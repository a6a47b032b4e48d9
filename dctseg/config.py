"""Configuration layer for the dctseg framework.

The reference scatters ~30 argparse flags across 8 driver scripts and bakes
magic constants into the model body (``cls_wise_former.py:72-86``: top_num=128,
patch sizes, select_num_*) plus a hard-coded dataset path read at model
construction (``cls_wise_former.py:275-278``).  Here everything lives in
dataclasses; all model geometry is *derived* from (img_dim, base_channels,
top_num) so that the default config reproduces the reference network exactly
while tiny configs remain available for multi-device dry runs and tests.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple


def _derive(img_dim: int, base_channels: int) -> dict:
    """Derive the ClsWiseFormer geometry from the two free size knobs.

    With the reference defaults (img_dim=128, base_channels=16) this yields
    exactly the constants of ``cls_wise_former.py:72-86``:
      semantic features 128ch @ 16^3, patch (2,2,1) -> 1024 tokens of dim 512
      edge features 32ch @ 32^3, patch (4,2,2)      -> 2048 tokens of dim 512
    """
    assert img_dim % 16 == 0, "img_dim must be divisible by 16"
    b0 = base_channels
    sem_ch = 8 * b0            # 128
    edge_ch = 2 * b0           # 32
    bottleneck_ch = 16 * b0    # 256
    sem_size = img_dim // 8    # 16
    edge_size = img_dim // 4   # 32
    sem_patch = (2, 2, 1)
    edge_patch = (4, 2, 2)
    token_dim = sem_ch * sem_patch[0] * sem_patch[1] * sem_patch[2]  # 512
    assert token_dim == edge_ch * edge_patch[0] * edge_patch[1] * edge_patch[2]
    n_sem_tokens = (sem_size // sem_patch[0]) * (sem_size // sem_patch[1]) * (
        sem_size // sem_patch[2])
    n_edge_tokens = (edge_size // edge_patch[0]) * (edge_size // edge_patch[1]) * (
        edge_size // edge_patch[2])
    return dict(
        sem_ch=sem_ch, edge_ch=edge_ch, bottleneck_ch=bottleneck_ch,
        sem_size=sem_size, edge_size=edge_size,
        sem_patch=sem_patch, edge_patch=edge_patch, token_dim=token_dim,
        n_sem_tokens=n_sem_tokens, n_edge_tokens=n_edge_tokens,
    )


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """ClsWiseFormer geometry + behaviour flags.

    Defaults reproduce ``get_cls_wise_former('brats', _conv_repr=True,
    _pe_type='fixed')`` (reference ``cls_wise_former.py:757-780``).
    """
    img_dim: int = 128
    in_channels: int = 4
    num_classes: int = 4
    base_channels: int = 16          # UNet stem width (reference: 16)
    num_heads: int = 8
    top_num: int = 128               # tokens routed per class branch
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    init_conv_dropout: float = 0.2   # InitConv spatial dropout (Unet_skipconnection.py:31)
    # 'fixed'  -> reference parity: the sinusoidal PE indexes the *batch* dim
    #            (PositionalEncoding.py:20-22) so every token receives the
    #            position-0 vector [0,1,0,1,...]; effectively a constant bias.
    # 'sinusoidal' -> corrected per-token sinusoidal PE.
    # 'learned'    -> per-token learned PE (the reference's 'learned' mode has
    #            transposed shapes and cannot run; ours is the fixed version).
    pe_type: str = "fixed"
    norm_eps: float = 1e-5           # torch InstanceNorm3d/LayerNorm default
    compute_dtype: str = "float32"   # 'bfloat16' for AMP-equivalent training
    # Use the fused Pallas attention kernel for the dual/fusion transformers.
    use_pallas_attention: bool = False
    # Rematerialize UNet residual blocks in backward (needed at 128^3 to fit
    # a 16GB chip; off for tiny test configs where recompute just costs time).
    remat: bool = True
    # Remat granularity when ``remat`` is on:
    #   "full"       — recompute the whole block in backward (stores only
    #                  block inputs; the most memory-thrifty policy).
    #   "save_convs" — jax.checkpoint_policies.save_only_these_names on the
    #                  conv outputs (tagged in dctseg/models/layers.py): the
    #                  MXU-bound convolutions are NOT recomputed in backward,
    #                  only the cheap norm/activation elementwise work is —
    #                  trades ~0.5 GB of saved conv activations (B=1 128^3)
    #                  for skipping the conv recompute FLOPs.
    # Measured on chip (docs/PERF.md round-4 remat sweep, B=1 128^3 bf16):
    # no remat fits and is 23% faster (112 vs 146 ms/step); save_convs buys
    # nothing over full (backward is bandwidth- not FLOP-bound).
    # scripts/train.py therefore defaults to remat=False under --amp.
    remat_policy: str = "full"
    # Fused Pallas InstanceNorm+activation(+residual) in the UNet blocks
    # (dctseg/ops/pallas/fusednorm.py): guarantees the 2-read/1-write HBM
    # floor per norm and folds the activation + residual add into the
    # normalize pass.  Inference-only (no VJP; Trainer rejects it);
    # rounding-close, not bit-exact (different f32 reduction-tree order).
    fused_norms: bool = False
    # Run the full-resolution UNet stages on a space-to-depth view (exact
    # weight-transformed convs, ~2.7x faster full-res convs on TPU v5e; see
    # dctseg/ops/s2d.py and docs/PERF.md).  Checkpoint-compatible both ways.
    s2d_fullres: bool = True
    # Same strategy for the half-resolution stages (64^3 x 32ch at full
    # size): encoder en2 blocks + down2, decoder deup3 + deblock3, and the
    # edge-decouple conv_64_to_32 run on the s2d view.
    s2d_halfres: bool = True
    # Execution strategy for the 3^3 stride-1 convs on the s2d view:
    # "dense" = (3,3,3,8C,8C) coarse conv (1/8-dense weights, 8x logical
    # FLOPs); "fine" = depth_to_space + (4,4,4,C,8C) stride-2 conv (2.37x
    # logical FLOPs).  Chosen by measurement on the chip (docs/PERF.md).
    conv3_strategy: str = "dense"
    # "int8": dynamic post-training quantization of the MXU-bound 3^3 convs
    # (dense-s2d stages + >=64-input-channel direct stages) — s8 x s8 -> s32
    # on the v5e int8 MXU path (2x the bf16 peak), dequantized per call.
    # Extra op classes opt in with "+pw" (pointwise 1x1 convs, incl. the
    # block-diagonal s2d DeUpCat convs), "+deconv" (S2DDeconv upsample),
    # "+down" (stride-2 s2d downs), or "int8_all" (everything) — chosen by
    # chip measurement (docs/PERF.md r5 "int8 residue").  Inference-only
    # (round() has zero gradient; the Trainer rejects it); checkpoints
    # stay f32 and identical (pure execution strategy).  Opt-in: changes
    # eval numerics, so parity modes keep "none".  dctseg/ops/quant.py.
    quantize: str = "none"

    @property
    def geometry(self) -> dict:
        return _derive(self.img_dim, self.base_channels)

    def __post_init__(self):
        g = self.geometry
        assert self.top_num <= min(g["n_sem_tokens"], g["n_edge_tokens"]), (
            f"top_num={self.top_num} exceeds token count "
            f"(sem={g['n_sem_tokens']}, edge={g['n_edge_tokens']})")
        assert g["token_dim"] % self.num_heads == 0


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """BraTS data pipeline settings (interface reconstructed from reference
    call sites; the reference's ``data/`` package is absent upstream)."""
    root: str = ""
    train_file: str = "train.txt"
    valid_file: str = "valid.txt"
    input_shape: Tuple[int, int, int] = (240, 240, 155)  # raw NIfTI volume
    pad_depth: int = 160            # pad 155 -> 160 before cropping
    crop_size: Tuple[int, int, int] = (128, 128, 128)
    modalities: Tuple[str, ...] = ("flair", "t1", "t1ce", "t2")
    drop_modal: bool = False        # random modality dropout at load time
    missing_modalities: Tuple[int, ...] = ()  # force these modality indices
    # absent on every sample (deterministic missing-modality evaluation; the
    # capability test_all_pth.py:112 exercises with drop_modal)
    # optional train-time augmentation (the reference's loader is absent
    # upstream; these mirror the standard BraTS recipe, default off)
    augment_flip: bool = False      # random axis flips (image+target+edge)
    augment_intensity: float = 0.0  # per-channel scale/shift jitter amount
    num_workers: int = 8
    prefetch: int = 2
    seed: int = 1000
    synthetic_num_samples: int = 8  # used when root == '' (synthetic data)
    synthetic_valid_seed_offset: int = 10000  # valid/full synthetic volumes
    # are generated from disjoint seeds so eval measures generalization, not
    # recall of the training volumes
    synthetic_hardness: str = "simple"  # 'simple' | 'hard' (multi-focal,
    # irregular lesions; see dctseg/data/synthetic.py)
    cache_dir: str = ""  # preprocessed-volume cache: decode NIfTI once into
    # mmap-able .npy + cached z-score stats; epoch 2+ reads only crop pages
    # Wire dtype for image volumes handed to the device.  "bfloat16" halves
    # host->device bytes — measured 25 MB/s over this container's remote-TPU
    # relay, making H2D the train/eval bottleneck (docs/PERF.md) — and is
    # BIT-IDENTICAL for bf16-compute models (the model casts inputs to bf16
    # at its first op anyway).  Keep "float32" for fp32-compute parity runs;
    # scripts pick this automatically from the model's compute dtype.
    transfer_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop settings (reference ``train.py:76-108``)."""
    lr: float = 2e-4
    weight_decay: float = 1e-5
    amsgrad: bool = True
    criterion: str = "softmax_dice"
    start_epoch: int = 0
    end_epoch: int = 1000
    save_freq: int = 50
    seed: int = 1000
    batch_size: int = 1              # per device
    poly_power: float = 0.9
    # train_amp.py:272-278 offsets the poly schedule by -249 for epochs > 249.
    amp_lr_restart_epoch: Optional[int] = None
    resume: str = ""
    checkpoint_dir: str = "checkpoints"
    experiment: str = "clswiseformer_tpu"
    log_every: int = 1
    # number of data-parallel devices; None -> all local devices
    num_devices: Optional[int] = None
    spatial_shards: int = 1  # 2-D (data, space) mesh: shard each sample's D
    # spatial axis over this many devices (GSPMD conv halo exchange); the
    # reference has no model parallelism (SURVEY.md §2.9b) — TPU headroom
    device_prefetch: int = 1  # device_put the NEXT batch from a feeder
    # thread while the current step runs (double buffer): overlaps the H2D
    # transfer — the measured bottleneck on this container's 25 MB/s relay
    # (docs/PERF.md) — with device compute.  0 = synchronous placement.
    grad_accum: int = 1  # micro-batches per optimizer step (lax.scan
    # accumulation): per-device batch must divide evenly.  Lets one 16 GB
    # chip train the reference's global batch of 4 (train.py:76,305) when
    # a single backward pass does not fit.
    preempt_save: bool = True  # on SIGTERM/SIGINT, finish the in-flight
    # step, save a FULL checkpoint (params+opt_state+step) and exit
    # cleanly (TPU-pod preemptions deliver SIGTERM; the reference has no
    # recovery story — crash = restart from last .pth, SURVEY.md §5)
    restore_opt: bool = False  # --resume restores optimizer state + epoch
    # too (true resume).  Default False = the reference's params-only
    # resume quirk (train.py:146-157).


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Inference settings (reference ``test_*.py`` / ``predict_*.py``)."""
    use_tta: bool = False            # 8-way flip test-time augmentation
    tiling: bool = False             # 8-crop sliding-window over 240x240x155
    multimodel: bool = False         # multi-checkpoint softmax ensembling
    snapshot: bool = False           # per-slice PNG export
    csv_export: bool = False         # per-slice CSV export
    save_nifti: bool = False         # NIfTI submission export
    postprocess: bool = False
    output_dir: str = "output"
    checkpoint: str = ""


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)

    @staticmethod
    def from_dict(d: dict) -> "Config":
        def build(cls, sub: Optional[dict]):
            sub = dict(sub or {})
            for k, v in sub.items():
                f = {f.name: f for f in dataclasses.fields(cls)}.get(k)
                if f is not None and isinstance(v, list):
                    sub[k] = tuple(v)
            return cls(**sub)
        return Config(
            model=build(ModelConfig, d.get("model")),
            data=build(DataConfig, d.get("data")),
            train=build(TrainConfig, d.get("train")),
            eval=build(EvalConfig, d.get("eval")),
        )

    @staticmethod
    def from_json(path: str) -> "Config":
        with open(path) as f:
            return Config.from_dict(json.load(f))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


def tiny_model_config(**overrides: Any) -> ModelConfig:
    """A miniature model for unit tests and multi-device CPU dry runs."""
    kw = dict(img_dim=32, base_channels=4, num_heads=8, top_num=8,
              dropout_rate=0.0, attn_dropout_rate=0.0, init_conv_dropout=0.0,
              remat=False)
    kw.update(overrides)
    return ModelConfig(**kw)
