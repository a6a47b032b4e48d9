#!/usr/bin/env python
"""Training driver (reference: train.py / train_amp.py / train_no_amp.py).

Single-program SPMD over all local devices (or --num-devices).  With no
--root, trains on synthetic volumes so the full loop is runnable anywhere.

Examples:
  python scripts/train.py --end-epoch 2              # synthetic smoke run
  python scripts/train.py --root /data/BraTS2018 --amp --end-epoch 1000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # dataset (reference train.py:44-73)
    p.add_argument("--root", default="", help="BraTS root; empty = synthetic")
    p.add_argument("--train-file", default="train.txt")
    p.add_argument("--drop-modal", action="store_true")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--cache-dir", default="",
                   help="preprocessed-volume cache dir (decode NIfTI once; "
                        "epoch 2+ reads mmap pages only)")
    p.add_argument("--num-samples", type=int, default=None,
                   help="synthetic dataset size (no --root only)")
    p.add_argument("--synthetic-hardness", default="simple",
                   choices=["simple", "hard"],
                   help="synthetic pathology difficulty (no --root only)")
    p.add_argument("--input-shape", type=int, nargs=3, default=None,
                   metavar=("H", "W", "D"),
                   help="raw volume shape (synthetic smoke runs; real "
                        "BraTS is always 240 240 155)")
    p.add_argument("--augment-flip", action="store_true")
    p.add_argument("--augment-intensity", type=float, default=0.0)
    # training (reference train.py:76-108)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight-decay", type=float, default=1e-5)
    p.add_argument("--criterion", default="softmax_dice")
    p.add_argument("--seed", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=1,
                   help="per-device batch size.  B=1 is the measured "
                        "per-sample optimum on v5e (B=2 costs +34%%/"
                        "sample — docs/PERF.md 'per-device train batch "
                        "sweep'); scale with data-parallel devices/"
                        "processes or --grad-accum instead")
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--end-epoch", type=int, default=1000)
    p.add_argument("--save-freq", type=int, default=50)
    p.add_argument("--resume", default="", help="checkpoint dir to resume")
    p.add_argument("--experiment", default="clswiseformer_tpu")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--num-devices", type=int, default=None)
    # multi-process launch (the reference's torch.distributed.launch shape,
    # train.py:1,128: one process per device / per host).  On Cloud TPU pod
    # slices just run the same command on every host — jax autodetects the
    # coordinator; elsewhere pass these (or JAX_COORDINATOR /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars).
    p.add_argument("--coordinator", default="",
                   help="coordinator address host:port for multi-process "
                        "runs (jax.distributed.initialize)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="shard each sample's D spatial axis over this many "
                        "devices (2-D data x space mesh; conv halos via "
                        "GSPMD)")
    # model
    p.add_argument("--img-dim", type=int, default=128)
    p.add_argument("--base-channels", type=int, default=16)
    p.add_argument("--pe-type", default="fixed",
                   choices=["fixed", "sinusoidal", "learned"])
    p.add_argument("--amp", action="store_true",
                   help="bf16 compute (train_amp.py equivalent, incl. its "
                        "LR restart quirk at epoch 249)")
    p.add_argument("--no-amp-lr-quirk", action="store_true",
                   help="with --amp, keep the plain poly schedule")
    p.add_argument("--pallas-attention", action="store_true")
    p.add_argument("--remat-policy", default=None,
                   choices=["full", "save_convs", "none"],
                   help="backward rematerialization granularity: 'full' "
                        "recomputes whole residual blocks, 'save_convs' "
                        "saves the MXU conv outputs and recomputes only "
                        "norms/activations, 'none' disables block remat "
                        "(needs the activation memory).  Default: 'none' "
                        "only for --amp with batch-size 1 and img-dim "
                        "<= 128 (the exact configuration measured 23%% "
                        "faster and fitting on a 16 GB chip — docs/PERF.md "
                        "remat sweep); everything else (fp32, larger "
                        "batches/volumes) keeps 'full'")
    p.add_argument("--device-prefetch", type=int, default=1,
                   help="stage the next batch's H2D transfer from a feeder "
                        "thread while the current step runs (0 = "
                        "synchronous placement)")
    p.add_argument("--eval-at-save", action="store_true",
                   help="run a validation pass (single-patch, no TTA) on "
                        "the valid split at every checkpoint save")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batches per optimizer step (gradient "
                        "accumulation; per-device batch must divide "
                        "evenly).  Trains large global batches on one chip")
    p.add_argument("--restore-opt", action="store_true",
                   help="--resume restores optimizer state + epoch too "
                        "(true resume; default is the reference's "
                        "params-only quirk, train.py:146-157)")
    p.add_argument("--no-preempt-save", action="store_true",
                   help="disable the SIGTERM/SIGINT handler that saves a "
                        "full resumable checkpoint before exiting")
    return p.parse_args(argv)


def build_config(a):
    from dctseg.config import (Config, DataConfig, ModelConfig, TrainConfig)
    # Measured remat sweep (docs/PERF.md round 4): at B=1 128^3 bf16 the
    # activations fit without remat and 'none' is 23% faster per step.
    # The default keys on the MEASURED configuration only — fp32 doubles
    # activations, and batch > 1 / img_dim > 128 scale them past what was
    # ever measured to fit on the 16 GB chip, so those keep 'full'.
    remat_policy = a.remat_policy or (
        "none" if (a.amp and a.batch_size == 1 and a.img_dim <= 128)
        else "full")
    model = ModelConfig(
        img_dim=a.img_dim, base_channels=a.base_channels, pe_type=a.pe_type,
        compute_dtype="bfloat16" if a.amp else "float32",
        use_pallas_attention=a.pallas_attention,
        remat=remat_policy != "none",
        remat_policy=("full" if remat_policy == "none"
                      else remat_policy),
        **({} if a.img_dim == 128 else {"top_num": min(128, (a.img_dim // 16) ** 3)}))
    # the data crop must match the model's input geometry (the reference
    # couples crop_* args to the 128^3 model, train.py:61-73)
    geo = {"crop_size": (a.img_dim,) * 3}
    if a.input_shape is not None:
        shape = tuple(a.input_shape)
        geo.update(input_shape=shape, pad_depth=max(shape[2], a.img_dim))
    data = DataConfig(root=a.root, train_file=a.train_file,
                      drop_modal=a.drop_modal, num_workers=a.num_workers,
                      seed=a.seed, cache_dir=a.cache_dir, **geo,
                      # bf16 wire format halves H2D bytes; bit-identical
                      # for the bf16-compute model (DataConfig docstring)
                      transfer_dtype="bfloat16" if a.amp else "float32",
                      synthetic_hardness=a.synthetic_hardness,
                      augment_flip=a.augment_flip,
                      augment_intensity=a.augment_intensity,
                      **({} if a.num_samples is None
                         else {"synthetic_num_samples": a.num_samples}))
    train = TrainConfig(
        lr=a.lr, weight_decay=a.weight_decay, criterion=a.criterion,
        start_epoch=a.start_epoch, end_epoch=a.end_epoch,
        save_freq=a.save_freq, seed=a.seed, batch_size=a.batch_size,
        amp_lr_restart_epoch=(249 if a.amp and not a.no_amp_lr_quirk
                              else None),
        resume=a.resume, checkpoint_dir=a.checkpoint_dir,
        experiment=a.experiment, num_devices=a.num_devices,
        spatial_shards=a.spatial_shards, device_prefetch=a.device_prefetch,
        grad_accum=a.grad_accum,
        restore_opt=a.restore_opt, preempt_save=not a.no_preempt_save)
    return Config(model=model, data=data, train=train)


def main(argv=None):
    a = parse_args(argv)
    # join the multi-process runtime BEFORE any jax backend use so all
    # processes agree on the global device set (no-op single-process)
    from dctseg.parallel import distributed
    distributed.initialize(a.coordinator or None, a.num_processes,
                           a.process_id)
    from dctseg.train.trainer import Trainer
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    from dctseg.utils.logging_utils import setup_logging

    from dctseg.utils.proctitle import set_process_title
    set_process_title("dctseg:train")  # reference train.py:120 'Training!'

    stamp = time.strftime("%Y%m%d_%H%M%S")
    # rank-gate the log file like the reference (train.py:113-118): only
    # the primary writes the experiment log; other processes log to console
    log = setup_logging(
        os.path.join(a.log_dir, f"{a.experiment}_{stamp}.txt")
        if distributed.is_primary() else None)
    for k, v in sorted(vars(a).items()):
        log.info("%s=%s", k, v)
    cfg = build_config(a)
    trainer = Trainer(cfg)
    log.info("devices: %s  global batch: %d",
             trainer.mesh.devices.ravel().tolist(), trainer.global_batch)

    eval_fn = None
    if a.eval_at_save:
        import os as _os
        from dctseg.data.brats import BraTSDataset
        from dctseg.data.pipeline import PrefetchLoader
        from dctseg.infer.engine import Predictor
        from dctseg.infer.validate import validate_softmax
        vds = BraTSDataset(
            list_file=(a.root and _os.path.join(a.root, "valid.txt")),
            root=a.root, mode="valid", cfg=cfg.data)
        predictor = Predictor(trainer.model, None)

        def eval_fn(tr, epoch):
            predictor.update_params(tr.state.params)
            out = validate_softmax(
                PrefetchLoader(vds, batch_size=1, shuffle=False,
                               num_workers=2),
                predictor, strategy="single", use_hd95=False)
            log.info("eval@%d: WT %.4f TC %.4f ET %.4f", epoch,
                     out["wt"], out["tc"], out["et"])

    trainer.fit(eval_fn)


if __name__ == "__main__":
    main()
