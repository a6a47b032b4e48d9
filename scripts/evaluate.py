#!/usr/bin/env python
"""Evaluation driver covering the reference's test_*.py family.

Strategies (reference pairing, SURVEY.md §1):
  tta         test_simple.py  — crop-volume 8-way flip TTA (primary eval)
  single      test.py         — single-patch, no TTA
  tiling      test_overlap.py — 8-crop sliding window over 240x240x155
  tiling_tta  test_cls.py     — tiling + flip TTA over tilings
  sweep       test_all_pth.py — evaluate every checkpoint, CSV of dice

With no --root, evaluates on synthetic volumes (dataset-free smoke).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--strategy", default="tta",
                   choices=["tta", "single", "tiling", "tiling_tta",
                            "sweep"])
    p.add_argument("--root", default="")
    p.add_argument("--valid-file", default="valid.txt")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch to load (default: latest)")
    p.add_argument("--drop-modal", action="store_true")
    p.add_argument("--missing", default="",
                   help="comma-separated modality names or indices to zero "
                        "out on every volume (missing-modality evaluation), "
                        "e.g. --missing t1ce or --missing 0,2")
    p.add_argument("--cache-dir", default="",
                   help="preprocessed-volume cache dir")
    p.add_argument("--synthetic-hardness", default="simple",
                   choices=["simple", "hard"])
    p.add_argument("--output-dir", default="output")
    p.add_argument("--snapshot", action="store_true", help="PNG slices")
    p.add_argument("--csv", action="store_true", help="per-slice CSV")
    p.add_argument("--save-nifti", action="store_true")
    p.add_argument("--no-hd95", action="store_true")
    p.add_argument("--hd95", default="reference",
                   choices=["reference", "surface"],
                   help="'reference' reproduces the reference's batched-mask "
                        "medpy quirk (its headline HD95 numbers); 'surface' "
                        "is the corrected 3-D surface-distance HD95 (see "
                        "dctseg.metrics.cal_hausdorff)")
    p.add_argument("--paired", type=int, default=1, metavar="V",
                   help="volumes per dispatched program (any strategy): V "
                        "volumes' crops/flips batch through one B=8V "
                        "forward — throughput for sweeps at Vx per-volume "
                        "latency+HBM (bf16 V=3 optimum on 16GB v5e, "
                        "docs/PERF.md 'Paired tiling')")
    p.add_argument("--multimodel", action="store_true",
                   help="ensemble over the newest 4 checkpoints "
                        "(predict_cls.py:147-174)")
    p.add_argument("--stitch-mode", default="reference",
                   choices=["reference", "aligned"])
    p.add_argument("--postprocess", action="store_true")
    p.add_argument("--img-dim", type=int, default=128)
    p.add_argument("--base-channels", type=int, default=16)
    p.add_argument("--fp32", action="store_true",
                   help="fp32 compute (default bf16: the fp32 B=8 batched "
                        "forward exceeds 16GB HBM on v5e)")
    p.add_argument("--pallas-attention", action="store_true")
    p.add_argument("--quantize", default="none",
                   help="int8 PTQ spec (dctseg/ops/quant.py): 'int8' = the "
                        "MXU-bound 3^3 convs (v5e int8 MXU runs 2x bf16 "
                        "peak); extend with '+pw'/'+deconv'/'+down' or "
                        "'int8_all'; changes numerics, so parity evals "
                        "keep 'none'")
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="multi-chip eval: shard each volume's D axis over "
                        "this many devices; TTA/tiling variants also fan "
                        "out over remaining devices (data axis)")
    p.add_argument("--random-params", action="store_true",
                   help="skip checkpoint loading (smoke runs)")
    p.add_argument("--num-samples", type=int, default=None,
                   help="synthetic dataset size (no --root only)")
    p.add_argument("--input-shape", type=int, nargs=3, default=None,
                   metavar=("H", "W", "D"),
                   help="raw volume shape (synthetic smoke runs; real "
                        "BraTS is always 240 240 155)")
    return p.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)
    import jax
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from dctseg.config import DataConfig, ModelConfig
    from dctseg.data.brats import BraTSDataset
    from dctseg.data.pipeline import PrefetchLoader
    from dctseg.infer.engine import Predictor
    from dctseg.infer.validate import validate_softmax
    from dctseg.models.clswiseformer import build_model
    from dctseg.train.checkpoint import Checkpointer
    from dctseg.train.trainer import ocp_abstract
    from dctseg.utils.export import export_checkpoint_sweep_csv
    from dctseg.utils.logging_utils import setup_logging

    from dctseg.utils.proctitle import set_process_title
    set_process_title("dctseg:test")  # reference test*.py:146 'Testing!'

    log = setup_logging(os.path.join(a.output_dir, "eval.txt"))
    mcfg = ModelConfig(
        img_dim=a.img_dim, base_channels=a.base_channels,
        compute_dtype="float32" if a.fp32 else "bfloat16",
        use_pallas_attention=a.pallas_attention, quantize=a.quantize,
        **({} if a.img_dim == 128
           else {"top_num": min(128, (a.img_dim // 16) ** 3)}))
    model = build_model(mcfg)

    names = DataConfig().modalities
    missing = tuple(
        int(tok) if tok.isdigit() else names.index(tok)
        for tok in (t.strip() for t in a.missing.split(",")) if tok)
    geo = {"crop_size": (a.img_dim,) * 3}
    if a.input_shape is not None:
        shape = tuple(a.input_shape)
        assert a.strategy not in ("tiling", "tiling_tta") or \
            shape == (240, 240, 155), (
            "sliding-window tiling windows are fixed to the BraTS "
            "240x240x155 geometry (predict.py:40-47)")
        geo.update(input_shape=shape, pad_depth=max(shape[2], a.img_dim))
    dcfg = DataConfig(root=a.root, valid_file=a.valid_file,
                      drop_modal=a.drop_modal, missing_modalities=missing,
                      cache_dir=a.cache_dir, **geo,
                      transfer_dtype="float32" if a.fp32 else "bfloat16",
                      synthetic_hardness=a.synthetic_hardness,
                      **({} if a.num_samples is None
                         else {"synthetic_num_samples": a.num_samples}))
    mode = "full" if a.strategy in ("tiling", "tiling_tta") else "valid"
    ds = BraTSDataset(
        list_file=(a.root and os.path.join(a.root, a.valid_file)),
        root=a.root, mode=mode, drop_modal=a.drop_modal, cfg=dcfg)

    def make_loader():
        return PrefetchLoader(ds, batch_size=1, shuffle=False,
                              num_workers=2)

    d = mcfg.img_dim
    x0 = jnp.zeros((1, d, d, d, mcfg.in_channels))
    params = jax.jit(lambda k: model.init(k, x0, train=False))(
        jax.random.PRNGKey(0))

    ckpt = None
    if not a.random_params:
        ckpt = Checkpointer(a.checkpoint_dir)
        abstract = jax.tree.map(ocp_abstract, params)
        epochs = ([a.epoch] if a.epoch is not None
                  else ([ckpt.latest_epoch()]
                        if ckpt.latest_epoch() is not None else []))
        if not epochs or epochs[0] is None:
            log.info("no checkpoint found in %s; using random params",
                     a.checkpoint_dir)
        elif a.strategy != "sweep":
            params = ckpt.restore_params(epochs[0], abstract)
            log.info("loaded checkpoint epoch %s", epochs[0])

    mesh = None
    if a.spatial_shards > 1 or jax.device_count() > 1:
        from dctseg.parallel.mesh import make_mesh
        mesh = make_mesh(spatial=a.spatial_shards)
        log.info("multi-chip eval mesh: %s", dict(mesh.shape))
    predictor = Predictor(model, params,
                          microbatch=4 if a.fp32 else None, mesh=mesh)
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    log.info("sum===== %d", n_params)

    if a.strategy == "sweep":
        # test_all_pth.py: evaluate every checkpoint, append to CSV
        assert ckpt is not None, "--random-params incompatible with sweep"
        abstract = jax.tree.map(ocp_abstract, params)
        csv_path = os.path.join(a.output_dir, "save_pth.csv")
        results = {}
        for epoch in ckpt.all_epochs():
            predictor.update_params(ckpt.restore_params(epoch, abstract))
            out = validate_softmax(make_loader(), predictor, "tta",
                                   use_hd95=not a.no_hd95,
                                   hd95_mode=a.hd95)
            export_checkpoint_sweep_csv(csv_path, f"epoch_{epoch}",
                                        out["wt"], out["tc"], out["et"])
            results[epoch] = out
            log.info("epoch %s -> WT %.4f TC %.4f ET %.4f", epoch,
                     out["wt"], out["tc"], out["et"])
        return results

    param_sets = None
    if a.multimodel and ckpt is not None:
        abstract = jax.tree.map(ocp_abstract, params)
        steps = ckpt.all_epochs()[-4:]
        param_sets = [ckpt.restore_params(e, abstract) for e in steps]
        log.info("ensembling %d checkpoints: %s", len(param_sets), steps)

    return validate_softmax(
        make_loader(), predictor, a.strategy,
        savepath=os.path.join(a.output_dir, "submission"),
        use_hd95=not a.no_hd95, hd95_mode=a.hd95,
        snapshot=a.snapshot, csv_export=a.csv,
        save_nifti=a.save_nifti, visual=os.path.join(a.output_dir, "visual"),
        param_sets=param_sets, stitch_mode=a.stitch_mode,
        postprocess=a.postprocess, paired=a.paired)


if __name__ == "__main__":
    main()
