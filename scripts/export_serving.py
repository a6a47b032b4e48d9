#!/usr/bin/env python
"""Export an AOT serving bundle (serialized StableHLO, weights embedded).

The deployment counterpart of the eval drivers: where the reference ships
model code + a ``.pth`` and rebuilds the module on the serving host
(predict_simple.py:283-300), this emits a self-contained program bundle
(dctseg/infer/serving.py) that any jax host replays bit-identically —
no Flax, no model code, no checkpoint at load time.

Examples:
  python scripts/export_serving.py --checkpoint-dir checkpoints \\
      --strategy tiling --out bundles/tiling_bf16
  python scripts/export_serving.py --strategy tta --input-shape 128 128 128 \\
      --platforms tpu cpu --out bundles/tta_portable
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="bundle output directory")
    p.add_argument("--strategy", default="tiling",
                   choices=["single", "tta", "tiling", "tiling_tta"])
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch to embed (default: latest)")
    p.add_argument("--random-params", action="store_true",
                   help="skip checkpoint loading (smoke runs)")
    p.add_argument("--img-dim", type=int, default=128)
    p.add_argument("--base-channels", type=int, default=16)
    p.add_argument("--fp32", action="store_true",
                   help="fp32 compute (default bf16, the eval default)")
    p.add_argument("--quantize", default="none",
                   help="int8 PTQ spec (ModelConfig.quantize; 'int8' or op-class extensions like 'int8+pw'/'int8_all')")
    p.add_argument("--input-shape", type=int, nargs=3, default=None,
                   metavar=("D", "H", "W"),
                   help="volume spatial shape the bundle accepts "
                        "(default: 240 240 160 for tiling; required for "
                        "single/tta)")
    p.add_argument("--input-dtype", default="float32",
                   choices=["float32", "float16"],
                   help="wire dtype the bundle accepts. float16 halves the "
                        "host->device bytes per request (the dominant "
                        "serving cost on bandwidth-poor paths) and is cast "
                        "to the compute dtype at the model's first op — for "
                        "the bf16 eval default this is the same "
                        "approximation class as DataConfig.transfer_dtype")
    p.add_argument("--batch-volumes", type=int, default=1,
                   help="volumes per request (paired bundle): the tiling "
                        "forward runs B=8V per request; measured optimum "
                        "V=3 bf16 on a 16 GB v5e (docs/PERF.md 'Paired "
                        "tiling'). tiling/single only")
    p.add_argument("--stitch-mode", default="reference",
                   choices=["reference", "aligned"])
    p.add_argument("--platforms", nargs="+", default=None,
                   help="export platforms, e.g. --platforms tpu cpu "
                        "(default: current platform only)")
    return p.parse_args(argv)


def main(argv=None):
    a = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    from dctseg.config import ModelConfig
    from dctseg.infer.engine import Predictor
    from dctseg.infer.serving import export_bundle
    from dctseg.models.clswiseformer import build_model
    from dctseg.train.checkpoint import Checkpointer
    from dctseg.train.trainer import ocp_abstract

    mcfg = ModelConfig(
        img_dim=a.img_dim, base_channels=a.base_channels,
        compute_dtype="float32" if a.fp32 else "bfloat16",
        quantize=a.quantize,
        **({} if a.img_dim == 128
           else {"top_num": min(128, (a.img_dim // 16) ** 3)}))
    model = build_model(mcfg)
    d = mcfg.img_dim
    x0 = jnp.zeros((1, d, d, d, mcfg.in_channels))
    params = jax.jit(lambda k: model.init(k, x0, train=False))(
        jax.random.PRNGKey(0))

    if not a.random_params:
        ckpt = Checkpointer(a.checkpoint_dir)
        abstract = jax.tree.map(ocp_abstract, params)
        epoch = a.epoch if a.epoch is not None else ckpt.latest_epoch()
        if epoch is None:
            print(f"no checkpoint found in {a.checkpoint_dir}; "
                  "pass --random-params to export anyway", file=sys.stderr)
            return 1
        params = ckpt.restore_params(epoch, abstract)
        print(f"embedding checkpoint epoch {epoch}")

    manifest = export_bundle(
        Predictor(model, params), a.out, strategy=a.strategy,
        input_shape=tuple(a.input_shape) if a.input_shape else None,
        in_channels=mcfg.in_channels, input_dtype=jnp.dtype(a.input_dtype),
        stitch_mode=a.stitch_mode, batch_volumes=a.batch_volumes,
        platforms=a.platforms)
    size = sum(os.path.getsize(os.path.join(a.out, f))
               for f in os.listdir(a.out))
    print(f"exported {a.strategy} bundle to {a.out} "
          f"({size / 1e6:.1f} MB, platforms={manifest['platforms']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
