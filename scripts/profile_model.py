#!/usr/bin/env python
"""FLOPs/params profiling CLI (the reference's thop ``__main__`` blocks,
cls_wise_former.py:783-801 and Unet_skipconnection.py:147-161).

  python scripts/profile_model.py                # ClsWiseFormer, 1x4x128^3
  python scripts/profile_model.py --model unet
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="clswiseformer",
                   choices=["clswiseformer", "unet"])
    p.add_argument("--img-dim", type=int, default=128)
    p.add_argument("--base-channels", type=int, default=16)
    p.add_argument("--batch", type=int, default=1)
    a = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from dctseg.config import ModelConfig
    from dctseg.utils.profiling import clever_format, profile_model

    d = a.img_dim
    x = jnp.zeros((a.batch, d, d, d, 4))
    key = jax.random.PRNGKey(0)
    if a.model == "clswiseformer":
        from dctseg.models.clswiseformer import build_model
        model = build_model(ModelConfig(
            img_dim=d, base_channels=a.base_channels,
            **({} if d == 128 else {"top_num": min(128, (d // 16) ** 3)})))
    else:
        from dctseg.models.unet import PlainUnet
        model = PlainUnet(base_channels=a.base_channels)
    params = jax.jit(
        lambda k: model.init({"params": k, "dropout": k}, x, train=False)
    )(key)
    stats = profile_model(model, params, x)
    print("FLOPS:", clever_format(stats["flops"]))
    print("Params:", clever_format(stats["params"]),
          f"({stats['params']})")
    print("HBM bytes accessed (XLA estimate):",
          clever_format(stats["bytes_accessed"]))


if __name__ == "__main__":
    main()
