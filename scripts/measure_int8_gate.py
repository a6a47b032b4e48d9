#!/usr/bin/env python
"""A/B of the int8 spatial gate (quant.MIN_SPATIAL_ELEMS) on the folded
B=16 forward — one process, both arms, so the comparison shares every
compile/dispatch condition.

measure_int8_residue.py's decoder split showed dynamic int8 LOSING on
the small-spatial direct stages (deblock4 @32^3: -1.25 ms at B=16;
enblock8 @16^3: neutral) while winning +27.6/+2.0 ms on the s2d stages.
A first (global trace-shape) gate measured NEGATIVE whole-model
(262.0 -> 264.0 ms): it also swept in the middle's conv_mid/conv_sem/
sum_fusion convs at 32^3/16^3.  The gate is now PER-INSTANCE
(layers.Conv3d(spatial_gate=True), set only on the decoder's
enblock8*/deblock4* blocks); this script times the gated and ungated
(MIN_SPATIAL_ELEMS=0) "int8" spec back to back.  Protocol: docs/PERF.md
"Measurement pitfalls" — scalar-carry data-dependent scan chains
(REP=6), best of 3, on-device inputs.

Run on the idle chip:  python scripts/measure_int8_gate.py [--rep 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img-dim", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from dctseg.config import ModelConfig
    from dctseg.models.clswiseformer import build_model
    from dctseg.ops import quant

    print("devices:", jax.devices(), flush=True)
    rep, b, d = args.rep, args.batch, args.img_dim
    cfg = ModelConfig(compute_dtype="bfloat16", img_dim=d,
                      quantize="int8",
                      **({} if d == 128
                         else {"top_num": min(128, (d // 16) ** 3)}))
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, d, d, d, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)
    xq = jax.jit(lambda k: jax.random.normal(
        k, (b, d, d, d, 4), jnp.float32))(jax.random.PRNGKey(6))

    def chain_time_scalar(fn, arrays, rounds=3):
        def chained(*a):
            def body(c, _):
                x = a[0] + c.astype(a[0].dtype)
                y = fn(x, *a[1:])
                leaf = jax.tree.leaves(y)[0]
                return leaf.astype(jnp.float32).ravel()[0] * 0.0, None
            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                length=rep)
            return c
        compiled = jax.jit(chained).lower(*arrays).compile()

        def once():
            t0 = time.perf_counter()
            y = compiled(*arrays)
            float(y)
            return (time.perf_counter() - t0) / rep

        once()
        ts = sorted(once() for _ in range(rounds))
        del compiled
        return ts

    gate = 33 ** 3  # the threshold above the measured-negative <=32^3
    # class (quant.MIN_SPATIAL_ELEMS ships 0 = inert, so set explicitly)
    print(f"\n== int8 spatial gate A/B (B={b}, folded params) ==",
          flush=True)
    for label, thr in (("ungated int8", 0),
                       (f"decoder-gated (< {gate} elems skip)", gate)):
        quant.MIN_SPATIAL_ELEMS = thr  # read at trace time via spatial_ok

        def fwd(x_):
            return model.apply(params, x_, train=False)[0]

        ts = chain_time_scalar(fwd, (xq,))
        print(f"  {label:24s} {ts[0] * 1e3:8.2f} ms/fwd (rounds "
              f"{[round(t * 1e3, 2) for t in ts]})", flush=True)
    quant.MIN_SPATIAL_ELEMS = gate
    print("\ndone.", flush=True)


if __name__ == "__main__":
    main()
