#!/usr/bin/env python
"""int8 forward residue accounting + op-class extension A/B (VERDICT r4
item 1).

The r4 artifact showed the int8 V=2 rung at 42.9% of int8 peak — int8
converting into only a 1.36x end-to-end win over bf16 — because
quantization covered only the 3^3 stride-1 convs while the pointwise
convs (DeUpCat/DeUpCatS2D conv1/conv3), S2DDeconv, and the stride-2
downs stayed float on an asserted rationale.  This script produces the
numbers that settle it:

  split — device-time split of the B=16 (V=2) forward: cumulative-tap
          sections of the decoder and encoder, each timed at
          quantize="none" (bf16) AND "int8", so the per-section deltas
          show which milliseconds the current int8 coverage accelerates
          and which sections are the float residue.  (Sections with no
          3^3 conv — the DeUpCat pointwise/deconv work, transposes,
          norms — must show ~0 delta; that IS the residue.)
  ops   — end-to-end A/B of the op-class extensions on the folded
          (headline program class) B=16 forward: bf16, int8,
          int8+pw, int8+deconv, int8+down, int8_all.  This is the
          adopt-or-document-negative measurement.
  acc   — probability drift of the extended specs vs float on the same
          input (the correctness side is unit-tested on CPU; this is
          the chip sanity check — structured-prediction accuracy for an
          adopted spec comes from scripts/measure_structured_accuracy.py).

Measurement protocol: docs/PERF.md "Measurement pitfalls" — every
timing is a data-dependent ``lax.scan`` chain of REP iterations in one
program, best of 3; inputs are generated ON DEVICE (H2D over this relay
runs ~25 MB/s, a 1 GB activation would dominate the session).

Reference for the accelerated path: predict.py:37-65 (sliding-window
inference).  Results land in docs/PERF.md "int8 residue".

Run on the idle chip:
    python scripts/measure_int8_residue.py [--rep 6] [--only split,ops,acc]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=REP)
    ap.add_argument("--batch", type=int, default=16,
                    help="forward batch (16 = the headline V=2 rung)")
    ap.add_argument("--only", default="",
                    help="comma list: split,ops,acc (default: all)")
    ap.add_argument("--img-dim", type=int, default=128,
                    help="spatial size (CPU smoke runs use 32)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (logic smoke; numbers meaningless)")
    args = ap.parse_args()
    only = set(t for t in args.only.split(",") if t)

    def want(name):
        return not only or name in only

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from dctseg.config import ModelConfig
    from dctseg.models.clswiseformer import build_model
    from dctseg.models.unet import Decoder, UnetEncoder

    print("devices:", jax.devices(), flush=True)
    rep, b, d = args.rep, args.batch, args.img_dim
    cfg = ModelConfig(compute_dtype="bfloat16", img_dim=d,
                      **({} if d == 128
                         else {"top_num": min(128, (d // 16) ** 3)}))
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, d, d, d, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)

    def devrand(shape, dtype=jnp.bfloat16, seed=0):
        """Random input generated on device (tiny H2D: just the key)."""
        return jax.jit(lambda k: jax.random.normal(
            k, shape, jnp.float32).astype(dtype))(jax.random.PRNGKey(seed))

    def chain_time(fn, arrays, rounds=3):
        """Best-of-rounds per-call seconds of fn(*arrays) via a
        data-dependent REP-chain (perturbs the first array with a
        zero-scaled scalar of the output)."""
        def chained(*a):
            def body(c, _):
                y = fn(*c)
                leaf = jax.tree.leaves(y)[0]
                eps = (leaf.astype(jnp.float32).ravel()[0] * 0
                       ).astype(c[0].dtype)
                return (c[0] + eps,) + tuple(c[1:]), None
            c, _ = jax.lax.scan(body, a, None, length=rep)
            return c[0]
        compiled = jax.jit(chained).lower(*arrays).compile()

        def once():
            t0 = time.perf_counter()
            y = compiled(*arrays)
            float(y.ravel()[0].astype("float32"))
            return (time.perf_counter() - t0) / rep

        once()
        ts = sorted(once() for _ in range(rounds))
        del compiled
        return ts

    def chain_time_scalar(fn, arrays, rounds=3):
        """Like chain_time, but the scan carry is one f32 scalar added
        (broadcast) to the first array inside the body.  Carrying the
        (B,128^3,4) input itself forces a carry layout that lane-pads
        the 4-channel dim 32x (512 MB -> 16 GB) and OOMs HBM at B=16;
        the scalar carry keeps the chain data-dependent without coupling
        the input's layout to the scan."""
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

    if want("split"):
        print(f"\n== decoder sections (B={b} bf16 vs int8, cumulative "
              "taps) ==", flush=True)
        dec_params = {"params": params["params"]["decoder"]}
        x1 = devrand((b, d // 2, d // 2, d // 2, 128), seed=1)
        x2 = devrand((b, d // 4, d // 4, d // 4, 256), seed=2)
        x3 = devrand((b, d // 4, d // 4, d // 4, 64), seed=3)
        encv = devrand((b, d // 8, d // 8, d // 8, 256), seed=4)
        taps = ["x8", "y4", "y3", "y2", ""]
        names = [("x8", "down_channel+enblock8x2 @16^3"),
                 ("y4", "deup4+deblock4x2 @32^3"),
                 ("y3", "deup3+deblock3x2 s2d-half"),
                 ("y2", "deup2+deblock2x2 s2d-full"),
                 ("", "endconv+softmax+d2s tail")]
        cums = {}
        for quant in ("none", "int8"):
            cum = {}
            for tap in taps:
                dec = Decoder(256, 4, dtype=jnp.bfloat16, remat=False,
                              tap=tap, quantize=quant, name=None)

                def f(a, b_, c, d, dec=dec):
                    return dec.apply(dec_params, a, b_, c, d)

                ts = chain_time(f, (x1, x2, x3, encv))
                cum[tap] = ts[0]
                print(f"  [{quant:5s}] tap {tap or 'full':5s}: "
                      f"{ts[0] * 1e3:8.2f} ms (rounds "
                      f"{[round(t * 1e3, 2) for t in ts]})", flush=True)
            cums[quant] = cum
        print("  -- section deltas (bf16 -> int8) --", flush=True)
        prev = {"none": 0.0, "int8": 0.0}
        for tap, desc in names:
            row = {}
            for quant in ("none", "int8"):
                row[quant] = cums[quant][tap] - prev[quant]
                prev[quant] = cums[quant][tap]
            print(f"  {desc:34s} {row['none'] * 1e3:7.2f} -> "
                  f"{row['int8'] * 1e3:7.2f} ms  "
                  f"(saved {(row['none'] - row['int8']) * 1e3:+6.2f})",
                  flush=True)

    if want("split") or want("enc"):
        print(f"\n== encoder total (B={b} bf16 vs int8) ==", flush=True)
        enc_params = {"params": params["params"]["unet"]}
        xin = devrand((b, d, d, d, 4), jnp.float32, seed=5)
        for quant in ("none", "int8"):
            em = UnetEncoder(dtype=jnp.bfloat16, remat=False,
                             quantize=quant, name=None)

            def f(x_, em=em):
                return em.apply(enc_params, x_, train=False)

            ts = chain_time_scalar(f, (xin,))
            print(f"  [{quant:5s}] encoder: {ts[0] * 1e3:8.2f} ms (rounds "
                  f"{[round(t * 1e3, 2) for t in ts]})", flush=True)

    if want("ops"):
        print(f"\n== op-class extension A/B (B={b}, folded params — the "
              "headline program class) ==", flush=True)
        xq = devrand((b, d, d, d, 4), jnp.float32, seed=6)
        for spec in ("none", "int8", "int8+pw", "int8+deconv",
                     "int8+down", "int8+pw+deconv", "int8_all"):
            m = build_model(dataclasses.replace(cfg, quantize=spec))

            def fwd(x_, m=m):
                return m.apply(params, x_, train=False)[0]

            try:
                ts = chain_time_scalar(fwd, (xq,))
                print(f"  {spec:16s} {ts[0] * 1e3:8.2f} ms/fwd (rounds "
                      f"{[round(t * 1e3, 2) for t in ts]})", flush=True)
            except Exception as e:  # noqa: BLE001 - OOM is a result here
                print(f"  {spec:16s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    if want("acc"):
        print("\n== drift vs float (B=1, same random input) ==",
              flush=True)
        xa = devrand((1, d, d, d, 4), jnp.float32, seed=7)
        ref = None
        for spec in ("none", "int8", "int8_all"):
            m = build_model(dataclasses.replace(cfg, quantize=spec))
            p = jax.jit(lambda v, m=m: m.apply(params, v, train=False)[0]
                        .astype(jnp.float32))(xa)
            if spec == "none":
                ref = p
                continue
            diff = jnp.abs(p - ref)
            agree = jnp.mean((jnp.argmax(p, -1) == jnp.argmax(ref, -1))
                             .astype(jnp.float32))
            print(f"  {spec:10s} max|dP|={float(jnp.max(diff)):.5f}  "
                  f"mean|dP|={float(jnp.mean(diff)):.6f}  "
                  f"argmax agree={float(agree):.6f}", flush=True)

    print("\ndone.", flush=True)


if __name__ == "__main__":
    main()
