#!/usr/bin/env python
"""Attack the full-res s2d conv backward (docs/PERF.md "inside the
backward"): en1 + deup2/deblock2 — the (1,64^3,128)->128 dense convs —
cost 49 ms of the 72 ms backward at 3.0-3.9x their forward, where conv
arithmetic says 2x (dx + dW each ~ one forward conv).

This script isolates WHERE the excess lives and tests explicit rewrites
at the exact hot shape (B=1 train, bf16, dense kernel as a constant so
the weight-transform is out of the picture):

  baseline  — fwd; autodiff dx-only / dW-only / dx+dW (value_and_grad
              scan chains, grads folded into the carry).
  explicit  — the same two gradient programs written by hand, timed as
              forward chains: dx = dense conv of the cotangent with the
              spatially-flipped, io-transposed kernel (identical
              arithmetic to XLA's data-grad conv); dW = 27 shifted
              (N*Z*Y*X, Ci)^T @ (N*Z*Y*X, Co) matmuls (the kernel-grad
              contraction expressed as fat MXU matmuls over the padded
              input's 27 window offsets, f32 accumulation).
  custom    — jax.custom_vjp conv using the explicit programs, timed
              dx+dW, to measure the in-graph (fused) cost.

Correctness: --check (any platform) asserts the custom VJP's dx/dW
match autodiff to bf16 tolerance before anything is timed.

Protocol: docs/PERF.md "Measurement pitfalls" — data-dependent lax.scan
chains (REP=6), best of 3, device-generated inputs, one process.

Reference hot loop this serves: train.py:182-240 (the reference's
backward has no analogue knobs; torch/cudnn picks grad algos opaquely).
Results: docs/PERF.md "Round 5: inside the backward".

Run:  python scripts/measure_backward_attack.py [--rep 6] [--check]
      python scripts/measure_backward_attack.py --cpu --dim 16 --check
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=6)
    ap.add_argument("--dim", type=int, default=64,
                    help="coarse spatial dim (64 = the 128^3 train shape)")
    ap.add_argument("--ch", type=int, default=128,
                    help="dense channels (128 = en1/deblock2)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="assert custom-VJP grads match autodiff first")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from dctseg.ops import s2d as s2dops

    print("devices:", jax.devices(), flush=True)
    rep, d, ch = args.rep, args.dim, args.ch

    def devrand(shape, dtype=jnp.bfloat16, seed=0):
        return jax.jit(lambda k: jax.random.normal(
            k, shape, jnp.float32).astype(dtype))(jax.random.PRNGKey(seed))

    x = devrand((1, d, d, d, ch), seed=1)
    w = devrand((3, 3, 3, ch, ch), seed=2)
    g = devrand((1, d, d, d, ch), seed=3)

    def conv(xx, ww):
        return s2dops.conv3d_s2d(xx, ww, padding=(1, 1))

    def dx_explicit(gg, ww):
        wt = jnp.flip(ww, (0, 1, 2)).swapaxes(3, 4)
        return conv(gg, wt)

    def dw_explicit(xx, gg):
        dd, hh, wwd = xx.shape[1:4]
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        rows = []
        for a in range(3):
            for b in range(3):
                for c in range(3):
                    xs = xp[:, a:a + dd, b:b + hh, c:c + wwd, :]
                    rows.append(jnp.einsum(
                        "nzyxi,nzyxo->io", xs, gg,
                        preferred_element_type=jnp.float32))
        out = jnp.stack(rows, 0).reshape(3, 3, 3, *rows[0].shape)
        return out.astype(xx.dtype)

    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def conv_cv(xx, ww):
        return conv(xx, ww)

    def conv_cv_fwd(xx, ww):
        return conv(xx, ww), (xx, ww)

    def conv_cv_bwd(res, gg):
        xx, ww = res
        return dx_explicit(gg, ww), dw_explicit(xx, gg)

    conv_cv.defvjp(conv_cv_fwd, conv_cv_bwd)

    # hybrid: explicit dx + XLA's own kernel-grad conv for dW (in case the
    # 27-matmul dW is bandwidth-bound at the real shape: it reads the
    # padded input 27 times where XLA's grad conv reads it once)
    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def conv_hy(xx, ww):
        return conv(xx, ww)

    def conv_hy_fwd(xx, ww):
        return conv(xx, ww), (xx, ww)

    def conv_hy_bwd(res, gg):
        xx, ww = res
        _, pull = jax.vjp(lambda w_: conv(xx, w_), ww)
        return dx_explicit(gg, ww), pull(gg)[0]

    conv_hy.defvjp(conv_hy_fwd, conv_hy_bwd)

    if args.check:
        def loss_ref(xx, ww):
            return jnp.mean(jnp.square(conv(xx, ww).astype(jnp.float32)))

        def loss_cv(xx, ww):
            return jnp.mean(jnp.square(conv_cv(xx, ww).astype(jnp.float32)))

        gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, w)
        gc = jax.jit(jax.grad(loss_cv, argnums=(0, 1)))(x, w)
        import numpy as np
        for name, a, b in (("dx", gr[0], gc[0]), ("dW", gr[1], gc[1])):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = np.abs(a).max() + 1e-30
            err = np.abs(a - b).max() / scale
            print(f"  check {name}: rel max|err| {err:.2e}", flush=True)
            assert err < 2e-2, (name, err)
        print("  custom-VJP grads match autodiff.", flush=True)

    def time_compiled(compiled, arrays, rounds=3):
        def once():
            t0 = time.perf_counter()
            y = compiled(*arrays)
            leaf = jax.tree.leaves(y)[0]
            float(leaf.ravel()[0].astype("float32"))
            return (time.perf_counter() - t0) / rep
        once()
        return sorted(once() for _ in range(rounds))

    def fwd_chain(f, arrays, label):
        """Chain f's (first-leaf) output back into arrays[0]."""
        def chained(*a):
            def body(c, _):
                y = f(*c)
                leaf = jax.tree.leaves(y)[0]
                eps = (leaf.astype(jnp.float32).ravel()[0] * 0
                       ).astype(c[0].dtype)
                return (c[0] + eps,) + tuple(c[1:]), None
            c, _ = jax.lax.scan(body, a, None, length=rep)
            return c[0]
        compiled = jax.jit(chained).lower(*arrays).compile()
        ts = time_compiled(compiled, arrays)
        del compiled
        print(f"  {label:44s} {ts[0] * 1e3:7.2f} ms  "
              f"(rounds {[round(t * 1e3, 2) for t in ts]})", flush=True)
        return ts[0]

    def grad_chain(convfn, argnums, arrays, label):
        def loss(xx, ww):
            return jnp.mean(jnp.square(convfn(xx, ww).astype(jnp.float32)))

        def chained(xx, ww):
            def body(c, _):
                cx, cw = c
                gs = jax.grad(loss, argnums=argnums)(cx, cw)
                gs = dict(zip(argnums, gs))
                if 0 in gs:
                    cx = cx + 0.0 * gs[0].astype(cx.dtype)
                if 1 in gs:
                    cw = cw + 0.0 * gs[1].astype(cw.dtype)
                return (cx, cw), None
            c, _ = jax.lax.scan(body, (xx, ww), None, length=rep)
            return c[0]
        compiled = jax.jit(chained).lower(*arrays).compile()
        ts = time_compiled(compiled, arrays)
        del compiled
        print(f"  {label:44s} {ts[0] * 1e3:7.2f} ms  "
              f"(rounds {[round(t * 1e3, 2) for t in ts]})", flush=True)
        return ts[0]

    print(f"\n== dense s2d conv ({d}^3 x {ch} -> {ch}, B=1 bf16, "
          f"REP={rep}) ==", flush=True)
    t_fwd = fwd_chain(conv, (x, w), "fwd conv (baseline)")
    grad_chain(conv, (0,), (x, w), "autodiff dx only")
    grad_chain(conv, (1,), (x, w), "autodiff dW only")
    t_auto = grad_chain(conv, (0, 1), (x, w), "autodiff dx+dW")
    fwd_chain(dx_explicit, (g, w), "explicit dx (flipped-kernel conv)")
    fwd_chain(dw_explicit, (x, g), "explicit dW (27-offset matmuls)")
    t_cv = grad_chain(conv_cv, (0, 1), (x, w), "custom-VJP dx+dW")
    grad_chain(conv_hy, (0, 1), (x, w),
               "hybrid VJP (explicit dx + XLA dW)")
    print(f"\n  fwd {t_fwd * 1e3:.2f}  autodiff bwd "
          f"{(t_auto - t_fwd) * 1e3:.2f}  custom bwd "
          f"{(t_cv - t_fwd) * 1e3:.2f} ms", flush=True)
    print("done.", flush=True)


if __name__ == "__main__":
    main()
