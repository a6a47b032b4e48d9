#!/usr/bin/env python
"""Backward-pass section profile: the forward's layout campaign, one
level down (VERDICT r4 item 2).

The B=1 128^3 bf16 train step splits ~40 ms fwd + ~72 ms bwd + ~1 ms
update (docs/PERF.md remat sweep), and the backward never received the
section-profile that won the forward 31 ms of layout reorders.  This
script measures, at the TRAIN shapes (B=1 128^3 bf16, remat off — the
measured --amp default):

  enc  — cumulative encoder taps, each timed TWICE: forward-only chain
         and value_and_grad chain (loss = mean(square(tap_output)),
         grads taken wrt params AND the input so both the data-gradient
         and weight-gradient programs of every section execute).  The
         per-tap deltas give per-section fwd and fwd+bwd; bwd = diff.
  dec  — likewise for the decoder (standalone module, random s2d-view
         inputs generated on device).
  ops  — isolated fwd+bwd of the suspected hot backward ops: the staged
         space_to_depth (its VJP is a staged depth_to_space),
         InstanceNorm+LeakyReLU+residual at the full-res s2d shape, and
         the dense-s2d 3^3 conv (dx + dW).

Protocol: docs/PERF.md "Measurement pitfalls" — data-dependent
``lax.scan`` chains (the grad chains fold every gradient leaf back into
the carry with a zero-scaled update, so no backward program is
dead-code-eliminated and every iteration depends on the last), best of
3, inputs generated on device.

Reference hot loop this accounts for: train.py:182-240.
Results land in docs/PERF.md "Round 5: inside the backward".

Run on the idle chip:  python scripts/profile_backward.py [--rep 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=REP)
    ap.add_argument("--only", default="", help="comma list: enc,dec,ops")
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
    from dctseg.ops import s2d as s2dops

    print("devices:", jax.devices(), flush=True)
    rep, d = args.rep, args.img_dim
    cfg = ModelConfig(compute_dtype="bfloat16", img_dim=d,
                      **({} if d == 128
                         else {"top_num": min(128, (d // 16) ** 3)}))
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, d, d, d, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)

    def devrand(shape, dtype=jnp.bfloat16, seed=0):
        return jax.jit(lambda k: jax.random.normal(
            k, shape, jnp.float32).astype(dtype))(jax.random.PRNGKey(seed))

    def time_compiled(compiled, arrays, rounds=3):
        def once():
            t0 = time.perf_counter()
            y = compiled(*arrays)
            leaf = jax.tree.leaves(y)[0]
            float(leaf.ravel()[0].astype("float32"))
            return (time.perf_counter() - t0) / rep
        once()
        return sorted(once() for _ in range(rounds))

    def fwd_chain_time(apply_fn, p, arrays):
        """Forward-only: perturb the first input with the tap output."""
        def chained(pp, *a):
            def body(c, _):
                y = apply_fn(pp, *c)
                leaf = jax.tree.leaves(y)[0]
                eps = (leaf.astype(jnp.float32).ravel()[0] * 0
                       ).astype(c[0].dtype)
                return (c[0] + eps,) + tuple(c[1:]), None
            c, _ = jax.lax.scan(body, a, None, length=rep)
            return c[0]
        compiled = jax.jit(chained).lower(p, *arrays).compile()
        ts = time_compiled(compiled, (p, *arrays))
        del compiled
        return ts

    def grad_chain_time(apply_fn, p, arrays):
        """value_and_grad chain: loss = mean(square(tap)), grads wrt
        params AND every input; all gradient leaves fold back into the
        carry so the full backward executes every iteration."""
        def loss(pp, *a):
            y = apply_fn(pp, *a)
            return jnp.mean(jnp.square(jax.tree.leaves(y)[0]
                                       .astype(jnp.float32)))

        nargs = len(arrays)

        def chained(pp, *a):
            def body(c, _):
                cp, ca = c
                grads = jax.grad(loss, argnums=tuple(range(nargs + 1)))(
                    cp, *ca)
                gp, ga = grads[0], grads[1:]
                p2 = jax.tree.map(
                    lambda w, g: w + 0.0 * g.astype(w.dtype), cp, gp)
                a2 = tuple(x + 0.0 * g.astype(x.dtype)
                           for x, g in zip(ca, ga))
                return (p2, a2), None
            c, _ = jax.lax.scan(body, (pp, a), None, length=rep)
            return c[1][0]
        compiled = jax.jit(chained).lower(p, *arrays).compile()
        ts = time_compiled(compiled, (p, *arrays))
        del compiled
        return ts

    def section_table(title, taps, names, make_module, p, arrays):
        print(f"\n== {title} (B=1 {d}^3 bf16, fwd vs fwd+bwd) ==",
              flush=True)
        cum_f, cum_g = {}, {}
        for tap in taps:
            mod = make_module(tap)

            def apply_fn(pp, *a, mod=mod):
                return mod.apply(pp, *a)

            tf = fwd_chain_time(apply_fn, p, arrays)
            tg = grad_chain_time(apply_fn, p, arrays)
            cum_f[tap], cum_g[tap] = tf[0], tg[0]
            print(f"  tap {tap or 'full':8s}: fwd {tf[0] * 1e3:7.2f} ms  "
                  f"fwd+bwd {tg[0] * 1e3:7.2f} ms  (rounds "
                  f"{[round(t * 1e3, 2) for t in tg]})", flush=True)
        print("  -- section deltas (fwd | bwd = (fwd+bwd) - fwd) --",
              flush=True)
        pf = pg = 0.0
        for tap, desc in names:
            df = cum_f[tap] - pf
            dg = cum_g[tap] - pg
            pf, pg = cum_f[tap], cum_g[tap]
            print(f"  {desc:36s} fwd {df * 1e3:7.2f}  bwd "
                  f"{(dg - df) * 1e3:7.2f} ms", flush=True)

    if want("enc"):
        enc_params = {"params": params["params"]["unet"]}
        xin = devrand((1, d, d, d, 4), jnp.float32, seed=5)
        taps = ["s2d_in", "init", "en1", "down1", "half_in", "en2",
                "down2", "en3", "down3", "en4"]
        names = [("s2d_in", "input cast + space_to_depth"),
                 ("init", "init_conv (s2d 32->128)"),
                 ("en1", "en1_a/b x2 full-res s2d"),
                 ("down1", "down1 stride-2"),
                 ("half_in", "space_to_depth half view"),
                 ("en2", "en2_a/b x2 half-res s2d"),
                 ("down2", "down2 stride-2"),
                 ("en3", "en3_a/b x2 quarter"),
                 ("down3", "down3 stride-2"),
                 ("en4", "en4_a/b x2 + widen")]

        def make_enc(tap):
            return _EncWrap(tap)

        class _EncWrap:
            """UnetEncoder tap with train=False baked (dropout off — the
            backward of interest is the conv/norm/transpose VJPs)."""
            def __init__(self, tap):
                self.m = UnetEncoder(dtype=jnp.bfloat16, remat=False,
                                     tap=tap, name=None)

            def apply(self, p, x):
                return self.m.apply(p, x, train=False)

        section_table("encoder sections", taps, names, make_enc,
                      enc_params, (xin,))

    if want("dec"):
        dec_params = {"params": params["params"]["decoder"]}
        x1 = devrand((1, d // 2, d // 2, d // 2, 128), seed=1)
        x2 = devrand((1, d // 4, d // 4, d // 4, 256), seed=2)
        x3 = devrand((1, d // 4, d // 4, d // 4, 64), seed=3)
        encv = devrand((1, d // 8, d // 8, d // 8, 256), seed=4)
        taps = ["x8", "y4", "y3", "y2", ""]
        names = [("x8", "down_channel+enblock8x2"),
                 ("y4", "deup4+deblock4x2"),
                 ("y3", "deup3+deblock3x2 s2d-half"),
                 ("y2", "deup2+deblock2x2 s2d-full"),
                 ("", "endconv+softmax+d2s tail")]

        def make_dec(tap):
            return Decoder(256, 4, dtype=jnp.bfloat16, remat=False,
                           tap=tap, name=None)

        section_table("decoder sections", taps, names, make_dec,
                      dec_params, (x1, x2, x3, encv))

    if want("ops"):
        print(f"\n== isolated ops fwd+bwd (B=1 {d}^3-class shapes) ==",
              flush=True)
        from dctseg.ops.norms import leaky_relu

        def run_op(label, f, arrays):
            def apply_fn(pp, *a):
                return f(*a)

            tf = fwd_chain_time(apply_fn, {}, arrays)
            tg = grad_chain_time(apply_fn, {}, arrays)
            print(f"  {label:40s} fwd {tf[0] * 1e3:7.3f} ms  "
                  f"bwd {(tg[0] - tf[0]) * 1e3:7.3f} ms", flush=True)

        xfine = devrand((1, d, d, d, 4), jnp.bfloat16, seed=10)
        run_op("space_to_depth (staged, 4ch input)",
               lambda x: s2dops.space_to_depth(x), (xfine,))

        h = d // 2
        y0 = devrand((1, h, h, h, 128), seed=11)
        r0 = devrand((1, h, h, h, 128), seed=12)
        run_op("IN+lrelu+residual (full-res s2d)",
               lambda y, r: leaky_relu(s2dops.instance_norm_s2d(y)) + r,
               (y0, r0))

        w = devrand((3, 3, 3, 16, 16), jnp.float32, seed=13)
        run_op("dense-s2d 3^3 conv 16ch (dx+dW)",
               lambda x, ww: s2dops.conv3x3_s2d(x, ww, "dense"),
               (y0, w))

        c4 = devrand((1, h, h, h, 32), seed=14)
        run_op("endconv tail: softmax-s2d + d2s",
               lambda y: s2dops.depth_to_space(
                   jax.nn.softmax(y.astype(jnp.float32).reshape(
                       *y.shape[:-1], 8, 4), axis=-1)
                   .reshape(*y.shape)), (c4,))

    print("\ndone.", flush=True)


if __name__ == "__main__":
    main()
