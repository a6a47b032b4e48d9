#!/usr/bin/env python
"""Decoder section profile + norm/fold A/B measurements on the chip.

VERDICT r3 items 1/2/5: publish a per-stage profile INSIDE the decoder
(the ~111 ms slice of the 215.5 ms B=8 eval forward), A/B the fused
Pallas InstanceNorm+act(+residual) kernel (ModelConfig.fused_norms,
dctseg/ops/pallas/fusednorm.py), A/B parameter folding
(Predictor(fold_params=True): XLA constant-folds the s2d weight
transforms + int8 weight quantization), and record absolute-efficiency
numbers (HLO flops, achieved TF/s, logical-FLOPs MFU).

Measurement protocol (docs/PERF.md "Measurement pitfalls"): every timing
is a data-dependent ``lax.scan`` chain of REP iterations inside ONE
program — single-call timings on this container are ~25-35 ms
relay-dispatch-bound, and loop-invariant chains get hoisted by XLA.
Decoder stage chains re-inject a zero-scaled scalar of the previous
output into the coupler-output input so each iteration depends on the
last while adding only a 16 MB elementwise pass.

Results land in docs/PERF.md.  Run on the idle chip:
    python scripts/profile_decoder.py [--rep 6] [--only sections,norm,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = 8
REP = 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=REP)
    ap.add_argument("--only", default="",
                    help="comma list: sections,norm,block,model,fold,"
                         "deup2,flops")
    args = ap.parse_args()
    only = set(t for t in args.only.split(",") if t)

    def want(name):
        return not only or name in only

    import jax
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from dctseg.config import ModelConfig
    from dctseg.models.clswiseformer import build_model
    from dctseg.models.unet import Decoder
    from dctseg.ops import s2d as s2dops

    print("devices:", jax.devices(), flush=True)
    rep = args.rep
    cfg = ModelConfig(compute_dtype="bfloat16")
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)
    dec_params = {"params": params["params"]["decoder"]}

    rng = np.random.default_rng(0)

    def rand(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)
                           ).astype(dtype)

    # decoder inputs at full size (s2d views where the flags put them)
    x1 = rand((B, 64, 64, 64, 128))      # full-res skip, s2d view
    x2 = rand((B, 32, 32, 32, 256))      # half-res skip, s2d view
    x3 = rand((B, 32, 32, 32, 64))       # quarter-res skip
    enc = rand((B, 16, 16, 16, 256))     # coupler output

    results = {}

    if want("sections"):
        print("\n== decoder sections (B=8 bf16, cumulative taps) ==",
              flush=True)
        taps = ["x8", "y4", "y3", "y3d", "y2", ""]
        cum = {}
        for tap in taps:
            dec = Decoder(256, 4, dtype=jnp.bfloat16, remat=False,
                          tap=tap, name=None)

            def step(x1_, x2_, x3_, e_, dec=dec):
                y = dec.apply(dec_params, x1_, x2_, x3_, e_)
                eps = (y.astype(jnp.float32).ravel()[0] * 0
                       ).astype(e_.dtype)
                return (x1_, x2_, x3_, e_ + eps)

            # carry = all four inputs; fn returns the perturbed carry
            def fn(*c, step=step):
                return step(*c)

            import jax as _jax

            def chained(*a, fn=fn):
                c, _ = _jax.lax.scan(lambda c, _: (fn(*c), None), a, None,
                                     length=rep)
                return c[3]

            compiled = _jax.jit(chained).lower(x1, x2, x3, enc).compile()

            def once(compiled=compiled):
                t0 = time.perf_counter()
                y = compiled(x1, x2, x3, enc)
                float(y.ravel()[0].astype("float32"))
                return (time.perf_counter() - t0) / rep

            once()
            ts = sorted(once() for _ in range(3))
            cum[tap] = ts[0]
            print(f"  tap {tap or 'full':5s}: {ts[0] * 1e3:8.2f} ms "
                  f"(rounds {[round(t * 1e3, 2) for t in ts]})", flush=True)
        names = [("x8", "down_channel+enblock8x2 @16^3"),
                 ("y4", "deup4+deblock4x2 @32^3 64ch"),
                 ("y3", "deup3+deblock3x2 s2d-half"),
                 ("y3d", "depth_to_space 32ch"),
                 ("y2", "deup2+deblock2x2 s2d-full"),
                 ("", "endconv+d2s+softmax")]
        prev = 0.0
        print("  -- section deltas --")
        for tap, desc in names:
            dt = cum[tap] - prev
            print(f"  {desc:36s} {dt * 1e3:8.2f} ms", flush=True)
            prev = cum[tap]
        results["sections"] = {t: cum[t] for t in cum}

    if want("norm"):
        print("\n== fused norm kernel vs XLA (s2d full-res shape) ==",
              flush=True)
        from dctseg.ops.pallas.fusednorm import fused_instance_norm_act
        shape = (B, 64, 64, 64, 128)
        y0 = rand(shape)
        res = rand(shape)

        def xla_norm(y, r):
            from dctseg.ops.norms import leaky_relu
            out = leaky_relu(s2dops.instance_norm_s2d(y)) + r
            return out, r

        def pl_norm(y, r):
            out = fused_instance_norm_act(y, 16, act="lrelu", residual=r,
                                          impl="pallas")
            return out, r

        for lbl, f in [("xla IN+lrelu+res", xla_norm),
                       ("pallas fused IN+lrelu+res", pl_norm)]:
            def fn(y, r, f=f):
                return f(y, r)

            def chained(y, r, fn=fn):
                c, _ = jax.lax.scan(lambda c, _: (fn(*c), None), (y, r),
                                    None, length=rep)
                return c[0]

            compiled = jax.jit(chained).lower(y0, res).compile()

            def once(compiled=compiled):
                t0 = time.perf_counter()
                out = compiled(y0, res)
                float(out.ravel()[0].astype("float32"))
                return (time.perf_counter() - t0) / rep

            once()
            ts = sorted(once() for _ in range(3))
            print(f"  {lbl:32s} {ts[0] * 1e3:8.3f} ms (rounds "
                  f"{[round(t * 1e3, 3) for t in ts]})", flush=True)

    if want("model"):
        print("\n== full eval forward: fused_norms off/on (B=8 bf16) ==",
              flush=True)
        import bench as benchmod
        for lbl, mcfg in [
                ("baseline", cfg),
                ("fused_norms", dataclasses.replace(cfg, fused_norms=True)),
                ("fused_norms+int8", dataclasses.replace(
                    cfg, fused_norms=True, quantize="int8")),
                ("int8", dataclasses.replace(cfg, quantize="int8"))]:
            m = build_model(mcfg)
            out = benchmod.measure_device_forward(
                m, params, (B, 128, 128, 128, 4), rep=rep)
            dt, fl = out["device_s_forward"], out["flops_forward"]
            print(f"  {lbl:20s} {dt * 1e3:8.2f} ms/fwd   HLO flops "
                  f"{fl / 1e12:.3f} T  -> {fl / dt / 1e12:6.1f} TF/s",
                  flush=True)
            results[f"model_{lbl}"] = (dt, fl)

    if want("fold"):
        print("\n== fold_params device A/B (int8, B=16 forward) ==",
              flush=True)
        # device-time chain with params as args (per-call weight prep
        # executes) vs params closed over (XLA folds it once at compile)
        mq = build_model(dataclasses.replace(cfg, quantize="int8"))
        xq = rand((16, 128, 128, 128, 4))

        def chain_args(p, x0_):
            def fwd(c):
                return mq.apply(p, c, train=False)[0].astype(c.dtype)
            c, _ = jax.lax.scan(lambda c, _: (fwd(c), None), x0_, None,
                                length=rep)
            return c

        def chain_fold(x0_):
            def fwd(c):
                return mq.apply(params, c, train=False)[0].astype(c.dtype)
            c, _ = jax.lax.scan(lambda c, _: (fwd(c), None), x0_, None,
                                length=rep)
            return c

        for lbl, compiled, a in [
                ("params-as-args", jax.jit(chain_args).lower(
                    params, xq).compile(), (params, xq)),
                ("params-folded", jax.jit(chain_fold).lower(
                    xq).compile(), (xq,))]:
            def once(compiled=compiled, a=a):
                t0 = time.perf_counter()
                y = compiled(*a)
                float(y.ravel()[0].astype("float32"))
                return (time.perf_counter() - t0) / rep

            once()
            ts = sorted(once() for _ in range(3))
            print(f"  {lbl:20s} {ts[0] * 1e3:8.2f} ms/fwd (rounds "
                  f"{[round(t * 1e3, 2) for t in ts]})", flush=True)

    if want("deup2"):
        print("\n== deup2 conv1 placement: d2s-then-1x1 vs pointwise-"
              "then-d2s ==", flush=True)
        w = rand((1, 1, 1, 32, 16), jnp.float32)
        y3s = rand((B, 32, 32, 32, 256))

        def variant_a(y, w_):
            yf = s2dops.depth_to_space(y)          # (B,64^3,32)
            out = jax.lax.conv_general_dilated(
                yf, w_.astype(yf.dtype), (1, 1, 1), [(0, 0)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=yf.dtype)
            return out

        def variant_b(y, w_):
            w8 = s2dops.pointwise_kernel(w_.astype(y.dtype), (32,))
            y16 = s2dops.conv3d_s2d(y, w8, padding=(0, 0))  # (B,32^3,128)
            return s2dops.depth_to_space(y16)       # (B,64^3,16)

        for lbl, f in [("A: d2s -> plain 1x1 32->16", variant_a),
                       ("B: s2d pointwise -> d2s", variant_b)]:
            def fn(y, w_, f=f):
                out = f(y, w_)
                eps = (out.astype(jnp.float32).ravel()[0] * 0
                       ).astype(y.dtype)
                return (y + eps, w_)

            def chained(y, w_, fn=fn):
                c, _ = jax.lax.scan(lambda c, _: (fn(*c), None), (y, w_),
                                    None, length=rep)
                return c[0]

            compiled = jax.jit(chained).lower(y3s, w).compile()

            def once(compiled=compiled):
                t0 = time.perf_counter()
                out = compiled(y3s, w)
                float(out.ravel()[0].astype("float32"))
                return (time.perf_counter() - t0) / rep

            once()
            ts = sorted(once() for _ in range(3))
            print(f"  {lbl:32s} {ts[0] * 1e3:8.3f} ms (rounds "
                  f"{[round(t * 1e3, 3) for t in ts]})", flush=True)

    if want("flops"):
        print("\n== logical model FLOPs (analytic, B=8 eval forward) ==",
              flush=True)
        # 2*K^3*Ci*Co*spatial per conv at the LOGICAL (fine-grid) shapes —
        # what the model mathematically computes, independent of the s2d
        # execution strategy's 8x re-expression.
        def conv(sp, k, ci, co):
            return 2 * (k ** 3) * ci * co * (sp ** 3) * B

        fl = 0
        # encoder: init + en1 x4 + down1 + en2 x4 + down2 + en3 x4 + down3
        #          + en4 x4 + widen
        fl += conv(128, 3, 4, 16) + 4 * conv(128, 3, 16, 16) \
            + conv(64, 3, 16, 32) + 4 * conv(64, 3, 32, 32) \
            + conv(32, 3, 32, 64) + 4 * conv(32, 3, 64, 64) \
            + conv(16, 3, 64, 128) + 4 * conv(16, 3, 128, 128) \
            + conv(16, 3, 128, 256)
        # decouple convs: conv_64_to_32 (3^3 32->32 @32^3)? see
        # clswiseformer.py — 3 edge (96->32 @32^3) + 3 sem (256->128 @16^3)
        fl += conv(32, 3, 32, 32) + 3 * conv(32, 3, 96, 32) \
            + 3 * conv(16, 3, 256, 128)
        # sum_fusion 3^3 128->256 @16^3
        fl += conv(16, 3, 128, 256)
        # decoder: down_channel 1x1 + enblock8 x4 + deup4(1x1+deconv+1x1)
        # + deblock4 x4 + deup3 + deblock3 x4 + deup2 + deblock2 x4
        # + endconv 1x1
        fl += conv(16, 1, 256, 128) + 4 * conv(16, 3, 128, 128)
        fl += conv(16, 1, 128, 64) + 2 * (2 ** 3) * 64 * 64 * (32 ** 3) * B \
            + conv(32, 1, 128, 64) + 4 * conv(32, 3, 64, 64)
        fl += conv(32, 1, 64, 32) + 2 * (2 ** 3) * 32 * 32 * (64 ** 3) * B \
            + conv(64, 1, 64, 32) + 4 * conv(64, 3, 32, 32)
        fl += conv(64, 1, 32, 16) + 2 * (2 ** 3) * 16 * 16 * (128 ** 3) * B \
            + conv(128, 1, 32, 16) + 4 * conv(128, 3, 16, 16)
        fl += conv(128, 1, 16, 4)
        print(f"  logical conv FLOPs (B=8): {fl / 1e12:.3f} TFLOP "
              "(couplers ~0.01 T more)", flush=True)
        results["logical_flops"] = fl

    print("\ndone.", flush=True)


if __name__ == "__main__":
    main()
