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
                    help="comma list: sections,enc,relayout,s2dforms,"
                         "initconv,norm,model,fold,deup2,flops")
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

    if want("enc"):
        print("\n== encoder sections (B=8 bf16, cumulative taps) ==",
              flush=True)
        from dctseg.models.unet import UnetEncoder
        enc_params = {"params": params["params"]["unet"]}
        xin = rand((B, 128, 128, 128, 4), jnp.float32)
        taps = ["s2d_in", "init", "en1", "down1", "half_in", "en2",
                "down2", "en3", "down3", "en4"]
        cum = {}
        for tap in taps:
            em = UnetEncoder(dtype=jnp.bfloat16, remat=False, tap=tap,
                             name=None)

            def step(x_, em=em):
                y = em.apply(enc_params, x_, train=False)
                eps = (y.astype(jnp.float32).ravel()[0] * 0
                       ).astype(x_.dtype)
                return x_ + eps

            def chained(x_, step=step):
                c, _ = jax.lax.scan(lambda c, _: (step(c), None), x_, None,
                                    length=rep)
                return c

            compiled = jax.jit(chained).lower(xin).compile()

            def once(compiled=compiled):
                t0 = time.perf_counter()
                y = compiled(xin)
                float(y.ravel()[0].astype("float32"))
                return (time.perf_counter() - t0) / rep

            once()
            ts = sorted(once() for _ in range(3))
            cum[tap] = ts[0]
            print(f"  tap {tap:8s}: {ts[0] * 1e3:8.2f} ms "
                  f"(rounds {[round(t * 1e3, 2) for t in ts]})", flush=True)
        names = [("s2d_in", "input cast + space_to_depth"),
                 ("init", "init_conv 4->16 (s2d 32->128)"),
                 ("en1", "en1_a/b x2 full-res s2d 16ch"),
                 ("down1", "down1 stride-2 -> plain 64^3x32"),
                 ("half_in", "space_to_depth to half-res view"),
                 ("en2", "en2_a/b x2 half-res s2d 32ch"),
                 ("down2", "down2 stride-2 -> 32^3x64"),
                 ("en3", "en3_a/b x2 @32^3 64ch"),
                 ("down3", "down3 stride-2 -> 16^3x128"),
                 ("en4", "en4_a/b x2 + widen @16^3")]
        prev = 0.0
        print("  -- section deltas --")
        for tap, desc in names:
            dt = cum[tap] - prev
            print(f"  {desc:36s} {dt * 1e3:8.2f} ms", flush=True)
            prev = cum[tap]
        results["enc"] = {t: cum[t] for t in cum}

    if want("relayout"):
        print("\n== input space_to_depth: XLA vs Pallas relayout kernel ==",
              flush=True)
        from dctseg.ops.pallas import relayout
        for lbl, shape, in_dt, out_dt in [
                ("input s2d f32->bf16 (8,128^3,4)",
                 (B, 128, 128, 128, 4), jnp.float32, jnp.bfloat16),
                ("input s2d bf16 (8,128^3,4)",
                 (B, 128, 128, 128, 4), jnp.bfloat16, jnp.bfloat16),
                ("half_in s2d bf16 (8,64^3,32)",
                 (B, 64, 64, 64, 32), jnp.bfloat16, jnp.bfloat16)]:
            x0 = rand(shape, in_dt)
            ya = s2dops.space_to_depth(x0.astype(out_dt))
            yb = relayout.space_to_depth(x0, out_dt, "pallas")
            biteq = bool(jnp.all(ya.astype(jnp.float32)
                                 == yb.astype(jnp.float32)))
            print(f"  {lbl}: bit-identical = {biteq}", flush=True)
            for impl, f in [
                    ("xla", lambda x, o=out_dt: s2dops.space_to_depth(
                        x.astype(o))),
                    ("pallas", lambda x, o=out_dt: relayout.space_to_depth(
                        x, o, "pallas"))]:
                def fn(x, f=f):
                    out = f(x)
                    eps = (out.astype(jnp.float32).ravel()[0] * 0
                           ).astype(x.dtype)
                    return x + eps

                def chained(x, fn=fn):
                    c, _ = jax.lax.scan(lambda c, _: (fn(c), None), x,
                                        None, length=rep)
                    return c

                compiled = jax.jit(chained).lower(x0).compile()

                def once(compiled=compiled):
                    t0 = time.perf_counter()
                    out = compiled(x0)
                    float(out.ravel()[0].astype("float32"))
                    return (time.perf_counter() - t0) / rep

                once()
                ts = sorted(once() for _ in range(3))
                print(f"    {impl:8s} {ts[0] * 1e3:8.3f} ms (rounds "
                      f"{[round(t * 1e3, 3) for t in ts]})", flush=True)

    if want("s2dforms"):
        print("\n== bf16 input s2d: alternative XLA formulations ==",
              flush=True)
        x0 = rand((B, 128, 128, 128, 4))

        def v_composite(x):
            return s2dops.space_to_depth(x)

        def v_twostage(x):
            # stage 1: d-parity inward (inner run c=4); stage 2: h/w
            # parities (inner run 8)
            n, d, h, w, c = x.shape
            y = x.reshape(n, d // 2, 2, h, w, c).transpose(
                0, 1, 3, 4, 2, 5).reshape(n, d // 2, h, w, 2 * c)
            y = y.reshape(n, d // 2, h // 2, 2, w // 2, 2, 2 * c)
            y = y.transpose(0, 1, 2, 4, 3, 5, 6)
            # (iy, ix, iz*c+ch) -> offset-major needs (iz, iy, ix, ch):
            # NOT the target order; this variant only measures transpose
            # cost structure, not final layout (see note below)
            return y.reshape(n, d // 2, h // 2, w // 2, 8 * c)

        def v_convgather(x):
            # s2d as a (2,2,2,C,8C) stride-2 conv with one-hot weights:
            # out lane o*C+c reads tap (iz,iy,ix)=o, channel c
            c = x.shape[-1]
            w = np.zeros((2, 2, 2, c, 8 * c), np.float32)
            for o in range(8):
                iz, iy, ix = o >> 2 & 1, o >> 1 & 1, o & 1
                for ch in range(c):
                    w[iz, iy, ix, ch, o * c + ch] = 1.0
            return jax.lax.conv_general_dilated(
                x, jnp.asarray(w).astype(x.dtype), (2, 2, 2),
                [(0, 0)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=x.dtype)

        def v_staged_exact(x):
            # EXACT offset-major order in two real passes: (ix,c) are
            # already adjacent-contiguous (free reshape), then move iy
            # past w2 (8-element runs), then iz past (h2,w2) (16-element
            # runs) — each pass has one moving dim instead of three
            n, d, h, w, c = x.shape
            y = x.reshape(n, d, h, w // 2, 2 * c)            # free
            y = y.reshape(n, d, h // 2, 2, w // 2, 2 * c)
            y = y.transpose(0, 1, 2, 4, 3, 5)                # pass 1
            y = y.reshape(n, d // 2, 2, h // 2, w // 2, 4 * c)
            y = y.transpose(0, 1, 3, 4, 2, 5)                # pass 2
            return y.reshape(n, d // 2, h // 2, w // 2, 8 * c)

        ya = v_composite(x0)
        yc = v_convgather(x0)
        ys = v_staged_exact(x0)
        print("  conv-gather bit-identical =",
              bool(jnp.all(ya == yc)), flush=True)
        print("  staged-exact bit-identical =",
              bool(jnp.all(ya == ys)), flush=True)

        for lbl, f in [("composite transpose (current)", v_composite),
                       ("two-stage transpose (layout probe)", v_twostage),
                       ("staged exact-order (2 passes)", v_staged_exact),
                       ("conv-as-gather one-hot", v_convgather)]:
            def fn(x, f=f):
                out = f(x)
                eps = (out.astype(jnp.float32).ravel()[0] * 0
                       ).astype(x.dtype)
                return x + eps

            def chained(x, fn=fn):
                c, _ = jax.lax.scan(lambda c, _: (fn(c), None), x, None,
                                    length=rep)
                return c

            compiled = jax.jit(chained).lower(x0).compile()

            def once(compiled=compiled):
                t0 = time.perf_counter()
                out = compiled(x0)
                float(out.ravel()[0].astype("float32"))
                return (time.perf_counter() - t0) / rep

            once()
            ts = sorted(once() for _ in range(3))
            print(f"  {lbl:36s} {ts[0] * 1e3:8.3f} ms (rounds "
                  f"{[round(t * 1e3, 3) for t in ts]})", flush=True)

    if want("initconv"):
        print("\n== init path: s2d transpose + dense conv vs direct "
              "fine->s2d conv ==", flush=True)
        # the encoder profile shows the input space_to_depth alone costs
        # ~39 ms (vs ~2 ms floor): XLA's transpose emitter on a 4-channel
        # trailing dim reads 8-byte runs.  Variant B removes the transpose
        # entirely: the 3^3 stride-1 fine conv is re-expressed as a
        # (4,4,4,Ci,8Co) stride-2 conv from the RAW fine grid straight to
        # the s2d view (fine_conv_kernel, already exact by test).
        w = rand((3, 3, 3, 4, 16), jnp.float32)
        xf = rand((B, 128, 128, 128, 4), jnp.float32)

        def variant_a(x, w_):
            x8 = s2dops.space_to_depth(x.astype(jnp.bfloat16))
            return s2dops.conv3d_s2d(
                x8, s2dops.conv_kernel(w_.astype(jnp.bfloat16)),
                padding=(1, 1))

        def variant_b(x, w_):
            return s2dops.conv3d_fine_s2dout(
                x.astype(jnp.bfloat16),
                s2dops.fine_conv_kernel(w_.astype(jnp.bfloat16)))

        ya = variant_a(xf, w)
        yb = variant_b(xf, w)
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                    - yb.astype(jnp.float32))))
        print(f"  max |A - B| = {err:.3e}", flush=True)

        for lbl, f in [("A: s2d -> dense 32->128 conv", variant_a),
                       ("B: fine (4,4,4,4,128) s2 conv", variant_b)]:
            def fn(x, w_, f=f):
                out = f(x, w_)
                eps = (out.astype(jnp.float32).ravel()[0] * 0
                       ).astype(x.dtype)
                return (x + eps, w_)

            def chained(x, w_, fn=fn):
                c, _ = jax.lax.scan(lambda c, _: (fn(*c), None), (x, w_),
                                    None, length=rep)
                return c[0]

            compiled = jax.jit(chained).lower(xf, w).compile()

            def once(compiled=compiled):
                t0 = time.perf_counter()
                out = compiled(xf, w)
                float(out.ravel()[0].astype("float32"))
                return (time.perf_counter() - t0) / rep

            once()
            ts = sorted(once() for _ in range(3))
            print(f"  {lbl:32s} {ts[0] * 1e3:8.3f} ms (rounds "
                  f"{[round(t * 1e3, 3) for t in ts]})", flush=True)

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
