#!/usr/bin/env python
"""Microbenchmark: int8 execution of the model's dominant convs on v5e.

The v5e MXU runs int8 at 2x the bf16 rate (394 TOP/s vs 197 TFLOP/s peak).
After the s2d re-expression the forward's FLOPs live in dense 3^3 convs
(128ch@64^3, 256ch@32^3 — docs/PERF.md); if XLA lowers an s8 x s8 -> s32
conv onto the int8 MXU path, post-training quantization halves their device
time.  This measures, per shape:

  1. bf16 conv (the production path today),
  2. raw int8 conv (s8 operands, preferred_element_type=s32) — the
     hardware ceiling question,
  3. the FULL dynamic-PTQ pipeline: per-tensor activation absmax+scale+
     round on device, per-channel pre-quantized weights, int conv, f32
     dequant — what a real quantized layer costs end to end.

Run on the IDLE chip: python scripts/micro_int8_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dctseg.utils.jax_setup import enable_compile_cache


def timeit(fn, *args, iters=20):
    y = fn(*args)
    float(jnp.sum(y[..., :1].astype(jnp.float32)))  # force full execution
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(jnp.sum(y[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def conv(x, w, out_dtype):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=out_dtype)


def main():
    enable_compile_cache()
    rng = np.random.default_rng(0)
    B = 8
    shapes = [  # (spatial, channels) of the two dense-s2d stages
        (64, 128),
        (32, 256),
    ]
    for S, C in shapes:
        flops = 2 * B * S**3 * 27 * C * C
        xf = jnp.asarray(rng.normal(size=(B, S, S, S, C)), jnp.bfloat16)
        wf = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.05, jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 128, size=(B, S, S, S, C)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, size=(3, 3, 3, C, C)), jnp.int8)
        # per-channel weight scales (precomputed offline in real PTQ)
        ws = jnp.asarray(rng.uniform(0.01, 0.1, size=(C,)), jnp.float32)

        bf16 = jax.jit(lambda x, w: conv(x, w, jnp.bfloat16))
        i8 = jax.jit(lambda x, w: conv(x, w, jnp.int32))

        def ptq(x, w8, ws):
            # dynamic per-tensor activation quant: absmax -> scale -> round
            amax = jnp.max(jnp.abs(x).astype(jnp.float32))
            sx = amax / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            acc = conv(xq, w8, jnp.int32)
            return acc.astype(jnp.float32) * (sx * ws)

        ptq_j = jax.jit(ptq)

        t_bf = timeit(bf16, xf, wf)
        print(f"bf16 3^3 {C}ch @{S}^3        : {t_bf*1e3:7.2f} ms  "
              f"{flops/t_bf/1e12:6.1f} TF/s", flush=True)
        try:
            t_i8 = timeit(i8, x8, w8)
            print(f"int8 raw 3^3 {C}ch @{S}^3    : {t_i8*1e3:7.2f} ms  "
                  f"{flops/t_i8/1e12:6.1f} TOP/s  "
                  f"({t_bf/t_i8:.2f}x vs bf16)", flush=True)
        except Exception as e:
            print(f"int8 raw: FAILED ({str(e).splitlines()[0][:160]})",
                  flush=True)
            continue
        try:
            t_q = timeit(ptq_j, xf, w8, ws)
            print(f"int8 PTQ pipeline            : {t_q*1e3:7.2f} ms  "
                  f"{flops/t_q/1e12:6.1f} TOP/s  "
                  f"({t_bf/t_q:.2f}x vs bf16)", flush=True)
        except Exception as e:
            print(f"int8 PTQ: FAILED ({str(e).splitlines()[0][:160]})",
                  flush=True)

    # isolate matmul (MXU int8 support sanity, independent of the conv
    # emitter): 4096x4096 square
    N = 4096
    af = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)
    bf = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
    mm_bf = jax.jit(lambda a, b: jnp.dot(a, b,
                                         preferred_element_type=jnp.bfloat16))
    mm_i8 = jax.jit(lambda a, b: jnp.dot(a, b,
                                         preferred_element_type=jnp.int32))
    fl = 2 * N**3
    t = timeit(mm_bf, af, bf)
    print(f"bf16 matmul {N}^2            : {t*1e3:7.2f} ms  "
          f"{fl/t/1e12:6.1f} TF/s", flush=True)
    t = timeit(mm_i8, a8, b8)
    print(f"int8 matmul {N}^2            : {t*1e3:7.2f} ms  "
          f"{fl/t/1e12:6.1f} TOP/s", flush=True)


if __name__ == "__main__":
    main()
