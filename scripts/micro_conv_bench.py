#!/usr/bin/env python
"""Microbenchmark: execution strategies for the full-res 3^3 16ch conv.

The model's full-res stages are 3x3x3 convs with 16 channels at 128^3
(reference Unet_skipconnection.py:48-56, cls_wise_former.py:732-754).
docs/PERF.md records the direct conv at 6.4 TF/s (lane-bound) and the
space-to-depth dense re-expression (dctseg/ops/s2d.py) at 137 TF/s with
8x arithmetic overhead.  This script measures the third strategy: the
SAME logical conv as a 4^3 stride-2 conv 16ch -> 128ch producing the s2d
view directly (im2col over the 2x2x2 output block: contraction
4^3*16=1024, output 8*16=128 — both MXU-aligned, only 64/27 = 2.37x
arithmetic overhead vs s2d's 8x).

Run on the real chip (idle!): python scripts/micro_conv_bench.py
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
    float(jnp.sum(y[..., :1]))  # force full execution (axon relay)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    float(jnp.sum(y[..., :1]))
    return (time.perf_counter() - t0) / iters


def main():
    enable_compile_cache()
    B, S, C = 8, 128, 16
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x_fine = jnp.asarray(rng.normal(size=(B, S, S, S, C)), dt)
    x_s2d = jnp.asarray(rng.normal(size=(B, S // 2, S // 2, S // 2, 8 * C)), dt)
    w_dense = jnp.asarray(rng.normal(size=(3, 3, 3, 8 * C, 8 * C)) * 0.1, dt)
    w4 = jnp.asarray(rng.normal(size=(4, 4, 4, C, 8 * C)) * 0.1, dt)

    flops_logical = 2 * B * S**3 * 27 * C * C

    @jax.jit
    def conv_s2d_dense(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dt)

    @jax.jit
    def conv_fine_s2dout(x, w):
        # fine output (2Y+o) <- fine window starting at 2Y-1, size 4:
        # stride 2, padding (1, 2); output (B, S/2, S/2, S/2, 8C) s2d view
        return jax.lax.conv_general_dilated(
            x, w, (2, 2, 2), [(1, 2)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dt)

    t1 = timeit(conv_s2d_dense, x_s2d, w_dense)
    print(f"s2d dense 3^3 128->128 @64^3 : {t1*1e3:7.2f} ms  "
          f"eff {flops_logical/t1/1e12:6.1f} TF/s(logical) "
          f"raw {8*flops_logical/t1/1e12:6.1f} TF/s")
    t2 = timeit(conv_fine_s2dout, x_fine, w4)
    print(f"fine 4^3 s2 16->128 @128^3   : {t2*1e3:7.2f} ms  "
          f"eff {flops_logical/t2/1e12:6.1f} TF/s(logical) "
          f"raw {64/27*flops_logical/t2/1e12:6.1f} TF/s")

    # half-res variants (32ch at 64^3)
    C2, S2 = 32, 64
    xf2 = jnp.asarray(rng.normal(size=(B, S2, S2, S2, C2)), dt)
    xs2 = jnp.asarray(rng.normal(size=(B, S2 // 2, S2 // 2, S2 // 2, 8 * C2)), dt)
    wd2 = jnp.asarray(rng.normal(size=(3, 3, 3, 8 * C2, 8 * C2)) * 0.1, dt)
    w42 = jnp.asarray(rng.normal(size=(4, 4, 4, C2, 8 * C2)) * 0.1, dt)
    fl2 = 2 * B * S2**3 * 27 * C2 * C2
    t3 = timeit(conv_s2d_dense, xs2, wd2)
    print(f"s2d dense 3^3 256->256 @32^3 : {t3*1e3:7.2f} ms  "
          f"eff {fl2/t3/1e12:6.1f} TF/s(logical)")
    t4 = timeit(conv_fine_s2dout, xf2, w42)
    print(f"fine 4^3 s2 32->256 @64^3    : {t4*1e3:7.2f} ms  "
          f"eff {fl2/t4/1e12:6.1f} TF/s(logical)")

    # quarter-res variants (64ch at 32^3: en3_a/b, down3, deup4,
    # deblock4/_1 — the VERDICT r2 third-rung question).  64 input channels
    # already fill half the 128 MXU lanes, so direct is the favorite; the
    # s2d view (512ch at 16^3) runs dense but at 8x arithmetic.
    @jax.jit
    def conv_direct(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=dt)

    C3, S3 = 64, 32
    xf3 = jnp.asarray(rng.normal(size=(B, S3, S3, S3, C3)), dt)
    xs3 = jnp.asarray(rng.normal(size=(B, S3 // 2, S3 // 2, S3 // 2, 8 * C3)), dt)
    wf3 = jnp.asarray(rng.normal(size=(3, 3, 3, C3, C3)) * 0.1, dt)
    wd3 = jnp.asarray(rng.normal(size=(3, 3, 3, 8 * C3, 8 * C3)) * 0.1, dt)
    w43 = jnp.asarray(rng.normal(size=(4, 4, 4, C3, 8 * C3)) * 0.1, dt)
    fl3 = 2 * B * S3**3 * 27 * C3 * C3
    t5 = timeit(conv_direct, xf3, wf3)
    print(f"direct 3^3 64->64 @32^3      : {t5*1e3:7.2f} ms  "
          f"eff {fl3/t5/1e12:6.1f} TF/s(logical)")
    t6 = timeit(conv_s2d_dense, xs3, wd3)
    print(f"s2d dense 3^3 512->512 @16^3 : {t6*1e3:7.2f} ms  "
          f"eff {fl3/t6/1e12:6.1f} TF/s(logical)")
    t7 = timeit(conv_fine_s2dout, xf3, w43)
    print(f"fine 4^3 s2 64->512 @32^3    : {t7*1e3:7.2f} ms  "
          f"eff {fl3/t7/1e12:6.1f} TF/s(logical)")

    # and the half-res DIRECT baseline for completeness at 32ch
    wf2 = jnp.asarray(rng.normal(size=(3, 3, 3, C2, C2)) * 0.1, dt)
    t8 = timeit(conv_direct, xf2, wf2)
    print(f"direct 3^3 32->32 @64^3      : {t8*1e3:7.2f} ms  "
          f"eff {fl2/t8/1e12:6.1f} TF/s(logical)")


if __name__ == "__main__":
    main()
