#!/usr/bin/env python
"""Measure DeviceMetrics at the sliding-window eval shape (240x240x155).

VERDICT r2 weak #2: the EDT min-plus pass materializes a (..., D_out, D_in)
broadcast the docstring assumes XLA fuses (dctseg/ops/edt.py); at tiling
shapes that is a multi-GB intermediate if fusion fails.  This script runs
DeviceMetrics (both hd95 modes) on full-volume label pairs on the real
chip, checks agreement against the host metrics, and times it — the basis
for the auto-fallback decision in dctseg/infer/validate.py.

Run on the idle chip: python scripts/measure_fullvol_metrics.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from dctseg import metrics

    rng = np.random.default_rng(0)
    shape = (240, 240, 155)
    # realistic-ish volumes: blobby tumor regions + scattered voxel noise
    z, y, x = np.ogrid[:shape[0], :shape[1], :shape[2]]

    def blob(c, r, label, vol):
        m = ((z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2) < r * r
        vol[m] = label

    target = np.zeros(shape, np.int32)
    blob((120, 120, 80), 46, 2, target)
    blob((120, 120, 80), 30, 3, target)
    blob((112, 128, 74), 12, 1, target)
    output = np.zeros(shape, np.int32)
    blob((123, 117, 78), 44, 2, output)
    blob((118, 122, 82), 28, 3, output)
    blob((110, 130, 72), 13, 1, output)
    noise = rng.random(shape) < 1e-4
    output[noise] = rng.integers(1, 4, noise.sum())

    for mode in (True, False):
        name = "reference" if mode else "surface"
        dm = metrics.DeviceMetrics(batched_call_shape=mode)
        t0 = time.perf_counter()
        got = dm(jnp.asarray(output), jnp.asarray(target))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_iter = 5
        for _ in range(n_iter):
            got = dm(jnp.asarray(output), jnp.asarray(target))
        dt = (time.perf_counter() - t0) / n_iter
        print(f"[{name}] device: {dt*1e3:.0f} ms/volume "
              f"(first call incl compile {t_compile:.1f}s)")

        t0 = time.perf_counter()
        want_h = metrics.cal_hausdorff(output, target,
                                       batched_call_shape=mode)
        t_host = time.perf_counter() - t0
        want_d = metrics.softmax_output_dice(output, target)
        for a, b in zip(got["hd95"], want_h):
            assert abs(a - b) < 1e-9, (name, got["hd95"], want_h)
        for a, b in zip(got["dice"], want_d):
            assert abs(a - b) < 1e-12
        print(f"[{name}] host scipy: {t_host:.1f} s/volume; "
              f"device == host exactly (hd95 {got['hd95']})")


if __name__ == "__main__":
    main()
