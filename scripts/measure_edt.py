#!/usr/bin/env python
"""Measure the device HD95 pipeline's phase split and the min-plus EDT.

DeviceMetrics (dctseg/metrics.py) runs two device programs per volume:
  phase1: composites + surfaces + two squared EDTs + pooled distance build
  phase2: integer binary-search order statistics over the pooled multiset
docs/PERF.md records ~900 ms/volume total at 240x240x155 — ~4x the model
forward itself.  This script measures where that time goes (phase1 vs
phase2, per shape and hd95 mode) and, when the Pallas min-plus kernel is
available, times `squared_edt` XLA vs Pallas head to head.

Timing: the axon relay returns early from block_until_ready, so every
measurement forces a scalar fetch of a reduction over the result.

Run on the idle chip: python scripts/measure_edt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def blobs(shape, seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    z, y, x = np.ogrid[: shape[0], : shape[1], : shape[2]]

    def blob(c, r, label, vol):
        m = ((z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2) < r * r
        vol[m] = label

    c = [s // 2 for s in shape]
    target = np.zeros(shape, np.int32)
    blob(c, int(0.38 * c[0]), 2, target)
    blob(c, int(0.25 * c[0]), 3, target)
    blob([c[0] - 8, c[1] + 8, c[2] - 6], max(4, c[0] // 10), 1, target)
    output = np.zeros(shape, np.int32)
    blob([c[0] + 3, c[1] - 3, c[2] - 2], int(0.36 * c[0]), 2, output)
    blob([c[0] - 2, c[1] + 2, c[2] + 2], int(0.23 * c[0]), 3, output)
    blob([c[0] - 10, c[1] + 10, c[2] - 8], max(4, c[0] // 9), 1, output)
    noise = rng.random(shape) < 1e-4
    output[noise] = rng.integers(1, 4, noise.sum())
    return output, target


def timeit(fn, n=3):
    import numpy as np
    fn()  # warm (compile)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(out).ravel()[0])  # force through the relay
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dctseg import metrics
    from dctseg.ops import edt

    print(f"backend: {jax.default_backend()}")

    for shape in ((128, 128, 128), (240, 240, 155)):
        output, target = blobs(shape, 0)
        od, td = jnp.asarray(output), jnp.asarray(target)

        # ---- raw squared_edt: XLA vs Pallas (3-class stacked masks) ----
        masks = np.stack([target > 0, (target == 1) | (target == 3),
                          target == 3])
        md = jnp.asarray(masks)
        xla_edt = jax.jit(lambda m: jnp.sum(edt.squared_edt(m, "xla")))
        t = timeit(lambda: xla_edt(md))
        print(f"[{shape}] squared_edt XLA:    {t*1e3:7.1f} ms")
        pl_edt = jax.jit(lambda m: jnp.sum(edt.squared_edt(m, "pallas")))
        ref = np.asarray(jax.jit(
            lambda m: edt.squared_edt(m, "xla"))(md))
        got = np.asarray(jax.jit(
            lambda m: edt.squared_edt(m, "pallas"))(md))
        ok = np.array_equal(ref, got)
        t = timeit(lambda: pl_edt(md))
        print(f"[{shape}] squared_edt Pallas: {t*1e3:7.1f} ms "
              f"(bit-identical: {ok})")

        # ---- DeviceMetrics phase split ----
        for mode in (True, False):
            name = "reference" if mode else "surface"
            dm = metrics.DeviceMetrics(batched_call_shape=mode)
            # phase1 with a scalar consume so the relay can't lie
            p1 = jax.jit(lambda o, t_: jax.tree.map(
                lambda v: jnp.sum(v) if v is not None else 0.0,
                dm._phase1(o, t_)[3]))
            t1 = timeit(lambda: p1(od, td))
            counts, degenerate, n, pooled = dm._phase1(od, td)
            n = np.asarray(n, np.int64)
            idx = 0.95 * (np.maximum(n, 1) - 1).astype(np.float64)
            ks = jnp.asarray(np.stack([np.floor(idx).astype(np.int32),
                                       np.ceil(idx).astype(np.int32)],
                                      axis=-1))
            t2 = timeit(lambda: dm._phase2(pooled, ks))
            t0 = time.perf_counter()
            dm(od, td)
            tfull = time.perf_counter() - t0
            print(f"[{shape}] {name:9s} phase1 {t1*1e3:7.1f} ms  "
                  f"phase2 {t2*1e3:7.1f} ms  full call {tfull*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
