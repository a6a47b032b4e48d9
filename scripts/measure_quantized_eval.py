#!/usr/bin/env python
"""Measure int8-PTQ inference (ModelConfig(quantize="int8")) on the chip.

The bf16 B=8 eval forward is 215.5 ms of device time, dominated by the
dense-s2d and >=64ch 3^3 convs (docs/PERF.md); the v5e MXU runs int8 at
2x the bf16 rate, so if XLA lowers s8 x s8 -> s32 convs onto that path
the quantized forward should land well under the bf16 one.  Measures:

  1. accuracy: argmax agreement + mean prob drift of the quantized
     tiled inference vs bf16 on the same weights (the test-suite bound,
     re-checked at full size on the chip),
  2. throughput: pairwise-interleaved tiled-inference rounds (the bench
     loop), bf16 vs int8, same drift-robust protocol as the prefetch and
     fused-dispatch measurements (docs/PERF.md).

Run on the idle chip: python scripts/measure_quantized_eval.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure_paired(pf, vols, depth, round_vps, jnp, time, label="bf16"):
    """V=2 paired tiling (tiled_probs_batch): two volumes' crops in ONE
    B=16 forward program — halves the per-program relay overhead per
    volume.  Correctness vs the per-volume path on the chip, then
    pairwise-interleaved throughput (each call covers 2 volumes)."""
    vols2 = [jnp.concatenate(vols[i:i + 2], axis=0) for i in (0, 2)]
    t0 = time.perf_counter()
    yp = pf.tiled_probs_batch(vols2[0]); float(yp[0, 0, 0, 0, 0])
    print(f"[{label}] V=2 paired compile+first: "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    err = float(jnp.max(jnp.abs(
        yp - jnp.concatenate([pf.tiled_probs(vols[0]),
                              pf.tiled_probs(vols[1])], axis=0))))
    print(f"[{label}] tiled_probs_batch V=2 max |err| vs per-volume: "
          f"{err:.2e}", flush=True)

    def round_vps2(n_calls: int) -> float:
        inflight = []
        t0 = time.perf_counter()
        for i in range(n_calls):
            inflight.append(pf.tiled_probs_batch(vols2[i % len(vols2)]))
            if len(inflight) > depth:
                float(inflight.pop(0)[0, 0, 0, 0, 0])
        for y in inflight:
            float(y[0, 0, 0, 0, 0])
        return 2 * n_calls / (time.perf_counter() - t0)

    round_vps2(2)  # warm
    pairs2 = []
    for k in range(4):
        a = round_vps(pf.tiled_probs, 6)
        b = round_vps2(3)
        pairs2.append((a, b))
        print(f"[{label}] pair {k}: per-volume {a:.3f} vol/s | V=2 paired "
              f"{b:.3f} vol/s | speedup {b/a:.3f}x", flush=True)
    wins = sum(b > a for a, b in pairs2)
    print(f"[{label}] V=2 paired wins {wins}/{len(pairs2)} pairs; best "
          f"paired {max(b for _, b in pairs2):.3f} vol/s, best per-volume "
          f"{max(a for a, _ in pairs2):.3f} vol/s", flush=True)


def main():
    from bench import _wait_for_accelerator
    _wait_for_accelerator()
    import jax
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from dctseg.config import ModelConfig
    from dctseg.infer.engine import Predictor
    from dctseg.models.clswiseformer import build_model

    cfg = ModelConfig(compute_dtype="bfloat16")
    model_f = build_model(cfg)
    model_q = build_model(dataclasses.replace(cfg, quantize="int8"))
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(lambda k: model_f.init(k, x0, train=False))(key)

    pf = Predictor(model_f, params)
    pq = Predictor(model_q, params)

    rng = np.random.default_rng(0)
    vols = [jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                        .astype(np.float32)) for _ in range(4)]

    t0 = time.perf_counter()
    yf = pf.tiled_probs(vols[0]); float(yf[0, 0, 0, 0, 0])
    print(f"bf16 compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    yq = pq.tiled_probs(vols[0]); float(yq[0, 0, 0, 0, 0])
    print(f"int8 compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    f32 = lambda a: np.asarray(a, np.float32)
    agree = (f32(yf).argmax(-1) == f32(yq).argmax(-1)).mean()
    drift = np.abs(f32(yf) - f32(yq)).mean()
    print(f"argmax agreement {agree:.6f}, mean prob drift {drift:.5f}",
          flush=True)

    depth = 2

    def round_vps(fn, n_iters: int) -> float:
        inflight = []
        t0 = time.perf_counter()
        for i in range(n_iters):
            inflight.append(fn(vols[i % len(vols)]))
            if len(inflight) > depth:
                float(inflight.pop(0)[0, 0, 0, 0, 0])
        for y in inflight:
            float(y[0, 0, 0, 0, 0])
        return n_iters / (time.perf_counter() - t0)

    round_vps(pf.tiled_probs, 3); round_vps(pq.tiled_probs, 3)  # warm
    pairs = []
    for k in range(4):
        a = round_vps(pf.tiled_probs, 6)
        b = round_vps(pq.tiled_probs, 6)
        pairs.append((a, b))
        print(f"pair {k}: bf16 {a:.3f} vol/s | int8 {b:.3f} vol/s | "
              f"speedup {b/a:.3f}x", flush=True)
    wins = sum(b > a for a, b in pairs)
    print(f"int8 wins {wins}/{len(pairs)} pairs; best int8 "
          f"{max(b for _, b in pairs):.3f} vol/s, best bf16 "
          f"{max(a for a, _ in pairs):.3f} vol/s", flush=True)

    # --- V=2 paired tiling (tiled_probs_batch): two volumes' crops in ONE
    # B=16 forward program — halves the per-program relay overhead per
    # volume.  Correctness vs per-volume path on the chip, then pairwise
    # throughput (2 volumes per call -> n_iters counts volumes).
    try:
        _measure_paired(pf, vols, depth, round_vps, jnp, time, label="bf16")
    except Exception as e:
        print(f"bf16 V=2 paired probe failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # int8 + paired composes both levers (the B=16 int8 executable is the
    # same one the B=16 probe below compiles, so this costs no extra
    # compile beyond the throughput rounds).
    try:
        _measure_paired(pq, vols, depth, round_vps, jnp, time, label="int8")
    except Exception as e:
        print(f"int8 V=2 paired probe failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # --- B=16 forward probe: would pairing two volumes' crops into ONE
    # forward program amortize the ~35 ms/program relay overhead
    # (docs/PERF.md "relay ceiling")?  Wins if t(B=16) < 2*t(B=8) - 35ms.
    for name, pred in (("bf16", pf), ("int8", pq)):
        try:
            x8 = jnp.zeros((8, 128, 128, 128, 4), jnp.float32)
            x16 = jnp.zeros((16, 128, 128, 128, 4), jnp.float32)
            fwd = pred._fwd
            y = fwd(pred.params, x8); float(y[0, 0, 0, 0, 0])  # warm B=8
            t0 = time.perf_counter()
            y = fwd(pred.params, x16); float(y[0, 0, 0, 0, 0])
            print(f"{name} B=16 compile+first: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            for b, x in ((8, x8), (16, x16)):
                ts = []
                for _ in range(6):
                    t0 = time.perf_counter()
                    y = fwd(pred.params, x); float(y[0, 0, 0, 0, 0])
                    ts.append(time.perf_counter() - t0)
                print(f"{name} B={b} forward: min {min(ts)*1e3:.1f} ms, "
                      f"median {sorted(ts)[len(ts)//2]*1e3:.1f} ms",
                      flush=True)
        except Exception as e:
            print(f"{name} B=16 probe failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
