#!/usr/bin/env python
"""Measure G-group scan chaining of the paired tiling pipeline (int8 V=2).

The relay-ceiling study (docs/PERF.md) left ~35 ms of per-program
execution overhead per forward program; V=2 pairing amortizes it to
~17.5 ms/volume.  This experiment chains G super-grouped V=2 groups
through ONE dispatched program per stage via `lax.scan` — program count
per 2G volumes drops from 3G to 3 — WITHOUT fusing stages into a
monolith (the known TPU-compiler crash) and without the B=8V HBM blowup
(scan keeps one group's activations live; int8 V=3+ measured slower).

Compile cost stays flat: the scan body compiles once per stage, so this
is the same three executables specialized to a leading G axis.

Pairwise-interleaved vs the production staged path (tiled_probs_batch,
depth-2 pipelining), same drift-robust protocol as the prefetch /
fused-dispatch / paired-width measurements (docs/PERF.md).

Run on the idle chip: python scripts/measure_group_scan.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    pred = Predictor(model_q, params)

    rng = np.random.default_rng(0)
    vols = [jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                        .astype(np.float32)) for _ in range(4)]
    V = 2
    # Device-resident V=2 groups (bench steady state: no H2D in the loop).
    groups = [jnp.concatenate([vols[i], vols[(i + 1) % 4]], axis=0)
              for i in range(4)]
    depth = 2

    # ---- production staged path (3 programs per group) ----
    def round_vps_staged(n_calls: int) -> float:
        inflight = []
        t0 = time.perf_counter()
        for i in range(n_calls):
            inflight.append(pred.tiled_probs_batch(groups[i % len(groups)]))
            if len(inflight) > depth:
                float(inflight.pop(0)[0, 0, 0, 0, 0])
        for y in inflight:
            float(y[0, 0, 0, 0, 0])
        return V * n_calls / (time.perf_counter() - t0)

    # ---- G-group scan path (3 programs per G groups) ----
    def make_scan_path(G):
        sgroups = [jnp.stack([groups[(i + j) % 4] for j in range(G)])
                   for i in range(2)]          # (G, V, 240, 240, 160, M)

        crops_g = jax.jit(lambda x: jax.lax.map(pred._crops_batch_fn, x))

        fwd_g = jax.jit(
            lambda p, xss: jax.lax.scan(
                lambda c, xs: (c, model_q.apply(p, xs, train=False)[0]),
                None, xss)[1])

        stitch_g = jax.jit(
            lambda ts: jax.lax.map(
                lambda t: pred._stitch_batch_fn(t, True), ts))

        def run(sg):
            return stitch_g(fwd_g(params, crops_g(sg)))

        def round_vps(n_calls: int) -> float:
            inflight = []
            t0 = time.perf_counter()
            for i in range(n_calls):
                inflight.append(run(sgroups[i % len(sgroups)]))
                if len(inflight) > depth:
                    float(inflight.pop(0)[0, 0, 0, 0, 0, 0])
            for y in inflight:
                float(y[0, 0, 0, 0, 0, 0])
            return G * V * n_calls / (time.perf_counter() - t0)

        return sgroups, run, round_vps

    t0 = time.perf_counter()
    y0 = pred.tiled_probs_batch(groups[0]); float(y0[0, 0, 0, 0, 0])
    print(f"staged compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    for G in (2, 4):
        try:
            sgroups, run, round_vps_scan = make_scan_path(G)
            t0 = time.perf_counter()
            yg = run(sgroups[0]); float(yg[0, 0, 0, 0, 0, 0])
            print(f"[G={G}] scan compile+first: "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            # correctness vs the production path on the chip
            err = float(jnp.max(jnp.abs(
                yg[0] - pred.tiled_probs_batch(groups[0]))))
            print(f"[G={G}] max |err| vs staged: {err:.2e}", flush=True)

            round_vps_staged(4); round_vps_scan(2)   # warm both
            pairs = []
            for k in range(4):
                a = round_vps_staged(6)
                b = round_vps_scan(max(2, 6 // G))
                pairs.append((a, b))
                print(f"[G={G}] pair {k}: staged {a:.3f} vol/s | scan "
                      f"{b:.3f} vol/s | speedup {b/a:.3f}x", flush=True)
            wins = sum(b > a for a, b in pairs)
            print(f"[G={G}] scan wins {wins}/{len(pairs)} pairs; best scan "
                  f"{max(b for _, b in pairs):.3f}, best staged "
                  f"{max(a for a, _ in pairs):.3f}", flush=True)
        except Exception as e:
            print(f"[G={G}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
