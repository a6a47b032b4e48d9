#!/usr/bin/env python
"""Measure fused crops+forward dispatch for the tiling engine.

The bench loop (bench.py, reference predict.py:37-65) dispatches three
programs per volume: crops -> B=8 forward -> stitch.  Device work is
dominated by the forward (215 ms; crops/stitch are 4.6/3.8 ms), but each
dispatch costs a round-trip over the axon relay, and the pipelined plateau
(~4.0 vol/s) sits below the forward's ~4.6 vol/s ceiling.  This script
measures whether folding crop extraction into the forward executable
(Predictor(fuse_dispatch=True)) closes part of that gap; the TTA engine's
flip stage gets the same treatment and is measured alongside.

Protocol: the relay's throughput drifts on minutes scales, so staged and
fused rounds are interleaved and compared pairwise (same policy as the
prefetch measurement, docs/PERF.md).  Exactness is asserted first.

Run on the idle chip: python scripts/measure_fused_dispatch.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from dctseg.config import ModelConfig
    from dctseg.infer.engine import Predictor
    from dctseg.models.clswiseformer import build_model

    cfg = ModelConfig(compute_dtype="bfloat16")
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)

    staged = Predictor(model, params)
    fused = Predictor(model, params, fuse_dispatch=True)

    rng = np.random.default_rng(0)
    vols = [jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                        .astype(np.float32)) for _ in range(4)]

    # compile both paths; assert exactness
    t0 = time.perf_counter()
    ys = staged.tiled_probs(vols[0]); float(ys[0, 0, 0, 0, 0])
    print(f"staged compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    yf = fused.tiled_probs(vols[0]); float(yf[0, 0, 0, 0, 0])
    print(f"fused compile+first:  {time.perf_counter()-t0:.1f}s", flush=True)
    err = float(jnp.max(jnp.abs(ys.astype(jnp.float32)
                                - yf.astype(jnp.float32))))
    print(f"max |staged - fused| = {err:.3e}", flush=True)
    assert err == 0.0, "fused crop path must be bit-exact"

    # TTA engine: compile both and assert exactness too
    tvol = vols[0][:, :128, :128, :128, :]
    t0 = time.perf_counter()
    ys = staged.tta_probs(tvol); float(ys[0, 0, 0, 0, 0])
    yf = fused.tta_probs(tvol); float(yf[0, 0, 0, 0, 0])
    print(f"tta compile+first (both): {time.perf_counter()-t0:.1f}s",
          flush=True)
    err = float(jnp.max(jnp.abs(ys - yf)))
    print(f"tta max |staged - fused| = {err:.3e}", flush=True)
    assert err == 0.0

    depth = 2

    def round_vps(fn, batch, n_iters: int) -> float:
        inflight = []
        t0 = time.perf_counter()
        for i in range(n_iters):
            inflight.append(fn(batch[i % len(batch)]))
            if len(inflight) > depth:
                float(inflight.pop(0)[0, 0, 0, 0, 0])
        for y in inflight:
            float(y[0, 0, 0, 0, 0])
        return n_iters / (time.perf_counter() - t0)

    tta_vols = [v[:, :128, :128, :128, :] for v in vols]

    for name, s_fn, f_fn, batch in (
            ("tiled", staged.tiled_probs, fused.tiled_probs, vols),
            ("tta", staged.tta_probs, fused.tta_probs, tta_vols)):
        # warm both steady states once
        round_vps(s_fn, batch, 3); round_vps(f_fn, batch, 3)
        pairs = []
        for k in range(4):
            s = round_vps(s_fn, batch, 6)
            f = round_vps(f_fn, batch, 6)
            pairs.append((s, f))
            print(f"[{name}] pair {k}: staged {s:.3f} vol/s | "
                  f"fused {f:.3f} vol/s | speedup {f/s:.3f}x", flush=True)
        wins = sum(f > s for s, f in pairs)
        print(f"[{name}] fused wins {wins}/{len(pairs)} pairs; "
              f"best fused {max(f for _, f in pairs):.3f} vol/s, "
              f"best staged {max(s for s, _ in pairs):.3f} vol/s", flush=True)


if __name__ == "__main__":
    main()
