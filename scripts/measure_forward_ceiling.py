#!/usr/bin/env python
"""Bound the tiling bench from above: forward-only throughput vs the full
crops->forward->stitch pipeline, same process, same relay conditions.

docs/PERF.md's section profile says the per-volume device work is ~224 ms
(forward 215.5 + crops 4.6 + stitch 3.8) -> a 4.47 vol/s ceiling, while the
pipelined bench plateaus at ~4.0.  This script measures (a) a forward-only
loop on pre-built (8,128^3) batches — the relay's achievable ceiling for the
dominant program alone — and (b) the full tiled_probs loop at pipeline
depths 2 and 3, interleaved pairwise against (a) so relay drift cancels.
If (a) lands at ~4.0 too, the residual gap is per-program relay execution
overhead (not crops/stitch dispatch), and the bench number IS the ceiling.

Reference for the benchmarked task: predict.py:37-65 (tailor_and_concat),
timed at predict_cls.py:137-144.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from dctseg.config import ModelConfig
    from dctseg.infer.engine import Predictor
    from dctseg.models.clswiseformer import build_model

    model = build_model(ModelConfig(compute_dtype="bfloat16"))
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)
    pred = Predictor(model, params)

    rng = np.random.default_rng(0)
    vols = [jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                        .astype(np.float32)) for _ in range(4)]
    batches = [pred._crops_fn(v) for v in vols]   # (8,128^3,4) pre-cropped

    t0 = time.perf_counter()
    y = pred._fwd(params, batches[0]); float(y[0, 0, 0, 0, 0])
    y = pred.tiled_probs(vols[0]); float(y[0, 0, 0, 0, 0])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    def loop(fn, items, depth, n_iters=6):
        inflight = []
        t0 = time.perf_counter()
        for i in range(n_iters):
            inflight.append(fn(items[i % len(items)]))
            if len(inflight) > depth:
                float(inflight.pop(0)[0, 0, 0, 0, 0])
        for y in inflight:
            float(y[0, 0, 0, 0, 0])
        return n_iters / (time.perf_counter() - t0)

    fwd_only = lambda b: pred._fwd(params, b)

    # warm steady states
    loop(fwd_only, batches, 2, 3)
    loop(pred.tiled_probs, vols, 2, 3)

    for k in range(4):
        f = loop(fwd_only, batches, 2)
        t2 = loop(pred.tiled_probs, vols, 2)
        t3 = loop(pred.tiled_probs, vols, 3)
        print(f"pair {k}: fwd-only {f:.3f} vol/s | tiled d2 {t2:.3f} | "
              f"tiled d3 {t3:.3f} | overhead d2 "
              f"{(1/t2 - 1/f)*1000:.1f} ms/vol", flush=True)


if __name__ == "__main__":
    main()
