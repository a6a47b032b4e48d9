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

Besides the throughput headline the artifact self-reports:
  * ``parity_rung``    — one bf16 V=1 measurement (the parity-proven
    numerics) so the headline's quantized/paired configuration never hides
    a regression of the reference-parity path;
  * ``device_ms_forward`` / ``achieved_tflops_device`` / ``mfu`` —
    absolute-efficiency accounting: per-forward device time from a
    data-dependent scan chain (single-call timings on this container are
    relay-dispatch-bound, docs/PERF.md "Measurement pitfalls") and XLA
    cost-analysis HLO flops vs the v5e peak (bf16 197 TF/s, int8 394
    TOP/s).  ``mfu`` here is executed-HLO flops over device time — the
    hardware-utilization number; docs/PERF.md separates it from
    model-logical FLOPs (the s2d strategy deliberately executes 8x the
    logical conv arithmetic because it is faster, docs/PERF.md).
  * ``wall_budget`` — the per-volume wall clock decomposed into
    {forward, crops, stitch, dispatch_residue} ms (VERDICT r4 item 3).
  * ``train_ms_step`` / ``train_mfu`` — B=1 128^3 bf16 train-step time
    and executed-HLO MFU (VERDICT r4 item 4; skip: DCTSEG_BENCH_TRAIN=0).

Prints ONE JSON line:
  {"metric": "sliding_window_inference", "value": <volumes/sec>,
   "unit": "volumes/sec", "vs_baseline": <speedup factor>, ...}
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Raw padded BraTS volume geometry (H, W, D) and benchmark working-set
# size.  Module-level so the unit tests (tests/test_bench.py) can shrink
# the volumes to toy sizes — the ladder/JSON logic is shape-agnostic.
VOL_SHAPE = (240, 240, 160)
CROP = 128
N_VOLS = 4
# Rungs ordered by measured throughput (r4 re-measurement with folded
# params + layout reorders): int8 V=2 (6.35-6.43), bf16 V=3 (~5.6), int8
# V=1 (~5.2), bf16 V=2 (~5.2), bf16 V=1 (4.7).  The int8 spec may carry
# op-class extensions (e.g. "int8+pw") when the r5 residue measurement
# adopts them (docs/PERF.md "int8 residue").
LADDER = [("int8", 2), (None, 3), ("int8", 1), (None, 2), (None, 1)]
PEAK_TFLOPS_BF16 = 197.0
PEAK_TOPS_INT8 = 394.0


def logical_flops(batch: int) -> float:
    """Analytic model-logical conv FLOPs of one eval forward at ``batch``
    (the FINE-grid conv algebra — what the model mathematically computes,
    independent of the s2d execution strategy's deliberate ~5.5x dense
    re-expression, docs/PERF.md).  Derived at runtime rather than carried
    as a constant so the artifact can't silently go stale if the model
    geometry changes (VERDICT r4 item 7); cross-checked against
    scripts/profile_decoder.py --only flops (4.232 T at B=8)."""
    def conv(sp, k, ci, co):
        return 2 * (k ** 3) * ci * co * (sp ** 3) * batch

    def deconv(sp_out, c):   # k=2 s=2 transpose conv to sp_out^3
        return 2 * (2 ** 3) * c * c * (sp_out ** 3) * batch

    fl = 0
    # encoder: init + en1 x4 + down1 + en2 x4 + down2 + en3 x4 + down3
    #          + en4 x4 + widen
    fl += conv(128, 3, 4, 16) + 4 * conv(128, 3, 16, 16) \
        + conv(64, 3, 16, 32) + 4 * conv(64, 3, 32, 32) \
        + conv(32, 3, 32, 64) + 4 * conv(32, 3, 64, 64) \
        + conv(16, 3, 64, 128) + 4 * conv(16, 3, 128, 128) \
        + conv(16, 3, 128, 256)
    # decouple convs: conv_64_to_32 + 3 edge (96->32 @32^3) + 3 sem
    # (256->128 @16^3); sum_fusion 3^3 128->256 @16^3
    fl += conv(32, 3, 32, 32) + 3 * conv(32, 3, 96, 32) \
        + 3 * conv(16, 3, 256, 128)
    fl += conv(16, 3, 128, 256)
    # decoder: down_channel 1x1 + enblock8 x4 + 3 x [deup(1x1 + deconv +
    # 1x1 on concat) + deblock x4] + endconv 1x1
    fl += conv(16, 1, 256, 128) + 4 * conv(16, 3, 128, 128)
    fl += conv(16, 1, 128, 64) + deconv(32, 64) \
        + conv(32, 1, 128, 64) + 4 * conv(32, 3, 64, 64)
    fl += conv(32, 1, 64, 32) + deconv(64, 32) \
        + conv(64, 1, 64, 32) + 4 * conv(64, 3, 32, 32)
    fl += conv(64, 1, 32, 16) + deconv(128, 16) \
        + conv(128, 1, 32, 16) + 4 * conv(128, 3, 16, 16)
    fl += conv(128, 1, 16, 4)
    return float(fl)


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


def measure_device_forward(model, params, shape, rep=6, fold_params=False):
    """Per-forward device seconds + HLO flops for ``model.apply`` at
    ``shape``.

    Timing comes from a data-dependent ``lax.scan`` chain of ``rep``
    forwards in ONE program (single-call timings on this container are
    ~25-35 ms relay-dispatch-bound, and a loop-invariant chain gets
    hoisted by XLA and fakes the number — docs/PERF.md "Measurement
    pitfalls"); the probs output feeds back as the next input (C == M ==
    4), making every iteration data-dependent.  FLOPs come from a
    separate single-forward compile: cost analysis of the scan program
    counts the body once (or twice when XLA peels an iteration), so
    dividing by rep under-reports — measured 3.9 T "per rep" vs 23.4 T
    for the true single B=8 forward (docs/PERF.md r4).

    ``fold_params`` closes the parameters over the chain as compile-time
    constants — the SAME program class as the headline rung's
    ``Predictor(fold_params=True)`` executables, so the artifact's
    device-time/MFU fields describe the program that actually produced
    the headline throughput (ADVICE r4: the two-arg probe is ~2.5 ms/fwd
    slower)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)
                    ).astype(jnp.bfloat16)

    try:
        single = jax.jit(
            lambda p, c: model.apply(p, c, train=False)[0]
        ).lower(params, x).compile()
        cost = single.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", -1.0))
    except Exception:  # noqa: BLE001 - cost analysis may be unavailable
        flops = -1.0

    def chain(p, x0):
        def fwd(c):
            return model.apply(p, c, train=False)[0].astype(c.dtype)
        y, _ = jax.lax.scan(lambda c, _: (fwd(c), None), x0, None,
                            length=rep)
        return y

    if fold_params:
        compiled = jax.jit(lambda x0: chain(params, x0)).lower(x).compile()
        args = (x,)
    else:
        compiled = jax.jit(chain).lower(params, x).compile()
        args = (params, x)

    def run_once():
        t0 = time.perf_counter()
        y = compiled(*args)
        float(y[(0,) * y.ndim].astype(jnp.float32))  # force full execution
        return (time.perf_counter() - t0) / rep

    run_once()                        # warm (compile already done; relay)
    dt = min(run_once() for _ in range(2))
    return {"device_s_forward": dt, "flops_forward": flops}


def _chain_time(fn, x, rep=6, rounds=3):
    """Device seconds per call of ``fn(x)`` via a data-dependent scan
    chain (shape-changing fns chain through a zero-scaled output scalar
    folded back into the carry — docs/PERF.md "Measurement pitfalls")."""
    import jax
    import jax.numpy as jnp

    def chain(x0):
        def body(c, _):
            y = fn(c)
            eps = (y.ravel()[0].astype(jnp.float32) * 0).astype(c.dtype)
            return c + eps, None
        c, _ = jax.lax.scan(body, x0, None, length=rep)
        return c

    compiled = jax.jit(chain).lower(x).compile()

    def once():
        t0 = time.perf_counter()
        y = compiled(x)
        float(y.ravel()[0].astype(jnp.float32))
        return (time.perf_counter() - t0) / rep

    once()
    return min(once() for _ in range(rounds))


def _chain_time_synth(fn, shape, dtype, rep=6, rounds=3):
    """Like ``_chain_time`` but the input is synthesized INSIDE the scan
    body (``jnp.full(shape, carry_scalar)``) so the chain carries only a
    scalar — the giant-carry chain crashes the TPU remote compiler at
    the 537 MB stitch input (HTTP 500 tpu_compile_helper).  Costs one
    full-bandwidth fill of ``shape`` per iteration (~0.7 ms at 537 MB on
    v5e HBM), small and noted vs the programs probed.  Value-agnostic:
    only valid for fns whose cost does not depend on input values (the
    crops/stitch/argmax programs are all such)."""
    import jax
    import jax.numpy as jnp

    def chain(s0):
        def body(s, _):
            y = fn(jnp.full(shape, s, dtype))
            return s + y.ravel()[0].astype(jnp.float32) * 0, None
        s, _ = jax.lax.scan(body, s0, None, length=rep)
        return s

    compiled = jax.jit(chain).lower(jnp.float32(1.0)).compile()

    def once():
        t0 = time.perf_counter()
        y = compiled(jnp.float32(1.0))
        float(y)
        return (time.perf_counter() - t0) / rep

    once()
    return min(once() for _ in range(rounds))


def _probe_ms(fn, x, rep, label):
    """Per-call ms of a device program: chain-timed, falling back to a
    synthesized-input chain, then to pipelined dispatches.  The plain
    chain (one scan program) excludes dispatch but carries the full
    input through scan, which crashes the TPU remote compiler at large
    shapes (observed: HTTP 500 tpu_compile_helper on the 537 MB-carry
    stitch chain — same family as the monolithic-program crashes in
    docs/PERF.md); the synth chain keeps the dispatch-free timing by
    generating the input inside the scan body from a scalar carry; the
    last-resort fallback times ``rep`` depth-2-pipelined dispatches,
    which includes relay dispatch overlap and is labeled as such."""
    try:
        return _chain_time(fn, x, rep) * 1e3, "chain"
    except Exception as e:  # noqa: BLE001 - fall back, keep field alive
        print(f"bench: {label} chain probe failed ({type(e).__name__}: "
              f"{str(e)[:100]}); synth-chain fallback", file=sys.stderr,
              flush=True)
    try:
        return (_chain_time_synth(fn, x.shape, x.dtype, rep) * 1e3,
                "synth-chain")
    except Exception as e:  # noqa: BLE001 - fall back, keep field alive
        print(f"bench: {label} synth-chain probe failed "
              f"({type(e).__name__}: {str(e)[:100]}); pipelined fallback",
              file=sys.stderr, flush=True)
    import jax.numpy as jnp

    def consume(y):
        float(y.ravel()[0].astype(jnp.float32))

    n = max(rep, 6)
    consume(fn(x))                                   # compile + warm
    inflight = []
    t0 = time.perf_counter()
    for _ in range(n):
        inflight.append(fn(x))
        if len(inflight) > 2:
            consume(inflight.pop(0))
    for y in inflight:
        consume(y)
    return (time.perf_counter() - t0) / n * 1e3, "pipelined"


def measure_wall_budget(predictor, group, wall_ms_per_vol,
                        fwd_ms_per_vol, rep=6):
    """Decompose the headline's per-volume wall time (VERDICT r4 item 3).

    The pipeline is crops -> B=8V forward -> stitch (staged programs,
    dctseg/infer/engine.py); the forward is accounted separately, so this
    times the crops and stitch programs the same chain way and reports
      wall_budget = {forward, crops, stitch, argmax, dispatch_residue}
    in ms/volume.  ``argmax`` is informational — the throughput headline
    fetches probabilities and never argmaxes (the serving labels path
    does), so it is NOT part of the residue arithmetic.  The residue is
    what remains of the wall clock after the on-device programs: host
    dispatch + the axon relay's per-program overhead.  Each probe is
    independent (a crashed program costs one field, not the budget)."""
    import jax
    import jax.numpy as jnp

    v = int(group.shape[0])
    out, methods = {}, {}

    crops_fn = (predictor._crops_batch_fn if v > 1
                else predictor._crops_fn)
    try:
        ms, how = _probe_ms(crops_fn, group, rep, "crops")
        out["crops"], methods["crops"] = round(ms / v, 2), how
    except Exception as e:  # noqa: BLE001
        out["crops"] = None
        print(f"bench: crops probe failed ({type(e).__name__}: "
              f"{str(e)[:100]})", file=sys.stderr, flush=True)

    # stitch input: the forward's probs at (8V, 128^3, C) f32 — generated
    # on device (H2D over this relay runs ~25 MB/s; 537 MB would dominate)
    c = 4
    t = jax.jit(lambda k: jax.random.normal(
        k, (8 * v, CROP, CROP, CROP, c), jnp.float32))(
            jax.random.PRNGKey(0))
    try:
        ms, how = _probe_ms(
            lambda tt: (predictor._stitch_batch_fn(tt, True) if v > 1
                        else predictor._stitch_fn(tt, True)), t, rep,
            "stitch")
        out["stitch"], methods["stitch"] = round(ms / v, 2), how
    except Exception as e:  # noqa: BLE001
        out["stitch"] = None
        print(f"bench: stitch probe failed ({type(e).__name__}: "
              f"{str(e)[:100]})", file=sys.stderr, flush=True)
    del t

    # argmax (labels) program at the stitched shape — informational
    d_out = min(VOL_SHAPE[2], 155)
    probs = jax.jit(lambda k: jax.random.normal(
        k, (v, VOL_SHAPE[0], VOL_SHAPE[1], d_out, c), jnp.float32))(
            jax.random.PRNGKey(1))
    try:
        ms, how = _probe_ms(
            lambda p: jnp.argmax(p, axis=-1).astype(jnp.uint8),
            probs, rep, "argmax")
        out["argmax_info"], methods["argmax"] = round(ms / v, 2), how
    except Exception as e:  # noqa: BLE001
        out["argmax_info"] = None
        print(f"bench: argmax probe failed ({type(e).__name__}: "
              f"{str(e)[:100]})", file=sys.stderr, flush=True)
    del probs

    residue = None
    if out.get("crops") is not None and out.get("stitch") is not None:
        residue = round(wall_ms_per_vol - fwd_ms_per_vol
                        - out["crops"] - out["stitch"], 2)
    return {
        "forward": round(fwd_ms_per_vol, 2),
        **out,
        "dispatch_residue": residue,
        "probe_methods": methods,
        "note": "ms/volume; argmax_info is NOT in the headline pipeline "
                "(probs are fetched, not argmaxed) and excluded from the "
                "residue; residue = wall - forward - crops - stitch "
                "(host dispatch + relay per-program overhead); "
                "probe_methods per field: chain / synth-chain (both "
                "dispatch-free scans; synth generates the input inside "
                "the scan body) vs pipelined (depth-2 dispatches, relay "
                "overlap included)",
    }


def measure_train_efficiency(rep=4):
    """Train-step efficiency fields for the artifact (VERDICT r4 item 4).

    B=1 128^3 bf16, remat 'none' — the measured production configuration
    (scripts/train.py defaults under --amp; docs/PERF.md remat sweep).
    FLOPs from a single-step compile's cost analysis (scan chains count
    the body once); time from a data-dependent chain of ``rep`` full
    train steps (grad + Adam + metrics) through the evolving state.
    Costs two full train-step compiles (~minutes over the relay) — keep
    it best-effort and last.  Reference hot loop: train.py:182-240."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dctseg.config import ModelConfig, TrainConfig
    from dctseg.losses import CRITERIA
    from dctseg.models.clswiseformer import build_model
    from dctseg.train.optim import make_optimizer
    from dctseg.train.trainer import TrainState, make_train_step

    d = CROP
    mcfg = ModelConfig(compute_dtype="bfloat16", remat=False,
                       img_dim=d,
                       **({} if d == 128
                          else {"top_num": min(128, (d // 16) ** 3)}))
    model = build_model(mcfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, d, d, d, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)
    tx = make_optimizer(TrainConfig(), steps_per_epoch=250)
    opt_state = jax.jit(tx.init)(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, d, d, d, 4))
                    .astype(np.float32)).astype(jnp.bfloat16)
    tgt = jnp.asarray(rng.integers(0, 4, (1, d, d, d)).astype(np.int32))
    edg = jnp.asarray(rng.integers(0, 9, (1, d, d, d)).astype(np.int32))
    step = make_train_step(model, tx, CRITERIA["softmax_dice"])
    state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
    keys = jax.random.split(jax.random.PRNGKey(1), rep)

    flops = -1.0
    try:
        single = jax.jit(
            lambda s, k: step(s, x, tgt, edg, k)[0].params
        ).lower(state, keys[0]).compile()
        cost = single.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", -1.0))
        del single
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        pass

    def chain(s):
        def body(st, k):
            s2, _ = step(st, x, tgt, edg, k)
            return s2, None
        s2, _ = jax.lax.scan(body, s, keys)
        return s2.params

    compiled = jax.jit(chain).lower(state).compile()

    def once():
        t0 = time.perf_counter()
        out = compiled(state)
        leaf = jax.tree.leaves(out)[0]
        float(leaf.ravel()[0].astype(jnp.float32))
        return (time.perf_counter() - t0) / rep

    once()
    dt = min(once() for _ in range(2))
    fields = {"train_ms_step": round(dt * 1e3, 1)}
    if flops > 0:
        ach = flops / dt / 1e12
        fields.update({
            "train_hlo_flops_step": flops,
            "train_tflops_device": round(ach, 1),
            "train_mfu": round(ach / PEAK_TFLOPS_BF16, 3),
            "train_note": "B=1 128^3 bf16, remat none (the measured "
                          "--amp default); executed-HLO flops vs bf16 "
                          "peak.  Per-device B=1 is also the measured "
                          "per-sample optimum (PERF.md batch sweep: "
                          "B=2 +34%/sample)",
        })
    return fields


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
    x0 = jnp.zeros((1, CROP, CROP, CROP, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)

    # int8 PTQ shares the float param tree (dctseg/ops/quant.py), so one
    # init serves both predictors.
    predictors, models = {}, {None: model}

    def get_predictor(quant):
        if quant not in predictors:
            m = model if quant is None else build_model(
                dataclasses.replace(cfg, quantize=quant))
            models[quant] = m
            # fold_params: weights baked into the executable so XLA
            # constant-folds the s2d weight transforms + int8 weight
            # quantization once at compile (measured ~2.5 ms/fwd,
            # docs/PERF.md; serving bundles do the same)
            predictors[quant] = Predictor(m, params, fold_params=True)
        return predictors[quant]

    rng = np.random.default_rng(0)
    vols = [jnp.asarray(rng.normal(size=(1, *VOL_SHAPE, 4))
                        .astype(np.float32)) for _ in range(N_VOLS)]

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
    # on ResourceExhausted / lowering failures — retrying the SAME rung
    # once first when the failure does not look like OOM (transient
    # relay stalls must not demote the round's artifact).
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

    chosen, last_err = None, None
    for quant, v in LADDER:
        for attempt in (0, 1):
            try:
                predictor = get_predictor(quant)
                round_vps(predictor, v, 1)      # compile + first run
                round_vps(predictor, v, 2)      # warm steady-state
                rounds = sorted(round_vps(predictor, v, max(2, 6 // v))
                                for _ in range(3))
                chosen = (quant, v, predictor, rounds)
                break
            except Exception as e:
                last_err = e
                msg = f"{type(e).__name__}: {str(e)[:120]}"
                # retry the SAME rung only on transient relay/RPC-looking
                # errors; deterministic failures (OOM, lowering/compile
                # errors) go straight to the next rung — a fresh-process
                # recompile costs 300-1100 s over the relay
                rep = repr(e)
                transient = any(tok in rep for tok in (
                    "UNAVAILABLE", "DEADLINE_EXCEEDED", "ABORTED",
                    "Connection", "timed out", "Socket", "EOF"))
                if attempt == 0 and transient:
                    print(f"bench: quant={quant} V={v} failed ({msg}); "
                          "retrying this rung once (transient)",
                          file=sys.stderr, flush=True)
                    continue
                print(f"bench: quant={quant} V={v} paired tiling failed "
                      f"({msg}); falling back", file=sys.stderr, flush=True)
                # free the failed rung's predictor (and its compiled
                # executables / device state) before trying the next rung
                # — int8 V=2 already sits at the HBM edge
                predictor = None
                predictors.pop(quant, None)
                break
        if chosen is not None:
            break
    else:
        raise RuntimeError("bench: every ladder rung failed "
                           f"({LADDER})") from last_err
    quant, v, predictor, rounds = chosen
    vps = rounds[-1]

    # bf16 V=1 parity rung: the reference-parity-proven configuration
    # (scripts/parity_check.py / parity_eval.py run bf16 per-volume), so
    # every round's artifact tracks it even when the headline is int8.
    parity = {}
    if (quant, v) == (None, 1):
        parity = {"value": round(vps, 4),
                  "rounds": [round(r, 4) for r in rounds],
                  "note": "headline rung IS the parity rung"}
    else:
        try:
            pb = get_predictor(None)
            round_vps(pb, 1, 1)
            round_vps(pb, 1, 2)
            prounds = sorted(round_vps(pb, 1, 4) for _ in range(2))
            parity = {"value": round(prounds[-1], 4),
                      "rounds": [round(r, 4) for r in prounds]}
        except Exception as e:  # keep the headline artifact alive
            parity = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(f"bench: parity rung failed ({parity['error']})",
                  file=sys.stderr, flush=True)

    # Absolute-efficiency accounting for the headline rung's forward.
    # fold_params=True: the probe measures the same program class as the
    # headline rung's Predictor(fold_params=True) executables (ADVICE r4:
    # the two-arg probe described a ~2.5 ms/fwd slower program).
    extras = {}
    try:
        dev = measure_device_forward(models.get(quant, model), params,
                                     (8 * v, CROP, CROP, CROP, 4),
                                     fold_params=True)
        dt, flops = dev["device_s_forward"], dev["flops_forward"]
        extras["device_ms_forward"] = round(dt * 1e3, 1)
        extras["device_ms_per_volume"] = round(dt * 1e3 / v, 1)
        extras["device_probe"] = ("folded-params chain (the headline "
                                  "rung's program class)")
        if flops > 0:
            ach = flops / dt / 1e12
            logical = logical_flops(8 * v)
            peak = (PEAK_TOPS_INT8 if (quant or "").startswith("int8")
                    else PEAK_TFLOPS_BF16)
            extras.update({
                "hlo_flops_forward": flops,
                "achieved_tflops_device": round(ach, 1),
                # wall-clock rate through the whole pipeline (dispatch,
                # crops/stitch, relay overhead included)
                "achieved_tflops_wall": round(flops / v * vps / 1e12, 1),
                "peak_tflops": peak,
                # executed-HLO utilization (hardware efficiency)
                "mfu": round(ach / peak, 3),
                "mfu_vs_bf16_peak": round(ach / PEAK_TFLOPS_BF16, 3),
                # logical-FLOPs MFU (model math per second vs peak)
                "logical_tflops_device": round(logical / dt / 1e12, 1),
                "logical_mfu": round(logical / dt / 1e12 / peak, 3),
            })
    except Exception as e:  # noqa: BLE001 - efficiency probe is best-effort
        print(f"bench: device-time probe skipped ({type(e).__name__}: "
              f"{str(e)[:120]})", file=sys.stderr, flush=True)

    # Per-volume wall-budget decomposition (VERDICT r4 item 3): account
    # the gap between the wall headline and the device forward.
    try:
        if "device_ms_per_volume" in extras:
            group = (jnp.concatenate(vols[:v], axis=0) if v > 1
                     else vols[0])
            extras["wall_budget"] = measure_wall_budget(
                predictor, group, 1e3 / vps,
                extras["device_ms_per_volume"])
    except Exception as e:  # noqa: BLE001 - budget probe is best-effort
        print(f"bench: wall-budget probe skipped ({type(e).__name__}: "
              f"{str(e)[:120]})", file=sys.stderr, flush=True)

    # Train-step efficiency (VERDICT r4 item 4) — last: it costs two
    # full train-step compiles over the relay.  DCTSEG_BENCH_TRAIN=0
    # skips it when only the inference headline is wanted.
    if os.environ.get("DCTSEG_BENCH_TRAIN", "1") != "0":
        try:
            extras.update(measure_train_efficiency())
        except Exception as e:  # noqa: BLE001 - best-effort
            print(f"bench: train-efficiency probe skipped "
                  f"({type(e).__name__}: {str(e)[:120]})",
                  file=sys.stderr, flush=True)

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
        "parity_rung": parity,
        **extras,
        "policy": "best-of-3 (median+rounds recorded; axon relay stalls); "
                  f"V={v} paired tiling, {quant or 'bfloat16'} compute "
                  "(docs/PERF.md 'Paired tiling'; int8 accuracy on trained "
                  "structured predictions: argmax agreement 0.999868, "
                  "gt-Dice equal to bf16 at 3 decimals — "
                  "scripts/measure_structured_accuracy.py).  parity_rung = "
                  "bf16 V=1 (best-of-2).  mfu = executed-HLO flops / device "
                  "time / peak (hardware utilization; model-logical FLOPs "
                  "accounting in docs/PERF.md 'Absolute efficiency')",
    }))


if __name__ == "__main__":
    main()
