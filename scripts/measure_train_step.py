#!/usr/bin/env python
"""Measure the real train-step wall time with and without H2D prefetch.

VERDICT r2 #7: the step is relay-bound (21 MB/step over the container's
25 MB/s H2D relay vs 0.16 s device compute, docs/PERF.md).  With
``TrainConfig.device_prefetch > 0`` a feeder thread device_puts batch i+1
while step i runs, overlapping the transfer with compute
(dctseg/train/trainer.py:_device_batches).  This script times full epochs
of the PRODUCTION Trainer (synthetic data, real 128^3 bf16 geometry, one
process so the train-step executable compiles once) for prefetch depths
0 and 1 and prints s/step for each.

Run on the idle chip:  python scripts/measure_train_step.py [--steps 16]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=16,
                   help="steps per timed epoch (synthetic dataset size)")
    p.add_argument("--reps", type=int, default=3,
                   help="interleaved (sync, prefetch) epoch pairs")
    p.add_argument("--fp32", action="store_true",
                   help="fp32 compute + wire (default bf16, the train_amp "
                        "configuration docs/PERF.md measures)")
    a = p.parse_args()

    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    from dctseg.config import Config, DataConfig, ModelConfig, TrainConfig
    from dctseg.train.trainer import Trainer

    dt = "float32" if a.fp32 else "bfloat16"
    cfg = Config(
        model=ModelConfig(compute_dtype=dt),
        data=DataConfig(synthetic_num_samples=a.steps, num_workers=2,
                        transfer_dtype=dt),
        train=TrainConfig(end_epoch=2, lr=2e-4, device_prefetch=0,
                          log_every=1000, checkpoint_dir="/tmp/mts_ckpt"),
    )
    tr = Trainer(cfg)
    tr.init_state()
    print(f"compiling + warmup epoch ({a.steps} steps, {dt})...", flush=True)
    t0 = time.perf_counter()
    tr.train_epoch(0)
    print(f"warmup epoch: {time.perf_counter() - t0:.1f}s", flush=True)

    # Alternate depths: the axon relay's throughput drifts over minutes,
    # so consecutive same-depth epochs are NOT comparable — interleave and
    # take medians.
    results = {}
    for rep, depth in enumerate((0, 1) * a.reps):
        tr.cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, device_prefetch=depth))
        t0 = time.perf_counter()
        m = tr.train_epoch(1 + rep)
        dt_ep = time.perf_counter() - t0
        per = dt_ep / a.steps
        results.setdefault(depth, []).append(per)
        print(f"device_prefetch={depth}: {dt_ep:.1f}s epoch, "
              f"{per:.3f} s/step (loss {m['loss']:.4f})", flush=True)
    import statistics
    sync = statistics.median(results[0])
    pre = statistics.median(results[1])
    print(f"\nsummary (medians of {a.reps} interleaved epochs): "
          f"sync {sync:.3f} s/step -> prefetch {pre:.3f} s/step "
          f"({sync / pre:.2f}x)   all: sync={results[0]} pre={results[1]}")


if __name__ == "__main__":
    main()
