#!/usr/bin/env python
"""Prove the grad-accum headline on the chip: the reference's global batch
of 4 (one per GPU x 4 GPUs, train.py:76,305) on ONE 16 GB v5e.

Runs in one process (remote compiles are expensive):
  1. batch_size=4, grad_accum=4 — four B=1 micro-batches under lax.scan,
     the reference's exact DDP semantics; expected to fit easily (B=1
     backward is the production step).
  2. batch_size=4, grad_accum=2 — two B=2 micro-batches.
  3. batch_size=4, grad_accum=1 — a single B=4 backward pass, LAST so an
     unrecoverable OOM cannot block the measurements above.

Prints s/step for whatever fits (note: each step moves ~67 MB over the
~25 MB/s relay, so wall time here is H2D-bound; the claim under test is
HBM feasibility + device time, not throughput).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    from dctseg.config import Config, DataConfig, ModelConfig, TrainConfig
    from dctseg.train.trainer import Trainer

    steps = 2
    for ga in (4, 2, 1):
        cfg = Config(
            model=ModelConfig(compute_dtype="bfloat16"),
            data=DataConfig(synthetic_num_samples=4 * steps, num_workers=2,
                            transfer_dtype="bfloat16"),
            train=TrainConfig(end_epoch=2, lr=2e-4, batch_size=4,
                              grad_accum=ga, log_every=1000,
                              checkpoint_dir=f"/tmp/mga_ckpt_{ga}"),
        )
        tr = Trainer(cfg)
        try:
            tr.init_state()
            t0 = time.perf_counter()
            tr.train_epoch(0)            # compile + first epoch
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            m = tr.train_epoch(1)
            per = (time.perf_counter() - t0) / steps
            print(f"grad_accum={ga} (micro-batch {4 // ga}): FITS  "
                  f"compile+first {tc:.0f}s, steady {per:.2f} s/step "
                  f"(loss {m['loss']:.4f})", flush=True)
        except Exception as e:  # RESOURCE_EXHAUSTED surfaces as XlaRuntimeError
            msg = str(e).splitlines()[0][:200]
            print(f"grad_accum={ga} (micro-batch {4 // ga}): FAILED "
                  f"({type(e).__name__}: {msg})", flush=True)
        del tr


if __name__ == "__main__":
    main()
