#!/usr/bin/env python
"""Coalescer pipelining: device-side A/B on the chip (VERDICT r4 item 5).

The r5 coalescer (dctseg/infer/server.py) splits dispatch from fetch:
group i+1's device programs enqueue while group i's outputs are still
being pulled (depth-2), and a mixed labels/probs group dispatches both
programs back-to-back.  The behavioral overlap is asserted on CPU with
an async fake bundle (tests/test_serving.py); this script quantifies the
device-side win on the real chip, isolated from the HTTP wire (which on
this relay-attached host dominates any request — docs/PERF.md "Serving
over HTTP"): it drives the _Coalescer directly with in-RAM volumes.

  A (old behavior) — G sequential `np.asarray(bundle.labels(group))`
      calls: each group's fetch completes before the next dispatch (the
      r4 dispatcher's shape).
  B (pipelined)    — 2G threads submit single volumes concurrently; the
      coalescer batches them into G groups and overlaps group i's fetch
      (~0.7 s: V x 17 MB uint8 labels over the 25 MB/s relay) with group
      i+1's dispatch+compute (~0.3 s at B=16 int8).

Expected: B saves ~min(compute, fetch) per steady-state group.

Run on the idle chip:
    python scripts/measure_serving_pipeline.py [--groups 4] [--wait-ms 4000]
"""

import argparse
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--batch-volumes", type=int, default=2)
    ap.add_argument("--quantize", default="int8")
    ap.add_argument("--wait-ms", type=float, default=4000.0,
                    help="coalesce window (large: force full groups)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from bench import _wait_for_accelerator
    if not args.cpu:
        _wait_for_accelerator()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from dctseg.config import ModelConfig
    from dctseg.infer.engine import Predictor
    from dctseg.infer.serving import ServingBundle, export_bundle
    from dctseg.infer.server import BundleServer
    from dctseg.models.clswiseformer import build_model

    print("devices:", jax.devices(), flush=True)
    v, g = args.batch_volumes, args.groups
    cfg = ModelConfig(compute_dtype="bfloat16", quantize=args.quantize)
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 128, 128, 128, 4), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, train=False))(key)
    pred = Predictor(model, params, fold_params=True)

    out_dir = tempfile.mkdtemp(prefix="dctseg_pipe_bundle_")
    print(f"exporting {args.quantize} V={v} tiling bundle (f16 wire) "
          f"to {out_dir} ...", flush=True)
    t0 = time.time()
    export_bundle(pred, out_dir, strategy="tiling", batch_volumes=v,
                  input_dtype=jnp.float16)
    print(f"export: {time.time() - t0:.1f} s", flush=True)

    bundle = ServingBundle.load(out_dir)
    server = BundleServer(bundle, port=0, warmup=True,
                          coalesce_wait_s=args.wait_ms / 1e3)
    co = server._coalescer
    assert co is not None and co.v == v

    rng = np.random.default_rng(0)
    vols = [rng.normal(size=(1, 240, 240, 160, 4)).astype(np.float16)
            for _ in range(v)]
    group = np.concatenate(vols, axis=0)

    def seq_round():
        """A: old shape — fetch completes before the next dispatch."""
        t0 = time.perf_counter()
        for _ in range(g):
            with server._device_lock:
                np.asarray(bundle.labels(group))
        return time.perf_counter() - t0

    def pipe_round():
        """B: 2G concurrent single-volume submits -> G pipelined groups."""
        results = [None] * (g * v)

        def client(i):
            results[i] = co.submit(vols[i % v], "labels")

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(g * v)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None for r in results)
        return time.perf_counter() - t0

    # warm both paths (first labels call also primes the argmax jit)
    seq_round()
    pipe_round()
    print(f"\n== {g} groups of V={v} ({args.quantize}), labels output, "
          f"interleaved rounds ==", flush=True)
    for r in range(args.rounds):
        ts = seq_round()
        tp = pipe_round()
        print(f"  round {r}: sequential {ts:6.2f} s   pipelined {tp:6.2f} s"
              f"   ({ts / tp:.2f}x)", flush=True)

    server.shutdown()
    print("\ndone.", flush=True)


if __name__ == "__main__":
    main()
