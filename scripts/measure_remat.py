#!/usr/bin/env python
"""Train-step device-time profile: remat × batch × grad-accum sweeps.

VERDICT r3 item 3: the B=1 128^3 train step was one opaque 0.16 s device
number, and block remat (unet.py) was all-or-nothing.  This script
measures, per remat policy (full-block remat / save_convs selective remat
/ no remat):

  fwd    — loss forward only
  grad   — value_and_grad (fwd + bwd)
  step   — the production train step (grad + Adam update + train metrics)

each as a data-dependent ``lax.scan`` chain of REP iterations in ONE
program with device-resident batches (docs/PERF.md "Measurement
pitfalls": single-call timings on this container are relay-dispatch
bound; chaining through the evolving state/params makes every iteration
depend on the last).  H2D is excluded by design — the transfer story is
measured separately (scripts/measure_train_step.py).

Round 5 added the per-device batch axis (``--batches 1,2,4``) and the
grad-accum axis (``--grad-accum B`` through the production
``make_train_step(grad_accum=...)`` scan): B=1 is the measured per-sample
optimum and accumulation holds that cost where direct batching loses
34-79 % (docs/PERF.md "Round 5: per-device train batch sweep").

Run on the idle chip:  python scripts/measure_remat.py [--rep 6]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REP = 6


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rep", type=int, default=REP)
    ap.add_argument("--policies", default="full,save_convs,none")
    ap.add_argument("--modes", default="fwd,grad,step")
    ap.add_argument("--img-dim", type=int, default=128,
                    help="spatial size (CPU smoke runs use 32)")
    ap.add_argument("--batches", default="1",
                    help="comma list of batch sizes to sweep (per-device "
                         "B; the reference trains batch 1/GPU over 4 "
                         "GPUs = global 4, /root/reference/train.py:94)")
    ap.add_argument("--base-channels", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (logic smoke; numbers meaningless)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="micro-batches per step (applies to 'step' mode; "
                         "every batch in --batches must divide evenly).  "
                         "grad_accum=B with batch B runs B=1 micro-steps "
                         "— the memory-free alternative to per-device "
                         "batching (docs/PERF.md batch sweep)")
    ap.add_argument("--conv-bwd", default=None, choices=("explicit", "xla"),
                    help="override s2d.CONV3_BWD for the whole sweep "
                         "(A/B the explicit conv3 VJP, docs/PERF.md "
                         "'Round 5: inside the backward')")
    args = ap.parse_args()
    rep = args.rep

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.conv_bwd:
        from dctseg.ops import s2d as _s2d
        _s2d.CONV3_BWD = args.conv_bwd
        print(f"CONV3_BWD = {args.conv_bwd}", flush=True)
    from dctseg.utils.jax_setup import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax
    from dctseg.config import ModelConfig, TrainConfig
    from dctseg.losses import CRITERIA, total_loss
    from dctseg.models.clswiseformer import build_model
    from dctseg.train.optim import make_optimizer
    from dctseg.train.trainer import TrainState, make_train_step

    print("devices:", jax.devices(), flush=True)
    d = args.img_dim
    base = ModelConfig(
        compute_dtype="bfloat16", img_dim=d,
        base_channels=args.base_channels,
        **({} if d == 128 else {"top_num": min(128, (d // 16) ** 3)}))
    model0 = build_model(base)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, d, d, d, 4), jnp.float32)
    params = jax.jit(lambda k: model0.init(k, x0, train=False))(key)

    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(1), rep)

    tcfg = TrainConfig()
    tx = make_optimizer(tcfg, steps_per_epoch=250)
    opt_state = jax.jit(tx.init)(params)

    def make_timed(batch):
        def timed(label, compiled, args_):
            def once():
                t0 = time.perf_counter()
                out = compiled(*args_)
                leaf = jax.tree.leaves(out)[0]
                float(leaf.ravel()[0].astype("float32"))
                return (time.perf_counter() - t0) / rep

            once()
            ts = sorted(once() for _ in range(3))
            print(f"  {label:12s} {ts[0] * 1e3:8.1f} ms/step "
                  f"({ts[0] * 1e3 / batch:6.1f} ms/sample, rounds "
                  f"{[round(t * 1e3, 1) for t in ts]})", flush=True)
            return ts[0]
        return timed

    for b_and_policy in [(b, p)
                         for b in map(int, args.batches.split(","))
                         for p in args.policies.split(",")]:
        batch, policy = b_and_policy
        timed = make_timed(batch)
        x = jnp.asarray(rng.normal(size=(batch, d, d, d, 4))
                        .astype(np.float32)).astype(jnp.bfloat16)
        tgt = jnp.asarray(
            rng.integers(0, 4, (batch, d, d, d)).astype(np.int32))
        edg = jnp.asarray(
            rng.integers(0, 9, (batch, d, d, d)).astype(np.int32))
        remat = policy != "none"
        mcfg = dataclasses.replace(base, remat=remat,
                                   remat_policy=policy if remat else "full")
        model = build_model(mcfg)
        ga = f" grad_accum={args.grad_accum}" if args.grad_accum != 1 else ""
        print(f"\n== batch={batch} remat_policy={policy}{ga} ==",
              flush=True)

        def loss_fn(p, key):
            outs = model.apply(p, x, train=True, rngs={"dropout": key})
            return total_loss(outs, tgt, edg)["loss"]

        try:
            if "fwd" in args.modes:
                def fwd_chain(x_, p):
                    def body(c, key):
                        loss = total_loss(model.apply(
                            p, c, train=True, rngs={"dropout": key}),
                            tgt, edg)["loss"]
                        return c + (loss * 0).astype(c.dtype), None
                    c, _ = jax.lax.scan(body, x_, keys)
                    return c
                timed("fwd", jax.jit(fwd_chain).lower(x, params).compile(),
                      (x, params))

            if "grad" in args.modes:
                def grad_chain(p):
                    def body(c, key):
                        g = jax.grad(loss_fn)(c, key)
                        return jax.tree.map(
                            lambda a, b: a + 0.0 * b.astype(a.dtype), c, g
                            ), None
                    c, _ = jax.lax.scan(body, p, keys)
                    return c
                timed("fwd+bwd",
                      jax.jit(grad_chain).lower(params).compile(),
                      (params,))

            if "step" in args.modes:
                step = make_train_step(model, tx, CRITERIA["softmax_dice"],
                                       grad_accum=args.grad_accum)

                def step_chain(state):
                    def body(s, key):
                        s2, _ = step(s, x, tgt, edg, key)
                        return s2, None
                    s, _ = jax.lax.scan(body, state, keys)
                    return s.params
                state = TrainState(params, opt_state,
                                   jnp.zeros((), jnp.int32))
                timed("full step",
                      jax.jit(step_chain).lower(state).compile(), (state,))
        except Exception as e:  # noqa: BLE001 - OOM is a result here
            print(f"  FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    print("\ndone.", flush=True)


if __name__ == "__main__":
    main()
