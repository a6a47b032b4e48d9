"""Training loop: jitted data-parallel train step, logging, checkpointing.

Replaces the reference DDP loop (train.py:111-268) with a single-program
SPMD design: one jitted step function whose batch inputs are sharded over a
1-D ``data`` mesh and whose parameters are replicated; XLA inserts the
gradient all-reduce over ICI.  The loss components the reference all-reduces
explicitly for logging (train.py:217-225) are already global here because the
loss itself is computed over the global (sharded) batch inside jit.

AMP equivalence: ``ModelConfig(compute_dtype='bfloat16')`` — on TPU bf16 has
fp32's exponent range so no GradScaler is needed (SURVEY.md §2.9b).
"""

from __future__ import annotations

import contextlib
import logging
import os
import signal
import threading
import time
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dctseg.config import Config
from dctseg.data.brats import BraTSDataset
from dctseg.data.pipeline import PrefetchLoader
from dctseg.losses import CRITERIA, total_loss
from dctseg.models.clswiseformer import ClsWiseFormer, build_model
from dctseg.parallel import distributed
from dctseg.parallel.mesh import (batch_sharding, data_size, make_mesh,
                                  replicated, shard_batch)
from dctseg.train.checkpoint import Checkpointer, should_save
from dctseg.train.optim import make_optimizer

logger = logging.getLogger("dctseg")


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_step(model: ClsWiseFormer, tx: optax.GradientTransformation,
                    criterion: Callable, grad_accum: int = 1) -> Callable:
    """Returns a jittable (state, x, target, edge, rng) -> (state, metrics).

    ``grad_accum`` splits the batch into that many micro-batches evaluated
    sequentially under ``lax.scan`` with gradients (and loss components)
    averaged before ONE optimizer update: activation memory drops by the
    accumulation factor, so a single 16 GB chip can train the reference's
    global batch of 4 (one per GPU x 4, train.py:76,305) that does not fit
    in one backward pass.  Semantics are the mean of per-micro-batch
    gradients — EXACTLY the reference's DDP shape (per-GPU loss on local
    rows, gradients averaged by the all-reduce, train.py:134) when the
    micro-batch equals the per-GPU batch.  A single full-batch pass is
    only near-equal: the dice losses couple the batch through global
    sums, and dropout masks are drawn per micro-batch."""

    def loss_fn(params, x, target, edge, rng):
        outs = model.apply(params, x, train=True, rngs={"dropout": rng})
        comp = total_loss(outs, target, edge, criterion)
        return comp["loss"], (comp, outs[0])

    def step(state: TrainState, x, target, edge, rng):
        # labels travel host->device as uint8 (the remote-TPU relay moves
        # ~25 MB/s; see DataConfig.transfer_dtype) — widen on device
        target = target.astype(jnp.int32)
        edge = edge.astype(jnp.int32)

        if grad_accum == 1:
            grads, (comp, seg) = jax.grad(loss_fn, has_aux=True)(
                state.params, x, target, edge, rng)
            pred = jnp.argmax(seg, axis=-1)
        else:
            ga = grad_accum
            # Micro-batch j takes rows {r : r % ga == j}: each device's
            # contiguous row block contributes equally to every micro-batch
            # (per-device batch % ga == 0, checked in Trainer), so the
            # reshape is shard-local and the micro-batch keeps the full
            # `data`-axis sharding — no resharding collectives.
            def split(a):
                return a.reshape(-1, ga, *a.shape[1:]).swapaxes(0, 1)
            keys = jax.random.split(rng, ga)

            def body(acc, inp):
                acc_g, acc_c = acc
                xm, tm, em, key = inp
                g, (c, seg) = jax.grad(loss_fn, has_aux=True)(
                    state.params, xm, tm, em, key)
                return (jax.tree.map(jnp.add, acc_g, g),
                        jax.tree.map(jnp.add, acc_c, c)), \
                    jnp.argmax(seg, axis=-1)
            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            # loss-component accumulator matching total_loss's dict
            comp_shape = jax.eval_shape(
                loss_fn, state.params, split(x)[0], split(target)[0],
                split(edge)[0], keys[0])[1][0]
            zeros_c = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), comp_shape)
            (acc_g, acc_c), preds = jax.lax.scan(
                body, (zeros_g, zeros_c),
                (split(x), split(target), split(edge), keys))
            grads = jax.tree.map(lambda a: a / ga, acc_g)
            comp = jax.tree.map(lambda a: a / ga, acc_c)
            # (ga, mb, ...) -> original row order
            pred = preds.swapaxes(0, 1).reshape(-1, *preds.shape[2:])

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # train-time sanity metrics (train.py:192-205), on device
        metrics = dict(comp)
        metrics["pred_counts"] = jnp.stack(
            [(pred == c).sum() for c in range(model.cfg.num_classes)])
        wt = _dice(pred > 0, target > 0)
        tc = _dice((pred == 1) | (pred == 3), (target == 1) | (target == 3))
        et = _dice(pred == 3, target == 3)
        metrics["dice_wt"], metrics["dice_tc"], metrics["dice_et"] = wt, tc, et
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def _dice(o, t, eps=1e-8):
    o = o.astype(jnp.float32)
    t = t.astype(jnp.float32)
    return (2 * (o * t).sum() + eps) / (o.sum() + t.sum() + eps)


class Trainer:
    """End-to-end training driver (the reference's main_worker,
    train.py:111-268)."""

    def __init__(self, cfg: Config, dataset: Optional[BraTSDataset] = None,
                 mesh=None):
        self.cfg = cfg
        self.model = build_model(cfg.model)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.train.num_devices, spatial=cfg.train.spatial_shards)
        # batch scales with DATA shards only; a 2-D mesh's `space` axis
        # shards each sample's D dimension instead (halo-exchanged convs)
        self.num_devices = data_size(self.mesh)

        self.dataset = dataset if dataset is not None else BraTSDataset(
            list_file=(cfg.data.root and
                       f"{cfg.data.root}/{cfg.data.train_file}"),
            root=cfg.data.root, mode="train",
            drop_modal=cfg.data.drop_modal, cfg=cfg.data)
        # global batch = per-device batch * mesh size
        self.global_batch = cfg.train.batch_size * self.num_devices
        # Multi-process (pod-slice) runs: each process loads only the rows
        # destined for its own chips — the DistributedSampler shape of
        # train.py:163 — and shard_batch assembles the global jax.Array
        # from the per-process locals.
        self.num_processes = jax.process_count()
        assert self.global_batch % self.num_processes == 0, (
            f"global batch {self.global_batch} not divisible by "
            f"{self.num_processes} processes")
        # accumulation splits each device's rows, so the per-device batch
        # must divide evenly (keeps the micro-batch reshape shard-local)
        assert cfg.train.batch_size % cfg.train.grad_accum == 0, (
            f"per-device batch {cfg.train.batch_size} not divisible by "
            f"grad_accum {cfg.train.grad_accum}")
        # int8 PTQ is inference-only: round() has a zero gradient, so a
        # quantized train step would silently stop learning through every
        # quantized conv
        assert cfg.model.quantize == "none", (
            "ModelConfig.quantize is an inference-only execution strategy; "
            "train in float/bf16 and quantize at eval")
        # likewise the fused Pallas norm kernel ships without a VJP
        assert not cfg.model.fused_norms, (
            "ModelConfig.fused_norms is an inference-only execution "
            "strategy (no custom VJP); train with the XLA norms")
        self.loader = PrefetchLoader(
            self.dataset,
            batch_size=self.global_batch // self.num_processes,
            shard=jax.process_index(), num_shards=self.num_processes,
            shuffle=True, num_workers=cfg.data.num_workers,
            prefetch=cfg.data.prefetch, seed=cfg.train.seed)
        self.steps_per_epoch = max(1, len(self.loader))

        self.tx = make_optimizer(cfg.train, self.steps_per_epoch)
        self.criterion = CRITERIA[cfg.train.criterion]
        self._step_fn = None
        self._mp_step = None   # AOT-compiled step for multi-process runs
        self.ckpt = Checkpointer(cfg.train.checkpoint_dir)
        self.state: Optional[TrainState] = None
        self.rng = jax.random.PRNGKey(cfg.train.seed)
        self._preempt = threading.Event()
        self.preempted = False  # set by fit() after an early exit

    # ---- state init / resume ----

    def init_state(self) -> TrainState:
        self.rng, init_key, drop_key = jax.random.split(self.rng, 3)
        d = self.cfg.model.img_dim
        x0 = jnp.zeros((self.global_batch, d, d, d,
                        self.cfg.model.in_channels), jnp.float32)
        rep = replicated(self.mesh)
        params = jax.jit(
            lambda k: self.model.init({"params": k, "dropout": drop_key},
                                      x0, train=False),
            out_shardings=rep)(init_key)
        opt_state = jax.jit(self.tx.init, out_shardings=rep)(params)
        self.state = TrainState(params, opt_state,
                                jnp.asarray(0, jnp.int32))
        return self.state

    def resume(self, epoch: Optional[int] = None,
               restore_opt: bool = False,
               from_dir: Optional[str] = None) -> int:
        """Restore params (reference quirk: optimizer state NOT restored by
        default, train.py:146-157).  Returns the epoch to continue from.

        ``from_dir`` restores from a different checkpoint directory than the
        one this trainer saves to (the reference's ``--load_dir`` capability,
        train.py:146-157); new checkpoints still go to ``checkpoint_dir``.

        On a params-only resume the optimizer state is fresh, but the LR must
        correspond to ``start_epoch`` (the reference computes LR from the
        actual epoch variable, train.py:184,272-275) — so the poly-schedule
        count and ``state.step`` are seeded with start_epoch*steps_per_epoch.
        Adam moments/bias-correction stay fresh, matching the reference's
        un-restored optimizer.
        """
        if self.state is None:
            self.init_state()
        src = self.ckpt
        if from_dir and os.path.abspath(from_dir) != self.ckpt.directory:
            src = Checkpointer(from_dir)
        epoch = epoch if epoch is not None else src.latest_epoch()
        if epoch is None:
            logger.info("re-training!!!")
            return self.cfg.train.start_epoch
        abstract = jax.tree.map(ocp_abstract, self.state.params)
        if restore_opt:
            params, opt_state, meta = src.restore_full(
                epoch, abstract, jax.tree.map(ocp_abstract,
                                              self.state.opt_state))
            self.state = TrainState(
                params, opt_state,
                jnp.asarray(int(meta["step"]), jnp.int32))
            logger.info("restored full state from epoch %s", epoch)
            # a partial (preemption) save re-runs the interrupted epoch
            return int(meta["epoch"]) + (0 if meta.get("partial") else 1)
        params = src.restore_params(epoch, abstract)
        start = self.cfg.train.start_epoch
        offset = start * self.steps_per_epoch
        self.state = TrainState(
            params,
            _seed_schedule_count(self.state.opt_state, offset),
            jnp.asarray(offset, jnp.int32))
        logger.info("restored params from epoch %s (dir=%s), LR seeded at "
                    "epoch %d", epoch, src.directory, start)
        return start

    # ---- preemption (SURVEY.md §5: the reference has no recovery story;
    # crash = restart from the last .pth.  TPU pods deliver SIGTERM on
    # preemption/maintenance — we save a FULL resumable checkpoint.) ----

    def request_stop(self) -> None:
        """Ask the training loop to stop after the in-flight step; fit()
        then saves a full (params+opt_state+step) checkpoint and returns.
        Thread- and signal-safe."""
        self._preempt.set()

    def _should_stop(self) -> bool:
        """Per-step stop decision.  Multi-process runs must AGREE on the
        stop step: signal delivery is skewed across processes, and a
        process that breaks one step earlier than its peers leaves them
        blocked in a gradient all-reduce (then everyone misses the
        checkpoint).  A scalar any-reduce over processes at each loop top
        makes every rank break at the same step index with identical
        state; a rank whose own signal never arrived (single-host
        preemption) is pulled along via request_stop so the collective
        save below runs on all ranks."""
        local = self._preempt.is_set()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            anyrank = bool(multihost_utils.process_allgather(
                np.asarray(local, np.int32)).max())
            if anyrank and not local:
                self.request_stop()
            return anyrank
        return local

    @contextlib.contextmanager
    def _signal_guard(self):
        """Route SIGTERM/SIGINT to request_stop for the duration of fit().

        The previous handler is restored on the FIRST signal (so a second
        one regains default force-kill semantics) and on exit.  Installed
        only from the main thread (signal.signal's requirement); on
        multi-process pod runs preemption delivers SIGTERM host-wide, so
        every process enters the same collective Orbax save."""
        if (not self.cfg.train.preempt_save
                or threading.current_thread() is not threading.main_thread()):
            yield
            return
        prev = {}

        def handler(sig, frame):
            self.request_stop()
            signal.signal(sig, prev[sig])
            logger.info("signal %s: will checkpoint and exit after the "
                        "in-flight step (again to force-kill)", sig)

        for sig in (signal.SIGTERM, signal.SIGINT):
            prev[sig] = signal.signal(sig, handler)
        try:
            yield
        finally:
            for sig, h in prev.items():
                if signal.getsignal(sig) is handler:
                    signal.signal(sig, h)

    # ---- the loop ----

    def _compiled_step(self):
        if self._step_fn is None:
            fn = make_train_step(self.model, self.tx, self.criterion,
                                 self.cfg.train.grad_accum)
            if self.mesh.size == 1:
                # Single chip: skip the SPMD partitioner entirely.  The
                # sharding-annotated executable is semantically identical on
                # a 1-device mesh but measurably slower through the remote
                # runtime; the annotations only pay off multi-device.
                self._step_fn = jax.jit(fn, donate_argnums=(0,))
            else:
                rep = replicated(self.mesh)
                data = batch_sharding(self.mesh)
                self._step_fn = jax.jit(
                    fn,
                    in_shardings=(rep, data, data, data, rep),
                    out_shardings=(rep, rep),
                    donate_argnums=(0,))
        return self._step_fn

    def _device_batches(self):
        """Iterate device-resident (x, target, edge) tuples.

        With ``device_prefetch > 0`` a feeder thread runs ``shard_batch``
        (device_put) for batch i+1 while the main thread's step i executes:
        the H2D transfer — the measured bottleneck on this container's
        25 MB/s relay (docs/PERF.md) — overlaps device compute instead of
        serializing ahead of each dispatch.  The queue bounds device-side
        staging to ``device_prefetch`` batches beyond the one in flight.
        """
        depth = self.cfg.train.device_prefetch
        if jax.process_count() > 1:
            # Multi-controller runs must issue operations in the same order
            # on every process; a feeder thread racing the main thread's
            # step dispatch makes that order nondeterministic (observed as
            # coordination-service barrier timeouts).  Keep placement
            # synchronous — on a pod slice the per-host DMA is fast; the
            # prefetch exists for this container's 25 MB/s relay.
            depth = 0
        if depth <= 0:
            for batch in self.loader:
                yield shard_batch(self.mesh, batch.x, batch.target,
                                  batch.edge)
            return
        import queue as _queue
        q: "_queue.Queue" = _queue.Queue(maxsize=depth)
        _END = object()
        stop = threading.Event()   # consumer gone (preemption/early exit)

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except _queue.Full:
                    pass
            return False

        def feeder():
            try:
                for batch in self.loader:
                    if not put(shard_batch(self.mesh, batch.x, batch.target,
                                           batch.edge)):
                        return
                put(_END)
            except BaseException as e:  # propagate into the train loop
                put(e)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # unblock and retire the feeder even on an early exit
            # (preemption breaks the consuming loop mid-epoch)
            stop.set()
            t.join()

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        step_fn = self._compiled_step()
        self.loader.set_epoch(epoch)
        last = {}
        pending = None          # (iter, device metrics) of the previous step

        def log(i, metrics):
            m = {k: np.asarray(v).tolist() for k, v in metrics.items()}
            logger.info(
                "Epoch: %d_Iter:%d  loss: %.5f || end_loss: %.5f || "
                "s_loss:%.4f || edge_loss:%.4f || mid_s_loss:%.4f || "
                "mid_edge_loss:%.4f ||",
                epoch, i, m["loss"], m["end_loss"],
                m["s_loss"], m["edge_loss"], m["mid_s_loss"],
                m["mid_edge_loss"])
            logger.info(
                "epoch:%d, DICE= WT:%.4f,TC:%.4f,ET:%.4f  counts=%s",
                epoch, m["dice_wt"], m["dice_tc"],
                m["dice_et"], m["pred_counts"])
            return m

        for i, (x, tgt, edg) in enumerate(self._device_batches()):
            if self._should_stop():
                break
            self.rng, drop = jax.random.split(self.rng)
            if jax.process_count() > 1:
                # Multi-process: compile ahead-of-time and rendezvous
                # BEFORE the first collective executes.  Cross-process
                # collective ops have short peer deadlines (Gloo: 30 s),
                # while cold compiles on a loaded host can skew processes'
                # arrival at the first all-reduce by minutes; the AOT
                # executable is then reused for every step (no re-trace).
                if self._mp_step is None:
                    self._mp_step = step_fn.lower(
                        self.state, x, tgt, edg, drop).compile()
                    distributed.barrier("dctseg:train_step_compiled")
                step_fn = self._mp_step
            self.state, metrics = step_fn(self.state, x, tgt, edg, drop)
            # log one step LATE: fetching step i's metrics would block on
            # its execution, so dispatch step i+1 first and only then read
            # step i's (by now finished) metrics — the host-side loader and
            # H2D overlap the device step instead of serializing behind it
            if pending is not None:
                last = log(*pending)
            pending = ((i, metrics) if i % self.cfg.train.log_every == 0
                       else None)
        if pending is not None:
            last = log(*pending)
        return last

    def fit(self, eval_fn: Optional[Callable] = None) -> Dict[str, float]:
        """Run the full training loop.  ``eval_fn(trainer, epoch)`` is an
        optional validation hook invoked at every checkpoint save (the
        reference's validate-in-train capability, predict_simple.py:283
        ``valid_in_train``)."""
        with self._signal_guard():
            return self._fit(eval_fn)

    def _fit(self, eval_fn: Optional[Callable]) -> Dict[str, float]:
        cfg = self.cfg.train
        if self.state is None:
            if cfg.resume:
                # cfg.resume is a checkpoint DIRECTORY (scripts/train.py
                # --resume <dir>), not a bool — restore from it while saving
                # new checkpoints to checkpoint_dir (train.py:146-157)
                start = self.resume(
                    from_dir=cfg.resume if isinstance(cfg.resume, str)
                    else None,
                    restore_opt=cfg.restore_opt)
            else:
                self.init_state()
                start = cfg.start_epoch
        else:
            start = cfg.start_epoch
        t0 = time.time()
        last = {}
        for epoch in range(start, cfg.end_epoch):
            te = time.time()
            # `or last`: an epoch stopped before its first step (preemption
            # raced the loop top) has no metrics; keep the previous ones
            last = self.train_epoch(epoch) or last
            logger.info("epoch %d done in %.1fs", epoch, time.time() - te)
            if self._preempt.is_set():
                # Early stop: save a FULL resumable checkpoint.  A signal
                # that lands after the epoch's last step interrupted
                # nothing — tag partial only when steps remain, else a
                # restore_opt resume would re-train the whole epoch on an
                # optimizer state that already includes it.
                steps_done = int(self.state.step)
                partial = steps_done < (epoch + 1) * self.steps_per_epoch
                self.ckpt.save(epoch, self.state.params,
                               self.state.opt_state,
                               steps_done, partial=partial)
                self.ckpt.wait()
                self.preempted = True
                logger.info("preempted: full state saved at epoch %d "
                            "step %d (%s); resume with restore_opt",
                            epoch, steps_done,
                            "mid-epoch" if partial else "epoch complete")
                return last
            if should_save(epoch, cfg.save_freq, cfg.end_epoch):
                self.ckpt.save(epoch, self.state.params,
                               self.state.opt_state,
                               int(self.state.step))
                if eval_fn is not None:
                    eval_fn(self, epoch)
        # final save (train.py:256-263)
        self.ckpt.save(cfg.end_epoch, self.state.params,
                       self.state.opt_state, int(self.state.step))
        self.ckpt.wait()
        logger.info("The total training time is %.2f hours",
                    (time.time() - t0) / 3600)
        return last


def ocp_abstract(x):
    return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)


def _seed_schedule_count(opt_state, count: int):
    """Replace every ScaleByScheduleState count in an optax.chain state."""
    def fix(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(count, s.count.dtype))
        return s
    return tuple(fix(s) for s in opt_state)
