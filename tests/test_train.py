"""Training subsystem tests: optimizer parity, schedule, multi-device step,
checkpoint round-trip, overfit-one-volume integration."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch

from dctseg.config import Config, DataConfig, TrainConfig, tiny_model_config
from dctseg.data.brats import BraTSDataset
from dctseg.parallel.mesh import make_mesh
from dctseg.train.checkpoint import should_save
from dctseg.train.optim import make_optimizer, poly_schedule
from dctseg.train.trainer import Trainer


def test_poly_schedule_matches_reference_formula():
    sched = poly_schedule(2e-4, 1000, steps_per_epoch=10, power=0.9)
    for epoch in (0, 1, 137, 999):
        got = float(sched(jnp.asarray(epoch * 10 + 3)))
        want = round(2e-4 * np.power(1 - epoch / 1000, 0.9), 8)
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_poly_schedule_amp_restart():
    """train_amp.py:272-278: epochs past 249 restart the decay."""
    sched = poly_schedule(2e-4, 1000, 1, power=0.9, restart_epoch=249)
    np.testing.assert_allclose(
        float(sched(jnp.asarray(300))),
        round(2e-4 * np.power(1 - 51 / 1000, 0.9), 8), atol=1e-12)


def test_optimizer_matches_torch_adam_amsgrad():
    """Our optax chain must track torch.optim.Adam(weight_decay, amsgrad)."""
    w0 = np.random.default_rng(0).normal(size=(7,)).astype(np.float32)

    # torch
    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=1e-2, amsgrad=True)
    for i in range(5):
        opt.zero_grad()
        loss = ((wt - 3.0) ** 2).sum()
        loss.backward()
        opt.step()

    # ours (constant schedule to isolate the transform)
    cfg = TrainConfig(lr=1e-2, weight_decay=1e-2, amsgrad=True,
                      end_epoch=10**9, poly_power=0.9)
    tx = make_optimizer(cfg, steps_per_epoch=10**9)
    wj = jnp.asarray(w0)
    state = tx.init(wj)
    for i in range(5):
        g = jax.grad(lambda w: ((w - 3.0) ** 2).sum())(wj)
        upd, state = tx.update(g, state, wj)
        wj = optax.apply_updates(wj, upd)
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=2e-4, atol=2e-5)


def test_should_save_matches_reference_predicate():
    # save_freq=50, end=1000 -> epochs 49, 99, ... and 996, 997, 998
    saves = [e for e in range(1000) if should_save(e, 50, 1000)]
    assert 49 in saves and 99 in saves and 949 in saves
    assert 996 in saves and 997 in saves and 998 in saves
    assert 0 not in saves and 995 not in saves


def _tiny_trainer(tmp_path, end_epoch=1, num_devices=1, samples=2,
                  **train_kw):
    cfg = Config(
        model=tiny_model_config(img_dim=16, top_num=2),
        data=DataConfig(synthetic_num_samples=samples,
                        input_shape=(24, 24, 20), pad_depth=20,
                        crop_size=(16, 16, 16), num_workers=2),
        train=TrainConfig(end_epoch=end_epoch, save_freq=1000,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          num_devices=num_devices, lr=1e-3, **train_kw),
    )
    return Trainer(cfg)


def test_single_device_training_reduces_loss(tmp_path):
    tr = _tiny_trainer(tmp_path, end_epoch=1, samples=2)
    tr.init_state()
    first = tr.train_epoch(0)
    for e in range(1, 6):
        last = tr.train_epoch(e)
    assert last["loss"] < first["loss"], (first["loss"], last["loss"])
    assert np.isfinite(last["loss"])


def test_multi_device_data_parallel_step(tmp_path):
    """8-virtual-device CPU mesh: sharded batch, replicated params."""
    assert jax.device_count() >= 8
    tr = _tiny_trainer(tmp_path, end_epoch=1, num_devices=8, samples=8)
    assert tr.global_batch == 8
    tr.init_state()
    metrics = tr.train_epoch(0)
    assert np.isfinite(metrics["loss"])
    # params stay replicated after the step
    leaf = jax.tree.leaves(tr.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_multi_vs_single_device_equivalence(tmp_path):
    """The same global batch gives the same loss on 1 and 8 devices."""
    t1 = _tiny_trainer(tmp_path / "a", end_epoch=1, num_devices=1, samples=8)
    t8 = _tiny_trainer(tmp_path / "b", end_epoch=1, num_devices=8, samples=8)
    # force identical global batch: single-device trainer with batch 8
    t1.global_batch = 8
    t1.loader.batch_size = 8
    t1.init_state()
    t8.init_state()
    # identical init (same seed) -> copy params across
    t8.state = t8.state._replace(params=jax.device_put(
        jax.tree.map(np.asarray, t1.state.params),
        jax.tree.leaves(t8.state.params)[0].sharding))
    m1 = t1.train_epoch(0)
    m8 = t8.train_epoch(0)
    np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=1e-4)


def test_grad_accum_matches_full_batch(tmp_path):
    """grad_accum (lax.scan micro-batching) must implement its definition:
    the mean of per-micro-batch gradients with interleaved rows ({r : r %
    ga == j}) and per-micro dropout keys — which is exactly the
    reference's DDP semantics (per-GPU loss on local rows, averaged
    gradients, train.py:134) when micro-batch == per-GPU batch.  Checked
    tightly against a python-loop oracle; the single full-batch pass is
    only NEAR-equal (the dice losses couple the batch through global
    sums), checked loosely."""
    import optax
    from dctseg.config import tiny_model_config
    from dctseg.losses import CRITERIA, total_loss
    from dctseg.models.clswiseformer import build_model
    from dctseg.train.trainer import TrainState, make_train_step

    model = build_model(tiny_model_config(img_dim=16, top_num=2))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 16, 4)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 4, size=(4, 16, 16, 16)), jnp.uint8)
    edge = jnp.asarray(rng.integers(0, 8, size=(4, 16, 16, 16)), jnp.uint8)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k},
        x[:1], train=True))(key)
    crit = CRITERIA["softmax_dice"]
    tx = optax.sgd(1e-2)

    def run(ga):
        step = jax.jit(make_train_step(model, tx, crit, grad_accum=ga))
        st = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))
        return step(st, x, tgt, edge, key)

    st1, m1 = run(1)

    # oracle for ga=2: python-loop mean of micro-gradients, same row
    # interleave and key split as the scan path
    def loss_fn(p, xm, tm, em, k):
        outs = model.apply(p, xm, train=True, rngs={"dropout": k})
        return total_loss(outs, tm.astype(jnp.int32),
                          em.astype(jnp.int32), crit)["loss"]
    keys = jax.random.split(key, 2)
    grad = jax.jit(jax.grad(loss_fn))
    gs = [grad(params, x[j::2], tgt[j::2], edge[j::2], keys[j])
          for j in range(2)]
    want = jax.tree.map(lambda a, b: (a + b) / 2, *gs)
    expect_params = optax.apply_updates(
        params, tx.update(want, tx.init(params), params)[0])

    st2, m2 = run(2)
    for a, b in zip(jax.tree.leaves(expect_params),
                    jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-5, atol=1e-7)
    # metrics cover the same rows (row order restored after the scan)
    np.testing.assert_array_equal(np.asarray(m2["pred_counts"]),
                                  np.asarray(m1["pred_counts"]))
    np.testing.assert_allclose(m2["dice_wt"], m1["dice_wt"], rtol=1e-4)
    # near-equality vs one full-batch pass (batch-coupled dice sums make
    # this approximate by construction, not a bug)
    np.testing.assert_allclose(m2["loss"], m1["loss"], rtol=1e-3)
    for a, b in zip(jax.tree.leaves(st1.params),
                    jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-4)


def test_grad_accum_multi_device_equivalence(tmp_path):
    """grad_accum's micro-batch reshape must stay shard-local under real
    meshes (each device's contiguous row block contributes bs/ga rows to
    every micro-batch): the same global batch with grad_accum=2 must give
    the same loss on 1 device, on an 8-device data mesh, and on a dp x sp
    (4x2) spatially-sharded mesh."""
    assert jax.device_count() >= 8
    t1 = _tiny_trainer(tmp_path / "a", num_devices=1, samples=16,
                       batch_size=16, grad_accum=2)
    t8 = _tiny_trainer(tmp_path / "b", num_devices=8, samples=16,
                       batch_size=2, grad_accum=2)
    tsp = _tiny_trainer(tmp_path / "c", num_devices=8, samples=16,
                        batch_size=4, grad_accum=2, spatial_shards=2)
    assert t1.global_batch == t8.global_batch == tsp.global_batch == 16
    t1.init_state()
    for t in (t8, tsp):
        t.init_state()
        t.state = t.state._replace(params=jax.device_put(
            jax.tree.map(np.asarray, t1.state.params),
            jax.tree.leaves(t.state.params)[0].sharding))
    m1 = t1.train_epoch(0)
    np.testing.assert_allclose(t8.train_epoch(0)["loss"], m1["loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(tsp.train_epoch(0)["loss"], m1["loss"],
                               rtol=1e-4)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    tr = _tiny_trainer(tmp_path, end_epoch=1)
    tr.init_state()
    tr.train_epoch(0)
    tr.ckpt.save(0, tr.state.params, tr.state.opt_state, 5)
    tr.ckpt.wait()

    tr2 = _tiny_trainer(tmp_path, end_epoch=1)
    tr2.init_state()
    start = tr2.resume()
    assert start == 0  # params-only resume: epoch comes from config
    a = jax.tree.leaves(tr.state.params)
    b = jax.tree.leaves(tr2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # full resume restores epoch
    tr3 = _tiny_trainer(tmp_path, end_epoch=1)
    tr3.init_state()
    start = tr3.resume(restore_opt=True)
    assert start == 1


def test_preemption_signal_saves_full_resumable_state(tmp_path):
    """SIGTERM during fit() (a TPU-pod preemption) must finish the
    in-flight step, save a FULL checkpoint (params+opt_state+step) tagged
    partial, and return; --restore-opt resume then re-runs the
    interrupted epoch from the saved optimizer state."""
    import signal
    import threading

    prev_handler = signal.getsignal(signal.SIGTERM)
    tr = _tiny_trainer(tmp_path, end_epoch=50, samples=4)
    # 50 epochs of real steps take far longer than the timer, so the
    # signal always lands mid-fit; every later assertion is
    # timing-independent (any number of completed steps is valid).
    threading.Timer(1.0, os.kill, (os.getpid(), signal.SIGTERM)).start()
    tr.fit()
    assert tr.preempted
    assert signal.getsignal(signal.SIGTERM) is prev_handler  # restored

    saved_epoch = tr.ckpt.latest_epoch()
    assert saved_epoch is not None and saved_epoch < 49

    tr2 = _tiny_trainer(tmp_path, end_epoch=50, restore_opt=True)
    tr2.init_state()
    start = tr2.resume(restore_opt=True)
    # partial (mid-epoch) save re-runs the epoch; a signal that landed
    # exactly at the epoch boundary interrupted nothing and resumes at +1
    boundary = (saved_epoch + 1) * tr.steps_per_epoch
    assert start == (saved_epoch if int(tr.state.step) < boundary
                     else saved_epoch + 1)
    assert int(tr2.state.step) == int(tr.state.step)
    for x, y in zip(jax.tree.leaves(tr.state.opt_state),
                    jax.tree.leaves(tr2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # the re-run epoch's regular save lands on the occupied step number:
    # it must supersede the stale partial save, not raise
    # StepAlreadyExistsError
    tr2.ckpt.save(saved_epoch, tr2.state.params, tr2.state.opt_state,
                  int(tr2.state.step))
    tr2.ckpt.wait()
    tr3 = _tiny_trainer(tmp_path, end_epoch=50)
    tr3.init_state()
    assert tr3.resume(restore_opt=True) == saved_epoch + 1  # non-partial now


def test_resume_from_other_dir_seeds_lr_schedule(tmp_path):
    """--resume <dir> must restore from THAT directory (reference --load
    capability, train.py:146-157) while saving to checkpoint_dir, and a
    params-only resume at start_epoch>0 must run at the poly LR of that
    epoch, not restart from epoch 0 (ADVICE r1)."""
    import optax

    tr = _tiny_trainer(tmp_path / "a", end_epoch=20)
    tr.init_state()
    tr.train_epoch(0)
    tr.ckpt.save(0, tr.state.params, tr.state.opt_state, 5)
    tr.ckpt.wait()

    tr2 = _tiny_trainer(tmp_path / "b", end_epoch=20, start_epoch=10,
                        resume=str(tmp_path / "a" / "ckpt"))
    tr2.init_state()
    start = tr2.resume(from_dir=tr2.cfg.train.resume)
    assert start == 10
    # params came from dir a
    for x, y in zip(jax.tree.leaves(tr.state.params),
                    jax.tree.leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # new checkpoints still go to dir b
    assert tr2.ckpt.directory.startswith(str(tmp_path / "b"))
    # LR schedule seeded at start_epoch; Adam moments stay fresh
    offset = 10 * tr2.steps_per_epoch
    assert int(tr2.state.step) == offset
    sched_counts = [int(s.count) for s in tr2.state.opt_state
                    if isinstance(s, optax.ScaleByScheduleState)]
    assert sched_counts == [offset]
    adam_counts = [int(s["count"]) for s in tr2.state.opt_state
                   if isinstance(s, dict) and "count" in s]
    assert adam_counts == [0]


def test_train_cli_build_config():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import importlib
    train_mod = importlib.import_module("train")
    a = train_mod.parse_args(["--amp", "--end-epoch", "7", "--img-dim", "32",
                              "--lr", "3e-4"])
    cfg = train_mod.build_config(a)
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.model.top_num == 8          # derived for img_dim 32
    assert cfg.train.amp_lr_restart_epoch == 249
    assert cfg.train.end_epoch == 7 and cfg.train.lr == 3e-4
    # the data crop follows the model geometry
    assert cfg.data.crop_size == (32, 32, 32)
    # measured remat defaults (docs/PERF.md round-4 sweep): no remat under
    # --amp (fits at bf16 and is 23% faster), full-block remat for fp32
    assert cfg.model.remat is False
    a2 = train_mod.parse_args(["--amp", "--no-amp-lr-quirk"])
    assert train_mod.build_config(a2).train.amp_lr_restart_epoch is None
    assert train_mod.build_config(train_mod.parse_args([])).model.remat
    a_override = train_mod.parse_args(["--amp", "--remat-policy",
                                       "save_convs"])
    cfg_o = train_mod.build_config(a_override)
    assert cfg_o.model.remat and cfg_o.model.remat_policy == "save_convs"
    a3 = train_mod.parse_args(["--img-dim", "32", "--input-shape",
                               "48", "48", "40"])
    cfg3 = train_mod.build_config(a3)
    assert cfg3.data.input_shape == (48, 48, 40)
    assert cfg3.data.pad_depth == 40 and cfg3.data.crop_size == (32,) * 3


def test_device_prefetch_matches_synchronous(tmp_path):
    """The H2D double-buffer feeder (TrainConfig.device_prefetch) must be a
    pure latency optimization: identical batches in identical order, so an
    epoch produces bitwise the same loss as synchronous placement."""
    t_sync = _tiny_trainer(tmp_path / "s", end_epoch=1, samples=4,
                           device_prefetch=0)
    t_pre = _tiny_trainer(tmp_path / "p", end_epoch=1, samples=4,
                          device_prefetch=2)
    t_sync.init_state()
    t_pre.init_state()
    m_sync = t_sync.train_epoch(0)
    m_pre = t_pre.train_epoch(0)
    assert m_pre["loss"] == m_sync["loss"], (m_pre["loss"], m_sync["loss"])
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(t_pre.state.params)[0]),
        np.asarray(jax.tree.leaves(t_sync.state.params)[0]))


def test_spatial_sharding_matches_data_parallel(tmp_path):
    """2-D (data=2, space=4) mesh: each sample's D axis is sharded over 4
    devices (GSPMD conv halo exchange).  Same global batch + params as the
    pure-DP run must give the same loss, and params stay replicated."""
    t_dp = _tiny_trainer(tmp_path / "dp", end_epoch=1, num_devices=2,
                         samples=2)
    t_sp = _tiny_trainer(tmp_path / "sp", end_epoch=1, num_devices=8,
                         samples=2, spatial_shards=4)
    assert t_sp.mesh.shape == {"data": 2, "space": 4}
    assert t_sp.global_batch == 2  # batch scales with data shards only
    t_dp.init_state()
    t_sp.init_state()
    t_sp.state = t_sp.state._replace(params=jax.device_put(
        jax.tree.map(np.asarray, t_dp.state.params),
        jax.tree.leaves(t_sp.state.params)[0].sharding))
    m_dp = t_dp.train_epoch(0)
    m_sp = t_sp.train_epoch(0)
    np.testing.assert_allclose(m_sp["loss"], m_dp["loss"], rtol=1e-4)
    leaf = jax.tree.leaves(t_sp.state.params)[0]
    assert leaf.sharding.is_fully_replicated
