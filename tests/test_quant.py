"""int8 dynamic post-training quantization (dctseg/ops/quant.py).

The quantized conv path is a pure execution strategy: the param tree must
be bit-identical to the float model's, the int32 accumulation must be
exact (oracle-checked), and the end-to-end probability drift on the full
model must stay within int8 rounding noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dctseg.config import tiny_model_config
from dctseg.models.clswiseformer import build_model
from dctseg.ops import quant


def test_conv3d_int8_matches_dequant_oracle():
    """The op must compute exactly round(x/sx)*round(w/sw) * sx*sw with
    int32 accumulation — checked against an explicit numpy oracle."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 6, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32))
    got = np.asarray(quant.conv3d_int8(x, w), np.float32)

    sx = np.abs(np.asarray(x)).max() / 127.0
    xq = np.clip(np.round(np.asarray(x) / sx), -127, 127)
    sw = np.abs(np.asarray(w)).max(axis=(0, 1, 2, 3)) / 127.0
    wq = np.clip(np.round(np.asarray(w) / sw), -127, 127)
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(wq, jnp.float32),
        (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    want = np.asarray(acc) * (sx * sw)
    # both sides hold exact integers <= 27*8*127^2 ~ 3.5e6 in f32/i32
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_conv3d_int8_error_within_rounding_noise():
    """Relative RMS error vs the float conv must be at the int8 SNR level
    (~1% for well-scaled inputs), not sign-flip level."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 32)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 3, 32, 32)) * 0.1)
                    .astype(np.float32))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))
    got = np.asarray(quant.conv3d_int8(x, w), np.float32)
    rel_rms = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel_rms < 0.02, rel_rms


def _tiny_pair(seed=0):
    cfg_f = tiny_model_config(img_dim=16, top_num=2)
    import dataclasses
    cfg_q = dataclasses.replace(cfg_f, quantize="int8")
    mf, mq = build_model(cfg_f), build_model(cfg_q)
    key = jax.random.PRNGKey(seed)
    x = jnp.asarray(np.random.default_rng(seed)
                    .normal(size=(1, 16, 16, 16, 4)).astype(np.float32))
    params = jax.jit(lambda k: mf.init(k, x, train=False))(key)
    return mf, mq, params, x


def test_quantize_is_pure_execution_strategy():
    """Same seed, quantize on/off: the param trees must be IDENTICAL
    (paths, shapes, and values) — checkpoints are interchangeable."""
    mf, mq, params, x = _tiny_pair()
    params_q = jax.jit(lambda k: mq.init(k, x, train=False))(
        jax.random.PRNGKey(0))
    flat_f = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_q = jax.tree_util.tree_flatten_with_path(params_q)[0]
    assert [p for p, _ in flat_f] == [p for p, _ in flat_q]
    for (_, a), (_, b) in zip(flat_f, flat_q):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_model_probs_close_to_float():
    """Full ClsWiseFormer forward with int8 PTQ vs float on shared params:
    probability drift bounded, argmax agreement high.  (Every quantized
    conv is followed by affine-free InstanceNorm, which cancels the
    per-channel scale component of the error — only rounding noise
    propagates.)"""
    mf, mq, params, x = _tiny_pair()
    pf = np.asarray(jax.jit(
        lambda p, v: mf.apply(p, v, train=False)[0])(params, x), np.float32)
    pq = np.asarray(jax.jit(
        lambda p, v: mq.apply(p, v, train=False)[0])(params, x), np.float32)
    assert pq.shape == pf.shape
    drift = np.abs(pq - pf)
    assert drift.mean() < 0.01, drift.mean()
    agree = (pq.argmax(-1) == pf.argmax(-1)).mean()
    assert agree > 0.98, agree


def test_quantize_spec_grammar():
    """enabled() parses the op-class spec and fails loudly on typos."""
    import pytest
    assert not quant.enabled("none", "conv3")
    assert not quant.enabled("", "pw")
    assert quant.enabled("int8", "conv3")
    assert not quant.enabled("int8", "pw")
    assert not quant.enabled("int8", "deconv")
    assert quant.enabled("int8+pw", "pw")
    assert quant.enabled("int8+pw", "conv3")
    assert not quant.enabled("int8+pw", "down")
    assert quant.enabled("int8+pw+deconv+down", "down")
    for op in quant.OP_CLASSES:
        assert quant.enabled("int8_all", op)
    with pytest.raises(ValueError, match="unknown quantize"):
        quant.enabled("int8+pointwise", "pw")
    with pytest.raises(ValueError, match="unknown quantize"):
        quant.enabled("fp8", "conv3")
    with pytest.raises(ValueError, match="op class"):
        quant.enabled("int8", "matmul")


def test_int8_all_is_pure_execution_strategy_with_bounded_drift():
    """quantize='int8_all' (pointwise + deconv + stride-2 convs in int8
    too) must keep the identical param tree and stay within PTQ rounding
    noise of the float model — the correctness side of the r5 residue
    measurement (speed is measured on chip, docs/PERF.md)."""
    import dataclasses
    mf, _, params, x = _tiny_pair()
    cfg_a = dataclasses.replace(tiny_model_config(img_dim=16, top_num=2),
                                quantize="int8_all")
    ma = build_model(cfg_a)
    params_a = jax.jit(lambda k: ma.init(k, x, train=False))(
        jax.random.PRNGKey(0))
    flat_f = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(params_a)[0]
    assert [p for p, _ in flat_f] == [p for p, _ in flat_a]
    pf = np.asarray(jax.jit(
        lambda p, v: mf.apply(p, v, train=False)[0])(params, x), np.float32)
    pa = np.asarray(jax.jit(
        lambda p, v: ma.apply(p, v, train=False)[0])(params, x), np.float32)
    drift = np.abs(pa - pf)
    assert drift.mean() < 0.015, drift.mean()
    agree = (pa.argmax(-1) == pf.argmax(-1)).mean()
    assert agree > 0.97, agree


def test_trainer_rejects_quantized_config(tmp_path):
    import dataclasses
    import pytest
    from dctseg.config import Config, DataConfig, TrainConfig
    from dctseg.train.trainer import Trainer
    cfg = Config(
        model=dataclasses.replace(tiny_model_config(img_dim=16, top_num=2),
                                  quantize="int8"),
        data=DataConfig(synthetic_num_samples=2, input_shape=(16, 16, 16),
                        pad_depth=16, crop_size=(16, 16, 16)),
        train=TrainConfig(end_epoch=1,
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )
    with pytest.raises(AssertionError, match="inference-only"):
        Trainer(cfg)


def test_fold_params_bit_exact_and_swappable():
    """Predictor(fold_params=True) bakes the parameters into the forward
    executable so XLA constant-folds the apply-time weight work (s2d
    kernel transforms + int8 per-channel weight quantization) once at
    compile time.  The folder evaluates those transforms in a different
    op order than the fused runtime program, so the float model is
    rounding-close (~1e-6 on f32 probs), not bit-exact — the same
    numerics class as any recompilation.  Under int8 a 1-ulp difference
    in a folded per-channel scale can flip individual weight roundings
    (weights sitting on a .5 boundary), so the folded int8 network is a
    slightly different — same accuracy class — quantization of the same
    float weights; bounded like the int8-vs-float drift test above.
    update_params must rebuild the folded executable (sweep correctness
    over speed)."""
    mf, mq, params, x = _tiny_pair()
    from dctseg.infer.engine import Predictor
    for model, atol in ((mf, 1e-5), (mq, None)):
        base = Predictor(model, params)
        fold = Predictor(model, params, fold_params=True)

        def check(a, b):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            if atol is not None:
                np.testing.assert_allclose(a, b, atol=atol)
            else:
                assert np.abs(a - b).mean() < 0.01
                assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.98

        check(base.seg_probs(x), fold.seg_probs(x))
        # checkpoint swap: the folded executable must track the new params
        params2 = jax.tree.map(lambda a: a * 1.5, params)
        base.update_params(params2)
        fold.update_params(params2)
        check(base.seg_probs(x), fold.seg_probs(x))


def test_spatial_gate_skips_quant_below_threshold(monkeypatch):
    """Conv3d(spatial_gate=True) must run the FLOAT conv when the
    per-item spatial volume is below quant.MIN_SPATIAL_ELEMS and the
    int8 conv at/above it.  The gate ships INERT (threshold 0) — both
    gate variants measured slower whole-model on chip (docs/PERF.md r5
    "int8 residue") — so the shipped default must quantize everywhere,
    and the opt-in must only bite when the threshold is raised.
    Checked by output comparison against the ungated float/int8 paths
    on shared params."""
    from dctseg.models.layers import Conv3d
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 64)).astype(np.float32))

    def out(quantize, spatial_gate):
        m = Conv3d(64, dtype=jnp.float32, quantize=quantize,
                   spatial_gate=spatial_gate)
        p = m.init(jax.random.PRNGKey(0), x)
        return np.asarray(m.apply(p, x), np.float32)

    y_float = out("none", False)
    y_int8 = out("int8", False)
    assert np.abs(y_int8 - y_float).max() > 1e-4  # int8 really differs

    # shipped default (threshold 0): gate inert even when opted in
    assert quant.MIN_SPATIAL_ELEMS == 0
    np.testing.assert_array_equal(out("int8", True), y_int8)
    # raised threshold, below it (4^3 < 33^3): gated conv is bit-float
    monkeypatch.setattr(quant, "MIN_SPATIAL_ELEMS", 33 ** 3)
    np.testing.assert_array_equal(out("int8", True), y_float)
    # ... but only for instances that opted in
    np.testing.assert_array_equal(out("int8", False), y_int8)
    # at/above the (monkeypatched tiny) threshold: int8 flows again
    monkeypatch.setattr(quant, "MIN_SPATIAL_ELEMS", 4 ** 3)
    np.testing.assert_array_equal(out("int8", True), y_int8)
