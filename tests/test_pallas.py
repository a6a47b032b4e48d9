"""Pallas kernel tests (interpret mode on CPU; real-TPU runs are exercised
by the TPU verification drives and bench)."""

import numpy as np
import jax
import jax.numpy as jnp

from dctseg.ops.pallas.attention import fused_attention


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def test_fused_attention_matches_einsum_interpret():
    rng = np.random.default_rng(0)
    for (b, h, n, d) in [(1, 8, 129, 64), (2, 4, 33, 16)]:
        q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
        scale = d ** -0.5
        got = fused_attention(q, k, v, scale, interpret=True)
        want = _ref_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_model_with_pallas_flag_interpret(monkeypatch):
    """The model's use_pallas path must produce the same output as the
    einsum path (eval mode)."""
    import dctseg.ops.pallas.attention as pa
    orig = pa.fused_attention
    monkeypatch.setattr(
        pa, "fused_attention",
        lambda q, k, v, scale: orig(q, k, v, scale, interpret=True))

    from dctseg.config import tiny_model_config
    from dctseg.models.clswiseformer import build_model

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 32, 32, 32, 4))
    m_ref = build_model(tiny_model_config())
    params = m_ref.init({"params": key, "dropout": key}, x, train=False)
    m_pl = build_model(tiny_model_config(use_pallas_attention=True))
    a = m_ref.apply(params, x, train=False)[0]
    b = m_pl.apply(params, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fused_attention_gradients_match_einsum(monkeypatch):
    import dctseg.ops.pallas.attention as pa
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 17, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 17, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 17, 8)).astype(np.float32))
    scale = 8 ** -0.5

    def loss_pallas(q, k, v):
        return jnp.sum(pa.fused_attention(q, k, v, scale, True) ** 2)

    def loss_einsum(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, scale) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(loss_einsum, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, ge):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_model_trains_with_pallas_attention(monkeypatch):
    """Gradient flow through the pallas path inside the full model."""
    import dctseg.ops.pallas.attention as pa
    orig = pa._fused_attention_impl
    monkeypatch.setattr(pa, "_fused_attention_impl",
                        lambda q, k, v, s, i=False: orig(q, k, v, s, True))

    from dctseg.config import tiny_model_config
    from dctseg.models.clswiseformer import build_model
    from dctseg.losses import total_loss

    cfg = tiny_model_config(img_dim=16, top_num=2,
                            use_pallas_attention=True)
    m = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 16, 4))
    tgt = jnp.zeros((1, 16, 16, 16), jnp.int32).at[0, 4:10].set(2)
    edg = jnp.zeros((1, 16, 16, 16), jnp.int32).at[0, 4].set(2)
    params = m.init({"params": key, "dropout": key}, x, train=False)

    def loss_fn(p):
        outs = m.apply(p, x, train=True, rngs={"dropout": key})
        return total_loss(outs, tgt, edg)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    qkv = grads["params"]["transformer_01"]["cross"]["attn"]["qkv"]
    assert float(jnp.abs(qkv["Dense_0"]["kernel"]).max()) > 0


def test_fused_instance_norm_act_matches_xla_interpret():
    """The 2-pass fused norm kernel (stats + normalize/act/residual) must
    match the plain-XLA composition on both plain and s2d-view layouts,
    all activation modes, with and without residual."""
    from dctseg.ops.pallas import fusednorm
    rng = np.random.default_rng(0)
    for shape, fine in [((2, 4, 4, 4, 16), 16),    # plain: stats per lane
                        ((2, 4, 4, 4, 32), 4),     # s2d view: 8 offsets
                        ((1, 8, 8, 8, 24), 3)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 3 + 1)
        res = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        for act in ("none", "relu", "lrelu"):
            for r in (None, res):
                got = fusednorm.fused_instance_norm_act(
                    x, fine, act=act, residual=r, impl="interpret",
                    tile_s=32)
                want = fusednorm._xla_reference(x, fine, 1e-5, act,
                                                0.01, r)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), rtol=2e-6,
                    atol=2e-6, err_msg=f"{shape} {act} res={r is not None}")


def test_fused_norm_xla_reference_matches_ops_norms():
    """The kernel's XLA twin must match the model's existing norm ops
    (the parity-proven definitions) — rounding-close: it flattens the
    spatial axes before reducing, so the f32 reduction tree differs."""
    from dctseg.ops.pallas import fusednorm
    from dctseg.ops.norms import instance_norm, leaky_relu
    from dctseg.ops import s2d as s2dops
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 6, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fusednorm._xla_reference(x, 16, 1e-5, "lrelu", 0.01,
                                            None)),
        np.asarray(leaky_relu(instance_norm(x))), rtol=1e-4, atol=2e-6)
    x8 = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 32)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fusednorm._xla_reference(x8, 4, 1e-5, "none", 0.01,
                                            None)),
        np.asarray(s2dops.instance_norm_s2d(x8)), rtol=1e-6, atol=1e-7)


def test_fused_norm_bf16_and_ragged_fallback():
    """bf16 inputs keep f32 statistics; spatial sizes with no valid tile
    fall back to the XLA path instead of failing."""
    from dctseg.ops.pallas import fusednorm
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8, 16))
                    .astype(np.float32)).astype(jnp.bfloat16)
    got = fusednorm.fused_instance_norm_act(x, 2, act="lrelu",
                                            impl="interpret", tile_s=32)
    want = fusednorm._xla_reference(x, 2, 1e-5, "lrelu", 0.01, None)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.02, atol=0.02)
    # ragged: 3*3*3 spatial has no multiple-of-8 tile -> XLA path, exact
    xr = jnp.asarray(rng.normal(size=(1, 3, 3, 3, 8)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(fusednorm.fused_instance_norm_act(
            xr, 8, act="relu", impl="interpret")),
        np.asarray(fusednorm._xla_reference(xr, 8, 1e-5, "relu", 0.01,
                                            None)))


def test_model_with_fused_norms_interpret(monkeypatch):
    """ModelConfig(fused_norms=True) must reproduce the XLA model's probs
    (rounding-close) on the tiny config, and the Trainer must reject the
    flag (inference-only, no VJP)."""
    import dataclasses
    import pytest
    from dctseg.ops.pallas import fusednorm
    orig = fusednorm.fused_instance_norm_act
    monkeypatch.setattr(
        fusednorm, "fused_instance_norm_act",
        lambda *a, **k: orig(*a, **{**k, "impl": "interpret"}))

    from dctseg.config import tiny_model_config, Config, DataConfig, \
        TrainConfig
    from dctseg.models.clswiseformer import build_model
    cfg = tiny_model_config(img_dim=16, top_num=2)
    cfg_f = dataclasses.replace(cfg, fused_norms=True)
    mf, mn = build_model(cfg_f), build_model(cfg)
    x = jnp.asarray(np.random.default_rng(3)
                    .normal(size=(1, 16, 16, 16, 4)).astype(np.float32))
    params = mn.init(jax.random.PRNGKey(0), x, train=False)
    pn = np.asarray(mn.apply(params, x, train=False)[0])
    pf = np.asarray(mf.apply(params, x, train=False)[0])
    np.testing.assert_allclose(pf, pn, atol=1e-4)

    from dctseg.train.trainer import Trainer
    tcfg = Config(
        model=cfg_f,
        data=DataConfig(synthetic_num_samples=2, input_shape=(16, 16, 16),
                        pad_depth=16, crop_size=(16, 16, 16)),
        train=TrainConfig(end_epoch=1))
    with pytest.raises(AssertionError, match="inference-only"):
        Trainer(tcfg)


def test_pallas_space_to_depth_bit_identical_interpret():
    """The relayout kernel is a pure permutation (+ cast): bit-identical
    to s2dops.space_to_depth at both encoder call-site shapes."""
    from dctseg.ops import s2d as s2dops
    from dctseg.ops.pallas import relayout
    rng = np.random.default_rng(0)
    for shape, in_dt, out_dt in [
            ((2, 4, 32, 32, 4), np.float32, jnp.bfloat16),   # input s2d
            ((2, 4, 32, 32, 4), np.float32, None),
            ((1, 4, 32, 4, 32), np.float32, jnp.bfloat16),   # half_in s2d
    ]:
        x = jnp.asarray(rng.normal(size=shape).astype(in_dt))
        if out_dt is not None and out_dt == jnp.bfloat16:
            x_b = x.astype(jnp.bfloat16)
            for xi in (x, x_b):   # f32 and bf16 inputs
                got = relayout.space_to_depth(xi, jnp.bfloat16,
                                              "interpret")
                want = s2dops.space_to_depth(xi.astype(jnp.bfloat16))
                assert got.dtype == want.dtype
                np.testing.assert_array_equal(
                    np.asarray(got.astype(jnp.float32)),
                    np.asarray(want.astype(jnp.float32)))
        else:
            got = relayout.space_to_depth(x, out_dt, "interpret")
            want = s2dops.space_to_depth(x)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_space_to_depth_fallback_and_grad():
    """Ragged shapes fall back to XLA (identical); the custom VJP matches
    the XLA path's gradient."""
    from dctseg.ops import s2d as s2dops
    from dctseg.ops.pallas import relayout
    rng = np.random.default_rng(1)
    # w*c = 24 not a lane multiple -> XLA fallback, still exact
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 6, 4)).astype(np.float32))
    got = relayout.space_to_depth(x, None, "interpret")
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(s2dops.space_to_depth(x)))

    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 4)).astype(np.float32))
    ct = jnp.asarray(rng.normal(
        size=(1, 2, 16, 16, 32)).astype(np.float32))

    def f_pl(x_):
        return jnp.sum(relayout.space_to_depth(
            x_, jnp.bfloat16, "interpret").astype(jnp.float32) * ct)

    def f_xla(x_):
        return jnp.sum(s2dops.space_to_depth(
            x_.astype(jnp.bfloat16)).astype(jnp.float32) * ct)

    g_pl = jax.grad(f_pl)(x)
    g_xla = jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla),
                               rtol=0, atol=0)
