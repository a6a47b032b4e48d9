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
