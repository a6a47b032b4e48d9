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
