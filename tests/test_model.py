"""Model-level tests on the tiny config (fast CPU compile)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dctseg.config import ModelConfig, tiny_model_config
from dctseg.models.clswiseformer import build_model, REGIONS


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_model_config()
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 32, 32, 32, 4))
    params = model.init({"params": key, "dropout": key}, x, train=False)
    return cfg, model, params, x


def test_forward_shapes_and_probabilities(tiny):
    cfg, model, params, x = tiny
    seg, sup, esup, msup, mesup = model.apply(params, x, train=False)
    d = cfg.img_dim
    assert seg.shape == (1, d, d, d, cfg.num_classes)
    np.testing.assert_allclose(np.asarray(seg.sum(-1)), 1.0, atol=1e-4)
    for dct in (sup, esup, msup, mesup):
        assert set(dct) == set(REGIONS)
        for v in dct.values():
            assert v.shape == (1, d, d, d, 2)
            np.testing.assert_allclose(np.asarray(v.sum(-1)), 1.0, atol=1e-4)


def test_full_size_param_count_matches_reference():
    """The default config reproduces the reference network exactly:
    16,824,556 parameters (measured from the reference model;
    predict_simple.py:319 prints this sum at eval)."""
    model = build_model(ModelConfig())
    params = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 128, 128, 128, 4)),
                             train=False),
        jax.random.PRNGKey(0))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == 16_824_556


def test_batch_consistency(tiny):
    """B=2 forward equals two stacked B=1 forwards (routing is per-sample)."""
    cfg, model, params, x = tiny
    key = jax.random.PRNGKey(1)
    x2 = jax.random.normal(key, (2, 32, 32, 32, 4))
    seg_b2 = model.apply(params, x2, train=False)[0]
    seg_a = model.apply(params, x2[:1], train=False)[0]
    seg_b = model.apply(params, x2[1:], train=False)[0]
    np.testing.assert_allclose(np.asarray(seg_b2[0]), np.asarray(seg_a[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(seg_b2[1]), np.asarray(seg_b[0]),
                               atol=2e-5)


def test_gradients_reach_all_params(tiny):
    cfg, model, params, x = tiny
    target = jnp.zeros((1, 32, 32, 32), jnp.int32).at[0, 10:20, 10:20,
                                                      10:20].set(1)
    edge = jnp.zeros((1, 32, 32, 32), jnp.int32).at[0, 10, 10:20, 10:20].set(1)

    from dctseg.losses import total_loss

    def loss_fn(p):
        outs = model.apply(p, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
        return total_loss(outs, target, edge)["loss"]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dead = [jax.tree_util.keystr(k) for k, g in flat
            if float(jnp.abs(g).max()) == 0.0]
    assert not dead, f"params with zero gradient: {dead}"


def test_jit_and_dropout_determinism(tiny):
    cfg, model, params, x = tiny
    f = jax.jit(lambda p, x: model.apply(p, x, train=False)[0])
    a = f(params, x)
    b = model.apply(params, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # train-mode forward with same rng is deterministic
    r = jax.random.PRNGKey(3)
    t1 = model.apply(params, x, train=True, rngs={"dropout": r})[0]
    t2 = model.apply(params, x, train=True, rngs={"dropout": r})[0]
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_plain_unet_model_family():
    from dctseg.models.unet import PlainUnet
    m = PlainUnet(base_channels=4, init_dropout=0.0, remat=False)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 32, 32, 32, 4))
    params = m.init({"params": key, "dropout": key}, x, train=False)
    y = m.apply(params, x, train=False)
    assert y.shape == (1, 32, 32, 32, 4)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-4)


def test_remat_policies_preserve_loss_and_grads(tiny):
    """remat and remat_policy are pure execution strategies: loss and
    gradients must match the no-remat model (same ops, different backward
    materialization schedule; 'save_convs' keeps the checkpoint_name-tagged
    conv outputs instead of recomputing them)."""
    import dataclasses
    cfg, _, params, x = tiny
    from dctseg.losses import total_loss
    target = jnp.zeros((1, 32, 32, 32), jnp.int32).at[0, 10:20, 10:20,
                                                      10:20].set(1)
    edge = jnp.zeros((1, 32, 32, 32), jnp.int32).at[0, 10, 10:20,
                                                    10:20].set(1)

    def loss_and_grads(mcfg):
        m = build_model(mcfg)

        def loss_fn(p):
            outs = m.apply(p, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
            return total_loss(outs, target, edge)["loss"]

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        return float(loss), grads

    base_loss, base_grads = loss_and_grads(cfg)  # tiny config: remat=False
    for policy in ("full", "save_convs"):
        loss, grads = loss_and_grads(
            dataclasses.replace(cfg, remat=True, remat_policy=policy))
        np.testing.assert_allclose(loss, base_loss, rtol=1e-6,
                                   err_msg=policy)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_flatten_with_path(base_grads)[0],
                jax.tree_util.tree_flatten_with_path(grads)[0]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
                err_msg=f"{policy}: {jax.tree_util.keystr(ka)}")
