"""Space-to-depth transform correctness: every s2d kernel transform must
reproduce the plain fine-grid op exactly (same dtype, fp32 tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctseg.ops import s2d

KEY = jax.random.PRNGKey(7)


def _conv(x, w, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, ((pad, pad),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def test_space_to_depth_roundtrip():
    x = jax.random.normal(KEY, (2, 8, 8, 8, 5))
    np.testing.assert_array_equal(
        np.asarray(s2d.depth_to_space(s2d.space_to_depth(x))), np.asarray(x))


def test_s2d_layout_offset_major():
    x = jnp.arange(2 * 2 * 2 * 3, dtype=jnp.float32).reshape(1, 2, 2, 2, 3)
    y = s2d.space_to_depth(x)
    assert y.shape == (1, 1, 1, 1, 24)
    # channel index = ((oz*2+oy)*2+ox)*C + c
    np.testing.assert_array_equal(np.asarray(y)[0, 0, 0, 0],
                                  np.asarray(x).ravel())


@pytest.mark.parametrize("ci,co", [(3, 5), (16, 16)])
def test_conv_kernel_exact(ci, co):
    x = jax.random.normal(KEY, (2, 8, 8, 8, ci))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, ci, co)) * 0.2
    ref = _conv(x, w)
    got = s2d.depth_to_space(
        s2d.conv3d_s2d(s2d.space_to_depth(x), s2d.conv_kernel(w)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("ci,co", [(3, 5), (16, 16)])
def test_fine_conv_kernel_exact(ci, co):
    """The 4^3 stride-2 'fine feed' strategy: same logical conv, output in
    the s2d view directly."""
    x = jax.random.normal(KEY, (2, 8, 8, 8, ci))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, ci, co)) * 0.2
    ref = s2d.space_to_depth(_conv(x, w))
    got = s2d.conv3d_fine_s2dout(x, s2d.fine_conv_kernel(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_conv3x3_strategy_dispatch():
    """conv3x3_s2d under either CONV3_STRATEGY matches the dense path."""
    x8 = s2d.space_to_depth(jax.random.normal(KEY, (1, 8, 8, 8, 3)))
    w = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 3, 3, 4)) * 0.2
    ref = s2d.conv3d_s2d(x8, s2d.conv_kernel(w), padding=(1, 1))
    old = s2d.CONV3_STRATEGY
    try:
        for strat in ("dense", "fine"):
            s2d.CONV3_STRATEGY = strat
            np.testing.assert_allclose(np.asarray(s2d.conv3x3_s2d(x8, w)),
                                       np.asarray(ref), atol=1e-5, rtol=1e-5)
    finally:
        s2d.CONV3_STRATEGY = old


def test_down_kernel_exact():
    ci, co = 6, 4
    x = jax.random.normal(KEY, (2, 8, 8, 8, ci))
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, ci, co)) * 0.2
    ref = _conv(x, w, stride=2, pad=1)        # (2, 4, 4, 4, co) plain grid
    got = s2d.conv3d_s2d(s2d.space_to_depth(x), s2d.down_kernel(w),
                         stride=1, padding=(1, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pointwise_kernel_exact_with_groups():
    c1, c2, co = 3, 4, 6
    a = jax.random.normal(KEY, (2, 8, 8, 8, c1))
    b = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8, c2))
    w = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 1, c1 + c2, co)) * 0.3
    ref = _conv(jnp.concatenate([a, b], -1), w, pad=0)
    x8 = jnp.concatenate([s2d.space_to_depth(a), s2d.space_to_depth(b)], -1)
    got = s2d.depth_to_space(
        s2d.conv3d_s2d(x8, s2d.pointwise_kernel(w, (c1, c2)), padding=(0, 0)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_deconv_kernel_exact():
    ci, co = 5, 3
    x = jax.random.normal(KEY, (2, 4, 4, 4, ci))
    w = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 2, ci, co)) * 0.3
    ref = jax.lax.conv_transpose(
        x, w, (2, 2, 2), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = s2d.depth_to_space(
        s2d.conv3d_s2d(x, s2d.deconv_kernel(w), padding=(0, 0)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_instance_norm_s2d_matches_fine():
    from dctseg.ops.norms import instance_norm
    x = jax.random.normal(KEY, (2, 8, 8, 8, 6)) * 3 + 1
    ref = instance_norm(x)
    got = s2d.depth_to_space(s2d.instance_norm_s2d(s2d.space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tile_bias_layout():
    b = jnp.asarray([1.0, 2.0, 3.0])
    t = s2d.tile_bias(b)
    assert t.shape == (24,)
    np.testing.assert_array_equal(np.asarray(t[3:6]), [1.0, 2.0, 3.0])


@pytest.mark.parametrize("overrides", [
    dict(s2d_fullres=True, s2d_halfres=False),
    dict(s2d_fullres=False, s2d_halfres=True),
    dict(s2d_fullres=True, s2d_halfres=True),
])
def test_model_s2d_equivalence(overrides):
    """s2d_fullres/s2d_halfres are pure execution strategies: identical
    parameter tree (checkpoints interchangeable) and matching forward
    outputs, in every combination."""
    from dctseg.config import tiny_model_config
    from dctseg.models.clswiseformer import build_model

    cfg_a = tiny_model_config(s2d_fullres=False, s2d_halfres=False)
    cfg_b = tiny_model_config(**overrides)
    ma, mb = build_model(cfg_a), build_model(cfg_b)
    x = jax.random.normal(KEY, (1, 32, 32, 32, 4))
    pa = ma.init(jax.random.PRNGKey(0), x, train=False)
    pb = mb.init(jax.random.PRNGKey(0), x, train=False)
    # identical tree structure AND identical values (same init streams)
    flat_a = jax.tree_util.tree_flatten_with_path(pa)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(pb)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (ka, va), (_, vb) in zip(flat_a, flat_b):
        assert va.shape == vb.shape, ka

    ya = ma.apply(pa, x, train=False)[0]
    yb = mb.apply(pa, x, train=False)[0]   # same params through s2d path
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               atol=2e-5, rtol=1e-4)


def test_model_s2d_train_step_gradients():
    """The s2d path must be trainable: gradients exist for every param and
    match the plain path closely (exact same math modulo fp reassociation)."""
    from dctseg.config import tiny_model_config
    from dctseg.models.clswiseformer import build_model

    cfg_a = tiny_model_config(s2d_fullres=False, s2d_halfres=False)
    cfg_b = tiny_model_config(s2d_fullres=True, s2d_halfres=True)
    ma, mb = build_model(cfg_a), build_model(cfg_b)
    x = jax.random.normal(KEY, (1, 32, 32, 32, 4))
    p = ma.init(jax.random.PRNGKey(0), x, train=False)

    def loss(model, params):
        return jnp.mean(model.apply(params, x, train=False)[0] ** 2)

    ga = jax.grad(lambda q: loss(ma, q))(p)
    gb = jax.grad(lambda q: loss(mb, q))(p)
    la = jax.tree.leaves(ga)
    lb = jax.tree.leaves(gb)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-3)


def test_conv3_explicit_vjp_matches_autodiff():
    """The explicit conv3 VJP (CONV3_BWD="explicit", docs/PERF.md "Round
    5: inside the backward") must produce the same dx/dW as XLA autodiff
    — f32 inputs, exact contraction order aside."""
    x8 = s2d.space_to_depth(jax.random.normal(KEY, (2, 8, 8, 8, 2)))
    w8 = s2d.conv_kernel(
        jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 2, 2)) * 0.3)

    def loss(mode, xx, ww):
        old = s2d.CONV3_BWD
        s2d.CONV3_BWD = mode
        try:
            y = s2d.conv3d_s2d(xx, ww, padding=(1, 1))
        finally:
            s2d.CONV3_BWD = old
        return jnp.mean(jnp.square(y))

    gx_ref, gw_ref = jax.grad(lambda a, b: loss("xla", a, b),
                              argnums=(0, 1))(x8, w8)
    gx_cv, gw_cv = jax.grad(lambda a, b: loss("explicit", a, b),
                            argnums=(0, 1))(x8, w8)
    np.testing.assert_allclose(np.asarray(gx_cv), np.asarray(gx_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_cv), np.asarray(gw_ref),
                               atol=1e-5, rtol=1e-5)


def test_conv3_explicit_vjp_dtypes_match_autodiff():
    """bf16 activations with an f32 kernel (the train configuration: f32
    params cast inside conv3d_s2d) must yield grads with the INPUT dtypes
    under both backward modes."""
    x8 = s2d.space_to_depth(
        jax.random.normal(KEY, (1, 8, 8, 8, 2))).astype(jnp.bfloat16)
    w8 = s2d.conv_kernel(
        jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 2, 2)) * 0.3)

    def loss(mode, xx, ww):
        old = s2d.CONV3_BWD
        s2d.CONV3_BWD = mode
        try:
            y = s2d.conv3d_s2d(xx, ww, padding=(1, 1))
        finally:
            s2d.CONV3_BWD = old
        return jnp.mean(jnp.square(y.astype(jnp.float32)))

    for mode in ("xla", "explicit"):
        gx, gw = jax.grad(lambda a, b: loss(mode, a, b),
                          argnums=(0, 1))(x8, w8)
        assert gx.dtype == jnp.bfloat16, mode
        assert gw.dtype == jnp.float32, mode
