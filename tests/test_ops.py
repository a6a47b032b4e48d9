"""Unit tests for core ops: patchify, norms, resize, routing.

Torch (CPU) is used as a *numerical oracle* for the PyTorch-default semantics
the reference relies on (InstanceNorm3d, LayerNorm, trilinear interpolation,
topk); no reference code is imported.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from dctseg.ops.patchify import patchify, unpatchify
from dctseg.ops.norms import instance_norm, layer_norm, leaky_relu
from dctseg.ops.resize import trilinear_upsample
from dctseg.ops.routing import topk_select, scatter_update


def torch_convert_dim(fea, image_size, patch_size):
    """Oracle for the reference token layout (cls_wise_former.py:15-23),
    written against its documented reshape/permute semantics."""
    B, C = fea.shape[:2]
    p0, p1, p2 = patch_size
    g = [s // p for s, p in zip(image_size, patch_size)]
    fea = fea.reshape(B, C, g[0], p0, g[1], p1, g[2], p2)
    fea = fea.permute(0, 2, 4, 6, 1, 3, 5, 7).contiguous()
    return fea.reshape(B, g[0] * g[1] * g[2], C * p0 * p1 * p2)


def test_patchify_matches_reference_layout():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 16, 8)).astype(np.float32)
    ours = np.asarray(patchify(jnp.asarray(x), (2, 2, 1)))
    # reference operates NCDHW
    theirs = torch_convert_dim(
        torch.from_numpy(x).permute(0, 4, 1, 2, 3), (16, 16, 16), (2, 2, 1))
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=0, atol=0)


def test_patchify_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 32, 4)).astype(np.float32))
    tokens = patchify(x, (4, 2, 2))
    back = unpatchify(tokens, 4, (32, 32, 32), (4, 2, 2))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 6, 7, 3)).astype(np.float32) * 3 + 1
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    theirs = torch.nn.InstanceNorm3d(3)(xt).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 9, 16)).astype(np.float32)
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale),
                                 jnp.asarray(bias)))
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale))
        ln.bias.copy_(torch.from_numpy(bias))
    theirs = ln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_leaky_relu_matches_torch():
    x = np.linspace(-3, 3, 13).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(leaky_relu(jnp.asarray(x))),
        F.leaky_relu(torch.from_numpy(x)).numpy(), rtol=1e-7)


def test_trilinear_upsample_matches_torch_align_corners_false():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32)
    for scale in (4, 8):
        ours = np.asarray(trilinear_upsample(jnp.asarray(x), scale))
        xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        theirs = F.interpolate(xt, scale_factor=scale, mode="trilinear",
                               align_corners=False)
        theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_topk_select_matches_torch():
    rng = np.random.default_rng(5)
    tokens = rng.normal(size=(2, 32, 16)).astype(np.float32)
    query = rng.normal(size=(1, 1, 16)).astype(np.float32)
    sel, idx = topk_select(jnp.asarray(tokens), jnp.asarray(query), 5)
    tt = torch.from_numpy(tokens)
    qt = torch.from_numpy(query)
    scores = qt @ tt.transpose(2, 1)                       # (2,1,32)
    _, tidx = scores.topk(5, dim=2, largest=True, sorted=True)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(idx)[b], tidx[b, 0].numpy())
        ref_sel = torch.index_select(tt[b], 0, tidx[b, 0]).numpy()
        np.testing.assert_allclose(np.asarray(sel)[b], ref_sel)


def test_scatter_update_semantics_and_grads():
    rng = np.random.default_rng(6)
    tokens = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    idx = jnp.asarray([[1, 3, 7], [0, 9, 5]])
    upd = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    out = scatter_update(tokens, idx, upd)
    expect = np.asarray(tokens).copy()
    for b in range(2):
        for j, i in enumerate(np.asarray(idx)[b]):
            expect[b, i] = np.asarray(upd)[b, j]
    np.testing.assert_array_equal(np.asarray(out), expect)

    # gradients: selected rows route to updates, others to tokens
    def f(t, u):
        return jnp.sum(scatter_update(t, idx, u) ** 2)
    gt, gu = jax.grad(f, argnums=(0, 1))(tokens, upd)
    gt = np.asarray(gt)
    assert np.all(gt[0, 1] == 0) and np.all(gt[0, 3] == 0)
    assert np.any(gt[0, 0] != 0)
    assert np.all(np.asarray(gu) != 0)


def test_scatter_then_gather_roundtrip():
    """Updated grid returns the updates at the routed positions."""
    tokens = jnp.zeros((1, 8, 3))
    q = jnp.ones((1, 1, 3))
    sel, idx = topk_select(tokens + jnp.arange(8.0)[None, :, None], q, 4)
    upd = jnp.full((1, 4, 3), 7.0)
    out = scatter_update(tokens, idx, upd)
    got = jnp.take_along_axis(out, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(upd))
