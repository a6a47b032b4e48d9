"""Normalization primitives matching the reference's PyTorch semantics.

The reference uses ``nn.InstanceNorm3d`` everywhere with PyTorch defaults:
affine=False, track_running_stats=False, eps=1e-5 — i.e. plain per-(sample,
channel) spatial standardization applied identically at train and eval time
(``cls_wise_former.py:207-223``, ``Unet_skipconnection.py:13-14`` via
norm='in').  XLA fuses the reduce + normalize into the surrounding convs, so a
hand-written kernel buys nothing here; keep it as straight jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over an NDHWC tensor (reduce over D,H,W per (B, C)).

    Matches ``torch.nn.InstanceNorm3d(C)`` defaults (no affine, biased
    variance, eps=1e-5).  Statistics accumulate in float32 *inside the
    reductions* (dtype=f32 over the bf16 input) rather than via an explicit
    fp32 copy of the activation — the model is HBM-bandwidth-bound on TPU
    and the fp32 materialization doubled the bytes of every norm.
    """
    axes = (1, 2, 3)
    mean = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
    sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes,
                  keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    # (x - mean) * scale evaluated in the compute dtype with f32 broadcast
    # scalars; XLA folds the per-(B,C) scalars into one elementwise pass.
    return ((x.astype(jnp.float32) - mean) * scale).astype(x.dtype)


def group_norm(x: jnp.ndarray, num_groups: int, scale: jnp.ndarray,
               bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over an NDHWC tensor (torch nn.GroupNorm semantics).

    Provided for the reference's ``normalization(planes, norm='gn')`` option
    (Unet_skipconnection.py:8-19); the shipped model uses norm='in'.
    """
    b, d, h, w, c = x.shape
    dtype = x.dtype
    x32 = x.astype(jnp.float32).reshape(b, d, h, w, num_groups, c // num_groups)
    mean = x32.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = x32.var(axis=(1, 2, 3, 5), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, d, h, w, c)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis with affine params (torch nn.LayerNorm)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    """torch nn.LeakyReLU default slope 0.01."""
    return jnp.where(x >= 0, x, negative_slope * x)
