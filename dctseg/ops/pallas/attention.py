"""Fused attention kernel (Pallas/Mosaic, TPU).

One kernel instance per (batch, head) computes
``softmax(q k^T * scale) v`` entirely in VMEM: the (N, N) score matrix never
round-trips to HBM, fusing what the XLA path expresses as two einsums + a
softmax (dctseg/models/attention.py).  The coupler sequences are short
(N = top_num+1 = 129 queries/keys of head_dim 64, reference
ClsWiseTransformer.py:52), so a whole (b, h) slice fits VMEM comfortably —
this is a single-block fused kernel, not a streaming FlashAttention; Mosaic
pads the ragged 129/64 tiles internally.

Used on the inference path when ``ModelConfig.use_pallas_attention`` is set
(training uses the XLA path, which autodiffs and lets XLA pick layouts for
fusion with the surrounding projections).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_TPU = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)        # (N, D)
    k = k_ref[0].astype(jnp.float32)        # (N2, D)
    v = v_ref[0].astype(jnp.float32)        # (N2, D)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (N, N2)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)    # (N, D)
    o_ref[0] = o.astype(o_ref.dtype)


def _einsum_attention(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, interpret: bool = False) -> jnp.ndarray:
    """q: (B, H, N, D); k, v: (B, H, N2, D) -> (B, H, N, D).

    Differentiable: forward runs the fused Pallas kernel; the backward pass
    recomputes attention through the einsum formulation and uses its VJP
    (the sequences are tiny — N <= 258 — so recompute is cheaper than
    saving the score matrix)."""
    return _fused_attention_impl(q, k, v, scale, interpret)


def _fused_attention_fwd(q, k, v, scale, interpret):
    return _fused_attention_impl(q, k, v, scale, interpret), (q, k, v)


def _fused_attention_bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _einsum_attention(q, k, v, scale),
                     q, k, v)
    return vjp(g)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def _fused_attention_impl(q, k, v, scale, interpret=False):
    b, h, n, d = q.shape
    n2 = k.shape[2]
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n2, d)
    vf = v.reshape(b * h, n2, d)
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_TPU and not interpret) \
        else {}
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), **mem),
            pl.BlockSpec((1, n2, d), lambda i: (i, 0, 0), **mem),
            pl.BlockSpec((1, n2, d), lambda i: (i, 0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), **mem),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)
