"""Pallas TPU kernel: fused InstanceNorm + activation (+ residual).

The UNet's residual blocks interleave 3^3 convs with affine-free
InstanceNorm and (Leaky)ReLU (cls_wise_former.py:691-754,
Unet_skipconnection.py:48-56).  After the s2d conv work is optimized the
remaining decoder weight is elementwise/norm HBM bandwidth (docs/PERF.md
"Where the time goes now"): at full resolution each norm touches a 537 MB
activation (B=8, 64^3 x 128ch bf16), so every extra pass over it costs
~0.7 ms.  The floor for an exact InstanceNorm is 2 reads + 1 write
(stats read, then normalize read+write); this kernel guarantees that
floor and folds the activation and the block's residual add into the
normalize pass:

  kernel 1 (stats):  one read  — per-lane sum and sum-of-squares partials
                     accumulated across spatial tiles into (N, 2, CB) f32;
                     the tiny cross-offset fold (s2d lanes o*C+c share fine
                     channel c) and the rsqrt happen in plain jnp on the
                     (N, CB) result;
  kernel 2 (apply):  one read + one write — y = act(x*a + b) [+ residual],
                     with a = rsqrt(var+eps), b = -mean*a broadcast from
                     per-(N, CB) rows.

The channel axis stays on VPU lanes end to end (CB = 128 at full res —
exactly one vreg lane width); reductions are sublane-axis only.

Numerics: statistics accumulate in f32 exactly like the XLA path
(dctseg/ops/norms.py, dctseg/ops/s2d.py instance_norm_s2d) but in a
different reduction-tree order, so results are rounding-close (~1e-7
relative on the f32 stats), not bit-exact — gated behind
``ModelConfig(fused_norms=...)`` and bounded by test.  Inference-only
(no custom VJP; the Trainer rejects the flag like ``quantize``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on builds without TPU support; interpret works
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    _HAS_TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_TPU = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _stats_kernel(x_ref, o_ref):
    """Accumulate per-lane sum / sum-of-squares over spatial tiles."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    xf = x_ref[0].astype(jnp.float32)                 # (TS, CB)
    o_ref[0, 0, :] = o_ref[0, 0, :] + jnp.sum(xf, axis=0)
    o_ref[0, 1, :] = o_ref[0, 1, :] + jnp.sum(xf * xf, axis=0)


def _act(y, act: str, slope: float):
    if act == "relu":
        return jnp.maximum(y, jnp.zeros_like(y))
    if act == "lrelu":
        return jnp.where(y >= 0, y, jnp.asarray(slope, y.dtype) * y)
    assert act == "none", act
    return y


# The activation runs in f32 BEFORE the downcast: Mosaic has no bf16
# vector compare ("Target does not support this comparison"), and the f32
# compare is free inside the same pass.  (The XLA path activates after
# the cast — a sub-ulp difference only for values whose bf16 rounding
# crosses zero; within the kernel's rounding-close contract.)


def _apply_kernel(x_ref, a_ref, b_ref, o_ref, *, act: str, slope: float):
    y = x_ref[0].astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0]
    o_ref[0] = _act(y, act, slope).astype(o_ref.dtype)


def _apply_res_kernel(x_ref, a_ref, b_ref, r_ref, o_ref, *, act: str,
                      slope: float):
    y = x_ref[0].astype(jnp.float32) * a_ref[0, 0] + b_ref[0, 0]
    o_ref[0] = _act(y, act, slope).astype(o_ref.dtype) + r_ref[0]


def _pick_tile(s: int, dtype, cap: int = 1024) -> int:
    """Largest spatial tile <= cap that divides s and respects the dtype's
    sublane granularity; 0 if none exists (caller falls back to XLA)."""
    sub = 16 if dtype in (jnp.bfloat16, jnp.float16) else 8
    ts = min(cap, s)
    ts -= ts % sub
    while ts >= sub and s % ts:
        ts -= sub
    return ts if ts >= sub and s % ts == 0 else 0


def _xla_reference(x, fine_channels: int, eps: float, act: str,
                   slope: float, residual):
    """Plain-XLA twin (also the CPU / ragged-shape fallback): identical
    math to dctseg.ops.norms.instance_norm / s2d.instance_norm_s2d with
    the activation and residual applied after the norm."""
    n, cb = x.shape[0], x.shape[-1]
    o = cb // fine_channels
    xr = x.reshape(n, -1, o, fine_channels)
    mean = jnp.mean(xr, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    sq = jnp.mean(jnp.square(xr.astype(jnp.float32)), axis=(1, 2),
                  keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    y = ((xr.astype(jnp.float32) - mean) * scale).astype(x.dtype)
    y = _act(y.reshape(x.shape), act, slope)
    return y + residual if residual is not None else y


def fused_instance_norm_act(x: jnp.ndarray, fine_channels: int,
                            eps: float = 1e-5, act: str = "none",
                            slope: float = 0.01, residual=None,
                            impl: str = "auto",
                            tile_s: int = 1024) -> jnp.ndarray:
    """InstanceNorm (affine-free, per original fine channel) + activation
    (+ residual add) in two HBM passes.

    ``x``: (N, *spatial, CB) with CB = O * fine_channels, offset-major
    (plain tensors: fine_channels == CB; s2d views: fine_channels = CB/8,
    matching dctseg/ops/s2d.py's channel layout).  ``act``: 'none' |
    'relu' | 'lrelu' (torch LeakyReLU slope 0.01).  ``residual`` is added
    AFTER the activation (the post-activation block pattern,
    cls_wise_former.py:691-713).  ``impl``: 'pallas' | 'xla' | 'auto'
    (pallas on TPU backends) | 'interpret' (tests).
    """
    assert x.shape[-1] % fine_channels == 0
    n, cb = x.shape[0], x.shape[-1]
    s = math.prod(x.shape[1:-1])
    use_pallas = impl in ("pallas", "interpret") or (
        impl == "auto" and _HAS_TPU and _on_tpu())
    ts = _pick_tile(s, x.dtype, tile_s) if use_pallas else 0
    if not ts:
        return _xla_reference(x, fine_channels, eps, act, slope, residual)
    interpret = impl == "interpret"

    xr = x.reshape(n, s, cb)
    stats = pl.pallas_call(
        _stats_kernel,
        grid=(n, s // ts),
        in_specs=[pl.BlockSpec((1, ts, cb), lambda i, t: (i, t, 0))],
        out_specs=pl.BlockSpec((1, 2, cb), lambda i, t: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2, cb), jnp.float32),
        interpret=interpret,
    )(xr)

    o = cb // fine_channels
    st = stats.reshape(n, 2, o, fine_channels).sum(axis=2)  # fold offsets
    cnt = jnp.float32(s * o)
    mean = st[:, 0] / cnt
    var = jnp.maximum(st[:, 1] / cnt - jnp.square(mean), 0.0)
    a = jax.lax.rsqrt(var + eps)                            # (N, C)
    b = -mean * a
    # back to offset-major (N, CB): lane o*C + c carries fine channel c.
    # Shaped (N, 1, CB) so the per-sample block (1, 1, CB) satisfies
    # Mosaic's trailing-dims rule (block == full array dims there).
    a = jnp.tile(a, (1, o))[:, None, :]
    b = jnp.tile(b, (1, o))[:, None, :]

    kernel = (_apply_res_kernel if residual is not None else _apply_kernel)
    operands = [xr, a, b]
    in_specs = [
        pl.BlockSpec((1, ts, cb), lambda i, t: (i, t, 0)),
        pl.BlockSpec((1, 1, cb), lambda i, t: (i, 0, 0)),
        pl.BlockSpec((1, 1, cb), lambda i, t: (i, 0, 0)),
    ]
    if residual is not None:
        operands.append(residual.reshape(n, s, cb))
        in_specs.append(pl.BlockSpec((1, ts, cb), lambda i, t: (i, t, 0)))
    out = pl.pallas_call(
        functools.partial(kernel, act=act, slope=slope),
        grid=(n, s // ts),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ts, cb), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, cb), x.dtype),
        interpret=interpret,
    )(*operands)
    return out.reshape(x.shape)
