"""Pallas TPU kernel: space_to_depth relayout for thin-channel tensors.

STATUS: MEASURED NEGATIVE in-model; ships as an opt-in capability.
Standalone the kernel beats XLA at every call-site shape on the chip
(bit-identical; f32->bf16 input s2d 39.2 -> 23.3 ms, bf16 20.1 -> 15.0,
half_in 10.1 -> 6.7 — XLA's transpose emitter reads 2C-element runs),
but in the full forward XLA *fuses* the transpose into init_conv's input
gather, and the opaque pallas_call boundary forces a materialization the
fused XLA program never pays: measured +4.8 ms on the B=8 eval forward
(docs/PERF.md "input space_to_depth").  The production encoder therefore
keeps plain ``s2dops.space_to_depth``.

The kernel exploits the structure of the permutation
(dctseg/ops/s2d.py:46, offset-major: out lane = ((iz*2+iy)*2+ix)*C + c):
for a fixed output row, the fine elements with ix in {0,1} and all c are
CONTIGUOUS 2C-element runs of the input row, so the whole relayout is an
interleave of 2C-wide chunks from 4 input rows (iz x iy).  HBM traffic is
contiguous row blocks on both sides; the shuffle happens in VMEM as a
4-way lane concatenation.  Mosaic forbids lane-splitting reshapes, so
both arrays are pre-shaped with the 2C chunk as its own trailing dim
(blocks (2, 2T, W2, 2C) -> (T, W2, 8C)); lanes below 128 are padded in
VREGs, which costs vector throughput but not HBM transactions — the op
is DMA-bound either way.

Numerics: a pure relayout (+ optional dtype cast) — bit-identical to
``s2dops.space_to_depth(x.astype(out_dtype))`` by test.  Differentiable:
custom VJP whose backward is the (cheap, XLA) inverse relayout.

Reference context: the full-res stage this feeds re-implements
Unet_skipconnection.py:22-58 on the s2d view.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from dctseg.ops import s2d as s2dops

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


def _s2d_kernel(x_ref, o_ref):
    """(1, 2, 2T, W2, 2C) fine rows -> (1, T, W2, 8C) s2d rows.

    Mosaic constraint: the lane (last) dim may never be split by a
    reshape, so the wrapper pre-shapes both HBM arrays with the 2C-wide
    contiguous chunks as their own trailing dim; the kernel only splits
    the sublane-side row dim (2T -> T, 2) and concatenates on lanes."""
    x = x_ref[0]                             # (2, 2T, W2, 2C)
    t = x.shape[1] // 2
    x = x.reshape(2, t, 2, x.shape[2], x.shape[3])
    # offset-major lanes: ((iz*2+iy)*2+ix)*C + c = concat order (iz, iy)
    y = jnp.concatenate(
        [x[0, :, 0], x[0, :, 1], x[1, :, 0], x[1, :, 1]], axis=-1)
    o_ref[0] = y.astype(o_ref.dtype)         # (T, W2, 8C)


def _xla_s2d(x, out_dtype):
    return s2dops.space_to_depth(x.astype(out_dtype))


def _pick_rows(h2: int, dtype) -> int:
    """Output rows per block: multiple of the dtype sublane count that
    divides H/2; 0 if none exists (caller falls back to XLA)."""
    sub = 16 if dtype in (jnp.bfloat16, jnp.float16) else 8
    t = min(16, h2)
    t -= t % sub
    while t >= sub and h2 % t:
        t -= sub
    return t if t >= sub and h2 % t == 0 else 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def space_to_depth(x: jnp.ndarray, out_dtype=None,
                   impl: str = "auto") -> jnp.ndarray:
    """``s2dops.space_to_depth(x.astype(out_dtype))``, bit-identical,
    at the HBM bandwidth floor on TPU.

    ``x``: (N, D, H, W, C) with even D/H/W.  ``out_dtype`` folds the
    model-dtype cast into the relayout write (None keeps ``x.dtype``).
    ``impl``: 'pallas' | 'xla' | 'auto' (pallas on TPU backends) |
    'interpret' (tests).
    """
    return _s2d_impl(x, out_dtype, impl)


def _s2d_impl(x, out_dtype, impl):
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    n, d, h, w, c = x.shape
    use_pallas = impl in ("pallas", "interpret") or (
        impl == "auto" and _HAS_TPU and _on_tpu())
    t = _pick_rows(h // 2, out_dtype) if use_pallas else 0
    if t and (d % 2 or h % 2 or w % 2
              or ((2 * t) % (16 if x.dtype in (jnp.bfloat16, jnp.float16)
                             else 8))):
        t = 0
    if not t:
        return _xla_s2d(x, out_dtype)
    interpret = impl == "interpret"

    nd = n * (d // 2)
    xr = x.reshape(nd, 2, h, w // 2, 2 * c)
    out = pl.pallas_call(
        _s2d_kernel,
        grid=(nd, (h // 2) // t),
        in_specs=[pl.BlockSpec((1, 2, 2 * t, w // 2, 2 * c),
                               lambda i, j: (i, 0, j, 0, 0))],
        out_specs=pl.BlockSpec((1, t, w // 2, 8 * c),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nd, h // 2, w // 2, 8 * c),
                                       out_dtype),
        interpret=interpret,
    )(xr)
    return out.reshape(n, d // 2, h // 2, w // 2, 8 * c)


def _s2d_fwd(x, out_dtype, impl):
    # residual: a zero-size array carrying only the input dtype
    return _s2d_impl(x, out_dtype, impl), jnp.zeros((0,), x.dtype)


def _s2d_bwd(out_dtype, impl, res, g):
    # pure relayout: the gradient is the inverse relayout (+ cast back)
    return (s2dops.depth_to_space(g).astype(res.dtype),)


space_to_depth.defvjp(_s2d_fwd, _s2d_bwd)
