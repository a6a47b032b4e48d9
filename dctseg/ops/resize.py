"""Trilinear upsampling matching ``F.interpolate(..., mode='trilinear',
align_corners=False)`` as used by the deep-supervision heads
(``SuperviseLabel.py:60-62``, ``EdgeSuperviseLabel.py:58-60``).

Implemented as three separable 1-D interpolation matmuls instead of
``jax.image.resize``: on TPU the latter lowers to giant padded constant
literals (observed 304MB each with 16x tile-padding waste, OOMing the
backward pass), whereas a (out, in) weight matrix per axis is a few KB and
rides the MXU.  The weights use half-pixel sample positions with edge
clamping — exactly PyTorch's align_corners=False convention; verified against
torch in tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _interp_matrix(n_in: int, scale: int) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix, half-pixel centers."""
    n_out = n_in * scale
    w = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        src = (i + 0.5) / scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), n_in - 1)
        hi_c = min(max(lo + 1, 0), n_in - 1)
        w[i, lo_c] += 1.0 - frac
        w[i, hi_c] += frac
    return w


def trilinear_upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Upsample an NDHWC tensor spatially by an integer factor."""
    b, d, h, w, c = x.shape
    dtype = x.dtype
    x = x.astype(jnp.float32)
    wd = jnp.asarray(_interp_matrix(d, scale))
    wh = jnp.asarray(_interp_matrix(h, scale))
    ww = jnp.asarray(_interp_matrix(w, scale))
    x = jnp.einsum("od,bdhwc->bohwc", wd, x)
    x = jnp.einsum("oh,bdhwc->bdowc", wh, x)
    x = jnp.einsum("ow,bdhwc->bdhoc", ww, x)
    return x.astype(dtype)
