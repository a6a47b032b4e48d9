"""Pallas TPU kernel for the pooled-distance order-statistic search.

The HD95 percentile needs the k-th smallest of the finite entries of the
pooled surface-distance multiset (dctseg/ops/edt.py masked_order_stats):
an integer binary search whose every iteration counts `values <= mid`.
In XLA the (C, 1, M) vs (C, K) broadcast form reaches ~30% of HBM
bandwidth and reads the pooled array once per (iteration, k).  This
kernel counts ALL K thresholds of a class in a single pass over its
values at full bandwidth; the threshold-update loop stays device-side
(lax.fori_loop around the pallas_call), so the whole search remains one
dispatched program.

Count semantics are identical to the XLA path (same f32 compares, same
integer thresholds), so results are bit-identical — tested in
tests/test_metrics.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_TPU = False

_LANES = 128


def _count_kernel(mids_ref, v_ref, out_ref, *, k: int):
    """Accumulate counts of v <= mids[c, k] over the class-c value tiles.

    mids/out are full (C, K) SMEM blocks (tiny), revisited every step;
    the first grid step zeroes the whole accumulator."""
    c = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((c == 0) & (j == 0))
    def _init():
        for cc in range(out_ref.shape[0]):           # SMEM: scalar stores
            for kk in range(out_ref.shape[1]):
                out_ref[cc, kk] = jnp.int32(0)

    v = v_ref[0]                                     # (R, 128)
    for kk in range(k):                              # K is tiny (2)
        cnt = jnp.sum(v <= mids_ref[c, kk], dtype=jnp.int32)
        out_ref[c, kk] += cnt


def _count_leq(values3, mids, tile_rows: int, interpret: bool):
    """values3: (C, R_total, 128) f32; mids: (C, K) f32 -> (C, K) i32."""
    c, r_total, _ = values3.shape
    k = mids.shape[-1]
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_TPU and not interpret) \
        else {}
    smem = dict(memory_space=pltpu.SMEM) if (_HAS_TPU and not interpret) \
        else {}
    return pl.pallas_call(
        functools.partial(_count_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((c, k), jnp.int32),
        grid=(c, r_total // tile_rows),
        in_specs=[
            pl.BlockSpec((c, k), lambda i, j: (0, 0), **smem),
            pl.BlockSpec((1, tile_rows, _LANES), lambda i, j: (i, j, 0),
                         **mem),
        ],
        out_specs=pl.BlockSpec((c, k), lambda i, j: (0, 0), **smem),
        interpret=interpret,
    )(mids, values3)


def masked_order_stats(values: jnp.ndarray, ks: jnp.ndarray, vmax: float,
                       tile_rows: int = 2048, fanout: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """k-th smallest (0-based) of the finite entries of ``values``.

    Pallas counterpart of edt.masked_order_stats for the (C, M) values /
    (C, K) ks case — same exact-integer bracketing, but an m-ary search
    (``fanout``-way, default 8): each pass counts fanout-1 cut points per
    rank in ONE full-bandwidth read of the values, so the whole search is
    ceil(log_m(vmax+2)) passes instead of ceil(log2): 6 instead of 18 at
    BraTS vmax.  Entries >= vmax are treated as masked-out, exactly like
    the XLA path; all interval arithmetic stays on exact-in-f32 integers.
    """
    if fanout < 2 or fanout & (fanout - 1):
        raise ValueError("fanout must be a power of two: the cut-point "
                         "division s*L/fanout is only exact in f32 for "
                         f"power-of-two fanouts (got {fanout})")
    c, m = values.shape
    k = ks.shape[-1]
    s = fanout - 1
    # lay the M axis out as (rows, 128) lanes; pad with an above-vmax
    # sentinel so padded entries can never be counted
    chunk = tile_rows * _LANES
    m_pad = -(-m // chunk) * chunk
    if m_pad != m:
        values = jnp.pad(values, ((0, 0), (0, m_pad - m)),
                         constant_values=jnp.float32(2.0 * vmax + 2.0))
    values3 = values.reshape(c, m_pad // _LANES, _LANES)

    lo = jnp.zeros(ks.shape, jnp.float32)               # (C, K)
    hi = jnp.full(ks.shape, jnp.float32(vmax))
    iters = int(math.ceil(math.log(float(vmax) + 2.0, fanout))) + 1
    steps = jnp.arange(1, fanout, dtype=jnp.float32)    # (S,)

    def body(_, lohi):
        lo, hi = lohi
        ln = hi - lo + 1.0
        # integer cuts  t_s = lo - 1 + floor(s * L / fanout), s = 1..S;
        # exact: s*L <= (fanout-1)*(vmax+1) < 2^24
        cuts = lo[..., None] - 1.0 + jnp.floor(
            steps * ln[..., None] / fanout)             # (C, K, S)
        cnt = _count_leq(values3, cuts.reshape(c, k * s), tile_rows,
                         interpret).reshape(c, k, s).astype(jnp.float32)
        ok = cnt >= (ks + 1)[..., None].astype(jnp.float32)
        # answer <= t_s iff ok_s; interval becomes
        #   [max(lo, max{t_s+1 : not ok_s}), min(hi, min{t_s : ok_s})]
        new_lo = jnp.max(jnp.where(ok, lo[..., None], cuts + 1.0), axis=-1)
        new_lo = jnp.maximum(lo, new_lo)
        new_hi = jnp.min(jnp.where(ok, cuts, hi[..., None]), axis=-1)
        new_hi = jnp.minimum(hi, new_hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi
