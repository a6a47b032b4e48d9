"""Pallas TPU kernel for the 1-D min-plus (quadratic-cost) EDT pass.

The exact squared EDT (dctseg/ops/edt.py) is three separable passes of

    out[..., i, ...] = min_j  f[..., j, ...] + (i - j)^2

XLA's broadcast+reduce formulation of this runs at ~15% of the v5e VPU's
throughput (measured, scripts/measure_edt.py): the (D_out, D_in) cost
broadcast forces a lane-dimension reduction per output element.  This
kernel restructures the pass so every hot operation is a full-width VPU
op with no lane-dimension reductions at all:

- the array is viewed as (A, D, B) with the pass axis D on *sublanes* and
  a contiguous minor axis B on *lanes*;
- the cost matrix is never materialized: cost[i, j] = ck[i - j + D - 1]
  where ck[t] = (t - (D-1))^2 is a fixed vector, stored REPLICATED across
  the TB lanes as (2D-1, TB) so the per-j column cost[:, j] is a cheap
  sublane-dynamic slice that is already a dense full-width operand (a
  single-lane (2D-1, 1) layout wastes 127/128 of every vreg and makes the
  per-j lane-broadcast the bottleneck — measured 1.5x SLOWER than XLA);
- the kernel loops over j, accumulating  acc = min(acc, ck_blk + x_row)
  — a (D, TB) add with a sublane-broadcast (1, TB) operand + a (D, TB)
  min, i.e. pure full-width VPU work.

Exactness: identical arithmetic to the XLA pass (all values are integers
< 2^24 in float32, and min is order-independent), so results are
bit-identical — tested in tests/test_metrics.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on builds without TPU support; interpret still works
    from jax.experimental.pallas import tpu as pltpu
    _HAS_TPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_TPU = False


def _minplus_kernel(ck_ref, x_ref, o_ref, *, d: int, unroll: int):
    """One (1, D, TB) block: o[i, b] = min_j x[j, b] + ck[i - j + D - 1].

    Mosaic requires dynamic sublane-slice starts to be provably 8-aligned,
    so the j loop is split into 8 phase groups: ck_ref[p] is ck pre-shifted
    by p rows, and within phase p the slice offset is always 8*t.  The j
    values covered are exactly {d-1-p-8t : 0 <= p < 8, 8t <= d-1-p} =
    [0, d); min is order-independent, so grouping does not change results.
    """
    tb = x_ref.shape[-1]

    def step(p, t, acc):
        j = d - 1 - p - 8 * t
        x_row = x_ref[0, pl.ds(j, 1), :]                        # (1, TB)
        off = pl.multiple_of(8 * t, 8)
        ck_blk = ck_ref[p, pl.ds(off, d), :]                    # (D, TB)
        return jnp.minimum(acc, ck_blk + x_row)

    acc = jnp.full((d, tb), jnp.inf, jnp.float32)
    for p in range(min(8, d)):                                  # static
        n_t = (d - p + 7) // 8
        main = (n_t // unroll) * unroll

        def body(t, acc, p=p):
            for u in range(unroll):
                acc = step(p, t * unroll + u, acc)
            return acc

        acc = jax.lax.fori_loop(0, n_t // unroll, body, acc)
        for t in range(main, n_t):                              # static tail
            acc = step(p, t, acc)
    o_ref[0] = acc


def minplus_sublane(x: jnp.ndarray, tile_b: int = 128, unroll: int = 1,
                    interpret: bool = False) -> jnp.ndarray:
    """Min-plus pass along axis -2 of a (A, D, B) float32 array.

    out[a, i, b] = min_j x[a, j, b] + (i - j)^2.  B should be the arrays'
    contiguous minor axis; lane utilization is B mod 128 on the last tile.
    """
    a, d, b = x.shape
    nk = 2 * d - 1
    # 8 phase-shifted replicas: ck8[p, t] = ck[p + t] (inf past the end),
    # so the kernel's dynamic slice start within a phase is always 8*t.
    nk8 = -(-nk // 8) * 8
    ck = jnp.square(jnp.arange(nk8 + 8, dtype=jnp.float32)
                    - jnp.float32(d - 1))
    ck = jnp.where(jnp.arange(nk8 + 8) < nk, ck, jnp.float32(jnp.inf))
    ck8 = jnp.stack([ck[p:p + nk8] for p in range(8)])          # (8, nk8)
    ck8 = jnp.broadcast_to(ck8[:, :, None], (8, nk8, tile_b))
    mem = dict(memory_space=pltpu.VMEM) if (_HAS_TPU and not interpret) \
        else {}
    return pl.pallas_call(
        functools.partial(_minplus_kernel, d=d, unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((a, d, b), jnp.float32),
        grid=(a, pl.cdiv(b, tile_b)),
        in_specs=[
            pl.BlockSpec((8, nk8, tile_b), lambda i, j: (0, 0, 0), **mem),
            pl.BlockSpec((1, d, tile_b), lambda i, j: (i, 0, j), **mem),
        ],
        out_specs=pl.BlockSpec((1, d, tile_b), lambda i, j: (i, 0, j), **mem),
        interpret=interpret,
    )(ck8, x)


def squared_edt_3d(f: jnp.ndarray, tile_b: int = 128, unroll: int = 1,
                   interpret: bool = False) -> jnp.ndarray:
    """Exact squared EDT over the last three axes of an initialized cost
    volume ``f`` (0 on foreground, a large finite sentinel elsewhere).

    Pass order is chosen so every pass sees a wide contiguous minor axis
    (>= 94% lane utilization at BraTS shapes) at the cost of one transpose
    pair; min-plus passes commute, so order does not affect the result:

      1. pass along X on (A, X, Y*Z)
      2. permute to (A, Z, Y, X); pass along Y on (A*Z, Y, X)
      3. pass along Z on (A, Z, Y*X); permute back
    """
    shp = f.shape
    x_, y_, z_ = shp[-3:]
    f = f.reshape(-1, x_, y_, z_).astype(jnp.float32)
    a = f.shape[0]

    f = minplus_sublane(f.reshape(a, x_, y_ * z_), tile_b, unroll,
                        interpret).reshape(a, x_, y_, z_)
    f = jnp.transpose(f, (0, 3, 2, 1))                    # (A, Z, Y, X)
    f = minplus_sublane(f.reshape(a * z_, y_, x_), tile_b, unroll,
                        interpret).reshape(a, z_, y_, x_)
    f = minplus_sublane(f.reshape(a, z_, y_ * x_), tile_b, unroll,
                        interpret).reshape(a, z_, y_, x_)
    f = jnp.transpose(f, (0, 3, 2, 1))                    # (A, X, Y, Z)
    return f.reshape(shp)
