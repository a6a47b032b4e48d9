"""Patchify / unpatchify between NDHWC feature volumes and token sequences.

TPU-native replacement for the reference's ``convert_dim`` / ``split_dim``
(``cls_wise_former.py:15-39``): pure reshape+transpose, traced once under jit,
with the token <-> voxel-block correspondence fixed by construction so the
scatter-back needs no external index table (the reference instead *eval()*s a
``fix_index.txt`` asset at model construction, ``cls_wise_former.py:275-278``).

Token layout matches the reference semantics: the token for grid cell
(g0,g1,g2) is the flattened (C, p0, p1, p2) block (channel-major within the
token), and tokens are ordered row-major over the (G0,G1,G2) grid.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def patchify(x: jnp.ndarray, patch: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, D0, D1, D2, C) -> (B, N, C*p0*p1*p2) token sequence.

    Mirrors ``convert_dim`` (cls_wise_former.py:15-23) which operates on NCDHW;
    we hold activations in NDHWC (TPU-friendly) and transpose the channel axis
    into token-major position here so token contents are bit-identical in
    meaning.
    """
    b, d0, d1, d2, c = x.shape
    p0, p1, p2 = patch
    g0, g1, g2 = d0 // p0, d1 // p1, d2 // p2
    x = x.reshape(b, g0, p0, g1, p1, g2, p2, c)
    # -> (B, g0, g1, g2, C, p0, p1, p2)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, g0 * g1 * g2, c * p0 * p1 * p2)


def unpatchify(tokens: jnp.ndarray, channels: int,
               image_size: Tuple[int, int, int],
               patch: Tuple[int, int, int]) -> jnp.ndarray:
    """(B, N, C*p0*p1*p2) -> (B, D0, D1, D2, C).  Inverse of :func:`patchify`.

    Mirrors ``split_dim`` (cls_wise_former.py:26-39).
    """
    b, n, t = tokens.shape
    p0, p1, p2 = patch
    g0 = image_size[0] // p0
    g1 = image_size[1] // p1
    g2 = image_size[2] // p2
    assert n == g0 * g1 * g2 and t == channels * p0 * p1 * p2
    x = tokens.reshape(b, g0, g1, g2, channels, p0, p1, p2)
    # -> (B, g0, p0, g1, p1, g2, p2, C)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, g0 * p0, g1 * p1, g2 * p2, channels)
