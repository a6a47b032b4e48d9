"""Positional encodings for routed token sequences.

Reference quirk (PositionalEncoding.py:20-22): ``ExtendFixedPositionalEncoding``
stores the sinusoidal table as (max_len, 1, dim) and indexes ``pe[:x.size(0)]``
— the *batch* dimension — so with batch 1 every token receives the position-0
vector, i.e. a constant bias of [sin(0), cos(0), ...] = [0, 1, 0, 1, ...].
The model is trained this way ('fixed' PE, train.py:131), so 'fixed' here is
that exact constant bias (batch-size independent: we always add row 0, which
equals the reference at its pinned B=1).

'sinusoidal' is the corrected per-token encoding; 'learned' is a per-token
learned table (the reference's learned mode constructs transposed shapes and
cannot execute — cls_wise_former.py:88-90 passes (129, 512) as (dim, len)).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoid_table(max_len: int, dim: int) -> np.ndarray:
    pe = np.zeros((max_len, dim), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                 * (-np.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class PositionalEncoding(nn.Module):
    pe_type: str = "fixed"      # 'fixed' | 'sinusoidal' | 'learned'
    dim: int = 512
    max_len: int = 4096

    @nn.compact
    def __call__(self, x):
        if self.pe_type == "fixed":
            bias = jnp.asarray(sinusoid_table(1, self.dim)[0])
            return x + bias.astype(x.dtype)
        if self.pe_type == "sinusoidal":
            table = jnp.asarray(sinusoid_table(self.max_len, self.dim))
            return x + table[: x.shape[1]].astype(x.dtype)
        if self.pe_type == "learned":
            table = self.param(
                "pos_embedding", nn.initializers.zeros,
                (1, self.max_len, self.dim), jnp.float32)
            return x + table[:, : x.shape[1]].astype(x.dtype)
        raise ValueError(f"unknown pe_type {self.pe_type!r}")
