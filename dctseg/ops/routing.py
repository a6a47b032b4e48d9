"""Top-k token routing: select, and functionally scatter results back.

The reference performs routing with ``torch.topk`` + ``index_select``
(``cls_wise_former.py:345-353``) and writes transformer outputs back with an
in-place ``scatter_`` driven by a Python loop that calls ``.item()`` once per
selected token (``cls_wise_former.py:463-479`` etc.) — 896 device->host syncs
per forward.  Here both directions are single fused XLA gather/scatter ops,
batched over B, fully differentiable, and jit/shard_map compatible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def topk_select(tokens: jnp.ndarray, query: jnp.ndarray, k: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select the ``k`` tokens with the highest affinity to ``query``.

    Args:
      tokens: (B, N, P) token sequence.
      query:  (1, 1, P) or (B, 1, P) class token.
    Returns:
      (selected (B, k, P), indices (B, k)) with indices sorted by descending
      score, matching ``topk(..., largest=True, sorted=True)``
      (cls_wise_former.py:346).
    """
    # (B, N): affinity logits query . token^T (cls_wise_former.py:345)
    scores = jnp.einsum("bop,bnp->bn", jnp.broadcast_to(
        query, (tokens.shape[0],) + query.shape[1:]), tokens)
    _, idx = jax.lax.top_k(scores, k)
    selected = jnp.take_along_axis(tokens, idx[:, :, None], axis=1)
    return selected, idx


def scatter_update(tokens: jnp.ndarray, idx: jnp.ndarray,
                   updates: jnp.ndarray) -> jnp.ndarray:
    """Write ``updates`` rows back into ``tokens`` at positions ``idx``.

    Functional, batched replacement for the reference scatter-back
    (cls_wise_former.py:467-479): positions not selected keep their original
    value; gradients flow to both ``tokens`` (non-selected rows) and
    ``updates`` (selected rows).

    Args:
      tokens:  (B, N, P)
      idx:     (B, k) int indices (assumed unique per row, as top_k yields)
      updates: (B, k, P)
    """
    def one(t, i, u):
        return t.at[i].set(u, mode="drop", unique_indices=True)
    return jax.vmap(one)(tokens, idx, updates)
