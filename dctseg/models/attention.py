"""Cross/self attention and transformer blocks for the couplers.

``DualSelfAttention`` (SelfAttention.py:50-102): a single fused QKV projection
(no bias) is **shared** between both inputs — Q comes from ``x``, K/V from
``x2`` — followed by an output projection.  The intra-region coupler
(ClsWiseTransformer.py:41-55) applies ONE weight-shared attention block four
times (edge->sem, sem->edge, then mutually on the results), concatenates both
streams and runs a weight-shared FFN.  The cross-region coupler
(FusionClsWiseTransformer.py:43-54) is the same attention applied to (x, x).

Residual wrappers match ResidualNorm.py: PreNormDrop LayerNorms *both*
attention inputs with separate norms (:31-32) and drops the attention output
before the residual add; the FFN block is pre-norm.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dctseg.models.layers import Dense, LayerNorm


class DualSelfAttention(nn.Module):
    """Shared-QKV cross attention: Q from x, K/V from x2."""
    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, x2, *, train: bool = False):
        h = self.num_heads
        d = self.hidden_size // h
        qkv = Dense(self.hidden_size * 3, use_bias=False, dtype=self.dtype,
                    name="qkv")
        b, n, _ = x.shape
        n2 = x2.shape[1]
        q = qkv(x).reshape(b, n, 3, h, d)[:, :, 0]        # (B, N, H, D)
        kv = qkv(x2).reshape(b, n2, 3, h, d)
        k, v = kv[:, :, 1], kv[:, :, 2]                   # (B, N2, H, D)

        # the pallas kernel is differentiable (custom VJP) but has no
        # attention-dropout inside; use it whenever dropout is inactive
        if self.use_pallas and (not train or self.dropout_rate == 0.0):
            from dctseg.ops.pallas.attention import fused_attention
            out = fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), d ** -0.5)
            out = out.transpose(0, 2, 1, 3)
        else:
            scale = d ** -0.5
            att = jnp.einsum("bxhd,byhd->bhxy", q, k,
                             preferred_element_type=jnp.float32) * scale
            att = nn.softmax(att, axis=-1).astype(x.dtype)
            att = nn.Dropout(self.dropout_rate, deterministic=not train)(att)
            out = jnp.einsum("bhxy,byhd->bxhd", att, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, n, self.hidden_size).astype(x.dtype)
        out = Dense(self.hidden_size, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        return out


class FeedForward(nn.Module):
    """Dense -> GELU -> drop -> Dense -> drop (ResidualNorm.py:35-44).

    The reference instantiates FeedForward(dim, dim, p): hidden == model dim.
    """
    dim: int
    hidden_dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU default is exact
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


class CrossAttentionBlock(nn.Module):
    """Residual(PreNormDrop(DualSelfAttention)): both inputs LayerNormed with
    separate norms, attention output dropped, residual from the Q stream."""
    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.0
    attn_dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, x2, *, train: bool = False):
        y = DualSelfAttention(
            self.hidden_size, self.num_heads, self.attn_dropout_rate,
            dtype=self.dtype, use_pallas=self.use_pallas, name="attn")(
                LayerNorm(name="norm")(x), LayerNorm(name="norm2")(x2),
                train=train)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y + x


class FFNBlock(nn.Module):
    """Residual(PreNorm(FeedForward))."""
    dim: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = FeedForward(self.dim, self.dim, self.dropout_rate,
                        dtype=self.dtype, name="ffn")(
                            LayerNorm(name="norm")(x), train=train)
        return y + x


class TwoClsWiseTransformer(nn.Module):
    """Edge-supported Intra-region Coupler (ClsWiseTransformer.py:7-55).

    One weight-shared cross-attention block applied four times, then a
    weight-shared FFN over the concatenated streams:
      a  = block(edge_fea,      sem_supple)
      b  = block(semantic_fea,  edge_supple)
      re = block(a, b);  rs = block(b, a)
      out = ffn_block(concat(re, rs))      # (B, 2*(k+1), P)
    """
    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, edge_fea, se_supple, semantic_fea, edge_supple, *,
                 train: bool = False):
        block = CrossAttentionBlock(
            self.hidden_size, self.num_heads, self.dropout_rate,
            self.attn_dropout_rate, dtype=self.dtype,
            use_pallas=self.use_pallas, name="cross")
        edge_q_sem = block(edge_fea, se_supple, train=train)
        sem_q_edge = block(semantic_fea, edge_supple, train=train)
        result_edge = block(edge_q_sem, sem_q_edge, train=train)
        result_sem = block(sem_q_edge, edge_q_sem, train=train)
        cross = jnp.concatenate([result_edge, result_sem], axis=1)
        return FFNBlock(self.hidden_size, self.dropout_rate,
                        dtype=self.dtype, name="ffn")(cross, train=train)


class FusionClsWiseTransformer(nn.Module):
    """Mutual Cross-region Coupler (FusionClsWiseTransformer.py:8-54):
    self-attention (DualSelfAttention on (x, x)) + FFN."""
    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = CrossAttentionBlock(
            self.hidden_size, self.num_heads, self.dropout_rate,
            self.attn_dropout_rate, dtype=self.dtype,
            use_pallas=self.use_pallas, name="cross")(x, x, train=train)
        return FFNBlock(self.hidden_size, self.dropout_rate,
                        dtype=self.dtype, name="ffn")(y, train=train)
