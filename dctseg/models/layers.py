"""Flax building blocks with PyTorch-matching semantics.

Conv/Dense initializers reproduce torch's ``kaiming_uniform_(a=sqrt(5))``
default (variance 1/(3*fan_in), uniform) so training dynamics are comparable;
biases are zero-initialized (flax convention — the only deliberate init
deviation from torch, documented here).  All convs take explicit torch-style
padding so stride-2 downsampling samples the same grid positions as
``nn.Conv3d(k=3, s=2, p=1)``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from dctseg.ops.norms import instance_norm, layer_norm, leaky_relu

# torch kaiming_uniform_(a=sqrt(5)): U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


class ConvParams(nn.Module):
    """Declares kernel/bias with nn.Conv's names/shapes/init so alternate
    execution paths (s2d weight transforms, int8 PTQ) share checkpoint
    layout with their plain counterparts (instantiate with name="Conv_0")."""
    features: int
    in_features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        shape = ((k, k, k, self.in_features, self.features)
                 if isinstance(k, int) else tuple(k) +
                 (self.in_features, self.features))
        kernel = self.param("kernel", torch_kernel_init, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class Conv3d(nn.Module):
    """3D convolution on NDHWC with torch-style explicit padding.

    ``quantize`` (a spec, dctseg/ops/quant.py): the conv3 class routes
    MXU-bound instances (3^3 kernel with >=64 input channels) through
    the dynamic-PTQ conv; the pw class likewise for >=64ch pointwise
    (1x1) convs.  Thinner convs stay float, as their cost is lane
    padding, not MXU rate.  ``spatial_gate`` additionally skips
    quantization when the per-item spatial volume is below
    quant.MIN_SPATIAL_ELEMS — opt-in per instance, for the small direct
    decoder stages where dynamic-quant overhead measured slower than
    the MXU gain (docs/PERF.md "Round 5: int8 residue").  Param tree is
    identical either way (checkpoint-compatible execution strategy)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    quantize: str = "none"
    spatial_gate: bool = False

    @nn.compact
    def __call__(self, x):
        from dctseg.ops import quant as quant_mod
        from dctseg.ops.quant import enabled
        k = self.kernel_size
        p = self.padding
        quant = (self.quantize != "none" and x.shape[-1] >= 64
                 and self.use_bias
                 # opt-in gate: small-spatial direct stages measured
                 # slower under dynamic int8 (quant.MIN_SPATIAL_ELEMS)
                 and (not self.spatial_gate or quant_mod.spatial_ok(x))
                 and ((k == 3 and enabled(self.quantize, "conv3"))
                      or (k == 1 and enabled(self.quantize, "pw"))))
        if quant:
            from dctseg.ops.quant import conv3d_int8
            kernel, bias = ConvParams(self.features, x.shape[-1], k,
                                      name="Conv_0")()
            y = conv3d_int8(x.astype(self.dtype), kernel,
                            (self.stride,) * 3, ((p, p),) * 3)
            return checkpoint_name(y + bias.astype(y.dtype), "conv_out")
        y = nn.Conv(
            features=self.features,
            kernel_size=(k, k, k),
            strides=(self.stride,) * 3,
            padding=((p, p),) * 3,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        # tag for ModelConfig(remat_policy="save_convs"): under that remat
        # policy the conv output is saved, not recomputed, in backward
        return checkpoint_name(y, "conv_out")


class ConvTranspose3d(nn.Module):
    """Transposed conv matching ``nn.ConvTranspose3d(k=2, s=2)`` upsampling."""
    features: int
    kernel_size: int = 2
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size,) * 3,
            strides=(self.stride,) * 3,
            padding="VALID",
            kernel_init=torch_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features, use_bias=self.use_bias,
            kernel_init=torch_kernel_init, dtype=self.dtype,
            param_dtype=jnp.float32)(x)


class LayerNorm(nn.Module):
    """Affine LayerNorm over the last axis (torch nn.LayerNorm defaults)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return layer_norm(x, scale, bias, self.eps)


class InstanceNormAct(nn.Module):
    """InstanceNorm3d (no affine) + LeakyReLU(0.01) fused block.

    The ubiquitous reference pattern, e.g. ``cls_wise_former.py:284-296``.
    """
    eps: float = 1e-5
    negative_slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        return leaky_relu(instance_norm(x, self.eps), self.negative_slope)
