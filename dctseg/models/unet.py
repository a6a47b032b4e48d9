"""3D UNet encoder and decoder for ClsWiseFormer, TPU-native (NDHWC).

Encoder mirrors the reference ``Unet`` (Unet_skipconnection.py:80-144):
  InitConv(4->B0) + spatial dropout
  [EnBlock x2 -> stride-2 EnDown] x3            (skips at full/half/quarter res)
  EnBlock x2 -> stride-1 conv to 16*B0 channels  (bottleneck at img/8)

Decoder mirrors ``Decoder`` (cls_wise_former.py:614-664):
  1x1 conv 256->128, EnBlock2 x2, then 3x [DeUp_Cat transpose-conv upsample +
  skip concat + DeBlock x2], 1x1 endconv -> num_classes, softmax over classes.

EnBlock is pre-activation (norm->relu->conv, Unet_skipconnection.py:48-56);
EnBlock2/DeBlock are post-activation (conv->norm->lrelu,
cls_wise_former.py:691-754).  Norms are InstanceNorm3d-equivalent.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dctseg.models.layers import Conv3d, ConvTranspose3d
from dctseg.ops.norms import instance_norm, leaky_relu


class _EnBlock(nn.Module):
    """Pre-activation residual block: [IN -> ReLU -> conv3] x2 + skip."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        y = instance_norm(x, self.eps)
        y = nn.relu(y)
        y = Conv3d(self.channels, dtype=self.dtype, name="conv1")(y)
        y = instance_norm(y, self.eps)
        y = nn.relu(y)
        y = Conv3d(self.channels, dtype=self.dtype, name="conv2")(y)
        return y + x


class _EnBlock2(nn.Module):
    """Post-activation residual block: [conv3 -> IN -> LeakyReLU] x2 + skip.

    (cls_wise_former.py:691-713; DeBlock :732-754 is identical.)
    """
    channels: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.channels, dtype=self.dtype, name="conv1")(x)
        y = leaky_relu(instance_norm(y, self.eps))
        y = Conv3d(self.channels, dtype=self.dtype, name="conv2")(y)
        y = leaky_relu(instance_norm(y, self.eps))
        return y + x


class UnetEncoder(nn.Module):
    """Returns (x1_1, x2_1, x3_1, bottleneck) like Unet.forward
    (Unet_skipconnection.py:114-144)."""
    base_channels: int = 16
    init_dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32
    remat: bool = True   # rematerialize residual blocks (full-res 3D conv
                         # activations at 128^3 otherwise OOM a 16GB chip)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        EnBlock = nn.remat(_EnBlock) if self.remat else _EnBlock
        b0 = self.base_channels
        x = Conv3d(b0, dtype=self.dtype, name="init_conv")(x)
        # Reference quirk: F.dropout3d is called with training=True even in
        # eval mode (Unet_skipconnection.py:31), making reference inference
        # stochastic.  We apply spatial dropout only when train=True.
        x = nn.Dropout(rate=self.init_dropout, broadcast_dims=(1, 2, 3),
                       deterministic=not train)(x)

        x1_1 = EnBlock(b0, dtype=self.dtype, name="en1_a")(x)
        x1_1 = EnBlock(b0, dtype=self.dtype, name="en1_b")(x1_1)
        x = Conv3d(b0 * 2, stride=2, dtype=self.dtype, name="down1")(x1_1)

        x2_1 = EnBlock(b0 * 2, dtype=self.dtype, name="en2_a")(x)
        x2_1 = EnBlock(b0 * 2, dtype=self.dtype, name="en2_b")(x2_1)
        x = Conv3d(b0 * 4, stride=2, dtype=self.dtype, name="down2")(x2_1)

        x3_1 = EnBlock(b0 * 4, dtype=self.dtype, name="en3_a")(x)
        x3_1 = EnBlock(b0 * 4, dtype=self.dtype, name="en3_b")(x3_1)
        x = Conv3d(b0 * 8, stride=2, dtype=self.dtype, name="down3")(x3_1)

        x4_1 = EnBlock(b0 * 8, dtype=self.dtype, name="en4_a")(x)
        x4_1 = EnBlock(b0 * 8, dtype=self.dtype, name="en4_b")(x4_1)
        # stride-1 widening conv ("EnDownTo8" with stride=1,
        # Unet_skipconnection.py:70-77,109)
        x4_1 = Conv3d(b0 * 16, stride=1, dtype=self.dtype, name="widen")(x4_1)
        return x1_1, x2_1, x3_1, x4_1


class DeUpCat(nn.Module):
    """1x1 conv -> transpose-conv x2 upsample -> concat skip -> 1x1 conv
    (cls_wise_former.py:716-729)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        x = Conv3d(self.out_channels, kernel_size=1, padding=0,
                   dtype=self.dtype, name="conv1")(x)
        y = ConvTranspose3d(self.out_channels, dtype=self.dtype, name="up")(x)
        y = jnp.concatenate([skip, y], axis=-1)
        y = Conv3d(self.out_channels, kernel_size=1, padding=0,
                   dtype=self.dtype, name="conv3")(y)
        return y


class Decoder(nn.Module):
    """UNet decoder with deep skip connections (cls_wise_former.py:614-664).

    ``embedding_dim`` is the bottleneck channel count (reference: 256).
    Output is softmax class probabilities — the reference bakes a Softmax into
    the decoder (:663), which its eval paths then softmax *again* for TTA
    averaging (predict_simple.py:333).  We preserve that by returning probs.
    """
    embedding_dim: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, x1_1, x2_1, x3_1, x):
        EnBlock2 = nn.remat(_EnBlock2) if self.remat else _EnBlock2
        e = self.embedding_dim
        x8 = Conv3d(e // 2, kernel_size=1, padding=0, dtype=self.dtype,
                    name="down_channel")(x)
        x8 = EnBlock2(e // 2, dtype=self.dtype, name="enblock8_1")(x8)
        x8 = EnBlock2(e // 2, dtype=self.dtype, name="enblock8_2")(x8)

        y4 = DeUpCat(e // 4, dtype=self.dtype, name="deup4")(x8, x3_1)
        y4 = EnBlock2(e // 4, dtype=self.dtype, name="deblock4")(y4)
        y4 = EnBlock2(e // 4, dtype=self.dtype, name="deblock4_1")(y4)

        y3 = DeUpCat(e // 8, dtype=self.dtype, name="deup3")(y4, x2_1)
        y3 = EnBlock2(e // 8, dtype=self.dtype, name="deblock3")(y3)
        y3 = EnBlock2(e // 8, dtype=self.dtype, name="deblock3_1")(y3)

        y2 = DeUpCat(e // 16, dtype=self.dtype, name="deup2")(y3, x1_1)
        y2 = EnBlock2(e // 16, dtype=self.dtype, name="deblock2")(y2)
        y2 = EnBlock2(e // 16, dtype=self.dtype, name="deblock2_1")(y2)

        y = Conv3d(self.num_classes, kernel_size=1, padding=0,
                   dtype=self.dtype, name="endconv")(y2)
        return nn.softmax(y.astype(jnp.float32), axis=-1)


class PlainUnet(nn.Module):
    """Standalone UNet encoder+decoder without the decouple/couple stages.

    The reference ships its UNet as a separately profileable model
    (Unet_skipconnection.py:147-161 builds and profiles it standalone); this
    is the segmentation-capable equivalent — encoder straight into the
    decoder — useful as an ablation baseline for the coupler machinery.
    """
    base_channels: int = 16
    num_classes: int = 4
    init_dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        enc = UnetEncoder(base_channels=self.base_channels,
                          init_dropout=self.init_dropout, dtype=self.dtype,
                          remat=self.remat, name="unet")
        x1_1, x2_1, x3_1, bottleneck = enc(x, train=train)
        dec = Decoder(self.base_channels * 16, self.num_classes,
                      dtype=self.dtype, remat=self.remat, name="decoder")
        return dec(x1_1, x2_1, x3_1, bottleneck)
