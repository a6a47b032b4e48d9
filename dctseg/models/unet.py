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

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from dctseg.models.layers import (Conv3d, ConvParams, ConvTranspose3d,
                                  torch_kernel_init)
from dctseg.ops import s2d as s2dops
from dctseg.ops.norms import instance_norm, leaky_relu


# ---- space-to-depth execution strategy for the full-res stages ----
#
# The 128^3 stages have 16 channels; XLA pads conv channel dims onto the
# 128-wide MXU lanes, leaving them ~8x under-utilized (measured 6 TF/s,
# docs/PERF.md).  These modules run the SAME convolutions on a 64^3 x 128ch
# space-to-depth view via exact weight transforms (dctseg/ops/s2d.py);
# parameter tree paths/shapes/inits are IDENTICAL to the plain modules, so
# checkpoints are interchangeable and the strategy is a pure config flag.


# param declaration shared with the plain modules (moved to layers.py so
# the quantized Conv3d path can reuse it)
_ConvParams = ConvParams


def _remat_wrap(block_cls, remat: bool, policy: str = "full", **fixed):
    """Block remat with configurable granularity (ModelConfig.remat_policy).

    "full" recomputes the whole block in backward (stores block inputs
    only); "save_convs" saves the checkpoint_name-tagged conv outputs so
    the MXU-bound convolutions are not recomputed — only the cheap
    norm/activation elementwise work is (measured on chip, docs/PERF.md
    "Train step").  ``fixed`` kwargs are partially applied to the block
    constructor (e.g. fused_norms)."""
    if policy not in ("full", "save_convs"):
        # a real error, not an assert: under `python -O` a typo'd policy
        # would otherwise silently fall back to full remat (ADVICE r4)
        raise ValueError(f"unknown remat_policy {policy!r}; "
                         "expected 'full' or 'save_convs'")
    if not remat:
        cls = block_cls
    elif policy == "save_convs":
        cls = nn.remat(block_cls, policy=jax.checkpoint_policies
                       .save_only_these_names("conv_out"))
    else:
        cls = nn.remat(block_cls)
    return functools.partial(cls, **fixed) if fixed else cls


def _norm_act(x, eps: float, act: str, fused: bool, s2d_view: bool,
              residual=None):
    """InstanceNorm + activation (+ residual) with a fused-kernel option.

    The XLA path is the original composition (dctseg/ops/norms.py /
    ops/s2d.py); ``fused`` routes through the 2-pass Pallas kernel
    (ops/pallas/fusednorm.py) — inference-only, rounding-close."""
    if fused:
        from dctseg.ops.pallas.fusednorm import fused_instance_norm_act
        fc = x.shape[-1] // (s2dops.B3 if s2d_view else 1)
        return fused_instance_norm_act(x, fc, eps, act=act,
                                       residual=residual)
    y = (s2dops.instance_norm_s2d(x, eps) if s2d_view
         else instance_norm(x, eps))
    y = nn.relu(y) if act == "relu" else leaky_relu(y)
    return y + residual if residual is not None else y


class S2DConv3d(nn.Module):
    """Drop-in for Conv3d operating on the s2d view.

    kernel_size 3 keeps the s2d view; kernel_size 1 is a block-diagonal
    pointwise conv (``groups`` gives fine channel sizes of concatenated s2d
    inputs); stride 2 lands on the PLAIN coarse grid (for EnDown).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: tuple = ()
    dtype: jnp.dtype = jnp.float32
    conv3: str = "dense"
    quantize: str = "none"   # ModelConfig spec (dctseg/ops/quant.py): the
    # conv3 class covers the 3^3 stride-1 conv (the MXU-bound one:
    # contraction 27*8Ci); the pw/down classes opt the pointwise and
    # stride-2 instances in (off under plain "int8" — chip-measured,
    # docs/PERF.md r5 "int8 residue")

    @nn.compact
    def __call__(self, x8):
        from dctseg.ops.quant import enabled
        cin = (sum(self.groups) if self.groups
               else x8.shape[-1] // s2dops.B3)
        kernel, bias = _ConvParams(self.features, cin, self.kernel_size,
                                   name="Conv_0")()
        w = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        if self.kernel_size == 1:
            w8 = s2dops.pointwise_kernel(w, self.groups or (cin,))
            q = "int8" if enabled(self.quantize, "pw") else "none"
            y = s2dops.conv3d_s2d(x8, w8, padding=(0, 0), quantize=q)
            y = y + s2dops.tile_bias(b)
        elif self.stride == 2:
            q = "int8" if enabled(self.quantize, "down") else "none"
            y = s2dops.conv3d_s2d(x8, s2dops.down_kernel(w), padding=(1, 0),
                                  quantize=q)
            y = y + b
        else:
            y = s2dops.conv3x3_s2d(x8, w, self.conv3, self.quantize)
            y = y + s2dops.tile_bias(b)
        # tag for ModelConfig(remat_policy="save_convs"), see layers.Conv3d
        return checkpoint_name(y, "conv_out")


class S2DDeconv(nn.Module):
    """ConvTranspose3d(k=2, s=2) emitting the s2d view directly: the
    upsample becomes a full-lane 1x1 conv at coarse resolution.

    ``quantize``: the deconv op class (dctseg/ops/quant.py) runs it int8."""
    features: int
    dtype: jnp.dtype = jnp.float32
    quantize: str = "none"

    @nn.compact
    def __call__(self, x):
        from dctseg.ops.quant import enabled
        cin = x.shape[-1]
        kernel, bias = _ConvParams(self.features, cin, 2,
                                   name="ConvTranspose_0")()
        w8 = s2dops.deconv_kernel(kernel.astype(self.dtype))
        q = "int8" if enabled(self.quantize, "deconv") else "none"
        y = s2dops.conv3d_s2d(x, w8, padding=(0, 0), quantize=q)
        return y + s2dops.tile_bias(bias.astype(self.dtype))


class _EnBlockS2D(nn.Module):
    """_EnBlock on the s2d view (identical math, see _EnBlock)."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5
    conv3: str = "dense"
    quantize: str = "none"
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x):
        y = _norm_act(x, self.eps, "relu", self.fused_norms, True)
        y = S2DConv3d(self.channels, dtype=self.dtype, conv3=self.conv3,
                      quantize=self.quantize, name="conv1")(y)
        y = _norm_act(y, self.eps, "relu", self.fused_norms, True)
        y = S2DConv3d(self.channels, dtype=self.dtype, conv3=self.conv3,
                      quantize=self.quantize, name="conv2")(y)
        return y + x


class _EnBlock2S2D(nn.Module):
    """_EnBlock2 on the s2d view (identical math, see _EnBlock2)."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5
    conv3: str = "dense"
    quantize: str = "none"
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x):
        y = S2DConv3d(self.channels, dtype=self.dtype, conv3=self.conv3,
                      quantize=self.quantize, name="conv1")(x)
        y = _norm_act(y, self.eps, "lrelu", self.fused_norms, True)
        y = S2DConv3d(self.channels, dtype=self.dtype, conv3=self.conv3,
                      quantize=self.quantize, name="conv2")(y)
        return _norm_act(y, self.eps, "lrelu", self.fused_norms, True,
                         residual=x)


class _EnBlock(nn.Module):
    """Pre-activation residual block: [IN -> ReLU -> conv3] x2 + skip."""
    channels: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5
    quantize: str = "none"
    fused_norms: bool = False

    @nn.compact
    def __call__(self, x):
        y = _norm_act(x, self.eps, "relu", self.fused_norms, False)
        y = Conv3d(self.channels, dtype=self.dtype,
                   quantize=self.quantize, name="conv1")(y)
        y = _norm_act(y, self.eps, "relu", self.fused_norms, False)
        y = Conv3d(self.channels, dtype=self.dtype,
                   quantize=self.quantize, name="conv2")(y)
        return y + x


class _EnBlock2(nn.Module):
    """Post-activation residual block: [conv3 -> IN -> LeakyReLU] x2 + skip.

    (cls_wise_former.py:691-713; DeBlock :732-754 is identical.)

    ``spatial_gate``: forwarded to Conv3d — the decoder's small direct
    stages (enblock8*/deblock4*) opt in so int8 skips them below
    quant.MIN_SPATIAL_ELEMS (measured slower there, docs/PERF.md r5).
    """
    channels: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5
    quantize: str = "none"
    fused_norms: bool = False
    spatial_gate: bool = False

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.channels, dtype=self.dtype,
                   quantize=self.quantize,
                   spatial_gate=self.spatial_gate, name="conv1")(x)
        y = _norm_act(y, self.eps, "lrelu", self.fused_norms, False)
        y = Conv3d(self.channels, dtype=self.dtype,
                   quantize=self.quantize,
                   spatial_gate=self.spatial_gate, name="conv2")(y)
        return _norm_act(y, self.eps, "lrelu", self.fused_norms, False,
                         residual=x)


class UnetEncoder(nn.Module):
    """Returns (x1_1, x2_1, x3_1, bottleneck) like Unet.forward
    (Unet_skipconnection.py:114-144)."""
    base_channels: int = 16
    init_dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32
    remat: bool = True   # rematerialize residual blocks (full-res 3D conv
                         # activations at 128^3 otherwise OOM a 16GB chip)
    remat_policy: str = "full"  # remat granularity (see _remat_wrap)
    fused_norms: bool = False  # fused Pallas norm+act in the blocks
    s2d: bool = True     # run the full-res stage space-to-depth (x1_1 is
                         # then returned in the s2d view; the decoder's
                         # matching flag consumes it)
    s2d_half: bool = True  # likewise for the half-res stage (x2_1 returned
                           # in the s2d view); independent of `s2d`
    conv3: str = "dense"   # 3^3 conv strategy on s2d views (see ops/s2d.py)
    quantize: str = "none"  # "int8": dynamic PTQ for the MXU-bound 3^3
    # convs (dense-s2d stages + >=64ch direct stages); inference-only
    tap: str = ""  # profiling: return the named intermediate alone instead
    # of the 4-tuple ("s2d_in" | "init" | "en1" | "down1" | "half_in" |
    # "en2" | "down2" | "en3" | "down3" | "en4"); section times come from
    # differencing tapped programs (scripts/profile_decoder.py --only enc).
    # Taps assume the default s2d/s2d_half layout; "" in production.

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b0 = self.base_channels
        if self.s2d:
            EnBlock = _remat_wrap(_EnBlockS2D, self.remat,
                                  self.remat_policy,
                                  fused_norms=self.fused_norms)
            # NOT the Pallas relayout kernel (ops/pallas/relayout.py):
            # in-model XLA fuses this transpose into init_conv's input
            # gather, and the opaque kernel boundary that wins standalone
            # (15.0 vs 20.1 ms) loses fused (+4.8 ms on the B=8 forward)
            # — docs/PERF.md "input space_to_depth"
            x = s2dops.space_to_depth(x.astype(self.dtype))
            if self.tap == "s2d_in":
                return x
            x = S2DConv3d(b0, dtype=self.dtype, conv3=self.conv3,
                          quantize=self.quantize, name="init_conv")(x)
            # spatial dropout zeroes whole fine channels: reshape so the
            # mask broadcasts over (coarse spatial, block offsets)
            n, d, h, w, cb = x.shape
            x = x.reshape(n, d, h, w, s2dops.B3, cb // s2dops.B3)
            x = nn.Dropout(rate=self.init_dropout,
                           broadcast_dims=(1, 2, 3, 4),
                           deterministic=not train)(x)
            x = x.reshape(n, d, h, w, cb)
            if self.tap == "init":
                return x
            x1_1 = EnBlock(b0, dtype=self.dtype, conv3=self.conv3,
                           quantize=self.quantize, name="en1_a")(x)
            x1_1 = EnBlock(b0, dtype=self.dtype, conv3=self.conv3,
                           quantize=self.quantize, name="en1_b")(x1_1)
            if self.tap == "en1":
                return x1_1
            x = S2DConv3d(b0 * 2, stride=2, dtype=self.dtype,
                          quantize=self.quantize, name="down1")(x1_1)
            if self.tap == "down1":
                return x
        else:
            EnBlock = _remat_wrap(_EnBlock, self.remat, self.remat_policy,
                                  fused_norms=self.fused_norms)
            x = Conv3d(b0, dtype=self.dtype, name="init_conv")(x)
            # Reference quirk: F.dropout3d is called with training=True even
            # in eval mode (Unet_skipconnection.py:31), making reference
            # inference stochastic.  We apply dropout only when train=True.
            x = nn.Dropout(rate=self.init_dropout, broadcast_dims=(1, 2, 3),
                           deterministic=not train)(x)

            x1_1 = EnBlock(b0, dtype=self.dtype, name="en1_a")(x)
            x1_1 = EnBlock(b0, dtype=self.dtype, name="en1_b")(x1_1)
            x = Conv3d(b0 * 2, stride=2, dtype=self.dtype,
                       name="down1")(x1_1)
        EnBlock = _remat_wrap(_EnBlock, self.remat, self.remat_policy,
                              fused_norms=self.fused_norms)

        if self.s2d_half:
            EnBlockH = _remat_wrap(_EnBlockS2D, self.remat,
                                   self.remat_policy,
                                   fused_norms=self.fused_norms)
            x = s2dops.space_to_depth(x)
            if self.tap == "half_in":
                return x
            x2_1 = EnBlockH(b0 * 2, dtype=self.dtype, conv3=self.conv3,
                            quantize=self.quantize, name="en2_a")(x)
            x2_1 = EnBlockH(b0 * 2, dtype=self.dtype, conv3=self.conv3,
                            quantize=self.quantize, name="en2_b")(x2_1)
            if self.tap == "en2":
                return x2_1
            x = S2DConv3d(b0 * 4, stride=2, dtype=self.dtype,
                          quantize=self.quantize, name="down2")(x2_1)
            if self.tap == "down2":
                return x
        else:
            x2_1 = EnBlock(b0 * 2, dtype=self.dtype, name="en2_a")(x)
            x2_1 = EnBlock(b0 * 2, dtype=self.dtype, name="en2_b")(x2_1)
            x = Conv3d(b0 * 4, stride=2, dtype=self.dtype,
                       name="down2")(x2_1)

        x3_1 = EnBlock(b0 * 4, dtype=self.dtype,
                       quantize=self.quantize, name="en3_a")(x)
        x3_1 = EnBlock(b0 * 4, dtype=self.dtype,
                       quantize=self.quantize, name="en3_b")(x3_1)
        if self.tap == "en3":
            return x3_1
        x = Conv3d(b0 * 8, stride=2, dtype=self.dtype,
                   quantize=self.quantize, name="down3")(x3_1)
        if self.tap == "down3":
            return x

        x4_1 = EnBlock(b0 * 8, dtype=self.dtype,
                       quantize=self.quantize, name="en4_a")(x)
        x4_1 = EnBlock(b0 * 8, dtype=self.dtype,
                       quantize=self.quantize, name="en4_b")(x4_1)
        # stride-1 widening conv ("EnDownTo8" with stride=1,
        # Unet_skipconnection.py:70-77,109)
        x4_1 = Conv3d(b0 * 16, stride=1, dtype=self.dtype,
                      quantize=self.quantize, name="widen")(x4_1)
        if self.tap == "en4":
            return x4_1
        return x1_1, x2_1, x3_1, x4_1


class DeUpCat(nn.Module):
    """1x1 conv -> transpose-conv x2 upsample -> concat skip -> 1x1 conv
    (cls_wise_former.py:716-729)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    quantize: str = "none"  # pw class covers conv1/conv3 (>=64ch gate in
    # layers.Conv3d); the transpose conv stays float (thin channels)

    @nn.compact
    def __call__(self, x, skip):
        x = Conv3d(self.out_channels, kernel_size=1, padding=0,
                   dtype=self.dtype, quantize=self.quantize,
                   name="conv1")(x)
        y = ConvTranspose3d(self.out_channels, dtype=self.dtype, name="up")(x)
        y = jnp.concatenate([skip, y], axis=-1)
        y = Conv3d(self.out_channels, kernel_size=1, padding=0,
                   dtype=self.dtype, quantize=self.quantize,
                   name="conv3")(y)
        return y


class DeUpCatS2D(nn.Module):
    """DeUpCat for the full-res stage on the s2d view: the x2 transpose-conv
    upsample becomes a full-lane 1x1 conv at coarse resolution, the skip
    concat happens in s2d channel groups, and conv3 is the matching
    block-diagonal pointwise conv.  Identical math to DeUpCat.

    ``s2d_input``: x arrives as the s2d view of its own (half) resolution
    (the s2d_half decoder stage feeding the s2d full-res stage): conv1
    runs as the block-diagonal pointwise conv THERE — full MXU lanes vs
    XLA's slow thin-channel plain 1x1 — and depth_to_space moves half the
    bytes (16ch instead of 32ch).  Exact reorder of the same ops; chip
    measurement: 6.9 ms vs 9.0 ms for d2s-then-1x1 (docs/PERF.md r4)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    s2d_input: bool = False
    quantize: str = "none"  # pw class: conv1/conv3; deconv class: up

    @nn.compact
    def __call__(self, x, skip8):
        if self.s2d_input:
            x = S2DConv3d(self.out_channels, kernel_size=1,
                          groups=(x.shape[-1] // s2dops.B3,),
                          dtype=self.dtype, quantize=self.quantize,
                          name="conv1")(x)
            x = s2dops.depth_to_space(x)
        else:
            x = Conv3d(self.out_channels, kernel_size=1, padding=0,
                       dtype=self.dtype, quantize=self.quantize,
                       name="conv1")(x)
        y8 = S2DDeconv(self.out_channels, dtype=self.dtype,
                       quantize=self.quantize, name="up")(x)
        skip_fine = skip8.shape[-1] // s2dops.B3
        y8 = jnp.concatenate([skip8, y8], axis=-1)
        return S2DConv3d(self.out_channels, kernel_size=1,
                         groups=(skip_fine, self.out_channels),
                         dtype=self.dtype, quantize=self.quantize,
                         name="conv3")(y8)


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
    remat_policy: str = "full"  # remat granularity (see _remat_wrap)
    fused_norms: bool = False  # fused Pallas norm+act(+residual) in blocks
    tap: str = ""  # profiling: return the named intermediate instead of the
    # probs ("x8" | "y4" | "y3" | "y3d" | "y2"); section times inside the
    # decoder come from differencing tapped programs
    # (scripts/profile_decoder.py) — "" (full decoder) in production
    s2d: bool = True     # full-res stage on the s2d view; x1_1 must arrive
                         # in the s2d view (UnetEncoder(s2d=True))
    s2d_half: bool = True  # half-res stage likewise; x2_1 in the s2d view
    conv3: str = "dense"   # 3^3 conv strategy on s2d views (see ops/s2d.py)
    quantize: str = "none"  # see UnetEncoder

    @nn.compact
    def __call__(self, x1_1, x2_1, x3_1, x):
        EnBlock2 = _remat_wrap(_EnBlock2, self.remat, self.remat_policy,
                               fused_norms=self.fused_norms)
        e = self.embedding_dim
        x8 = Conv3d(e // 2, kernel_size=1, padding=0, dtype=self.dtype,
                    name="down_channel")(x)
        x8 = EnBlock2(e // 2, dtype=self.dtype, spatial_gate=True,
                      quantize=self.quantize, name="enblock8_1")(x8)
        x8 = EnBlock2(e // 2, dtype=self.dtype, spatial_gate=True,
                      quantize=self.quantize, name="enblock8_2")(x8)
        if self.tap == "x8":
            return x8

        y4 = DeUpCat(e // 4, dtype=self.dtype,
                     quantize=self.quantize, name="deup4")(x8, x3_1)
        y4 = EnBlock2(e // 4, dtype=self.dtype, spatial_gate=True,
                      quantize=self.quantize, name="deblock4")(y4)
        y4 = EnBlock2(e // 4, dtype=self.dtype, spatial_gate=True,
                      quantize=self.quantize, name="deblock4_1")(y4)
        if self.tap == "y4":
            return y4

        if self.s2d_half:
            Block2H = _remat_wrap(_EnBlock2S2D, self.remat,
                                  self.remat_policy,
                                  fused_norms=self.fused_norms)
            y3 = DeUpCatS2D(e // 8, dtype=self.dtype,
                            quantize=self.quantize, name="deup3")(y4, x2_1)
            y3 = Block2H(e // 8, dtype=self.dtype, conv3=self.conv3,
                         quantize=self.quantize, name="deblock3")(y3)
            y3 = Block2H(e // 8, dtype=self.dtype, conv3=self.conv3,
                         quantize=self.quantize, name="deblock3_1")(y3)
            if self.tap == "y3":
                return y3
            if not self.s2d:
                # back to the plain grid for the plain deup2
                y3 = s2dops.depth_to_space(y3)
            if self.tap == "y3d":
                return y3
        else:
            y3 = DeUpCat(e // 8, dtype=self.dtype,
                         quantize=self.quantize, name="deup3")(y4, x2_1)
            y3 = EnBlock2(e // 8, dtype=self.dtype, name="deblock3")(y3)
            y3 = EnBlock2(e // 8, dtype=self.dtype, name="deblock3_1")(y3)

        if self.s2d:
            Block2 = _remat_wrap(_EnBlock2S2D, self.remat,
                                 self.remat_policy,
                                 fused_norms=self.fused_norms)
            # with s2d_half on, y3 is still the half-res s2d view: deup2's
            # conv1 runs there (full lanes) and d2s moves 16ch, not 32
            y2 = DeUpCatS2D(e // 16, dtype=self.dtype,
                            s2d_input=self.s2d_half,
                            quantize=self.quantize,
                            name="deup2")(y3, x1_1)
            y2 = Block2(e // 16, dtype=self.dtype, conv3=self.conv3,
                        quantize=self.quantize, name="deblock2")(y2)
            y2 = Block2(e // 16, dtype=self.dtype, conv3=self.conv3,
                        quantize=self.quantize, name="deblock2_1")(y2)
            if self.tap == "y2":
                return y2
            y = S2DConv3d(self.num_classes, kernel_size=1,
                          dtype=self.dtype, name="endconv")(y2)
            # softmax on the s2d layout (each class group o*C+c holds the
            # SAME summands), THEN depth_to_space: XLA fuses the transpose
            # into the softmax's output write instead of paying a separate
            # f32 round trip — bit-exact, 21.4 -> 13.7 ms measured on chip
            # (docs/PERF.md r4 "endconv tail")
            n, d, h, w, cb = y.shape
            y = nn.softmax(
                y.astype(jnp.float32).reshape(n, d, h, w, s2dops.B3,
                                              self.num_classes), axis=-1)
            return s2dops.depth_to_space(y.reshape(n, d, h, w, cb))
        y2 = DeUpCat(e // 16, dtype=self.dtype,
                     quantize=self.quantize, name="deup2")(y3, x1_1)
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
    remat_policy: str = "full"
    fused_norms: bool = False
    s2d: bool = True
    s2d_half: bool = True
    conv3: str = "dense"
    quantize: str = "none"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.astype(self.dtype)
        enc = UnetEncoder(base_channels=self.base_channels,
                          init_dropout=self.init_dropout, dtype=self.dtype,
                          remat=self.remat, remat_policy=self.remat_policy,
                          fused_norms=self.fused_norms, s2d=self.s2d,
                          s2d_half=self.s2d_half, conv3=self.conv3,
                          quantize=self.quantize, name="unet")
        x1_1, x2_1, x3_1, bottleneck = enc(x, train=train)
        dec = Decoder(self.base_channels * 16, self.num_classes,
                      dtype=self.dtype, remat=self.remat,
                      remat_policy=self.remat_policy,
                      fused_norms=self.fused_norms, s2d=self.s2d,
                      s2d_half=self.s2d_half, conv3=self.conv3,
                      quantize=self.quantize, name="decoder")
        return dec(x1_1, x2_1, x3_1, bottleneck)
