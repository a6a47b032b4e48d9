"""Space-to-depth execution strategy for full-resolution 3D convs.

Motivation (measured on TPU v5e, see docs/PERF.md): XLA pads a conv's
channel dims onto the 128-wide MXU lanes, so the model's full-res stages —
3x3x3 convs with 16 channels at 128^3 (Unet_skipconnection.py:48-56,
cls_wise_former.py:732-754) — run at ~6 TF/s against a ~200 TF/s dense
ceiling.  Re-expressing the SAME convolution on a space-to-depth view
(2x2x2 blocks folded into channels: 64^3 x 128ch) runs the MXU dense:
8x the arithmetic at ~137 TF/s ≈ 2.7x faster, and 5x+ for pointwise convs.

Everything here is an EXACT weight-space transform: parameters keep their
reference shapes (checkpoints interchangeable); the transforms build the
equivalent coarse-grid kernels at apply time (27*C*C floats — negligible).

Layout convention: s2d channel index = offset * C + c, offset = (oz*b+oy)*b+ox
(offset-major).  All transforms assume block b=2 and odd fine kernels.

Derivation for the 3^3 stride-1 SAME conv: with fine output f = 2*Co + o and
fine tap k, the input position 2*Co + (o+k-1) decomposes as
2*(Co + K - 1) + i with K = floor((o+k-1)/2)+1 in {0,1,2} and i in {0,1} —
i.e. a coarse 3^3 SAME conv whose kernel W'[K, i*C+ci, o*C+co] = W[k, ci, co]
for k = 2K + i - o - 1 (zero where k is out of range: W' is 1/8 dense).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

B = 2          # block size (fixed: the model's full-res stages are 2x finer)
B3 = B ** 3

# Execution strategy for the 3^3 stride-1 convs on the s2d view:
#   "dense" — conv_kernel's (3,3,3,8C,8C) coarse conv (1/8-dense weights,
#             8x logical FLOPs, measured 137 TF/s raw on v5e).
#   "fine"  — depth_to_space + fine_conv_kernel's (4,4,4,C,8C) stride-2
#             conv (64/27 = 2.37x logical FLOPs; contraction 4^3*C).
# Module-level so benchmarks/tests can flip it; the default is chosen by
# measurement on the real chip (scripts/micro_conv_bench.py, docs/PERF.md).
CONV3_STRATEGY = "dense"


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, D, H, W, C) -> (N, D/2, H/2, W/2, 8C), offset-major channels.

    Staged exact-order form: (ix, c) are already adjacent-contiguous (a
    free reshape), then one pass moves iy past w/2 (2C-element runs) and
    one moves iz past (h/2, w/2) (4C-element runs).  Bit-identical to the
    single 8-d transpose, but each pass has ONE moving dim instead of
    three, which XLA's transpose emitter handles 2.2x faster at the
    4-channel input shape (20.7 -> 9.4 ms standalone, -2 ms on the B=8
    eval forward — docs/PERF.md "input space_to_depth")."""
    n, d, h, w, c = x.shape
    y = x.reshape(n, d, h // B, B, w // B, B * c)
    y = y.transpose(0, 1, 2, 4, 3, 5)
    y = y.reshape(n, d // B, B, h // B, w // B, B * B * c)
    y = y.transpose(0, 1, 3, 4, 2, 5)
    return y.reshape(n, d // B, h // B, w // B, B3 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, d, h, w, cb = x.shape
    c = cb // B3
    x = x.reshape(n, d, h, w, B, B, B, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(n, d * B, h * B, w * B, c)


def _axis_table(kk: int) -> np.ndarray:
    """One-hot S[K, i, o, k]: coarse tap K picks fine tap k for (in-offset i,
    out-offset o).  kk = fine kernel size (odd)."""
    pad = (kk - 1) // 2
    kc = kk  # coarse kernel size equals fine size for b=2, kk odd <= 3
    s = np.zeros((kc, B, B, kk), np.float32)
    for o in range(B):
        for k in range(kk):
            t = o + k - pad              # fine input offset from 2*Co
            K = t // 2 + pad             # coarse tap index
            i = t - 2 * (t // 2)         # input offset within block
            if 0 <= K < kc:
                s[K, i, o, k] = 1.0
    return s


def conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Ci,Co) stride-1 SAME fine conv -> (3,3,3,8Ci,8Co) coarse."""
    kk, _, _, ci, co = w.shape
    s = jnp.asarray(_axis_table(kk))
    # out[a,b,c, i,j,l,d, o,p,r,e] = sum_{k,m,n} S[a,i,o,k] S[b,j,p,m]
    #                                S[c,l,r,n] w[k,m,n,d,e]
    t = jnp.einsum("aiok,bjpm,clrn,kmnde->abcijldopre", s, s, s, w)
    return t.reshape(kk, kk, kk, B3 * ci, B3 * co)


def fine_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Ci,Co) stride-1 SAME fine conv -> (4,4,4,Ci,8Co) strided kernel.

    The same logical conv as :func:`conv_kernel`, expressed as a 4^3
    stride-2 conv on the FINE input producing the s2d view directly:
    output coarse voxel Y, offset o reads fine window 2Y-1+p (p in 0..3,
    stride 2, padding (1,2)); tap W4[p, ci, o*Co+co] = W[p-o, ci, co]
    (zero outside 0 <= p-o <= 2).  Contraction is 4^3*Ci and output 8*Co —
    for Ci=16 both MXU-aligned at ~2.4x logical FLOPs (vs dense s2d's 8x).
    """
    kk, _, _, ci, co = w.shape
    assert kk == 3
    s = np.zeros((4, B, kk), np.float32)     # S[p, o, k]: k = p - o
    for o in range(B):
        for k in range(kk):
            s[o + k, o, k] = 1.0
    s = jnp.asarray(s)
    t = jnp.einsum("aok,bpm,cqn,kmnde->abcdopqe", s, s, s, w)
    return t.reshape(4, 4, 4, ci, B3 * co)


def conv3d_fine_s2dout(x: jnp.ndarray, w4: jnp.ndarray) -> jnp.ndarray:
    """Apply :func:`fine_conv_kernel`'s strided kernel: fine (N,D,H,W,Ci)
    -> s2d view (N,D/2,H/2,W/2,8Co)."""
    return jax.lax.conv_general_dilated(
        x, w4.astype(x.dtype), (2, 2, 2), [(1, 2)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


def down_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Ci,Co) stride-2 pad-1 fine conv -> (2,2,2,8Ci,Co) coarse conv
    with per-axis padding (1, 0); output lands on the PLAIN coarse grid."""
    kk, _, _, ci, co = w.shape
    assert kk == 3
    s = np.zeros((2, B, kk), np.float32)  # S[K, i, k]: o == 0 only
    for k in range(kk):
        t = k - 1                         # fine offset from 2*Co
        K, i = t // 2 + 1, t - 2 * (t // 2)
        s[K, i, k] = 1.0
    s = jnp.asarray(s)
    t = jnp.einsum("aik,bjm,cln,kmnde->abcijlde", s, s, s, w)
    return t.reshape(2, 2, 2, B3 * ci, co)


def pointwise_kernel(w: jnp.ndarray,
                     group_sizes: Sequence[int]) -> jnp.ndarray:
    """Fine 1x1 conv on a channel-concat of s2d tensors -> coarse 1x1.

    ``group_sizes``: fine channel count of each concatenated s2d group (the
    input channel layout is [g0*8ch, g1*8ch, ...], each group offset-major);
    sum(group_sizes) must equal w's input dim.  Output is offset-major 8Co.
    """
    if w.ndim == 5:
        w = w.reshape(w.shape[-2], w.shape[-1])
    cin, co = w.shape
    assert sum(group_sizes) == cin
    out = jnp.zeros((B3 * cin, B3 * co), w.dtype)
    base_fine = 0   # fine channel offset within w's input dim
    base_s2d = 0    # channel offset within the concatenated s2d input
    for g in group_sizes:
        blk = w[base_fine:base_fine + g]              # (g, co)
        # offset o of the group scatters to output offset o (block diagonal)
        for o in range(B3):
            out = out.at[base_s2d + o * g:base_s2d + (o + 1) * g,
                         o * co:(o + 1) * co].set(blk)
        base_fine += g
        base_s2d += B3 * g
    return out.reshape(1, 1, 1, B3 * cin, B3 * co)


def deconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(2,2,2,Ci,Co) stride-2 transpose conv -> (1,1,1,Ci,8Co) coarse 1x1
    producing the s2d view directly (kernel==stride: no overlap, each fine
    output 2*Co + o reads exactly tap o)."""
    k0, k1, k2, ci, co = w.shape
    assert (k0, k1, k2) == (B, B, B)
    # jax.lax.conv_transpose (DHWIO) uses the flipped-kernel (gradient)
    # convention: fine output 2*Co + o reads tap (1-oz, 1-oy, 1-ox)
    w = w[::-1, ::-1, ::-1]
    # offset-major output: channel (o, co), o = (oz*2+oy)*2+ox
    t = w.transpose(3, 0, 1, 2, 4).reshape(ci, B3 * co)
    return t.reshape(1, 1, 1, ci, B3 * co)


def tile_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """Fine per-channel bias -> s2d channels (offset-major: plain tile)."""
    return jnp.tile(bias, B3)


def instance_norm_s2d(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm with statistics per ORIGINAL fine channel: reduce over
    coarse spatial dims AND block offsets (equals instance_norm on the
    depth_to_space view; see dctseg/ops/norms.py for the f32 policy)."""
    n, d, h, w, cb = x.shape
    c = cb // B3
    xr = x.reshape(n, d, h, w, B3, c)
    axes = (1, 2, 3, 4)
    mean = jnp.mean(xr, axis=axes, keepdims=True, dtype=jnp.float32)
    sq = jnp.mean(jnp.square(xr.astype(jnp.float32)), axis=axes,
                  keepdims=True, dtype=jnp.float32)
    var = jnp.maximum(sq - jnp.square(mean), 0.0)
    scale = jax.lax.rsqrt(var + eps)
    y = (xr.astype(jnp.float32) - mean) * scale
    return y.astype(x.dtype).reshape(n, d, h, w, cb)


def conv3d_s2d(x: jnp.ndarray, w8: jnp.ndarray,
               stride: int = 1,
               padding: Tuple[int, int] = (1, 1),
               quantize: str = "none") -> jnp.ndarray:
    """conv_general_dilated on the s2d view (NDHWC/DHWIO).

    ``quantize="int8"`` executes the conv s8 x s8 -> s32 on the int8 MXU
    path (dynamic PTQ, dctseg/ops/quant.py) — inference-only.

    The 3^3 stride-1 SAME case (the dense-strategy hot shape) can carry
    an explicit VJP (:data:`CONV3_BWD` = "explicit") — built to attack
    the 3.0-3.9x in-model gradient cost the backward section profile
    found at this shape, then MEASURED NEGATIVE in-model (143.5 vs
    112.4 ms/step; docs/PERF.md "Round 5: inside the backward").  The
    default is XLA autodiff."""
    if quantize == "int8":
        from dctseg.ops.quant import conv3d_int8
        return conv3d_int8(x, w8, (stride,) * 3, (padding,) * 3)
    if (CONV3_BWD == "explicit" and stride == 1 and padding == (1, 1)
            and w8.shape[:3] == (3, 3, 3)):
        return _conv3_cv(x, w8)
    return jax.lax.conv_general_dilated(
        x, w8.astype(x.dtype), (stride,) * 3, (padding,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


# --- explicit backward for the 3^3 stride-1 SAME dense conv -----------------
#
# docs/PERF.md "Round 5: inside the backward": the full-res s2d conv
# gradients (en1 + deup2/deblock2) cost 49 ms of the 72 ms B=1 train
# backward at 3.0-3.9x their forward, where dx + dW each ~ one forward
# conv (2x total).  This explicit VJP — dx as the dense conv of the
# cotangent with the spatially-flipped, io-transposed kernel, dW as 27
# shifted (N*Z*Y*X, Ci)^T @ (N*Z*Y*X, Co) MXU matmuls over the padded
# input with f32 accumulation — is arithmetically the same gradient.
# MEASURED NEGATIVE on chip (scripts/measure_backward_attack.py +
# scripts/measure_remat.py --conv-bwd explicit, 2026-08-20): isolated,
# autodiff dx+dW 12.33 ms vs explicit 12.64 vs hybrid 12.72 (equal
# within noise — the isolated conv backward is only 1.69x its forward,
# so the in-model 3-3.9x is an interaction/layout effect, not the conv
# grad op); in-model, the explicit VJP makes the step WORSE: 143.5 vs
# 112.4 ms/step (the 27-read dW loses the fusion context autodiff's
# single-read grad conv keeps).  Default "xla" = autodiff; "explicit"
# remains a tested opt-in (module-level so tests/benchmarks can flip).
CONV3_BWD = "xla"


def _conv3_raw(x: jnp.ndarray, w8: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w8.astype(x.dtype), (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


@jax.custom_vjp
def _conv3_cv(x: jnp.ndarray, w8: jnp.ndarray) -> jnp.ndarray:
    return _conv3_raw(x, w8)


def _conv3_cv_fwd(x, w8):
    return _conv3_raw(x, w8), (x, w8)


def _conv3_cv_bwd(res, g):
    x, w8 = res
    wt = jnp.flip(w8, (0, 1, 2)).swapaxes(3, 4)
    dx = _conv3_raw(g, wt)
    d, h, w = x.shape[1:4]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    rows = [jnp.einsum("nzyxi,nzyxo->io",
                       xp[:, a:a + d, b:b + h, c:c + w, :], g,
                       preferred_element_type=jnp.float32)
            for a in range(3) for b in range(3) for c in range(3)]
    dw = (jnp.stack(rows, 0).reshape(3, 3, 3, *rows[0].shape)
          .astype(w8.dtype))
    return dx, dw


_conv3_cv.defvjp(_conv3_cv_fwd, _conv3_cv_bwd)


def conv3x3_s2d(x8: jnp.ndarray, w: jnp.ndarray,
                strategy: str = None,
                quantize: str = "none") -> jnp.ndarray:
    """The 3^3 stride-1 SAME conv on the s2d view.  ``w`` is the FINE
    (3,3,3,Ci,Co) kernel; ``strategy`` defaults to :data:`CONV3_STRATEGY`.

    "auto" picks per channel width from the v5e measurements in docs/PERF.md:
    "fine" wins for Ci >= 32 (XLA's strided-conv emitter reaches ~50 TF/s raw
    there, beating dense's 8x arithmetic), "dense" for narrower inputs.

    ``quantize`` is the ModelConfig spec (dctseg/ops/quant.py): the conv3
    op class applies to the dense strategy (the MXU-bound one: contraction
    27*8Ci); the fine strategy stays float."""
    strategy = strategy or CONV3_STRATEGY
    ci = w.shape[3]
    if strategy == "fine" or (strategy == "auto" and ci >= 32):
        return conv3d_fine_s2dout(depth_to_space(x8), fine_conv_kernel(w))
    from dctseg.ops.quant import enabled
    q = "int8" if enabled(quantize, "conv3") else "none"
    return conv3d_s2d(x8, conv_kernel(w), padding=(1, 1), quantize=q)
