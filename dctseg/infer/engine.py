"""Inference engines: jitted forward, flip-TTA, sliding-window tiling,
multi-checkpoint ensembling.

Covers the reference's four engines (SURVEY.md §1 pairing matrix):
  predict_simple.py — full-volume (128^3) 8-way flip TTA, softmax mean
  predict.py        — single-patch argmax (+ 3->4 label remap)
  predict_cls.py    — 8-crop tiling, optional TTA over tilings, ensembling
  predict_overlap.py— 8-crop tiling, no TTA

TPU-first design decisions:
  * The 8 flip variants are evaluated as ONE batched forward (B=8) instead of
    8 sequential model calls (predict_simple.py:333-349) — flips are free
    `lax.rev` ops fused into the same compiled program.
  * The 8 sliding-window crops are likewise one B=8 forward
    (vs the sequential loop at predict.py:45-54); stitch-back uses static
    slice assignments so a single compiled function serves every volume.
  * The reference softmaxes the decoder's already-softmaxed output again
    before averaging (predict_simple.py:333, Decoder softmax at
    cls_wise_former.py:663).  We reproduce that double softmax for parity.

Reference stitching quirk: the high-depth crops start at slice 27 but are
stitched with ``[..., 96:123]`` into ``[..., 128:155]`` (predict.py:60-63) —
a 5-slice misalignment.  ``stitch_mode='reference'`` reproduces it;
``'aligned'`` uses the correct ``101:128`` window.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

FLIP_COMBOS: List[tuple] = [
    (), (1,), (2,), (3,), (1, 2), (1, 3), (2, 3), (1, 2, 3),
]  # spatial axes of NDHWC; order matches predict_simple.py:333-347


class Predictor:
    """Jit-compiled inference over a fixed parameter set.

    ``microbatch`` caps the per-call forward batch (the TTA/tiling engines
    batch 8 variants; fp32 at B=8 exceeds a 16GB chip — pass microbatch=4
    to split, at the cost of one extra executable).

    ``mesh`` enables multi-chip inference (TPU headroom beyond the
    reference's single-process ``DataParallel`` eval, test_simple.py:76):
    the forward batch shards over the mesh's ``data`` axis (the 8 TTA/tiling
    variants fan out one per chip) and, on a 2-D mesh, each volume's D
    spatial axis shards over ``space`` (GSPMD conv halo exchange), dropping
    per-chip activation memory by the space factor."""

    def __init__(self, model, params, microbatch: Optional[int] = None,
                 mesh=None, fuse_dispatch: bool = False,
                 fold_params: bool = False):
        self.model = model
        self.params = params
        self.microbatch = microbatch
        self.mesh = mesh
        # Fold the batch-construction stage (tiling crops / TTA flips) into
        # the batched-forward executable: one dispatch round-trip fewer per
        # volume.  Only the single-chip, unsplit-batch path supports it.
        # Measured NEGATIVE on the idle host (pipelining already hides the
        # dispatch; the fused program is 2-5% slower) — ships off by
        # default as a mitigation for high-latency dispatch paths only
        # (scripts/measure_fused_dispatch.py, docs/PERF.md).
        self.fuse_dispatch = (fuse_dispatch and microbatch is None
                              and mesh is None)
        # Close the parameters over the forward jit as compile-time
        # constants so XLA constant-folds every apply-time weight
        # computation ONCE — the s2d weight-space transforms
        # (dctseg/ops/s2d.py conv_kernel/pointwise_kernel/...) and the int8
        # per-channel weight quantization (dctseg/ops/quant.py:70-71),
        # which the two-argument jit re-executes on every call because
        # params arrive as runtime inputs.  Embeds the ~64 MB parameter set
        # in the executable (like the AOT serving bundles);
        # ``update_params`` then recompiles, so sweeps/ensembles should
        # keep the default.  Folding evaluates the transforms in a
        # different op order than the fused runtime program, so results
        # are rounding-close (~1e-6 f32), not bit-exact — the numerics
        # class of any recompilation; under int8 a 1-ulp folded-scale
        # difference can flip individual weight roundings (same accuracy
        # class, bounded by test).  Single-chip only (the mesh path needs
        # params as shardable inputs).
        self.fold_params = fold_params and mesh is None
        self._fwd_cache = {}
        self._fwd = self._make_fwd(shard_batch_axis=False)

    def _make_fwd(self, shard_batch_axis: bool) -> Callable:
        if self.mesh is None:
            if self.fold_params:
                params = self.params
                fwd = jax.jit(
                    lambda x: self.model.apply(params, x, train=False)[0])
                return lambda p, x: fwd(x)
            return jax.jit(
                lambda p, x: self.model.apply(p, x, train=False)[0])
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dctseg.parallel.mesh import DATA_AXIS, SPACE_AXIS, replicated
        spec = P(DATA_AXIS if shard_batch_axis else None,
                 SPACE_AXIS if SPACE_AXIS in self.mesh.axis_names else None)
        bs = NamedSharding(self.mesh, spec)
        return jax.jit(lambda p, x: self.model.apply(p, x, train=False)[0],
                       in_shardings=(replicated(self.mesh), bs),
                       out_shardings=bs)

    def _batched_fwd(self, b: int) -> Callable:
        """Forward specialized to whether batch b can shard over `data`."""
        if self.mesh is None:
            return self._fwd
        from dctseg.parallel.mesh import data_size
        shard_b = data_size(self.mesh) > 1 and b % data_size(self.mesh) == 0
        if shard_b not in self._fwd_cache:
            self._fwd_cache[shard_b] = self._make_fwd(shard_b)
        return self._fwd_cache[shard_b]

    def _forward(self, params, xs):
        mb = self.microbatch
        if mb is None or xs.shape[0] <= mb:
            return self._batched_fwd(xs.shape[0])(params, xs)
        outs = [self._batched_fwd(min(mb, xs.shape[0] - i))(
                    params, xs[i:i + mb])
                for i in range(0, xs.shape[0], mb)]
        return jnp.concatenate(outs, axis=0)

    def update_params(self, params):
        """Swap checkpoints without recompiling (for ensembling/sweeps).

        Under ``fold_params`` the old parameters are baked into the
        executable, so the forward must be rebuilt (a recompile per
        swap — keep fold_params off for sweeps/ensembles)."""
        self.params = params
        if self.fold_params:
            self._fwd_cache.clear()
            self._fwd = self._make_fwd(shard_batch_axis=False)
            # fused-dispatch executables also close over the old params
            for cached in ("_flips_fwd_fn", "_crops_fwd_fn"):
                self.__dict__.pop(cached, None)

    def seg_probs(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, D, H, W, M) -> (B, D, H, W, C) decoder softmax probs."""
        return self._batched_fwd(x.shape[0])(self.params, x)

    # ---- flip TTA (predict_simple.py:333-349) ----

    @functools.cached_property
    def _flip_batch_fn(self) -> Callable:
        def flips(x):
            # x: (1, D, H, W, M) -> (8, D, H, W, M) flipped variants
            return jnp.concatenate(
                [jax.lax.rev(x, c) if c else x for c in FLIP_COMBOS], axis=0)
        return jax.jit(flips)

    @staticmethod
    def _unflip_mean_volume(probs):
        """(8, D, H, W, C) flip-variant probs -> (1, D, H, W, C) double-
        softmax mean (predict_simple.py:333-349).  Single definition serves
        the per-volume jit and the V-volume vmap."""
        acc = jnp.zeros_like(probs[0:1], dtype=jnp.float32)
        for i, c in enumerate(FLIP_COMBOS):
            p = probs[i:i + 1]
            p = jax.lax.rev(p, c) if c else p
            acc = acc + jax.nn.softmax(p.astype(jnp.float32), axis=-1)
        return acc / len(FLIP_COMBOS)

    @functools.cached_property
    def _unflip_mean_fn(self) -> Callable:
        return jax.jit(self._unflip_mean_volume)

    @functools.cached_property
    def _flips_fwd_fn(self) -> Callable:
        """Flip construction + B=8 forward as ONE program (see
        _crops_fwd_fn: the full monolith incl. unflip+mean crashes the TPU
        compiler, but fusing the free `lax.rev` stage saves a dispatch).
        Honors ``fold_params`` like _make_fwd (ADVICE r4: the combination
        used to silently lose the constant-folding benefit)."""
        def flips_fwd(p, x):
            # the jitted stage fn inlines when traced inside this jit, so
            # the flip construction has exactly one definition
            return self.model.apply(p, self._flip_batch_fn(x),
                                    train=False)[0]
        if self.fold_params:
            params = self.params
            fwd = jax.jit(lambda x: flips_fwd(params, x))
            return lambda p, x: fwd(x)
        return jax.jit(flips_fwd)

    def tta_probs(self, x: jnp.ndarray) -> jnp.ndarray:
        """8-way flip TTA with double-softmax averaging; x must be (1,...).

        Staged (flips -> shared B=8 forward -> unflip+mean) so the big
        batched-forward executable is shared with the tiling path and the
        TPU compiler never sees one monolithic program (which OOMs).
        ``fuse_dispatch`` folds the flip stage into the forward."""
        assert x.shape[0] == 1, "TTA operates per volume"
        if self.fuse_dispatch:
            probs = self._flips_fwd_fn(self.params, x)
        else:
            xs = self._flip_batch_fn(x)
            probs = self._forward(self.params, xs)
        return self._unflip_mean_fn(probs)

    @functools.cached_property
    def _flips_batch_fn(self) -> Callable:
        """V-volume flip builder: (V, ...) -> (8V, ...), volume-major
        (volume v's flip variants are rows 8v:8v+8).  Reuses _flip_batch_fn
        (inlined under this jit) so the flip order has one definition."""
        def flips_cat(x):
            return jnp.concatenate(
                [self._flip_batch_fn(x[v:v + 1]) for v in range(x.shape[0])],
                axis=0)
        return jax.jit(flips_cat)

    @functools.cached_property
    def _unflip_mean_batch_fn(self) -> Callable:
        """(8V, D, H, W, C) volume-major flip outputs -> (V, D, H, W, C)
        double-softmax means in ONE program (vs V per-volume dispatches)."""
        def unflip_batch(probs):
            pv = probs.reshape(-1, 8, *probs.shape[1:])
            return jax.vmap(Predictor._unflip_mean_volume)(pv)[:, 0]
        return jax.jit(unflip_batch)

    def tta_probs_batch(self, x: jnp.ndarray) -> jnp.ndarray:
        """(V, D, H, W, M) -> (V, D, H, W, C): V volumes' 8 flip variants
        batched through ONE forward program (B=8V).

        The TTA analogue of :meth:`tiled_probs_batch` — amortizes the
        per-program dispatch overhead over V volumes and runs the forward
        at the larger batch (docs/PERF.md "Paired tiling").
        Algorithmically identical to V calls of tta_probs (same flips,
        same double-softmax mean; bit-exact on CPU by test) — but B=8V is
        a different XLA executable, so on-chip bf16 results shift within
        rounding, like any batch-width change.  Throughput-only knob:
        per-volume latency scales with V."""
        if x.shape[0] == 1:
            return self.tta_probs(x)
        xs = self._flips_batch_fn(x)
        probs = self._forward(self.params, xs)
        return self._unflip_mean_batch_fn(probs)

    # ---- sliding-window tiling (predict.py:37-65) ----

    def _crops(self, d: int):
        """Static crop windows for a (240,240,155+) volume with 128^3 model
        input: {[:128],[112:240]}^2 in H,W x {[:128],[27:155]} in D."""
        return [
            (slice(0, 128), slice(0, 128), slice(0, 128)),
            (slice(0, 128), slice(112, 240), slice(0, 128)),
            (slice(112, 240), slice(0, 128), slice(0, 128)),
            (slice(112, 240), slice(112, 240), slice(0, 128)),
            (slice(0, 128), slice(0, 128), slice(27, 155)),
            (slice(0, 128), slice(112, 240), slice(27, 155)),
            (slice(112, 240), slice(0, 128), slice(27, 155)),
            (slice(112, 240), slice(112, 240), slice(27, 155)),
        ]

    @functools.cached_property
    def _crops_fn(self) -> Callable:
        def crops_cat(x):
            crops = self._crops(x.shape[3])
            return jnp.concatenate([x[:, h, w, d, :] for h, w, d in crops],
                                   axis=0)                     # (8,128^3,M)
        return jax.jit(crops_cat)

    @functools.cached_property
    def _crops_fwd_fn(self) -> Callable:
        """Crop extraction + B=8 forward as ONE program: saves one dispatch
        round-trip per volume.  The full tiling monolith
        (crops+forward+stitch) crashes the TPU compiler, so this is the
        deepest fusable split.  Measured slightly SLOWER than staged under
        depth-2 pipelining on the idle host (docs/PERF.md) — the option
        exists for dispatch-latency-dominated deployments."""
        def crops_fwd(p, x):
            # reuses _crops_fn (inlined under this jit): one definition of
            # the safety-critical crop windows serves both paths
            return self.model.apply(p, self._crops_fn(x), train=False)[0]
        if self.fold_params:   # see _flips_fwd_fn (ADVICE r4)
            params = self.params
            fwd = jax.jit(lambda x: crops_fwd(params, x))
            return lambda p, x: fwd(x)
        return jax.jit(crops_fwd)

    @staticmethod
    def _stitch_volume(t, stitch_ref: bool):
        """(8, 128^3, C) crop outputs -> (240, 240, 155, C) volume.

        Stitch-back (predict.py:56-63): later crops overwrite the
        16-voxel H/W overlap with their inner region.  The single
        definition serves the per-volume jit and the V-volume vmap."""
        c = t.shape[-1]
        y = jnp.zeros((240, 240, 155, c), t.dtype)
        y = y.at[:128, :128, :128].set(t[0])
        y = y.at[:128, 128:240, :128].set(t[1, :, 16:128, :])
        y = y.at[128:240, :128, :128].set(t[2, 16:128, :, :])
        y = y.at[128:240, 128:240, :128].set(t[3, 16:128, 16:128, :])
        lo, hi = (96, 123) if stitch_ref else (101, 128)
        y = y.at[:128, :128, 128:155].set(t[4, :, :, lo:hi])
        y = y.at[:128, 128:240, 128:155].set(t[5, :, 16:128, lo:hi])
        y = y.at[128:240, :128, 128:155].set(t[6, 16:128, :, lo:hi])
        y = y.at[128:240, 128:240, 128:155].set(
            t[7, 16:128, 16:128, lo:hi])
        return y

    @functools.cached_property
    def _stitch_fn(self) -> Callable:
        return jax.jit(lambda t, ref: self._stitch_volume(t, ref)[None],
                       static_argnums=1)

    @functools.cached_property
    def _stitch_batch_fn(self) -> Callable:
        """(8V, 128^3, C) volume-major crop outputs -> (V, 240, 240, 155, C)
        in ONE program (vs V per-volume stitch dispatches)."""
        def stitch_batch(t, stitch_ref: bool):
            tv = t.reshape(-1, 8, *t.shape[1:])
            return jax.vmap(Predictor._stitch_volume,
                            in_axes=(0, None))(tv, stitch_ref)
        return jax.jit(stitch_batch, static_argnums=1)

    def tiled_probs(self, x: jnp.ndarray,
                    stitch_mode: str = "reference") -> jnp.ndarray:
        """(1, 240, 240, >=155, M) -> (1, 240, 240, 155, C).

        Three jitted stages (crops -> batched forward -> stitch) rather than
        one fused program: the monolithic version crashes the TPU compiler,
        and splitting lets the B=8 forward executable be shared with other
        callers; per-volume dispatch overhead is negligible."""
        assert x.shape[0] == 1
        if self.fuse_dispatch:
            t = self._crops_fwd_fn(self.params, x)
        else:
            xs = self._crops_fn(x)
            t = self._forward(self.params, xs)
        return self._stitch_fn(t, stitch_mode == "reference")

    @functools.cached_property
    def _crops_batch_fn(self) -> Callable:
        """V-volume crop builder: (V, 240, 240, D, M) -> (8V, 128^3, M),
        volume-major (volume v's crops are rows 8v:8v+8).  Reuses _crops_fn
        (inlined under this jit) so the safety-critical crop windows have
        exactly one definition; shape-specialized per V like every jit."""
        def crops_cat(x):
            return jnp.concatenate(
                [self._crops_fn(x[v:v + 1]) for v in range(x.shape[0])],
                axis=0)
        return jax.jit(crops_cat)

    def tiled_probs_batch(self, x: jnp.ndarray,
                          stitch_mode: str = "reference") -> jnp.ndarray:
        """(V, 240, 240, >=155, M) -> (V, 240, 240, 155, C): V volumes'
        crops batched through ONE forward program (B=8V).

        Amortizes the per-program dispatch/launch overhead over V volumes —
        on a high-latency dispatch path (the axon relay pays ~35 ms per
        forward program regardless of batch, docs/PERF.md "relay ceiling")
        pairing volumes (V=2) trades HBM headroom for fewer program
        executions.  Numerics are identical to V calls of tiled_probs
        (same crop windows, same stitch; the forward is batch-parallel).
        Throughput-only knob: per-volume latency doubles."""
        if x.shape[0] == 1:
            return self.tiled_probs(x, stitch_mode)
        xs = self._crops_batch_fn(x)
        t = self._forward(self.params, xs)
        return self._stitch_batch_fn(t, stitch_mode == "reference")

    def tiled_tta_probs(self, x: jnp.ndarray,
                        stitch_mode: str = "reference") -> jnp.ndarray:
        """Flip TTA over full tilings (predict_cls.py:184-203 /
        predict.py TTA path): 8 flips x 8 crops = 64 forwards per volume,
        softmax mean.  Accepts V volumes — each flip variant batches all
        V volumes' crops through one B=8V forward (tiled_probs_batch)."""
        x = x[:, :, :, :155]
        acc = None
        for c in FLIP_COMBOS:
            xf = jax.lax.rev(x, c) if c else x
            y = self.tiled_probs_batch(xf, stitch_mode)
            y = jax.lax.rev(y, c) if c else y
            y = jax.nn.softmax(y.astype(jnp.float32), axis=-1)
            acc = y if acc is None else acc + y
        return acc / len(FLIP_COMBOS)


def ensemble_probs(predict_fn: Callable[[], jnp.ndarray],
                   predictor: Predictor,
                   param_sets: Sequence,
                   divisor: Optional[float] = None) -> jnp.ndarray:
    """Multi-checkpoint softmax ensembling (predict_cls.py:147-174): average
    ``predict_fn()`` over parameter sets.  The reference divides by a
    hard-coded 4 regardless of how many checkpoints exist; pass ``divisor``
    to reproduce, or None to divide by the actual count."""
    acc = None
    for ps in param_sets:
        predictor.update_params(ps)
        y = predict_fn()
        acc = y if acc is None else acc + y
    return acc / (divisor if divisor is not None else len(param_sets))
