"""AOT serving bundles: the inference engines as portable ``jax.export``
artifacts (serialized StableHLO), weights embedded.

The reference's deployment story is "ship the python model class + a
``.pth`` and rebuild the module at load time" (predict_simple.py:283-300);
any drift in the model code changes what a checkpoint means.  A serving
bundle instead pins the *program*: each jitted stage of the staged
inference engine (dctseg/infer/engine.py) is exported with the parameters
embedded as constants and serialized to disk.  A serving host needs jax
and the bundle — not Flax, not the model code, not the checkpoint — and
replays byte-identical computation regardless of library-code drift.
Cross-platform lowering (``platforms=("tpu", "cpu")``) lets a CPU build
host produce TPU-servable artifacts.

The bundle keeps the engine's staged-jit structure (crops -> forward ->
stitch; flips -> forward -> unflip): the monolithic fused program crashes
the TPU compiler (docs/PERF.md), and the staged stages are exactly what
the live ``Predictor`` runs (the exported callables ARE the Predictor's
stage functions).  Outputs match the live engine to float ULP: the AOT
loader may retune codegen (e.g. FMA contraction) for the serving host's
machine features, so bit-identity holds only when those match the export
target; numerics are otherwise identical.

Layout on disk::

    bundle/
      MANIFEST.json     format, strategy, shapes, dtypes, jax version
      forward.jaxexp    serialized Exported per stage (strategy-dependent)
      crops.jaxexp / stitch.jaxexp            [tiling]
      flips.jaxexp / unflip_mean.jaxexp       [tta]
      crops_flip{0..7}.jaxexp / stitch.jaxexp
        / unflip_mean.jaxexp                  [tiling_tta]
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dctseg.infer.engine import FLIP_COMBOS, Predictor

MANIFEST_NAME = "MANIFEST.json"
_FORMAT = 1


def _spec(shape: Tuple[int, ...], dtype) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(tuple(int(s) for s in shape),
                                jnp.dtype(dtype))


def export_bundle(predictor: Predictor, out_dir: str, *,
                  strategy: str = "tiling",
                  input_shape: Optional[Tuple[int, ...]] = None,
                  in_channels: int = 4,
                  input_dtype=jnp.float32,
                  stitch_mode: str = "reference",
                  batch_volumes: int = 1,
                  platforms: Optional[Sequence[str]] = None) -> Dict:
    """Export ``predictor``'s ``strategy`` engine to ``out_dir``.

    ``input_shape`` is the spatial (D, H, W) the bundle will accept:
    defaults to (240, 240, 160) for ``tiling`` (the BraTS sliding-window
    geometry, reference predict.py:40-47) and is required for
    ``single``/``tta`` (the crop-sized volume the model was trained on).
    ``platforms`` forwards to ``jax.export`` (e.g. ``("tpu", "cpu")`` for
    an artifact that runs on either); None pins the default platform.

    ``batch_volumes=V`` exports a paired bundle: every request carries V
    volumes ``(V, D, H, W, M)`` and the tiling forward runs B=8V — the
    measured throughput optimum on a 16 GB v5e is V=3 bf16 (docs/PERF.md
    "Paired tiling"; AOT programs are shape-specialized, so the request
    batch is fixed at export time).  Supported for ``tiling`` and
    ``single``; the flip-TTA strategies stay per-volume.

    Returns the manifest dict (also written to ``MANIFEST.json``).
    """
    from jax import export as jx

    if strategy not in ("single", "tta", "tiling", "tiling_tta"):
        raise ValueError(f"unsupported serving strategy {strategy!r}")
    batch_volumes = int(batch_volumes)
    if batch_volumes < 1:
        raise ValueError(f"batch_volumes must be >= 1, got {batch_volumes}")
    if batch_volumes > 1 and strategy not in ("tiling", "single"):
        raise ValueError("batch_volumes>1 is supported for 'tiling' and "
                         f"'single' bundles, not {strategy!r} (flip TTA "
                         "operates per volume)")
    if input_shape is None:
        if strategy not in ("tiling", "tiling_tta"):
            raise ValueError("input_shape (D, H, W) is required for "
                             f"strategy {strategy!r}")
        input_shape = (240, 240, 160)
    input_shape = tuple(int(s) for s in input_shape)
    if strategy in ("tiling", "tiling_tta") and (input_shape[:2] != (240, 240)
                                                 or input_shape[2] < 155):
        raise ValueError("tiling windows are fixed to the BraTS "
                         "240x240x(>=155) geometry (predict.py:40-47), got "
                         f"{input_shape}")

    kwargs = {} if platforms is None else {"platforms": list(platforms)}

    def ex(fn, *specs):
        return jx.export(fn, **kwargs)(*specs)

    # forward with the parameters embedded as program constants: the
    # serving artifact is self-contained (no checkpoint at load time)
    params = predictor.params
    fwd = jax.jit(
        lambda x: predictor.model.apply(params, x, train=False)[0])

    vol = _spec((batch_volumes, *input_shape, in_channels), input_dtype)
    exported: Dict[str, jax.export.Exported] = {}
    if strategy == "single":
        exported["forward"] = ex(fwd, vol)
        out_aval = exported["forward"].out_avals[0]
    elif strategy == "tta":
        flips = predictor._flip_batch_fn
        exported["flips"] = ex(flips, vol)
        batch = _spec(exported["flips"].out_avals[0].shape, input_dtype)
        exported["forward"] = ex(fwd, batch)
        probs = exported["forward"].out_avals[0]
        exported["unflip_mean"] = ex(predictor._unflip_mean_fn,
                                     _spec(probs.shape, probs.dtype))
        out_aval = exported["unflip_mean"].out_avals[0]
    elif strategy == "tiling":
        # V=1 exports the per-volume crop/stitch programs; V>1 the
        # volume-major batched ones (engine.tiled_probs_batch's stages) —
        # one B=8V forward per request
        crops = (predictor._crops_fn if batch_volumes == 1
                 else predictor._crops_batch_fn)
        exported["crops"] = ex(crops, vol)
        batch = _spec(exported["crops"].out_avals[0].shape, input_dtype)
        exported["forward"] = ex(fwd, batch)
        probs = exported["forward"].out_avals[0]
        stitch_ref = stitch_mode == "reference"
        if batch_volumes == 1:
            stitch = jax.jit(
                lambda t: Predictor._stitch_volume(t, stitch_ref)[None])
        else:
            stitch = jax.jit(lambda t: jax.vmap(
                Predictor._stitch_volume, in_axes=(0, None))(
                    t.reshape(-1, 8, *t.shape[1:]), stitch_ref))
        exported["stitch"] = ex(stitch, _spec(probs.shape, probs.dtype))
        out_aval = exported["stitch"].out_avals[0]
    else:  # tiling_tta: flip TTA over full tilings (engine.tiled_tta_probs)
        # 8 flip-folded crop builders share ONE forward and stitch program;
        # a final static program unflips and softmax-means the 8 stitched
        # tilings.  The flip is folded into the crop stage (lax.rev on the
        # 155-truncated volume, exactly the live engine's order) so the 8
        # heavy dispatches reuse the same B=8 forward executable — the same
        # staged structure that keeps the TPU compiler happy live.
        for i, combo in enumerate(FLIP_COMBOS):
            def crops_flip(x, c=combo):
                xf = x[:, :, :, :155]
                xf = jax.lax.rev(xf, c) if c else xf
                return predictor._crops_fn(xf)
            exported[f"crops_flip{i}"] = ex(jax.jit(crops_flip), vol)
        batch = _spec(exported["crops_flip0"].out_avals[0].shape, input_dtype)
        exported["forward"] = ex(fwd, batch)
        probs = exported["forward"].out_avals[0]
        stitch_ref = stitch_mode == "reference"
        stitch = jax.jit(
            lambda t: Predictor._stitch_volume(t, stitch_ref)[None])
        exported["stitch"] = ex(stitch, _spec(probs.shape, probs.dtype))
        sv = exported["stitch"].out_avals[0]

        def unflip_mean(ys):  # (8, 240, 240, 155, C) in FLIP_COMBOS order
            acc = None
            for i, c in enumerate(FLIP_COMBOS):
                y = ys[i][None]
                y = jax.lax.rev(y, c) if c else y
                y = jax.nn.softmax(y.astype(jnp.float32), axis=-1)
                acc = y if acc is None else acc + y
            return acc / len(FLIP_COMBOS)

        exported["unflip_mean"] = ex(jax.jit(unflip_mean),
                                     _spec((8, *sv.shape[1:]), sv.dtype))
        out_aval = exported["unflip_mean"].out_avals[0]

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "format": _FORMAT,
        "strategy": strategy,
        "stitch_mode": (stitch_mode
                        if strategy in ("tiling", "tiling_tta") else None),
        "input_shape": list(input_shape),
        "in_channels": in_channels,
        "batch_volumes": batch_volumes,
        "input_dtype": jnp.dtype(input_dtype).name,
        "output_shape": [int(s) for s in out_aval.shape],
        "output_dtype": jnp.dtype(out_aval.dtype).name,
        "programs": {name: f"{name}.jaxexp" for name in exported},
        "platforms": list(exported["forward"].platforms),
        "jax_version": jax.__version__,
    }
    for name, e in exported.items():
        with open(os.path.join(out_dir, f"{name}.jaxexp"), "wb") as f:
            f.write(e.serialize())
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingBundle:
    """A loaded serving bundle; mirrors the live ``Predictor`` numerics.

    ``predict(x)`` maps a ``(1, D, H, W, M)`` volume to the strategy's
    probability tensor (double-softmax TTA mean / stitched tiling /
    decoder softmax), exactly as ``Predictor.tta_probs`` /
    ``tiled_probs`` / ``seg_probs`` would with the exported parameters.
    """

    def __init__(self, manifest: Dict, programs: Dict):
        self.manifest = manifest
        self._p = programs

    @classmethod
    def load(cls, bundle_dir: str) -> "ServingBundle":
        from jax import export as jx
        with open(os.path.join(bundle_dir, MANIFEST_NAME)) as f:
            manifest = json.load(f)
        if manifest.get("format") != _FORMAT:
            raise ValueError(f"unsupported bundle format "
                             f"{manifest.get('format')!r}")
        programs = {}
        for name, fname in manifest["programs"].items():
            with open(os.path.join(bundle_dir, fname), "rb") as f:
                programs[name] = jx.deserialize(f.read())
        return cls(manifest, programs)

    @property
    def strategy(self) -> str:
        return self.manifest["strategy"]

    def _check(self, x) -> None:
        want = (self.manifest.get("batch_volumes", 1),
                *self.manifest["input_shape"],
                self.manifest["in_channels"])
        if tuple(x.shape) != want:
            raise ValueError(f"bundle expects input shape {want}, got "
                             f"{tuple(x.shape)} (AOT programs are "
                             "shape-specialized; re-export for new shapes)")

    def predict(self, x: jnp.ndarray) -> jnp.ndarray:
        self._check(x)
        x = jnp.asarray(x, self.manifest["input_dtype"])
        s = self.strategy
        if s == "single":
            return self._p["forward"].call(x)
        if s == "tta":
            return self._p["unflip_mean"].call(
                self._p["forward"].call(self._p["flips"].call(x)))
        if s == "tiling_tta":
            ys = [self._p["stitch"].call(self._p["forward"].call(
                      self._p[f"crops_flip{i}"].call(x)))[0]
                  for i in range(len(FLIP_COMBOS))]
            return self._p["unflip_mean"].call(jnp.stack(ys))
        return self._p["stitch"].call(
            self._p["forward"].call(self._p["crops"].call(x)))

    def labels(self, x: jnp.ndarray) -> jnp.ndarray:
        """Argmax segmentation as uint8 (the submission payload)."""
        return jnp.argmax(self.predict(x), axis=-1).astype(jnp.uint8)
