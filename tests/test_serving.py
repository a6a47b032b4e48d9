"""Serving-bundle tests: AOT export round-trips vs the live engines
(to float ULP — the AOT loader may retune FMA contraction for generic
host features), survives disk serialization, and validates its inputs."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dctseg.config import tiny_model_config
from dctseg.infer.engine import Predictor
from dctseg.infer.serving import MANIFEST_NAME, ServingBundle, export_bundle
from dctseg.models.clswiseformer import build_model


class _PassThrough:
    """Fake model: 'probs' = first 4 input channels (position-coded)."""

    def apply(self, params, x, train=False):
        return (x[..., :4] + params,)


@pytest.fixture(scope="module")
def tiny_predictor():
    cfg = tiny_model_config()
    model = build_model(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 32, 32, 32, 4))
    params = model.init({"params": key, "dropout": key}, x, train=False)
    return Predictor(model, params), x


def test_single_bundle_roundtrip(tiny_predictor, tmp_path):
    pred, x = tiny_predictor
    out = str(tmp_path / "single")
    manifest = export_bundle(pred, out, strategy="single",
                             input_shape=x.shape[1:4])
    assert set(manifest["programs"]) == {"forward"}
    bundle = ServingBundle.load(out)
    np.testing.assert_allclose(np.asarray(bundle.predict(x)),
                               np.asarray(pred.seg_probs(x)),
                               rtol=1e-4, atol=1e-6)
    labels = np.asarray(bundle.labels(x))
    assert labels.dtype == np.uint8 and labels.shape == x.shape[:4]
    # manifest records the real output geometry
    with open(os.path.join(out, MANIFEST_NAME)) as f:
        m = json.load(f)
    assert tuple(m["output_shape"]) == tuple(
        np.asarray(pred.seg_probs(x)).shape)


def test_tta_bundle_matches_live_engine(tiny_predictor, tmp_path):
    pred, x = tiny_predictor
    out = str(tmp_path / "tta")
    manifest = export_bundle(pred, out, strategy="tta",
                             input_shape=x.shape[1:4])
    assert set(manifest["programs"]) == {"flips", "forward", "unflip_mean"}
    bundle = ServingBundle.load(out)
    np.testing.assert_allclose(np.asarray(bundle.predict(x)),
                               np.asarray(pred.tta_probs(x)),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("stitch_mode", ["reference", "aligned"])
def test_tiling_bundle_matches_live_engine(tmp_path, stitch_mode):
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                    .astype(np.float32))
    out = str(tmp_path / f"tiling_{stitch_mode}")
    manifest = export_bundle(pred, out, stitch_mode=stitch_mode)
    assert set(manifest["programs"]) == {"crops", "forward", "stitch"}
    assert manifest["stitch_mode"] == stitch_mode
    bundle = ServingBundle.load(out)
    np.testing.assert_array_equal(
        np.asarray(bundle.predict(x)),
        np.asarray(pred.tiled_probs(x, stitch_mode)))


def test_bundle_rejects_wrong_shape_and_format(tiny_predictor, tmp_path):
    pred, x = tiny_predictor
    out = str(tmp_path / "single")
    export_bundle(pred, out, strategy="single", input_shape=x.shape[1:4])
    bundle = ServingBundle.load(out)
    with pytest.raises(ValueError, match="shape"):
        bundle.predict(jnp.zeros((1, 8, 8, 8, 4)))
    # future-format bundles are refused, not misread
    mpath = os.path.join(out, MANIFEST_NAME)
    with open(mpath) as f:
        m = json.load(f)
    m["format"] = 999
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="format"):
        ServingBundle.load(out)


def test_export_validates_strategy_and_shape(tiny_predictor, tmp_path):
    pred, _ = tiny_predictor
    with pytest.raises(ValueError, match="strategy"):
        export_bundle(pred, str(tmp_path / "x"), strategy="tiling_tta")
    with pytest.raises(ValueError, match="input_shape"):
        export_bundle(pred, str(tmp_path / "x"), strategy="tta")
    with pytest.raises(ValueError, match="geometry"):
        export_bundle(pred, str(tmp_path / "x"), strategy="tiling",
                      input_shape=(128, 128, 128))


def test_cross_platform_export_lowers_for_tpu(tiny_predictor, tmp_path):
    """A CPU build host can emit a TPU-servable artifact (multi-platform
    lowering); the CPU leg of the same bundle stays bit-identical."""
    pred, x = tiny_predictor
    out = str(tmp_path / "portable")
    manifest = export_bundle(pred, out, strategy="single",
                             input_shape=x.shape[1:4],
                             platforms=("cpu", "tpu"))
    assert set(manifest["platforms"]) == {"cpu", "tpu"}
    bundle = ServingBundle.load(out)
    np.testing.assert_allclose(np.asarray(bundle.predict(x)),
                               np.asarray(pred.seg_probs(x)),
                               rtol=1e-4, atol=1e-6)


def test_export_serving_cli(tmp_path):
    """Driver wiring: random-params smoke export of a tiny single bundle."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "export_serving_cli",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "export_serving.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    out = str(tmp_path / "cli_bundle")
    rc = cli.main(["--out", out, "--strategy", "single", "--random-params",
                   "--img-dim", "32", "--base-channels", "4", "--fp32",
                   "--input-shape", "32", "32", "32"])
    assert rc == 0
    bundle = ServingBundle.load(out)
    y = bundle.predict(jnp.zeros((1, 32, 32, 32, 4)))
    assert y.shape[:4] == (1, 32, 32, 32)
