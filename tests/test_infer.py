"""Inference engine tests: TTA equivalence, tiling stitch logic, ensembling,
and the end-to-end validate loop with exporters."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dctseg.config import DataConfig, tiny_model_config
from dctseg.data.brats import BraTSDataset
from dctseg.data.pipeline import PrefetchLoader
from dctseg.infer.engine import FLIP_COMBOS, Predictor, ensemble_probs
from dctseg.infer.validate import validate_softmax
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


def test_tta_equals_sequential_flips(tiny_predictor):
    """The batched-8 TTA must equal the reference's sequential 8 forwards
    with double softmax (predict_simple.py:333-349)."""
    pred, x = tiny_predictor
    got = np.asarray(pred.tta_probs(x))

    acc = 0
    for c in FLIP_COMBOS:
        xf = jax.lax.rev(x, c) if c else x
        p = pred.seg_probs(xf)
        p = jax.lax.rev(p, c) if c else p
        acc = acc + jax.nn.softmax(p.astype(jnp.float32), -1)
    want = np.asarray(acc / 8)
    np.testing.assert_allclose(got, want, atol=2e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-4)


def test_tiled_stitch_aligned_is_identity():
    """With a pass-through model, aligned stitching reproduces the input."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4)) \
                    .astype(np.float32))
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    y = np.asarray(pred.tiled_probs(x, stitch_mode="aligned"))
    np.testing.assert_allclose(y, np.asarray(x)[:, :, :, :155], atol=1e-6)


def test_tiled_stitch_reference_offset():
    """Reference mode reproduces the 5-slice misalignment in the deep
    window (predict.py:60-63): output depth 128:155 holds input 123:150."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4)) \
                    .astype(np.float32))
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    y = np.asarray(pred.tiled_probs(x, stitch_mode="reference"))
    xn = np.asarray(x)
    np.testing.assert_allclose(y[:, :, :, :128], xn[:, :, :, :128],
                               atol=1e-6)
    np.testing.assert_allclose(y[:, :, :, 128:155], xn[:, :, :, 123:150],
                               atol=1e-6)


def test_fused_dispatch_matches_staged(tiny_predictor):
    """fuse_dispatch folds the batch-construction stage (tiling crops /
    TTA flips) into the forward executable (one dispatch fewer per
    volume); both engines must be bit-exact vs the staged path, and the
    flag must silently disable itself on the mesh/microbatch paths it
    does not support."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 240, 240, 160, 4))
                    .astype(np.float32))
    staged = Predictor(_PassThrough(), jnp.asarray(0.0))
    fused = Predictor(_PassThrough(), jnp.asarray(0.0), fuse_dispatch=True)
    assert fused.fuse_dispatch
    for mode in ("reference", "aligned"):
        np.testing.assert_array_equal(
            np.asarray(fused.tiled_probs(x, mode)),
            np.asarray(staged.tiled_probs(x, mode)))
    assert not Predictor(_PassThrough(), jnp.asarray(0.0), microbatch=4,
                         fuse_dispatch=True).fuse_dispatch

    # TTA path, with a real (tiny) model
    pred, xt = tiny_predictor
    fused_t = Predictor(pred.model, pred.params, fuse_dispatch=True)
    np.testing.assert_array_equal(np.asarray(fused_t.tta_probs(xt)),
                                  np.asarray(pred.tta_probs(xt)))


def test_fold_params_applies_on_fused_dispatch_paths(tiny_predictor):
    """Predictor(fold_params=True, fuse_dispatch=True) must bake the
    params into the fused TTA/tiling executables too (ADVICE r4: the
    combination used to quietly keep params as runtime args), and
    update_params must rebuild them."""
    pred, xt = tiny_predictor
    both = Predictor(pred.model, pred.params, fuse_dispatch=True,
                     fold_params=True)
    # rounding-close, not bit-exact: folding changes transform op order
    np.testing.assert_allclose(
        np.asarray(both.tta_probs(xt), np.float32),
        np.asarray(pred.tta_probs(xt), np.float32), atol=1e-5)
    # the fused executable closes over params: a checkpoint swap must
    # rebuild it, not silently keep answering with the old weights
    params2 = jax.tree.map(lambda a: a * 1.5, pred.params)
    pred2 = Predictor(pred.model, params2)
    both.update_params(params2)
    np.testing.assert_allclose(
        np.asarray(both.tta_probs(xt), np.float32),
        np.asarray(pred2.tta_probs(xt), np.float32), atol=1e-5)


def test_tiled_probs_batch_matches_per_volume():
    """The V-volume batched tiling path must equal V independent
    tiled_probs calls (same crops, same stitch, batch-parallel forward)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 240, 240, 160, 4))
                    .astype(np.float32))
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    for mode in ("reference", "aligned"):
        got = np.asarray(pred.tiled_probs_batch(x, mode))
        want = np.concatenate([
            np.asarray(pred.tiled_probs(x[v:v + 1], mode))
            for v in range(2)], axis=0)
        np.testing.assert_array_equal(got, want)
    # V=1 falls through to the single-volume path
    np.testing.assert_array_equal(
        np.asarray(pred.tiled_probs_batch(x[:1])),
        np.asarray(pred.tiled_probs(x[:1])))
    # microbatch splits the B=16 forward without changing the result
    # (HBM-headroom fallback when B=8V does not fit)
    pred_mb = Predictor(_PassThrough(), jnp.asarray(0.0), microbatch=8)
    np.testing.assert_array_equal(
        np.asarray(pred_mb.tiled_probs_batch(x)),
        np.asarray(pred.tiled_probs_batch(x)))


def test_validate_paired_matches_per_volume():
    """validate_softmax(paired=V) groups volumes into one B=8V program
    (incl. a remainder group smaller than V) without changing any metric:
    the paired path is the same crops/stitch, batch-parallel forward."""
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    cfg = DataConfig(synthetic_num_samples=3)  # 3 volumes -> groups [2, 1]
    ds = BraTSDataset(mode="full", cfg=cfg)

    def run(paired):
        loader = PrefetchLoader(ds, batch_size=1, shuffle=False,
                                num_workers=1)
        return validate_softmax(loader, pred, strategy="tiling",
                                use_hd95=False, paired=paired)

    base, paired = run(1), run(2)
    for k in ("wt", "tc", "et", "miou_wt", "miou_tc", "miou_et"):
        np.testing.assert_allclose(paired[k], base[k], atol=0, err_msg=k)
    # flip TTA over tilings also supports V volumes per flip program
    x2 = jnp.asarray(np.stack([ds[i].x for i in range(2)]))
    got = np.asarray(pred.tiled_tta_probs(x2))
    want = np.concatenate([np.asarray(pred.tiled_tta_probs(x2[v:v + 1]))
                           for v in range(2)], axis=0)
    np.testing.assert_array_equal(got, want)


def test_tta_probs_batch_matches_per_volume(tiny_predictor):
    """The V-volume batched TTA path must equal V independent tta_probs
    calls (same flips, same double-softmax mean, batch-parallel forward) —
    the TTA analogue of tiled_probs_batch, so --paired covers 'tta' too."""
    pred, x = tiny_predictor
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.normal(size=(3, *x.shape[1:])).astype(np.float32))
    got = np.asarray(pred.tta_probs_batch(xs))
    want = np.concatenate([np.asarray(pred.tta_probs(xs[v:v + 1]))
                           for v in range(3)], axis=0)
    # the B=24 forward is a different XLA executable than B=8, so allow
    # reduction-order rounding (same tolerance class as the TTA test above)
    np.testing.assert_allclose(got, want, atol=2e-6)
    # V=1 falls through to the per-volume path
    np.testing.assert_array_equal(np.asarray(pred.tta_probs_batch(xs[:1])),
                                  np.asarray(pred.tta_probs(xs[:1])))
    # end-to-end: validate_softmax(strategy='tta', paired=2) groups volumes
    # (incl. a remainder group) without changing any metric
    pt = Predictor(_PassThrough(), jnp.asarray(0.0))
    cfg = DataConfig(synthetic_num_samples=3)
    ds = BraTSDataset(mode="valid", cfg=cfg)

    def run(paired):
        loader = PrefetchLoader(ds, batch_size=1, shuffle=False,
                                num_workers=1)
        return validate_softmax(loader, pt, strategy="tta",
                                use_hd95=False, paired=paired)

    base, paired = run(1), run(2)
    for k in ("wt", "tc", "et", "miou_wt", "miou_tc", "miou_et"):
        np.testing.assert_allclose(paired[k], base[k], atol=0, err_msg=k)


def test_ensemble_average():
    x = jnp.ones((1, 240, 240, 160, 4))
    pred = Predictor(_PassThrough(), jnp.asarray(0.0))
    out = ensemble_probs(lambda: pred.tiled_probs(x, "aligned"), pred,
                         [jnp.asarray(0.0), jnp.asarray(2.0)])
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-6)  # (1+3)/2
    out4 = ensemble_probs(lambda: pred.tiled_probs(x, "aligned"), pred,
                          [jnp.asarray(0.0), jnp.asarray(2.0)], divisor=4.0)
    np.testing.assert_allclose(np.asarray(out4), 1.0, atol=1e-6)


def test_validate_softmax_end_to_end(tmp_path, tiny_predictor):
    pred, _ = tiny_predictor
    cfg = DataConfig(synthetic_num_samples=2, input_shape=(48, 48, 40),
                     pad_depth=40, crop_size=(32, 32, 32))
    ds = BraTSDataset(mode="valid", cfg=cfg)
    loader = PrefetchLoader(ds, batch_size=1, shuffle=False, num_workers=1)
    out = validate_softmax(
        loader, pred, strategy="tta", use_hd95=True,
        snapshot=True, csv_export=True, save_nifti=True,
        visual=str(tmp_path / "visual"), savepath=str(tmp_path / "sub"))
    for k in ("wt", "tc", "et", "hd95_wt", "miou_et", "sec_per_volume"):
        assert np.isfinite(out[k]), k
    # artifacts exist
    name = ds.names[0]
    assert os.path.exists(tmp_path / "sub" / f"{name}.nii.gz")
    assert os.path.exists(tmp_path / "visual" / name / "predict")
    csvs = list((tmp_path / "visual" / name / "predict" / name).glob("*.csv"))
    assert len(csvs) == 3  # wt/tc/et sorted exports
    # NIfTI submission uses raw BraTS labels {0,1,2,4}
    from dctseg.data import nifti
    seg = nifti.load(str(tmp_path / "sub" / f"{name}.nii.gz")).data
    assert set(np.unique(seg)) <= {0, 1, 2, 4}
    # per-volume summary CSV (predict_simple.py:147-183): one row per
    # volume with dice product + pred/gt voxel counts
    import pandas as pd
    summary = pd.read_csv(tmp_path / "visual" / "sum.csv")
    assert len(summary) == 2
    assert list(summary.columns) == ["name", "wt", "tc", "et", "sum",
                                     "pre_1", "pre_2", "pre_4",
                                     "gt_1", "gt_2", "gt_4"]
    row = summary.iloc[0]
    np.testing.assert_allclose(row["sum"],
                               row["wt"] * row["tc"] * row["et"], rtol=1e-6)
    assert row["gt_1"] > 0  # synthetic volumes contain class-1 voxels


def test_validate_postprocess_device_matches_host(tiny_predictor):
    """--postprocess (ET suppression) no longer forces the host metric
    path: the device twin applies the identical integer edit, so device
    and host metrics agree exactly under postprocess."""
    from dctseg.infer.validate import _postprocess_device

    # unit: the device edit equals the host heuristic on both sides of
    # the 500-voxel threshold
    rng = np.random.default_rng(5)
    for n_et in (499, 500, 3000):
        o = rng.integers(0, 3, (24, 24, 24)).astype(np.uint8)
        idx = np.argwhere(o >= 0)[:n_et]
        o[tuple(idx.T)] = 3
        host = o.copy()
        if (host == 3).sum() < 500:
            host = np.where(host == 3, 1, host)
        dev = np.asarray(_postprocess_device(jnp.asarray(o)))
        np.testing.assert_array_equal(dev, host)

    pred, _ = tiny_predictor
    cfg = DataConfig(synthetic_num_samples=2, input_shape=(48, 48, 40),
                     pad_depth=40, crop_size=(32, 32, 32))
    ds = BraTSDataset(mode="valid", cfg=cfg)

    def run(device_metrics):
        loader = PrefetchLoader(ds, batch_size=1, shuffle=False,
                                num_workers=1)
        return validate_softmax(loader, pred, strategy="single",
                                postprocess=True,
                                device_metrics=device_metrics)

    dev, host = run(True), run(False)
    for k in ("wt", "tc", "et", "hd95_wt", "hd95_tc", "hd95_et",
              "miou_wt", "miou_tc", "miou_et"):
        np.testing.assert_allclose(dev[k], host[k], atol=0, err_msg=k)


def test_validate_single_strategy(tiny_predictor):
    pred, _ = tiny_predictor
    cfg = DataConfig(synthetic_num_samples=1, input_shape=(48, 48, 40),
                     pad_depth=40, crop_size=(32, 32, 32))
    ds = BraTSDataset(mode="valid", cfg=cfg)
    loader = PrefetchLoader(ds, batch_size=1, shuffle=False, num_workers=1)
    out = validate_softmax(loader, pred, strategy="single", use_hd95=False)
    assert np.isfinite(out["wt"])


def test_validate_hd95_modes(tiny_predictor):
    """--hd95 {reference,surface}: both modes must flow through the loop
    (device-metrics path) and match the host oracle for the predicted
    labels; on asymmetric masks the two numbers must differ (the quirk is
    measurably smaller than true surface HD95)."""
    from dctseg import metrics

    pred, _ = tiny_predictor
    cfg = DataConfig(synthetic_num_samples=1, input_shape=(48, 48, 40),
                     pad_depth=40, crop_size=(32, 32, 32))
    ds = BraTSDataset(mode="valid", cfg=cfg)

    def run(mode, device_metrics):
        loader = PrefetchLoader(ds, batch_size=1, shuffle=False,
                                num_workers=1)
        return validate_softmax(loader, pred, strategy="single",
                                hd95_mode=mode,
                                device_metrics=device_metrics)

    ref = run("reference", True)
    surf = run("surface", True)
    # host path agrees with the device path in both modes
    ref_h = run("reference", False)
    surf_h = run("surface", False)
    for k in ("hd95_wt", "hd95_tc", "hd95_et"):
        np.testing.assert_allclose(ref[k], ref_h[k], atol=1e-6)
        np.testing.assert_allclose(surf[k], surf_h[k], atol=1e-6)
    # the quirk mode pools all-voxel distances -> differs from surface HD95
    assert any(abs(ref[k] - surf[k]) > 1e-6
               for k in ("hd95_wt", "hd95_tc", "hd95_et")), (ref, surf)
    with pytest.raises(ValueError):
        run("bogus", True)


def test_evaluate_cli_hd95_flag():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import importlib
    eval_mod = importlib.import_module("evaluate")
    assert eval_mod.parse_args([]).hd95 == "reference"
    assert eval_mod.parse_args(["--hd95", "surface"]).hd95 == "surface"


def test_mesh_sharded_inference_matches_unsharded(tiny_predictor):
    """Multi-chip eval: a (data=2, space=4) mesh Predictor must produce the
    single-device result — TTA's 8 variants shard over `data`, each volume's
    D axis shards over `space` (GSPMD conv halos)."""
    from dctseg.parallel.mesh import make_mesh

    pred, x = tiny_predictor
    mesh = make_mesh(8, spatial=4)
    assert dict(mesh.shape) == {"data": 2, "space": 4}
    sharded = Predictor(pred.model, pred.params, mesh=mesh)
    # atol 1e-5: GSPMD halo-exchange convs reassociate float sums, so a
    # handful of probabilities differ at the ~2e-6 level from the
    # single-device program (observed 1/131072 elements at atol=1e-6)
    np.testing.assert_allclose(np.asarray(sharded.seg_probs(x)),
                               np.asarray(pred.seg_probs(x)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded.tta_probs(x)),
                               np.asarray(pred.tta_probs(x)),
                               rtol=1e-4, atol=1e-5)
