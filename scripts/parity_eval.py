#!/usr/bin/env python
"""End-to-end eval-pipeline parity vs the torch reference.

Unlike parity_check.py (single forward), this runs the reference's ACTUAL
eval loops, unmodified, on synthetic volumes with shared converted weights:

  tta     predict_simple.validate_softmax — the 8-way flip TTA
          double-softmax averaging path (predict_simple.py:283-448) with its
          Dice/mIoU/HD95 metric stack (including the 4-D batched-mask HD95
          call shape, predict_simple.py:393,408)
  tiling  predict_overlap.validate_softmax — the 8-crop sliding-window
          composition via tailor_and_concat (predict_overlap.py:31-65,
          103-171), with the raw-label 4->3 remap at eval time

then runs dctseg's validate_softmax on the same volumes and compares the
argmaxed label volumes voxel-for-voxel plus every per-volume metric.

The reference needs CUDA, nibabel and medpy; none exist here, so the harness
shims them: ``Tensor.cuda`` becomes identity, nibabel gets a no-op stub
(unused on these code paths), and medpy.metric gets the exact scipy
implementation of hd/hd95 (pooled-percentile surface distances — the same
algorithm dctseg/metrics.py implements natively).

  python scripts/parity_eval.py --reference /root/reference \
      [--volumes 2] [--strategies tta,tiling]

Recorded result (2026-08-16, 2 volumes x both strategies): label-volume
agreement >= 99.9997% per volume, Dice/mIoU deltas <= 1e-7, HD95 deltas
exactly 0, mean-metric deltas <= 5e-8 (see docs/PARITY.md).
"""

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# ---------------------------------------------------------------- shims

def install_medpy_stub():
    """medpy.metric.{hd,hd95} with medpy's exact algorithm on scipy
    (utils/hausdorff.py:106-123 wraps these)."""
    from scipy import ndimage as ndi

    def _surface_distances(result, reference, voxelspacing=None,
                           connectivity=1):
        result = np.atleast_1d(np.asarray(result).astype(bool))
        reference = np.atleast_1d(np.asarray(reference).astype(bool))
        footprint = ndi.generate_binary_structure(result.ndim, connectivity)
        rb = result ^ ndi.binary_erosion(result, structure=footprint,
                                         iterations=1)
        fb = reference ^ ndi.binary_erosion(reference, structure=footprint,
                                            iterations=1)
        dt = ndi.distance_transform_edt(~fb, sampling=voxelspacing)
        return dt[rb]

    def hd95(result, reference, voxelspacing=None, connectivity=1):
        d1 = _surface_distances(result, reference, voxelspacing, connectivity)
        d2 = _surface_distances(reference, result, voxelspacing, connectivity)
        return float(np.percentile(np.hstack((d1, d2)), 95))

    def hd(result, reference, voxelspacing=None, connectivity=1):
        d1 = _surface_distances(result, reference, voxelspacing, connectivity)
        d2 = _surface_distances(reference, result, voxelspacing, connectivity)
        return float(max(d1.max(), d2.max()))

    medpy = types.ModuleType("medpy")
    metric = types.ModuleType("medpy.metric")
    metric.hd95, metric.hd = hd95, hd
    medpy.metric = metric
    sys.modules["medpy"] = medpy
    sys.modules["medpy.metric"] = metric


def install_nibabel_stub():
    """predict*.py import nibabel at module scope but the live eval paths
    never touch it (all nib usage is commented out)."""
    if "nibabel" in sys.modules:
        return
    nib = types.ModuleType("nibabel")
    nib.load = nib.save = lambda *a, **k: None
    nib.Nifti1Image = object
    sys.modules["nibabel"] = nib


class Recorder:
    """Wrap a metric fn; record a copy of the argmaxed output and result."""

    def __init__(self, fn, keep_volumes=False):
        self.fn = fn
        self.keep_volumes = keep_volumes
        self.results = []
        self.volumes = []

    def __call__(self, output, target, *a, **k):
        out = self.fn(output, target, *a, **k)
        self.results.append([float(v) for v in out])
        if self.keep_volumes:
            self.volumes.append(np.array(output, np.int16, copy=True))
        return out


# ------------------------------------------------------------ reference

def setup_reference(refpath, workdir):
    os.makedirs(os.path.join(
        workdir, "2-MICCAI_BraTS_2018", "MICCAI_BraTS_2018_Data_Training"),
        exist_ok=True)
    fix = os.path.join(workdir, "2-MICCAI_BraTS_2018",
                       "MICCAI_BraTS_2018_Data_Training", "fix_index.txt")
    if not os.path.exists(fix):
        with open(fix, "w") as f:
            # identity token map (see docs/PARITY.md "fix_index assumption")
            f.write(repr({str(i): [i] * 512 for i in range(2048)}))
    os.chdir(workdir)  # the model eval()s fix_index.txt relative to CWD
    sys.path.insert(0, refpath)

    install_medpy_stub()
    install_nibabel_stub()

    import torch
    import torch.nn.functional as F
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only container
    # neutralize the eval-time dropout quirk (Unet_skipconnection.py:31)
    F.dropout3d = lambda x, p=0.5, training=True, inplace=False: x

    from models.clswiseformer.cls_wise_former import get_cls_wise_former
    torch.manual_seed(0)
    ref = get_cls_wise_former(dataset="brats", _conv_repr=True,
                              _pe_type="fixed", gpu=0)
    ref.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    return ref, sd


def run_reference_tta(ref, crops, visual):
    """Drive predict_simple.validate_softmax (the real function) on in-memory
    volumes; record per-volume metrics + label volumes via wrappers."""
    import torch
    import predict_simple as ps
    import utils.tools as ut

    dice = Recorder(ut.softmax_output_dice, keep_volumes=True)
    miou = Recorder(ps.softmax_output_mIou)
    haus = Recorder(ps.cal_hausdorff)
    ut.softmax_output_dice = dice
    ps.softmax_output_mIou = miou
    ps.cal_hausdorff = haus
    ps.output_excel = lambda *a, **k: None  # skip per-slice pandas CSVs
    try:
        loader = []
        for s in crops:
            x = torch.from_numpy(
                np.ascontiguousarray(np.transpose(s.x, (3, 0, 1, 2))[None]))
            t = torch.from_numpy(np.ascontiguousarray(s.target[None]))
            edge = torch.zeros_like(t)
            loader.append((x, t, edge, None, [s.path]))
        means = ps.validate_softmax(
            loader, ref, load_file="", multimodel=False,
            names=[s.name for s in crops], visual=visual,
            valid_in_train=True)
    finally:
        ut.softmax_output_dice = dice.fn
        ps.softmax_output_mIou = miou.fn
        ps.cal_hausdorff = haus.fn
    return {"dice": dice.results, "miou": miou.results,
            "hd95": haus.results, "volumes": dice.volumes,
            "means": [float(m) for m in means]}


def run_reference_tiling(ref, fulls):
    """Drive predict_overlap.validate_softmax (tailor_and_concat stitch)."""
    import torch
    import predict_overlap as po
    import utils.tools as ut

    dice = Recorder(ut.softmax_output_dice, keep_volumes=True)
    ut.softmax_output_dice = dice
    try:
        loader = []
        for s in fulls:
            x = torch.from_numpy(
                np.ascontiguousarray(np.transpose(s.x, (3, 0, 1, 2))[None]))
            # predict_overlap remaps raw label 4->3 itself (line 152)
            t_raw = np.where(s.target == 3, 4, s.target).astype(np.int64)
            t = torch.from_numpy(np.ascontiguousarray(t_raw[None]))
            edge = torch.zeros_like(t)
            loader.append((x, t, edge, None))
        means = po.validate_softmax(
            loader, ref, load_file="", multimodel=False,
            names=[s.name for s in fulls], valid_in_train=True)
    finally:
        ut.softmax_output_dice = dice.fn
    return {"dice": dice.results, "volumes": dice.volumes,
            "means": [float(m) for m in means]}


# --------------------------------------------------------------- dctseg

def run_dctseg(sd, crops, fulls, strategies):
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    from dctseg import metrics
    from dctseg.config import ModelConfig
    from dctseg.data.pipeline import Batch
    from dctseg.infer.engine import Predictor
    from dctseg.infer.validate import validate_softmax
    from dctseg.models.clswiseformer import build_model
    from dctseg.utils.torch_convert import convert_state_dict

    model = build_model(ModelConfig(compute_dtype="float32"))
    params = {"params": convert_state_dict(sd)}
    predictor = Predictor(model, params, microbatch=4)

    out = {}
    for strat in strategies:
        samples = crops if strat == "tta" else fulls
        dice = Recorder(metrics.softmax_output_dice, keep_volumes=True)
        miou = Recorder(metrics.softmax_output_miou)
        haus = Recorder(metrics.cal_hausdorff)
        metrics_backup = (metrics.softmax_output_dice,
                          metrics.softmax_output_miou, metrics.cal_hausdorff)
        metrics.softmax_output_dice = dice
        metrics.softmax_output_miou = miou
        metrics.cal_hausdorff = haus
        try:
            # device_metrics=False: the Recorders instrument the HOST
            # metric functions (the reference-semantics path this harness
            # compares); the device twin is separately proven bit-exact
            # against the host path by tests/test_metrics.py
            res = validate_softmax([Batch([s]) for s in samples], predictor,
                                   strategy=strat, device_metrics=False)
        finally:
            (metrics.softmax_output_dice, metrics.softmax_output_miou,
             metrics.cal_hausdorff) = metrics_backup
        out[strat] = {"dice": dice.results, "miou": miou.results,
                      "hd95": haus.results, "volumes": dice.volumes,
                      "means": [res["wt"], res["tc"], res["et"]]}
    return out


# ----------------------------------------------------------------- main

def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference", required=True)
    p.add_argument("--workdir", default="/tmp/dctseg_parity_eval")
    p.add_argument("--volumes", type=int, default=2)
    p.add_argument("--strategies", default="tta,tiling")
    a = p.parse_args(argv)
    strategies = [s.strip() for s in a.strategies.split(",") if s.strip()]

    from dctseg.config import DataConfig
    from dctseg.data.brats import BraTSDataset

    dcfg = DataConfig(synthetic_num_samples=a.volumes)
    crops = ([BraTSDataset(mode="valid", cfg=dcfg).get(i)
              for i in range(a.volumes)] if "tta" in strategies else [])
    fulls = ([BraTSDataset(mode="full", cfg=dcfg).get(i)
              for i in range(a.volumes)] if "tiling" in strategies else [])

    os.makedirs(a.workdir, exist_ok=True)
    ref, sd = setup_reference(a.reference, a.workdir)

    ref_out = {}
    if "tta" in strategies:
        print("== reference: predict_simple.validate_softmax (flip TTA) ==")
        ref_out["tta"] = run_reference_tta(ref, crops, a.workdir)
    if "tiling" in strategies:
        print("== reference: predict_overlap.validate_softmax (tiling) ==")
        ref_out["tiling"] = run_reference_tiling(ref, fulls)
    del ref  # release the torch model before JAX compiles

    print("== dctseg: validate_softmax ==")
    dct_out = run_dctseg(sd, crops, fulls, strategies)

    ok = True
    for strat in strategies:
        r, d = ref_out[strat], dct_out[strat]
        print(f"\n=== strategy {strat} ===")
        for i in range(len(r["volumes"])):
            rv = np.squeeze(r["volumes"][i])
            dv = np.squeeze(d["volumes"][i])
            agree = float((rv == dv).mean())
            deltas = {"dice": np.max(np.abs(
                np.array(r["dice"][i]) - np.array(d["dice"][i])))}
            for key in ("miou", "hd95"):
                if key in r and r[key]:
                    deltas[key] = np.max(np.abs(
                        np.array(r[key][i]) - np.array(d[key][i])))
            dstr = "  ".join(f"max|d{k}|={v:.3e}" for k, v in deltas.items())
            print(f"vol {i}: label agreement {agree:.6%}  {dstr}")
            print(f"  ref  dice {r['dice'][i]}")
            print(f"  dct  dice {d['dice'][i]}")
            ok &= agree >= 0.9999 and all(v <= 1e-4 for v in deltas.values())
        mdelta = np.max(np.abs(np.array(r["means"]) - np.array(d["means"])))
        print(f"mean WT/TC/ET delta: {mdelta:.3e}")
        ok &= bool(mdelta <= 1e-4)

    print("\nE2E PARITY", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
