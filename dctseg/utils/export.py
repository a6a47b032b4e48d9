"""Host-side exporters: per-slice CSV, PNG snapshots, NIfTI submissions.

Mirrors the reference's observability tooling:
  per-slice CSV sorted by WT/TC/ET      predict_simple.py:214-278
  per-checkpoint sweep CSV              test_all_pth.py:67-74,143-149
  PNG slice renderer, fixed palette     predict_simple.py:186-210
  NIfTI segmentation export             predict.py:318-328 (commented there)
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

from dctseg import metrics
from dctseg.data import nifti

# fixed RGB palette (predict_simple.py:196-198)
PALETTE = {1: (250, 250, 149), 2: (244, 130, 128), 3: (97, 136, 200)}


def _append_csv(path: str, header: Sequence[str], rows: List[Dict]) -> None:
    import pandas as pd
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        pd.DataFrame(columns=list(header)).to_csv(path, index=False)
    pd.DataFrame([{k: r.get(k) for k in header} for r in rows]).to_csv(
        path, mode="a", index=False, header=False)


def export_per_slice_csv(out_dir: str, name: str, output: np.ndarray,
                         label: np.ndarray, modal: str = "Our") -> None:
    """Per-slice WT/TC/ET dice, one CSV per sort key
    (predict_simple.py:214-278).  output/label: (H, W, D) int."""
    rows = []
    for frame in range(output.shape[2]):
        li = label[:, :, frame]
        if li.max() > 0:
            d = metrics.softmax_output_dice(output[:, :, frame], li)
            rows.append({"name": f"{name}_{frame}", "wt": d[0], "tc": d[1],
                         "et": d[2], "sum": d[0] * d[1] * d[2]})
    base = os.path.join(out_dir, name, "predict", name)
    os.makedirs(base, exist_ok=True)
    for key in ("wt", "tc", "et"):
        rows.sort(key=lambda r: r[key])
        _append_csv(os.path.join(base, f"{modal}_{name}_{key}.csv"),
                    ("name", "wt", "tc", "et", "sum"), rows)


def export_volume_summary_csv(path: str, rows: List[Dict]) -> None:
    """Per-volume summary (predict_simple.py:147-183)."""
    _append_csv(path, ("name", "wt", "tc", "et", "sum", "pre_1", "pre_2",
                       "pre_4", "gt_1", "gt_2", "gt_4"), rows)


def export_checkpoint_sweep_csv(path: str, name: str, wt: float, tc: float,
                                et: float) -> None:
    """Append one checkpoint's mean dice (test_all_pth.py:143-149)."""
    _append_csv(path, ("name", "wt", "tc", "et"),
                [{"name": name, "wt": wt, "tc": tc, "et": et}])


def render_label_slice(label2d: np.ndarray) -> np.ndarray:
    """(H, W) int labels -> (H, W, 3) uint8 with the reference palette."""
    img = np.zeros(label2d.shape + (3,), np.uint8)
    for cls, rgb in PALETTE.items():
        img[label2d == cls] = rgb
    return img


def export_png_slices(out_dir: str, name: str, output: np.ndarray,
                      label: np.ndarray, modal: str = "Our") -> None:
    """Per-slice PNGs for prediction and ground truth
    (predict_simple.py:186-210)."""
    import imageio
    pred_dir = os.path.join(out_dir, name, "predict")
    lab_dir = os.path.join(out_dir, name, "label")
    os.makedirs(pred_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)
    for frame in range(output.shape[2]):
        imageio.imwrite(
            os.path.join(pred_dir, f"{modal}_pre_{frame}.png"),
            render_label_slice(output[:, :, frame]))
        imageio.imwrite(
            os.path.join(lab_dir, f"{modal}_label_{frame}.png"),
            render_label_slice(label[:, :, frame]))


def export_nifti_segmentation(path: str, output: np.ndarray,
                              affine: np.ndarray = None,
                              remap_3_to_4: bool = True) -> None:
    """BraTS submission export: labels {0,1,2,3} -> {0,1,2,4}
    (predict.py:145-163 remap + nib.save at :318-328)."""
    seg = output.astype(np.uint8)
    if remap_3_to_4:
        seg = np.where(seg == 3, 4, seg).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    nifti.save(seg, path, affine=affine)
