"""Evaluation loops: the reference's ``validate_softmax`` engines.

``validate_softmax`` here is a single parameterized loop covering the four
reference variants (predict_simple.py:283-448 is the primary; see
SURVEY.md §1 pairing matrix):
  strategy='tta'        full-volume (crop-sized) 8-way flip TTA  [test_simple]
  strategy='single'     single patch, no TTA                     [test]
  strategy='tiling'     8-crop sliding window                    [test_overlap]
  strategy='tiling_tta' tiling + flip TTA over tilings           [test_cls]

Returns mean (WT, TC, ET) dice like the reference (predict_simple.py:448) and
logs per-volume Dice / mIoU / HD95.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dctseg import metrics
from dctseg.infer.engine import Predictor, ensemble_probs
from dctseg.utils import export

logger = logging.getLogger("dctseg")


@jax.jit
def _postprocess_device(o):
    """Device twin of the host ET-suppression heuristic (the reference's
    commented `np.sum(o) < 500 -> o*0`, predict_simple.py:132-140): the
    identical integer edit, so device metrics stay usable under
    ``postprocess``."""
    return jnp.where((o == 3) & (jnp.sum(o == 3) < 500), jnp.uint8(1), o)


def validate_softmax(
        loader,
        predictor: Predictor,
        strategy: str = "tta",
        savepath: str = "",
        use_hd95: bool = True,
        snapshot: bool = False,
        csv_export: bool = False,
        save_nifti: bool = False,
        visual: str = "",
        param_sets: Optional[Sequence] = None,
        stitch_mode: str = "reference",
        postprocess: bool = False,
        device_metrics: bool = True,
        hd95_mode: str = "reference",
        paired: int = 1,
) -> Dict[str, float]:
    """``hd95_mode``: 'reference' reproduces the reference's batched-mask
    medpy quirk (parity with its headline numbers, predict_simple.py:393,408);
    'surface' is the corrected 3-D surface-distance HD95 (see
    :func:`dctseg.metrics.cal_hausdorff`).

    ``paired``: volumes per dispatched program.  ``paired=V`` groups V
    volumes into one forward (B=8V for the tiling engines via
    ``tiled_probs_batch``, and likewise 8 flips x V volumes via
    ``tta_probs_batch`` for 'tta') — amortizes per-program dispatch overhead
    for throughput-oriented runs like checkpoint sweeps, at the cost of V×
    per-volume latency and HBM (measured V=3 optimum in bf16 on a 16 GB
    v5e, docs/PERF.md "Paired tiling"; algorithmically identical to
    per-volume — bit-exact on CPU, within bf16 rounding on chip since
    B=8V is a different executable).
    Supported for every strategy."""
    if hd95_mode not in ("reference", "surface"):
        raise ValueError(f"hd95_mode must be 'reference' or 'surface', "
                         f"got {hd95_mode!r}")
    paired = max(1, int(paired))
    batched_call_shape = hd95_mode == "reference"
    wt, tc, et = [], [], []
    h_wt, h_tc, h_et = [], [], []
    m_wt, m_tc, m_et = [], [], []
    runtimes = []
    summary_rows = []  # per-volume rows (predict_simple.py:147-183)
    n_total = len(loader)
    # Dice/mIoU/HD95 on the accelerator (exact-match with the host
    # functions; scipy's EDT costs ~4.5 s/volume on this 1-core host).
    # ``postprocess`` is applied on device too (identical integer edit),
    # so it no longer forces the host metric path.
    dmetrics = (metrics.DeviceMetrics(batched_call_shape=batched_call_shape,
                                      use_hd95=use_hd95)
                if device_metrics else None)
    pp_dev = _postprocess_device  # module-level jit: sweeps share it

    def run(x):
        # the *_batch engines fall through to the single-volume path at
        # V=1, so the per-volume and paired paths share one code path
        if strategy == "tta":
            return predictor.tta_probs_batch(x)
        if strategy == "single":
            return predictor.seg_probs(x)
        if strategy == "tiling":
            return predictor.tiled_probs_batch(x, stitch_mode)
        if strategy == "tiling_tta":
            return predictor.tiled_tta_probs(x, stitch_mode)
        raise ValueError(f"unknown strategy {strategy!r}")

    def predict(batches):
        """Dispatch one program over a group of volumes; returns an async
        device array of labels (V, ...).  argmax on device transfers uint8
        volumes instead of the float32 probability tensor (8x smaller; the
        host here is slow)."""
        x = (jnp.concatenate([jnp.asarray(b.x) for b in batches], axis=0)
             if len(batches) > 1 else jnp.asarray(batches[0].x))
        if param_sets:
            probs = ensemble_probs(lambda: run(x), predictor, param_sets)
        else:
            probs = run(x)
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

    def stream():
        """Group-of-``paired`` pipeline: group i+1 computes on device while
        the host evaluates metrics for group i (jax dispatch is async).
        Ensembling swaps parameters between dispatches, so it stays
        sequential.  Each yielded item carries its group's dispatch time
        and size so per-volume runtimes stay a faithful mean."""
        pipelined = not param_sets

        def dispatch(group):
            t0 = time.time()
            out = predict(group)
            if not pipelined:
                out = np.asarray(out)
            return [(b, out[j:j + 1], t0, len(group))
                    for j, b in enumerate(group)]

        pending, group = [], []
        for batch in loader:
            group.append(batch)
            if len(group) == paired:
                items = dispatch(group)
                group = []
                yield from pending
                pending = items
        if group:  # remainder group smaller than ``paired``
            items = dispatch(group)
            yield from pending
            pending = items
        yield from pending

    for i, (batch, out_dev, t0, vshare) in enumerate(stream()):
        name = batch.names[0]
        output = np.asarray(out_dev)[0].astype(np.int32)
        # t0 is taken at dispatch and the result fetched one group later
        # (see stream()), so each per-volume runtime folds in the overlapped
        # host work and an equal share of its group — exact as a mean over
        # the run, approximate per volume
        runtimes.append((time.time() - t0) / vshare)

        target = batch.target[0]
        if strategy in ("tiling", "tiling_tta"):
            target = target[..., :155]
        if postprocess:
            # optional ET-voxel suppression hook (the reference ships the
            # commented heuristic `np.sum(o) < 500 -> o*0`,
            # predict_simple.py:132-140)
            if (output == 3).sum() < 500:
                output = np.where(output == 3, 1, output)

        if dmetrics is not None:
            md = dmetrics(pp_dev(out_dev[0]) if postprocess else out_dev[0],
                          jnp.asarray(target))
            soft, miou, haus = md["dice"], md["miou"], md["hd95"]
        else:
            soft = metrics.softmax_output_dice(output, target)
            miou = metrics.softmax_output_miou(output, target)
            haus = (metrics.cal_hausdorff(output, target,
                                          batched_call_shape)
                    if use_hd95 else [0.0, 0.0, 0.0])
        wt.append(soft[0]); tc.append(soft[1]); et.append(soft[2])
        m_wt.append(miou[0]); m_tc.append(miou[1]); m_et.append(miou[2])
        h_wt.append(haus[0]); h_tc.append(haus[1]); h_et.append(haus[2])

        counts = [int((output == c).sum()) for c in range(4)]
        logger.info("name:%s, Subject %d/%d, DICE= WT:%.4f,TC:%.4f,ET:%.4f",
                    name, i + 1, n_total, *soft)
        logger.info("name:%s, MIOU= WT:%.4f,TC:%.4f,ET:%.4f", name, *miou)
        logger.info("name:%s, HAUSDORFF= WT:%.4f,TC:%.4f,ET:%.4f",
                    name, *haus)
        logger.info("pred counts 0..3: %s  (%.2fs/volume, pipelined "
                    "dispatch-to-fetch)", counts, runtimes[-1])

        if csv_export and visual:
            export.export_per_slice_csv(visual, name, output, target)
            # per-volume summary row (predict_simple.py:398-401 item_sum:
            # dice product + predicted/GT voxel counts per raw label 1/2/4)
            summary_rows.append({
                "name": name, "wt": soft[0], "tc": soft[1], "et": soft[2],
                "sum": soft[0] * soft[1] * soft[2],
                "pre_1": counts[1], "pre_2": counts[2], "pre_4": counts[3],
                "gt_1": int((target == 1).sum()),
                "gt_2": int((target == 2).sum()),
                "gt_4": int((target == 3).sum())})
        if snapshot and visual:
            export.export_png_slices(visual, name, output, target)
        if save_nifti and savepath:
            # carry the source affine so submissions have valid world
            # coordinates (reference keeps nibabel's, predict.py:318-328),
            # and re-embed crop-strategy predictions into the source
            # geometry so every strategy produces a submission-shaped
            # volume (the reference's NIfTI path only ever handled full
            # volumes)
            seg = output
            src = getattr(batch, "source_shapes", [None])[0]
            org = getattr(batch, "crop_origins", [None])[0]
            if (src is not None and org is not None
                    and tuple(src) != seg.shape):
                full = np.zeros(tuple(src), seg.dtype)
                ends = [min(o + c, s) for o, c, s
                        in zip(org, seg.shape, src)]
                full[tuple(slice(o, e) for o, e in zip(org, ends))] = \
                    seg[tuple(slice(0, e - o) for o, e in zip(org, ends))]
                seg = full
            export.export_nifti_segmentation(
                os.path.join(savepath, f"{name}.nii.gz"), seg,
                affine=getattr(batch, "affines", [None])[0])

    if summary_rows:
        export.export_volume_summary_csv(
            os.path.join(visual, "sum.csv"), summary_rows)
    out = {
        "wt": float(np.mean(wt)), "tc": float(np.mean(tc)),
        "et": float(np.mean(et)),
        "hd95_wt": float(np.mean(h_wt)), "hd95_tc": float(np.mean(h_tc)),
        "hd95_et": float(np.mean(h_et)),
        "miou_wt": float(np.mean(m_wt)), "miou_tc": float(np.mean(m_tc)),
        "miou_et": float(np.mean(m_et)),
        "sec_per_volume": float(np.mean(runtimes)) if runtimes else 0.0,
    }
    logger.info("WT Dice: %.4f | TC Dice: %.4f | ET Dice: %.4f",
                out["wt"], out["tc"], out["et"])
    logger.info("HD95 WT: %.4f | TC: %.4f | ET: %.4f",
                out["hd95_wt"], out["hd95_tc"], out["hd95_et"])
    logger.info("MIOU WT: %.4f | TC: %.4f | ET: %.4f",
                out["miou_wt"], out["miou_tc"], out["miou_et"])
    return out
