"""Synthetic BraTS-like volumes for tests, benchmarks and dataset-free runs.

Generates nested ellipsoidal "tumors" (edema containing core containing
enhancing rim) over 4 correlated noise modalities, at the raw BraTS geometry
(240x240x155, labels {0,1,2,4}) or any requested size.  Can also materialize
a fake on-disk BraTS-layout dataset (NIfTI files + train.txt/valid.txt) to
exercise the real loading path end-to-end.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np


# cache all default synthetic samples (~156MB each; host RAM is ample) —
# with maxsize < dataset size every epoch regenerates every volume (~20s
# apiece on this slow host)
@functools.lru_cache(maxsize=16)
def make_volume_channels(seed: int,
                         shape: Tuple[int, int, int] = (240, 240, 155),
                         num_modalities: int = 4):
    """Returns (channels: tuple of M contiguous (H, W, D) float32 arrays,
    label (H, W, D) uint8 with raw BraTS values {0, 1, 2, 4}).  Results are
    cached; callers must not mutate the returned arrays."""
    img, label = _make_volume_impl(seed, shape, num_modalities)
    chans = tuple(np.ascontiguousarray(img[..., m])
                  for m in range(num_modalities))
    return chans, label


def make_volume(seed: int, shape: Tuple[int, int, int] = (240, 240, 155),
                num_modalities: int = 4):
    """Returns (image (H, W, D, M) float32, label (H, W, D) uint8 with raw
    BraTS values {0, 1, 2, 4})."""
    chans, label = make_volume_channels(seed, shape, num_modalities)
    return np.stack(chans, axis=-1), label


def _make_volume_impl(seed, shape, num_modalities):
    rng = np.random.default_rng(seed)
    h, w, d = shape
    ii = np.arange(h, dtype=np.float32)[:, None, None]
    jj = np.arange(w, dtype=np.float32)[None, :, None]
    kk = np.arange(d, dtype=np.float32)[None, None, :]

    def edist(center, radii):
        return np.sqrt(((ii - center[0]) / radii[0]) ** 2
                       + ((jj - center[1]) / radii[1]) ** 2
                       + ((kk - center[2]) / radii[2]) ** 2)

    center = np.array([h, w, d]) * (0.35 + 0.3 * rng.random(3))
    radii = np.array([h, w, d]) * (0.08 + 0.10 * rng.random(3))
    dist = edist(center, radii)

    label = np.zeros(shape, np.uint8)
    label[dist < 1.0] = 2                       # edema
    label[dist < 0.7] = 4                       # enhancing
    label[dist < 0.4] = 1                       # necrotic core

    # brain mask: big ellipsoid; outside is exactly zero (z-score over
    # nonzero voxels relies on this)
    bcenter = np.array([h, w, d]) * 0.5
    bradii = np.array([h, w, d]) * np.array([0.45, 0.45, 0.48])
    brain = edist(bcenter, bradii) < 1.0

    img = np.zeros(shape + (num_modalities,), np.float32)
    base = rng.normal(0.0, 1.0, shape).astype(np.float32)
    for m in range(num_modalities):
        level = 400.0 + 200.0 * m
        tex = 0.5 * base + rng.normal(0, 0.5, shape).astype(np.float32)
        mod = level + 80.0 * tex
        mod += (30.0 * (m + 1)) * (label == 2)
        mod += (60.0 * (m + 1)) * (label == 4)
        mod -= (40.0 * (m + 1)) * (label == 1)
        img[..., m] = np.where(brain, mod, 0.0)
    label = np.where(brain, label, 0).astype(np.uint8)
    return img, label


def write_fake_dataset(root: str, num_train: int = 2, num_valid: int = 1,
                       shape: Tuple[int, int, int] = (240, 240, 155),
                       modalities=("flair", "t1", "t1ce", "t2"),
                       seed: int = 0, affine: np.ndarray = None) -> None:
    """Materialize a BraTS2018-layout dataset:
    root/<case>/<case>_<modality>.nii.gz + _seg.nii.gz, plus list files.

    Default affine matches the BraTS SRI24 atlas orientation (LPS-flipped
    RAS, 1mm isotropic) so affine propagation is exercised non-trivially."""
    from dctseg.data import nifti

    if affine is None:
        affine = np.array([[-1., 0., 0., 0.], [0., -1., 0., 239.],
                           [0., 0., 1., 0.], [0., 0., 0., 1.]], np.float32)
    names = [f"SYN_{seed}_{i:03d}" for i in range(num_train + num_valid)]
    for i, name in enumerate(names):
        case_dir = os.path.join(root, name)
        os.makedirs(case_dir, exist_ok=True)
        chans, label = make_volume_channels(seed * 1000 + i, shape,
                                            len(modalities))
        for m, mod in enumerate(modalities):
            nifti.save(chans[m],
                       os.path.join(case_dir, f"{name}_{mod}.nii.gz"),
                       affine=affine)
        nifti.save(label, os.path.join(case_dir, f"{name}_seg.nii.gz"),
                   affine=affine)
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names[:num_train]) + "\n")
    with open(os.path.join(root, "valid.txt"), "w") as f:
        f.write("\n".join(names[num_train:]) + "\n")
