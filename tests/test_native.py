"""Native C++ kernel parity and performance sanity."""

import time

import numpy as np
import pytest

from dctseg.native import lib, native_edge_map, native_zscore
from dctseg.data.edge import _make_edge_map_scipy
from dctseg.data.brats import _zscore_nonzero_np

needs_native = pytest.mark.skipif(lib() is None,
                                  reason="no C++ toolchain available")


@needs_native
def test_edge_map_native_matches_scipy():
    rng = np.random.default_rng(0)
    label = np.zeros((40, 40, 40), np.int32)
    label[8:30, 8:30, 8:30] = 2
    label[12:24, 12:24, 12:24] = 3
    label[15:20, 15:20, 15:20] = 1
    # plus speckle to hit edge cases (isolated voxels, volume borders)
    speckle = rng.choice([0, 1, 2, 3], size=label.shape,
                         p=[0.95, 0.02, 0.02, 0.01]).astype(np.int32)
    for vol in (label, speckle, np.zeros((8, 8, 8), np.int32)):
        got = native_edge_map(vol)
        want = _make_edge_map_scipy(vol)
        np.testing.assert_array_equal(got, want)


@needs_native
def test_zscore_native_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.normal(50, 20, size=(30, 30, 20, 4)).astype(np.float32)
    img[img < 40] = 0.0            # realistic zero background
    img[..., 2] = 0.0              # fully-zero modality
    got = native_zscore(img)
    want = _zscore_nonzero_np(img)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@needs_native
def test_native_edge_map_speedup():
    label = np.zeros((128, 128, 128), np.int32)
    label[30:100, 30:100, 30:100] = 2
    label[50:80, 50:80, 50:80] = 3
    native_edge_map(label)  # warm
    t0 = time.perf_counter()
    native_edge_map(label)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _make_edge_map_scipy(label)
    t_scipy = time.perf_counter() - t0
    assert t_native < t_scipy, (t_native, t_scipy)
