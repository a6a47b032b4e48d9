"""Metric tests: dice/mIoU composites and the scipy-based HD95."""

import pytest
import numpy as np

from dctseg import metrics


def test_dice_composites_perfect_and_disjoint():
    a = np.zeros((8, 8, 8), np.int32)
    a[2:5, 2:5, 2:5] = 1
    a[5:7, 5:7, 5:7] = 3
    assert metrics.softmax_output_dice(a, a) == [1.0, 1.0, 1.0]
    b = np.zeros_like(a)
    wt, tc, et = metrics.softmax_output_dice(a, b)
    assert wt < 1e-5 and tc < 1e-5 and et < 1e-5


def test_miou_matches_manual():
    o = np.zeros((4, 4, 4), np.int32)
    t = np.zeros((4, 4, 4), np.int32)
    o[:2] = 1
    t[1:3] = 1
    wt = metrics.softmax_output_miou(o, t)[0]
    # intersection 16, union 48
    np.testing.assert_allclose(wt, 16 / 48, rtol=1e-6)


def test_hd95_translated_cube():
    """Two identical cubes offset by k voxels along one axis have
    hd95 == hd == k for the flat faces (the 95th percentile across the
    surface is dominated by the offset distance)."""
    a = np.zeros((24, 24, 24), bool)
    b = np.zeros((24, 24, 24), bool)
    a[4:12, 4:20, 4:20] = True
    b[8:16, 4:20, 4:20] = True    # shifted +4 in x
    d = metrics.hausdorff_distance_95(a, b)
    assert 3.0 <= d <= 4.01, d


def test_hd95_pooled_percentile_medpy_semantics():
    """medpy.metric.hd95 (which utils/hausdorff.py:106 wraps) pools BOTH
    directed distance sets before taking one 95th percentile.  On an
    asymmetric error — prediction = ground truth plus a distant false-positive
    blob — this differs from max(percentile(d1), percentile(d2)): d2 is all
    zeros and dilutes the pooled percentile."""
    ref = np.zeros((32, 32, 32), bool)
    ref[4:14, 4:14, 4:14] = True
    test = ref.copy()
    test[24:28, 24:28, 24:28] = True  # distant FP blob
    d1 = metrics._surface_distances(test, ref)
    d2 = metrics._surface_distances(ref, test)
    pooled = float(np.percentile(np.hstack((d1, d2)), 95))
    per_dir = float(max(np.percentile(d1, 95), np.percentile(d2, 95)))
    assert pooled != per_dir  # the case VERDICT r1 flagged as untested
    np.testing.assert_allclose(
        metrics.hausdorff_distance_95(test, ref), pooled, rtol=1e-9)


def test_hd95_identical_is_zero():
    a = np.zeros((10, 10, 10), bool)
    a[3:7, 3:7, 3:7] = True
    assert metrics.hausdorff_distance_95(a, a) == 0.0


def test_hd95_degenerate_guards():
    empty = np.zeros((6, 6, 6), bool)
    full = np.ones((6, 6, 6), bool)
    some = np.zeros((6, 6, 6), bool)
    some[2:4, 2:4, 2:4] = True
    # reference ConfusionMatrix guard: empty or full on either side -> 0
    assert metrics.hausdorff_distance_95(empty, some) == 0.0
    assert metrics.hausdorff_distance_95(some, empty) == 0.0
    assert metrics.hausdorff_distance_95(full, some) == 0.0
    assert np.isnan(
        metrics.hausdorff_distance_95(empty, some, nan_for_nonexisting=True))


def test_cal_hausdorff_triplet():
    a = np.zeros((12, 12, 12), np.int32)
    a[2:6, 2:6, 2:6] = 1
    a[6:9, 6:9, 6:9] = 3
    out = metrics.cal_hausdorff(a, a)
    assert out == [0.0, 0.0, 0.0]


def test_cal_hausdorff_batched_call_shape_quirk():
    """The reference passes (1, D, H, W) masks to medpy
    (predict_simple.py:393,408); the 4-D cross-footprint erosion along the
    size-1 batch axis degenerates 'surfaces' to the full masks, so the
    reference's HD95 is the pooled percentile of ALL-voxel distances.
    cal_hausdorff must reproduce that by default and the corrected 3-D
    surface metric on request — the two must differ on overlapping masks."""
    from scipy import ndimage as ndi

    o = np.zeros((24, 24, 24), np.int32)
    t = np.zeros((24, 24, 24), np.int32)
    o[4:14, 4:14, 4:14] = 1
    t[7:19, 5:15, 4:14] = 1

    def medpy_hd95_4d(a, b):
        a, b = a[None].astype(bool), b[None].astype(bool)
        fp = ndi.generate_binary_structure(4, 1)
        ab = a ^ ndi.binary_erosion(a, structure=fp, iterations=1)
        bb = b ^ ndi.binary_erosion(b, structure=fp, iterations=1)
        d1 = ndi.distance_transform_edt(~bb)[ab]
        d2 = ndi.distance_transform_edt(~ab)[bb]
        return np.percentile(np.hstack((d1, d2)), 95)

    want_wt = medpy_hd95_4d(o > 0, t > 0)
    got = metrics.cal_hausdorff(o, t)  # default: reference call shape
    np.testing.assert_allclose(got[0], want_wt, rtol=1e-9)
    corrected = metrics.cal_hausdorff(o, t, batched_call_shape=False)
    assert abs(corrected[0] - got[0]) > 0.1  # quirk is load-bearing


def _blobby_labels(seed, shape=(24, 24, 24)):
    r = np.random.default_rng(seed)
    arr = np.zeros(shape, np.int32)
    zz, yy, xx = np.ogrid[:shape[0], :shape[1], :shape[2]]
    for lab in (1, 2, 3):
        c = r.integers(4, 20, 3)
        rad = r.integers(2, 6)
        arr[(zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
            < rad ** 2] = lab
    return arr


def test_squared_edt_exact_vs_scipy():
    """Device EDT is the exact integer squared Euclidean distance."""
    from scipy import ndimage as ndi
    import jax.numpy as jnp
    from dctseg.ops import edt

    rng = np.random.default_rng(0)
    for shape in [(16, 16, 16), (13, 17, 9)]:
        m = rng.random(shape) < 0.1
        ref = np.round(ndi.distance_transform_edt(~m) ** 2)
        got = np.asarray(edt.squared_edt(jnp.asarray(m)))
        np.testing.assert_array_equal(got, ref)


def test_percentile_ranks_match_numpy_float64():
    """The device integer twin of numpy's percentile index arithmetic
    (metrics._percentile_ranks) must bracket identically to the f64 host
    computation for every surface-count magnitude, including exact
    multiples of 20 (where idx is an exact integer and k_lo == k_hi)."""
    import jax.numpy as jnp

    ns = np.concatenate([
        np.arange(0, 2001),
        np.random.default_rng(3).integers(0, 2 * 240 * 240 * 155,
                                          5000),
        np.arange(0, 41) * 892800,          # multiples of 20 at scale
        np.array([2 * 240 * 240 * 155]),    # the maximum pooled count
    ]).astype(np.int64)
    idx = 0.95 * (np.maximum(ns, 1) - 1).astype(np.float64)
    want = np.stack([np.floor(idx), np.ceil(idx)], -1).astype(np.int64)
    got = np.asarray(metrics._percentile_ranks(
        jnp.asarray(ns, jnp.int32)), np.int64)
    np.testing.assert_array_equal(got, want)


def test_squared_edt_pallas_bit_identical():
    """The Pallas min-plus kernel (TPU path of squared_edt) matches the XLA
    implementation bit-for-bit, including batch dims, unaligned extents,
    tile remainders, unroll tails, and the all-False sentinel."""
    import jax.numpy as jnp
    from dctseg.ops import edt
    from dctseg.ops.pallas import minplus

    rng = np.random.default_rng(7)
    cases = [((2, 10, 9, 11), 4, 1), ((1, 11, 13, 6), 8, 4),
             ((3, 5, 6, 7), 16, 2)]
    for shape, tile_b, unroll in cases:
        m = rng.random(shape) < 0.12
        ref = np.asarray(edt.squared_edt(jnp.asarray(m), impl="xla"))
        f = jnp.where(jnp.asarray(m), jnp.float32(0), edt.INF)
        got = np.asarray(minplus.squared_edt_3d(f, tile_b, unroll,
                                                interpret=True))
        np.testing.assert_array_equal(got, ref)
    # all-False mask: INF sentinel must survive all three passes
    m = jnp.zeros((1, 6, 7, 8), bool)
    ref = np.asarray(edt.squared_edt(m, impl="xla"))
    got = np.asarray(edt.squared_edt(m, impl="pallas-interpret"))
    np.testing.assert_array_equal(got, ref)


def test_masked_order_stats_pallas_bit_identical():
    """The Pallas m-ary order-statistic search (TPU path of phase2) matches
    the XLA binary search bit-for-bit across fanouts, tile remainders, and
    value ranges (tiny, typical, near-vmax)."""
    import jax.numpy as jnp
    from dctseg.ops import edt
    from dctseg.ops.pallas import orderstats

    rng = np.random.default_rng(11)
    vmax = 3.0 * 255 ** 2 + 1
    for trial, hi in enumerate((5, 2500, 195075)):
        c, m = 3, int(rng.integers(100, 3000))
        vals = np.where(rng.random((c, m)) < 0.4,
                        rng.integers(0, hi, (c, m)).astype(np.float64),
                        1e7).astype(np.float32)
        nval = max(1, int((vals < vmax).sum(1).min()))
        ks = rng.integers(0, nval, (c, 2)).astype(np.int32)
        ref = np.asarray(edt.masked_order_stats(
            jnp.asarray(vals), jnp.asarray(ks), vmax, impl="xla"))
        for fanout in (4, 8):
            got = np.asarray(orderstats.masked_order_stats(
                jnp.asarray(vals), jnp.asarray(ks), vmax, tile_rows=4,
                fanout=fanout, interpret=True))
            np.testing.assert_array_equal(got, ref)


def test_erode_cross_exact_vs_scipy():
    from scipy import ndimage as ndi
    import jax.numpy as jnp
    from dctseg.ops import edt

    rng = np.random.default_rng(1)
    for shape in [(16, 16, 16), (13, 17, 9)]:
        m = rng.random(shape) < 0.6
        st = ndi.generate_binary_structure(3, 1)
        ref = ndi.binary_erosion(m, structure=st)
        got = np.asarray(edt.erode_cross(jnp.asarray(m)))
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("bcs", [True, False])
def test_device_metrics_exact_vs_host(bcs):
    """DeviceMetrics must match the host Dice/mIoU/HD95 EXACTLY (zero
    tolerance): same integer counts, and HD95 finished in float64 from the
    exact integer squared order statistics."""
    dm = metrics.DeviceMetrics(batched_call_shape=bcs)
    for seed in range(4):
        out = _blobby_labels(seed)
        tgt = _blobby_labels(seed + 100)
        d = dm(out, tgt)
        assert d["dice"] == metrics.softmax_output_dice(out, tgt)
        assert d["miou"] == metrics.softmax_output_miou(out, tgt)
        assert d["hd95"] == metrics.cal_hausdorff(
            out, tgt, batched_call_shape=bcs)


def test_device_metrics_degenerate_and_batch_axis():
    dm = metrics.DeviceMetrics()
    z = np.zeros((8, 8, 8), np.int32)
    assert dm(z, z)["hd95"] == [0.0, 0.0, 0.0]
    out = _blobby_labels(7)
    tgt = _blobby_labels(8)
    # a leading batch-1 axis is stripped (validate passes (1, D, H, W))
    assert dm(out[None], tgt[None])["hd95"] == dm(out, tgt)["hd95"]
