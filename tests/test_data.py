"""Data pipeline tests: NIfTI IO, edge maps, dataset assembly, loader."""

import os

import numpy as np
import pytest

from dctseg.config import DataConfig
from dctseg.data import nifti, synthetic
from dctseg.data.brats import BraTSDataset, zscore_nonzero
from dctseg.data.edge import decode_edge_map, make_edge_map, region_boundary
from dctseg.data.pipeline import PrefetchLoader, shard_indices


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.int16, np.uint8):
        data = (rng.normal(0, 100, (7, 9, 5)) if dtype == np.float32
                else rng.integers(0, 100, (7, 9, 5))).astype(dtype)
        for ext in (".nii", ".nii.gz"):
            p = str(tmp_path / f"x_{dtype.__name__}{ext}")
            nifti.save(data, p)
            back = nifti.load(p)
            np.testing.assert_array_equal(back.data, data)
            assert back.data.dtype == dtype


def test_nifti_scl_scaling(tmp_path):
    """scl_slope/scl_inter must be applied on load."""
    import struct
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = str(tmp_path / "scaled.nii")
    nifti.save(data, p)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, 5.0)   # scl_inter
    open(p, "wb").write(bytes(raw))
    back = nifti.load(p)
    np.testing.assert_allclose(back.data,
                               data.astype(np.float32) * 2.0 + 5.0)


def test_edge_map_codes_and_decode():
    label = np.zeros((20, 20, 20), np.int32)
    label[4:16, 4:16, 4:16] = 2        # edema shell
    label[7:13, 7:13, 7:13] = 3        # enhancing
    label[9:11, 9:11, 9:11] = 1        # necrotic
    edge = make_edge_map(label)
    # only legal codes
    assert set(np.unique(edge)) <= {0, 1, 2, 4, 5, 6, 7, 8}
    # adjacent region boundaries coincide -> composite codes must occur
    assert ((edge == 7) | (edge == 5)).any(), "1-4 shared boundary missing"
    assert ((edge == 8) | (edge == 5)).any(), "2-4 shared boundary missing"
    # decode matches direct morphological gradients
    dec = decode_edge_map(edge)
    for key, region in (("01", 1), ("02", 2), ("04", 3)):
        np.testing.assert_array_equal(dec[key],
                                      region_boundary(label == region))


def test_zscore_nonzero():
    img = np.zeros((10, 10, 10, 2), np.float32)
    img[2:8, 2:8, 2:8, 0] = np.random.default_rng(0).normal(
        50, 10, (6, 6, 6))
    img[1:5, 1:5, 1:5, 1] = 7.0
    out = zscore_nonzero(img)
    m0 = img[..., 0] != 0
    assert abs(out[..., 0][m0].mean()) < 1e-4
    assert abs(out[..., 0][m0].std() - 1.0) < 1e-3
    assert (out[~(img != 0).any(-1)] == 0).all()


def test_synthetic_dataset_train_items():
    cfg = DataConfig(synthetic_num_samples=3)
    ds = BraTSDataset(mode="train", cfg=cfg)
    assert len(ds) == 3 and len(ds.names) == 3
    s = ds[0]
    assert s.x.shape == (128, 128, 128, 4)
    assert s.target.shape == (128, 128, 128)
    assert set(np.unique(s.target)) <= {0, 1, 2, 3}
    assert s.edge.shape == (128, 128, 128)
    assert s.missing_modal.tolist() == [1, 1, 1, 1]


def test_full_mode_shapes():
    cfg = DataConfig(synthetic_num_samples=1)
    ds = BraTSDataset(mode="full", cfg=cfg)
    s = ds[0]
    assert s.x.shape == (240, 240, 160, 4)
    assert s.target.shape == (240, 240, 155)
    assert (s.x[:, :, 155:] == 0).all()


def test_real_file_loading_path(tmp_path):
    """End-to-end through the on-disk BraTS layout via our NIfTI writer."""
    root = str(tmp_path / "brats")
    synthetic.write_fake_dataset(root, num_train=2, num_valid=1,
                                 shape=(64, 64, 40))
    cfg = DataConfig(input_shape=(64, 64, 40), pad_depth=48,
                     crop_size=(32, 32, 32))
    ds = BraTSDataset(os.path.join(root, "train.txt"), root, "train",
                      cfg=cfg)
    assert len(ds) == 2
    s = ds[0]
    assert s.x.shape == (32, 32, 32, 4)
    assert s.target.shape == (32, 32, 32)
    assert s.path.endswith(ds.names[0] + os.sep)
    # valid mode is deterministic
    dsv = BraTSDataset(os.path.join(root, "valid.txt"), root, "valid",
                       cfg=cfg)
    a, b = dsv[0], dsv[0]
    np.testing.assert_array_equal(a.x, b.x)


def test_affine_roundtrip_to_submission(tmp_path):
    """The source volume's affine must survive into exported submissions
    (reference keeps nibabel's affine, predict.py:318-328)."""
    from dctseg.data import nifti
    from dctseg.utils import export

    root = str(tmp_path / "brats")
    brats_affine = np.array([[-1., 0., 0., 0.], [0., -1., 0., 239.],
                             [0., 0., 1., 0.], [0., 0., 0., 1.]], np.float32)
    synthetic.write_fake_dataset(root, num_train=1, num_valid=1,
                                 shape=(48, 48, 32))
    cfg = DataConfig(input_shape=(48, 48, 32), pad_depth=32,
                     crop_size=(32, 32, 32))
    ds = BraTSDataset(os.path.join(root, "valid.txt"), root, "full", cfg=cfg)
    s = ds[0]
    np.testing.assert_array_equal(s.affine, brats_affine)
    out = str(tmp_path / "sub.nii.gz")
    export.export_nifti_segmentation(out, s.target.astype(np.uint8),
                                     affine=s.affine)
    np.testing.assert_array_equal(nifti.load(out).affine, brats_affine)


def test_drop_modal():
    cfg = DataConfig(synthetic_num_samples=2)
    ds = BraTSDataset(mode="train", drop_modal=True, cfg=cfg)
    rng = np.random.default_rng(0)
    seen_drop = False
    for _ in range(8):
        s = ds.get(0, rng)
        present = s.missing_modal
        assert present.sum() >= 1
        for m in range(4):
            if not present[m]:
                seen_drop = True
                assert (s.x[..., m] == 0).all()
    assert seen_drop


def test_shard_indices_cover_and_disjoint():
    idx = [shard_indices(10, epoch=3, seed=7, shard=s, num_shards=4,
                         shuffle=True) for s in range(4)]
    # equal length, union covers all samples
    assert all(len(i) == 3 for i in idx)
    assert set().union(*map(set, idx)) == set(range(10))
    # deterministic given epoch
    again = shard_indices(10, 3, 7, 0, 4, True)
    assert idx[0] == again
    assert shard_indices(10, 4, 7, 0, 4, True) != idx[0]


def test_prefetch_loader_order_and_shapes():
    cfg = DataConfig(synthetic_num_samples=4,
                     input_shape=(64, 64, 40), pad_depth=48,
                     crop_size=(32, 32, 32))
    ds = BraTSDataset(mode="valid", cfg=cfg)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].x.shape == (2, 32, 32, 32, 4)
    assert batches[0].names == ds.names[:2]
    assert batches[1].names == ds.names[2:]


def test_augmentation_flags():
    cfg = DataConfig(synthetic_num_samples=1, input_shape=(48, 48, 40),
                     pad_depth=40, crop_size=(32, 32, 32),
                     augment_flip=True, augment_intensity=0.1)
    ds = BraTSDataset(mode="train", cfg=cfg)
    rng = np.random.default_rng(0)
    a = ds.get(0, rng)
    b = ds.get(0, rng)
    assert a.x.shape == b.x.shape == (32, 32, 32, 4)
    assert not np.array_equal(a.x, b.x)  # stochastic augmentation
    # edge map consistent with (possibly flipped) target
    from dctseg.data.edge import _make_edge_map_scipy
    np.testing.assert_array_equal(a.edge, _make_edge_map_scipy(a.target))


def test_prefetch_loader_bounded_inflight():
    """Workers must not decode an unbounded number of batches ahead of the
    consumer (ADVICE r1: real samples are ~50 MB; unbounded prefetch OOMs
    the host).  With prefetch=1 and 1 worker, at most 1 (in-flight) + 1
    (taken) batches may have started decoding after one consume."""
    import time

    cfg = DataConfig(synthetic_num_samples=12, input_shape=(32, 32, 24),
                     pad_depth=24, crop_size=(16, 16, 16))

    class Counting(BraTSDataset):
        started = 0

        def get(self, idx, rng=None):
            Counting.started += 1
            return super().get(idx, rng)

    ds = Counting(mode="valid", cfg=cfg)
    loader = PrefetchLoader(ds, batch_size=1, shuffle=False, num_workers=1,
                            prefetch=1)
    it = iter(loader)
    next(it)
    time.sleep(0.5)  # give the worker time to run ahead if it could
    # consumed 1 (permit released) + at most 1 permit in flight = 2;
    # allow one extra for the release/acquire race
    assert Counting.started <= 3, Counting.started
    rest = list(it)
    assert Counting.started == 12
    assert len(rest) == 11


def test_prefetch_loader_propagates_worker_errors():
    cfg = DataConfig(synthetic_num_samples=2, input_shape=(48, 48, 40),
                     pad_depth=40, crop_size=(32, 32, 32))
    ds = BraTSDataset(mode="valid", cfg=cfg)

    class Boom(BraTSDataset):
        def get(self, idx, rng=None):
            raise RuntimeError("decode failed")
    boom = Boom(mode="valid", cfg=cfg)
    loader = PrefetchLoader(boom, batch_size=1, shuffle=False, num_workers=1)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(loader)


def test_preprocessed_volume_cache(tmp_path):
    """cache_dir decodes each case once into mmap-able .npy + cached stats;
    cached samples are bit-identical to direct NIfTI loads, and subsequent
    loads never touch the NIfTI files at all."""
    root = str(tmp_path / "brats")
    cache = str(tmp_path / "cache")
    synthetic.write_fake_dataset(root, num_train=1, num_valid=1,
                                 shape=(64, 64, 40))
    base_cfg = dict(input_shape=(64, 64, 40), pad_depth=48,
                    crop_size=(32, 32, 32))
    lst = os.path.join(root, "train.txt")
    direct = BraTSDataset(lst, root, "valid", cfg=DataConfig(**base_cfg))[0]
    ds = BraTSDataset(lst, root, "valid",
                      cfg=DataConfig(cache_dir=cache, **base_cfg))
    first = ds[0]
    np.testing.assert_allclose(first.x, direct.x, rtol=1e-6)
    np.testing.assert_array_equal(first.target, direct.target)
    np.testing.assert_array_equal(first.affine, direct.affine)
    files = sorted(os.listdir(cache))
    assert any(f.endswith(".img.npy") for f in files)
    # prove the cache is authoritative: remove the NIfTI source entirely
    import shutil
    shutil.rmtree(os.path.join(root, ds.names[0]))
    again = ds[0]
    np.testing.assert_array_equal(again.x, first.x)
    np.testing.assert_array_equal(again.target, first.target)
    # full mode reads through the same cache
    full = BraTSDataset(lst, root, "full",
                        cfg=DataConfig(cache_dir=cache, **base_cfg))[0]
    assert full.x.shape == (64, 64, 48, 4)


def test_missing_modalities_deterministic():
    """missing_modalities forces given channels absent on every sample,
    including in valid mode where random drop_modal is inert."""
    cfg = DataConfig(synthetic_num_samples=1, missing_modalities=(1, 3))
    ds = BraTSDataset(mode="valid", cfg=cfg)
    s = ds[0]
    np.testing.assert_array_equal(s.missing_modal, [1, 0, 1, 0])
    assert (s.x[..., 1] == 0).all() and (s.x[..., 3] == 0).all()
    assert (s.x[..., 0] != 0).any()


def test_synthetic_hardness_modes():
    """'hard' volumes are multi-focal/lobed with weaker contrast; both
    hardness modes keep the BraTS label alphabet and brain-masked zeros."""
    simple_img, simple_lab = synthetic.make_volume(7, (64, 64, 48))
    hard_img, hard_lab = synthetic.make_volume(7, (64, 64, 48),
                                               hardness="hard")
    assert set(np.unique(hard_lab)) <= {0, 1, 2, 4}
    assert (hard_lab > 0).any()
    assert not np.array_equal(simple_lab, hard_lab)
    # weaker contrast: enhancing-vs-background intensity gap shrinks
    def gap(img, lab):
        bg = img[..., 3][(lab == 0) & (img[..., 3] != 0)].mean()
        et = img[..., 3][lab == 4].mean()
        return abs(et - bg)
    if (simple_lab == 4).any() and (hard_lab == 4).any():
        assert gap(hard_img, hard_lab) < gap(simple_img, simple_lab)


def test_synthetic_valid_split_disjoint_from_train():
    cfg = DataConfig(synthetic_num_samples=1)
    tr = BraTSDataset(mode="train", cfg=cfg)
    va = BraTSDataset(mode="valid", cfg=cfg)
    t_raw = tr._load_raw(0)[1]
    v_raw = va._load_raw(0)[1]
    assert not np.array_equal(np.asarray(t_raw), np.asarray(v_raw))


def test_bf16_wire_format_bit_identical_for_bf16_model():
    """DataConfig.transfer_dtype='bfloat16' claims bit-identity for
    bf16-compute models: the model casts inputs to bf16 at its first op, so
    rounding on the host before transfer must change nothing."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from dctseg.config import tiny_model_config
    from dctseg.models.clswiseformer import build_model

    cfg = tiny_model_config(compute_dtype="bfloat16")
    m = build_model(cfg)
    x32 = np.random.default_rng(0).normal(
        size=(1, 32, 32, 32, 4)).astype(np.float32)
    x16 = x32.astype(ml_dtypes.bfloat16)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x32), train=False)
    y32 = m.apply(p, jnp.asarray(x32), train=False)[0]
    y16 = m.apply(p, jnp.asarray(x16), train=False)[0]
    np.testing.assert_array_equal(np.asarray(y32), np.asarray(y16))
