"""Driver-level end-to-end smoke test: scripts/train.py -> scripts/evaluate.py
main() against a materialized on-disk dataset, through real subprocesses.

Every subsystem is unit-tested elsewhere; this is the one test that runs the
actual CLI drivers the way a user does (reference flow: train.py:300-308
then test_all_pth.py:143-149), so argparse wiring / config plumbing
regressions (the round-1 --resume bug class) can't hide."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _run(script, *args, timeout=900):
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}          # sitecustomize TPU hook
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        cwd=REPO, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert proc.returncode == 0, (script, proc.stdout.decode()[-4000:])
    return proc.stdout.decode()


@pytest.mark.slow
def test_train_then_evaluate_drivers(tmp_path):
    from dctseg.data.synthetic import write_fake_dataset

    root = str(tmp_path / "data")
    write_fake_dataset(root, num_train=2, num_valid=2, shape=(48, 48, 40))
    ckpt = str(tmp_path / "ckpt")
    cache = str(tmp_path / "cache")
    out = str(tmp_path / "out")

    common = ["--img-dim", "32", "--base-channels", "4",
              "--input-shape", "48", "48", "40"]

    # train 2 epochs, checkpoint each, validation pass at each save
    log = _run("train.py", "--root", root, "--cache-dir", cache,
               "--end-epoch", "2", "--save-freq", "1", "--eval-at-save",
               "--checkpoint-dir", ckpt, "--log-dir", str(tmp_path / "logs"),
               "--num-workers", "2", "--num-devices", "1", *common)
    assert "eval@" in log                      # --eval-at-save ran
    saved = sorted(int(d) for d in os.listdir(ckpt) if d.isdigit())
    assert saved == [0, 1, 2], saved           # per-epoch + final saves
    assert os.listdir(cache)                   # preprocessed cache used

    # primary eval: TTA + CSV + NIfTI submission + corrected HD95 mode
    log = _run("evaluate.py", "--root", root, "--checkpoint-dir", ckpt,
               "--cache-dir", cache, "--strategy", "tta", "--csv",
               "--save-nifti", "--hd95", "surface",
               "--output-dir", out, *common)
    assert "loaded checkpoint epoch 2" in log

    # per-volume summary CSV (predict_simple.py:147-183)
    import pandas as pd
    summary = pd.read_csv(os.path.join(out, "visual", "sum.csv"))
    assert len(summary) == 2
    assert {"wt", "tc", "et", "sum"} <= set(summary.columns)

    # NIfTI submission exists, loads, carries the source affine, and uses
    # raw BraTS labels {0,1,2,4}
    from dctseg.data import nifti
    with open(os.path.join(root, "valid.txt")) as f:
        names = f.read().split()
    sub = os.path.join(out, "submission", f"{names[0]}.nii.gz")
    seg = nifti.load(sub)
    src = nifti.load(os.path.join(root, names[0], f"{names[0]}_seg.nii.gz"))
    np.testing.assert_array_equal(seg.affine, src.affine)
    assert set(np.unique(seg.data)) <= {0, 1, 2, 4}
    assert seg.data.shape == (48, 48, 40)

    # checkpoint sweep (test_all_pth.py): one CSV row per checkpoint
    sweep_out = str(tmp_path / "sweep")
    _run("evaluate.py", "--root", root, "--checkpoint-dir", ckpt,
         "--cache-dir", cache, "--strategy", "sweep", "--no-hd95",
         "--output-dir", sweep_out, *common)
    rows = pd.read_csv(os.path.join(sweep_out, "save_pth.csv"))
    assert len(rows) == 3                      # epochs 0, 1, 2
    assert rows["name"].str.startswith("epoch_").all()
    assert np.isfinite(rows[["wt", "tc", "et"]].to_numpy()).all()
