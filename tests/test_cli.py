"""Subprocess-level CLI smoke tests (CPU): the actual user-facing commands.

These pin the argparse plumbing end to end — config construction, protocol
output, artifact creation — by invoking the scripts exactly as a user would.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SCRIPTS = os.path.join(ROOT, "scripts")


def _run(args, cwd, timeout=420):
    return subprocess.run([sys.executable] + args, cwd=cwd, timeout=timeout,
                          capture_output=True, text=True)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """Synthetic dataset + extracted pairs, shared across CLI tests."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu import nifti

    ws = tmp_path_factory.mktemp("cli_ws")
    anat = ws / "datasets" / "s1" / "sub-01" / "anat"
    anat.mkdir(parents=True)
    rng = np.random.default_rng(0)
    vol = (rng.random((40, 36, 24)) * 500).astype(np.float32)
    nifti.save(str(anat / "sub-01_T1w.nii.gz"), vol)

    r = _run([os.path.join(SCRIPTS, "extract_paired_slices.py"),
              "--datasets_dir", "./datasets", "--hr_output_dir", "./hr",
              "--lr_output_dir", "./lr", "--n_slices", "8",
              "--target_size", "64", "64", "--cpu"], cwd=str(ws))
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(os.listdir(ws / "hr")) == 8
    return ws


def test_train_cli_protocol_and_checkpoints(workspace):
    r = _run([os.path.join(SCRIPTS, "train.py"),
              "--full_res_dir", "./hr", "--low_res_dir", "./lr",
              "--epochs", "1", "--batch_size", "8", "--base_filters", "16",
              "--seed", "1", "--checkpoint_dir", "./ckpt",
              "--grad_accum", "2",      # exercises the microbatch-scan path
              "--ema_decay", "0.9",     # exercises Polyak-averaged serving
              "--opt_shard",            # exercises ZeRO-1 moment sharding
              "--log_dir", "./logs", "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Gradient accumulation: 2 sequential microbatches" in r.stdout
    assert "EMA of weights enabled" in r.stdout
    assert "ZeRO-1 optimizer-state sharding" in r.stdout
    lines = [json.loads(l) for l in r.stdout.splitlines()
             if l.startswith("{")]
    kinds = {l["type"] for l in lines}
    assert {"params", "epoch_summary"} <= kinds
    assert (workspace / "ckpt" / "final_model_unet.ckpt").exists()
    assert (workspace / "ckpt" / "final_model_unet.json").exists()


def test_train_cli_spatial_shards(workspace):
    """--spatial_shards trains row-sharded over a (data, space) mesh end to
    end (LR 32x32 rows over 4 shards: 32 % (8*4) == 0)."""
    r = _run([os.path.join(SCRIPTS, "train.py"),
              "--full_res_dir", "./hr", "--low_res_dir", "./lr",
              "--epochs", "1", "--batch_size", "8", "--base_filters", "16",
              "--seed", "1", "--spatial_shards", "4",
              "--checkpoint_dir", "./ckpt_sp", "--log_dir", "./logs_sp",
              "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Spatially-sharded training" in r.stdout
    assert (workspace / "ckpt_sp" / "final_model_unet.ckpt").exists()


def test_infer_cli(workspace):
    name = sorted(os.listdir(workspace / "lr"))[0]
    r = _run([os.path.join(SCRIPTS, "infer.py"),
              "--input", f"./lr/{name}", "--target", f"./hr/{name}",
              "--output", "./sr_out.png", "--checkpoint_dir", "./ckpt",
              "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    import cv2
    out = cv2.imread(str(workspace / "sr_out.png"), cv2.IMREAD_GRAYSCALE)
    assert out is not None and out.shape == (64, 64)
    assert "SSIM" in r.stderr  # metrics logged


def test_infer_volume_cli(workspace):
    from mri_superresolution_tpu import nifti
    r = _run([os.path.join(SCRIPTS, "infer_volume.py"),
              "--input", "./datasets/s1/sub-01/anat/sub-01_T1w.nii.gz",
              "--output", "./sr_vol.nii.gz", "--checkpoint_dir", "./ckpt",
              "--batch_size", "8", "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    data, hdr = nifti.load(str(workspace / "sr_vol.nii.gz"))
    assert data.shape == (80, 72, 24)  # 2x in-plane
    assert hdr.zooms[0] == 0.5


def test_infer_volume_cli_spatial_shards(workspace):
    """Row-sharded serving path end to end: 8 virtual CPU devices as a
    (2 data, 4 space) mesh via --spatial_shards 4."""
    from mri_superresolution_tpu import nifti
    r = _run([os.path.join(SCRIPTS, "infer_volume.py"),
              "--input", "./datasets/s1/sub-01/anat/sub-01_T1w.nii.gz",
              "--output", "./sr_vol_sp.nii.gz", "--checkpoint_dir", "./ckpt",
              "--batch_size", "8", "--spatial_shards", "4", "--cpu"],
             cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    data, _ = nifti.load(str(workspace / "sr_vol_sp.nii.gz"))
    assert data.shape == (80, 72, 24)
    assert np.isfinite(data).all()


def test_infer_volume_cli_artifact(workspace):
    """Volume serving from a portable AOT artifact: export at 40x40, serve
    the (40, 36) slices via host-side pad+crop, no model code loaded."""
    from mri_superresolution_tpu import nifti
    r = _run([os.path.join(ROOT, "tools", "export_serving.py"),
              "--checkpoint_dir", "./ckpt", "--out", "vol.mrisrx",
              "--shapes", "40x40", "--base_filters", "16",
              "--platforms", "cpu", "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run([os.path.join(SCRIPTS, "infer_volume.py"),
              "--input", "./datasets/s1/sub-01/anat/sub-01_T1w.nii.gz",
              "--output", "./sr_vol_art.nii.gz", "--artifact", "vol.mrisrx",
              "--batch_size", "8", "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "no model code loaded" in r.stderr
    assert "zero-padded to the smallest fitting" in r.stderr
    data, hdr = nifti.load(str(workspace / "sr_vol_art.nii.gz"))
    assert data.shape == (80, 72, 24) and np.isfinite(data).all()
    assert hdr.zooms[0] == 0.5
    # incompatible engine-side modes are refused, not silently ignored
    r = _run([os.path.join(SCRIPTS, "infer_volume.py"),
              "--input", "./datasets/s1/sub-01/anat/sub-01_T1w.nii.gz",
              "--output", "./nope.nii.gz", "--artifact", "vol.mrisrx",
              "--quant", "int8", "--cpu"], cwd=str(workspace))
    assert r.returncode == 1 and "incompatible" in r.stderr


def test_infer_volume_cli_directory_batch(workspace):
    """--input as a DIRECTORY serves every volume through one loaded
    backend, writing <stem>_sr outputs under --output."""
    import shutil
    from mri_superresolution_tpu import nifti
    vdir = workspace / "vols"
    vdir.mkdir(exist_ok=True)
    src = workspace / "datasets" / "s1" / "sub-01" / "anat" / "sub-01_T1w.nii.gz"
    shutil.copy(src, vdir / "a.nii.gz")
    shutil.copy(src, vdir / "b.nii.gz")
    (vdir / "corrupt.nii").write_bytes(b"not a nifti at all")
    r = _run([os.path.join(SCRIPTS, "infer_volume.py"),
              "--input", "./vols", "--output", "./vols_sr",
              "--checkpoint_dir", "./ckpt", "--batch_size", "8", "--cpu"],
             cwd=str(workspace))
    # the corrupt volume fails the RUN (exit 1) but not the batch: the
    # good volumes still serve
    assert r.returncode == 1, r.stderr[-2000:]
    assert "Batch mode: 3 volume(s)" in r.stderr
    assert "1/3 volume(s) failed" in r.stderr
    for name in ("a_sr.nii.gz", "b_sr.nii.gz"):
        data, _ = nifti.load(str(workspace / "vols_sr" / name))
        assert data.shape == (80, 72, 24)
    # empty directory is a clean error
    (workspace / "vols_empty").mkdir(exist_ok=True)
    r = _run([os.path.join(SCRIPTS, "infer_volume.py"),
              "--input", "./vols_empty", "--output", "./x",
              "--checkpoint_dir", "./ckpt", "--cpu"], cwd=str(workspace))
    assert r.returncode == 1 and "No .nii/.nii.gz volumes" in r.stderr


def test_infer_volume_cli_tta_artifact(workspace):
    """--tta paired with a tta-mode artifact is satisfied (not refused):
    the baked 4-member ensemble serves the exact-shape volume."""
    from mri_superresolution_tpu import nifti
    r = _run([os.path.join(ROOT, "tools", "export_serving.py"),
              "--checkpoint_dir", "./ckpt", "--out", "vol_tta.mrisrx",
              "--shapes", "40x36", "--base_filters", "16", "--mode", "tta",
              "--platforms", "cpu", "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run([os.path.join(SCRIPTS, "infer_volume.py"),
              "--input", "./datasets/s1/sub-01/anat/sub-01_T1w.nii.gz",
              "--output", "./sr_vol_tta.nii.gz",
              "--artifact", "vol_tta.mrisrx", "--tta",
              "--batch_size", "8", "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mode=tta" in r.stderr and "incompatible" not in r.stderr
    data, _ = nifti.load(str(workspace / "sr_vol_tta.nii.gz"))
    assert data.shape == (80, 72, 24) and np.isfinite(data).all()


def test_infer_cli_bad_checkpoint_dir_exits_nonzero(workspace):
    r = _run([os.path.join(SCRIPTS, "infer.py"),
              "--input", "x.png", "--output", "y.png",
              "--checkpoint_dir", "./definitely_missing", "--cpu"],
             cwd=str(workspace))
    assert r.returncode == 1
