"""Subprocess smokes for the six eval/analysis CLIs (VERDICT r2 item 6).

Same pattern as tests/test_cli.py: invoke each script exactly as a user
would (CPU, tiny synthetic data) and assert its artifacts, so regressions
in e.g. test_model.py's square-%8 sizing can't ship green. Reference
counterparts: scripts/test_model.py:94-109, evaluate.py:62-108.
"""

import glob
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
    """Synthetic dataset + extracted pairs + a 1-epoch checkpoint."""
    pytest.importorskip("cv2")
    from mri_superresolution_tpu import nifti

    ws = tmp_path_factory.mktemp("evalsuite_ws")
    anat = ws / "datasets" / "s1" / "sub-01" / "anat"
    anat.mkdir(parents=True)
    rng = np.random.default_rng(3)
    vol = (rng.random((40, 36, 24)) * 500).astype(np.float32)
    nifti.save(str(anat / "sub-01_T1w.nii.gz"), vol)

    r = _run([os.path.join(SCRIPTS, "extract_paired_slices.py"),
              "--datasets_dir", "./datasets", "--hr_output_dir", "./hr",
              "--lr_output_dir", "./lr", "--n_slices", "8",
              "--target_size", "64", "64", "--cpu"], cwd=str(ws))
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run([os.path.join(SCRIPTS, "train.py"),
              "--full_res_dir", "./hr", "--low_res_dir", "./lr",
              "--epochs", "1", "--batch_size", "8", "--base_filters", "16",
              "--seed", "1", "--checkpoint_dir", "./ckpt", "--cpu"],
             cwd=str(ws))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (ws / "ckpt" / "final_model_unet.ckpt").exists()
    return ws


def test_test_model_cli(workspace):
    """Avg-resolution analysis, square-%8 re-padding, per-slice metrics,
    summary grid (reference scripts/test_model.py:94-188)."""
    r = _run([os.path.join(SCRIPTS, "test_model.py"),
              "--test_dataset", "./datasets", "--output_dir", "./tm",
              "--checkpoint_dir", "./ckpt", "--n_slices", "4",
              "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (workspace / "tm" / "results_summary.png").exists()
    enhanced = os.listdir(workspace / "tm" / "enhanced")
    assert enhanced, "no enhanced slices written"
    import cv2
    # square-%8 sizing: avg 36x40 -> HR canvas 40x40, LR 20x20 -> output 40x40
    hr = cv2.imread(str(workspace / "tm" / "hr_slices" /
                        sorted(os.listdir(workspace / "tm" / "hr_slices"))[0]),
                    cv2.IMREAD_GRAYSCALE)
    assert hr.shape == (40, 40)
    out = cv2.imread(str(workspace / "tm" / "enhanced" / sorted(enhanced)[0]),
                     cv2.IMREAD_GRAYSCALE)
    assert out.shape == (40, 40)
    assert "Average SSIM" in r.stderr


def test_test_comparison_cli(workspace):
    """Model vs bilinear/bicubic/etc baselines; markdown metrics table."""
    r = _run([os.path.join(SCRIPTS, "test_comparison.py"),
              "--test_dataset", "./datasets", "--output_dir", "./cmp",
              "--checkpoint_dir", "./ckpt", "--seed", "0", "--cpu"],
             cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (workspace / "cmp" / "comparison.png").exists()
    table = (workspace / "cmp" / "metrics.txt").read_text()
    assert "Model" in table and "SSIM" in table


def test_evaluate_cli_single_checkpoint(workspace):
    r = _run([os.path.join(ROOT, "evaluate.py"),
              "--hr_dir", "./hr", "--lr_dir", "./lr",
              "--checkpoint", "./ckpt/final_model_unet.ckpt",
              "--output_dir", "./eval", "--cpu"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (workspace / "eval" / "report.json").exists()
    csv = (workspace / "eval" / "metrics.csv").read_text()
    assert "ssim" in csv.splitlines()[0].lower()
    assert len(csv.splitlines()) > 1          # at least one evaluated pair


def test_ssim_weights_and_detailed_compare_cli(workspace):
    """One-weight one-epoch sweep, then the detailed comparator over its
    output directory — chained as a user would."""
    r = _run([os.path.join(SCRIPTS, "test_ssim_weights.py"),
              "--full_res_dir", "./hr", "--low_res_dir", "./lr",
              "--ssim_weights", "0.3", "--epochs", "1", "--batch_size", "8",
              "--output_dir", "./sweep", "--cpu"], cwd=str(workspace),
             timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    sweep_dirs = glob.glob(str(workspace / "sweep_*"))
    assert len(sweep_dirs) == 1               # timestamped root
    root = sweep_dirs[0]
    assert os.path.exists(os.path.join(root, "ssim_weight_comparison.png"))
    assert os.path.exists(os.path.join(root, "ssim_weight_0.3"))

    r = _run([os.path.join(SCRIPTS, "compare_ssim_detailed.py"),
              "--weight_dirs", root, "--test_image_dir", "./lr",
              "--output_dir", "./detailed", "--cpu"], cwd=str(workspace),
             timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "1 weight directories" in r.stdout
    imgs = glob.glob(str(workspace / "detailed" / "*" / "comparison.png"))
    assert imgs, "no per-image comparison figures written"
    assert glob.glob(str(workspace / "detailed" / "*" / "weight_0.3.png"))


def test_visualise_res_cli(workspace):
    r = _run([os.path.join(SCRIPTS, "visualise_res.py"),
              "--root_dir", "./datasets", "--output_png_dir", "./png_slices",
              "--output_viz_file", "./res_hist.png"], cwd=str(workspace))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (workspace / "res_hist.png").exists()
    assert os.listdir(workspace / "png_slices")
    assert "width" in r.stdout.lower()
