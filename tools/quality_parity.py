#!/usr/bin/env python
"""Measured quality parity: train the ACTUAL PyTorch reference
(/root/reference/scripts/train.py, torch CPU, via the tools/tv_shim
torchvision stand-in) and this framework's `unet` on IDENTICAL extracted
pairs, evaluate both on a held-out volume set with the same metric code,
and print the SSIM/PSNR delta table (north star: |dPSNR| <= 0.1 dB,
BASELINE.json).

Protocol (everything seeded):
 1. synthesize a BIDS dataset of structured volumes (ellipsoid anatomy +
    multi-scale texture) split into train/test volume sets,
 2. extract HR/LR pairs once with scripts/extract_paired_slices.py (the
    k-space LR simulator) — both trainers read the same PNG files,
 3. train both with the same hyperparams (no augmentation so the data
    pipelines are RNG-identical; perceptual off — no VGG weights offline),
 4. evaluate both final+best checkpoints: the torch model natively in
    torch, ours through the inference engine; metrics via
    ops.metrics.metric_suite in fp32 for both.

Usage: python tools/quality_parity.py --workdir /tmp/qparity --epochs 30
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def make_volume(rng, shape=(160, 160, 40)):
    """Structured synthetic 'anatomy': a few smooth ellipsoids with distinct
    intensities + band-limited multi-scale texture, so 2x SR is learnable."""
    import numpy as np
    import cv2

    h, w, d = shape
    zz, yy, xx = np.meshgrid(np.linspace(-1, 1, d), np.linspace(-1, 1, h),
                             np.linspace(-1, 1, w), indexing="ij")
    vol = np.zeros((d, h, w), np.float32)
    for _ in range(rng.integers(4, 8)):
        c = rng.uniform(-0.5, 0.5, 3)
        r = rng.uniform(0.15, 0.55, 3)
        level = rng.uniform(0.25, 1.0)
        mask = (((zz - c[0]) / r[0]) ** 2 + ((yy - c[1]) / r[1]) ** 2
                + ((xx - c[2]) / r[2]) ** 2) < 1.0
        vol[mask] = level
    # multi-scale texture: upsampled coarse noise at 3 scales
    for scale, amp in ((8, 0.10), (24, 0.06), (64, 0.03)):
        coarse = rng.standard_normal((d, scale, scale)).astype(np.float32)
        tex = np.stack([cv2.resize(coarse[k], (w, h),
                                   interpolation=cv2.INTER_CUBIC)
                        for k in range(d)])
        vol = vol + amp * tex * (vol > 0)
    vol = np.clip(vol, 0, 1.3)
    return np.ascontiguousarray(vol.transpose(1, 2, 0)) * 600.0


def synthesize(root, n_volumes, seed):
    import numpy as np
    from mri_superresolution_tpu import nifti

    rng = np.random.default_rng(seed)
    for i in range(n_volumes):
        sub = os.path.join(root, f"set1/sub-{i:02d}/anat")
        os.makedirs(sub, exist_ok=True)
        nifti.save(os.path.join(sub, f"sub-{i:02d}_T1w.nii.gz"),
                   make_volume(rng).astype(np.float32))


def run(cmd, env=None, tag=""):
    print(f"[quality_parity] run {tag}: {' '.join(map(str, cmd))}",
          flush=True)
    t0 = time.time()
    e = dict(os.environ)
    if env:
        e.update(env)
    res = subprocess.run(list(map(str, cmd)), env=e, capture_output=True,
                         text=True)
    if res.returncode != 0:
        print(res.stdout[-4000:])
        print(res.stderr[-4000:])
        raise RuntimeError(f"{tag} failed rc={res.returncode}")
    print(f"[quality_parity] {tag} done in {time.time() - t0:.0f}s",
          flush=True)
    return res


def torch_infer_metrics(ckpt_path, pairs):
    """Run the reference model NATIVELY in torch on the test pairs."""
    import numpy as np
    import cv2
    import torch

    sys.path.insert(0, REFERENCE)
    from models.unet_model import UNetSuperRes as TorchUNet

    from mri_superresolution_tpu.ops.metrics import metric_suite
    import jax.numpy as jnp

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = sd.get("model_state_dict", sd)
    model = TorchUNet(in_channels=1, out_channels=1, base_filters=32)
    model.load_state_dict(state)
    model.eval()

    per = []
    with torch.no_grad():
        for lr_p, hr_p in pairs:
            lr = cv2.imread(lr_p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
            hr = cv2.imread(hr_p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
            out = model(torch.from_numpy(lr[None, None]))[0, 0].numpy()
            out = np.clip(out, 0.0, 1.0)
            per.append(metric_suite(jnp.asarray(out), jnp.asarray(hr)))
    return per


def ours_infer_metrics(ckpt_path, pairs, model_type="unet"):
    import numpy as np
    import cv2
    import jax.numpy as jnp

    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.infer import load_engine
    from mri_superresolution_tpu.ops.metrics import metric_suite

    engine = load_engine(InferConfig(
        model=ModelConfig(model_type=model_type, base_filters=32),
        checkpoint_dir=os.path.dirname(ckpt_path),
        checkpoint_path=ckpt_path, bf16=False))
    per = []
    for lr_p, hr_p in pairs:
        lr = cv2.imread(lr_p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        hr = cv2.imread(hr_p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        out = engine.upscale_image(lr)
        per.append(metric_suite(jnp.asarray(out), jnp.asarray(hr)))
    return per


def summarize(per):
    import numpy as np

    return {k: float(np.mean([m[k] for m in per]))
            for k in ("ssim", "psnr", "rmse", "mae")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/quality_parity")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n_train_volumes", type=int, default=6)
    ap.add_argument("--n_test_volumes", type=int, default=2)
    ap.add_argument("--n_slices", type=int, default=25,
                    help="slices per volume")
    ap.add_argument("--hr_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--ssim_weight", type=float, default=0.3)
    ap.add_argument("--ours_cpu", action="store_true",
                    help="train ours on CPU instead of the TPU")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse existing checkpoints in workdir")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    paths = {k: os.path.join(wd, k) for k in
             ("data_train", "data_test", "hr_train", "lr_train",
              "hr_test", "lr_test", "ckpt_ref", "ckpt_ours")}

    if not args.skip_train:
        print("[quality_parity] synthesizing volumes", flush=True)
        synthesize(paths["data_train"], args.n_train_volumes, args.seed)
        synthesize(paths["data_test"], args.n_test_volumes, args.seed + 1)

        for split in ("train", "test"):
            run([sys.executable,
                 os.path.join(REPO, "scripts/extract_paired_slices.py"),
                 "--datasets_dir", paths[f"data_{split}"],
                 "--hr_output_dir", paths[f"hr_{split}"],
                 "--lr_output_dir", paths[f"lr_{split}"],
                 "--n_slices", args.n_slices,
                 "--target_size", args.hr_size, args.hr_size,
                 "--seed", args.seed], tag=f"extract-{split}")

        common = ["--full_res_dir", paths["hr_train"],
                  "--low_res_dir", paths["lr_train"],
                  "--epochs", args.epochs,
                  "--batch_size", args.batch_size,
                  "--learning_rate", args.learning_rate,
                  "--ssim_weight", args.ssim_weight,
                  "--validation_split", 0.2,
                  "--seed", args.seed]
        run([sys.executable, os.path.join(REFERENCE, "scripts/train.py"),
             *common, "--cpu", "--num_workers", 0,
             "--checkpoint_dir", paths["ckpt_ref"]],
            env={"PYTHONPATH": os.path.join(REPO, "tools/tv_shim"),
                 "OMP_NUM_THREADS": "1"},
            tag="train-reference-torch")
        run([sys.executable, os.path.join(REPO, "scripts/train.py"),
             *common, "--no_bf16",
             *(["--cpu"] if args.ours_cpu else []),
             "--checkpoint_dir", paths["ckpt_ours"]],
            tag="train-ours")

    lr_files = sorted(os.listdir(paths["lr_test"]))
    pairs = [(os.path.join(paths["lr_test"], f),
              os.path.join(paths["hr_test"], f)) for f in lr_files
             if os.path.exists(os.path.join(paths["hr_test"], f))]
    print(f"[quality_parity] evaluating on {len(pairs)} held-out pairs",
          flush=True)

    rows = {}
    for which in ("best", "final"):
        ref_ckpt = os.path.join(paths["ckpt_ref"], f"{which}_model_unet.pth")
        our_ckpt = os.path.join(paths["ckpt_ours"], f"{which}_model_unet.ckpt")
        if not (os.path.exists(ref_ckpt) and os.path.exists(our_ckpt)):
            continue
        ref = summarize(torch_infer_metrics(ref_ckpt, pairs))
        ours = summarize(ours_infer_metrics(our_ckpt, pairs))
        # The sharp implementation-parity claim: the SAME torch-trained
        # weights served by our engine (`.pth` accepted via torch_compat)
        # must reproduce native-torch quality — this isolates framework
        # numerics from SGD/run-to-run training noise.
        xfw = summarize(ours_infer_metrics(ref_ckpt, pairs))
        rows[which] = {
            "reference_torch": ref, "ours_jax": ours,
            "torch_weights_in_our_engine": xfw,
            "same_weights_delta_psnr_db": xfw["psnr"] - ref["psnr"],
            "same_weights_delta_ssim": xfw["ssim"] - ref["ssim"],
            "trained_delta_psnr_db": ours["psnr"] - ref["psnr"],
            "trained_delta_ssim": ours["ssim"] - ref["ssim"]}

    out = {"config": vars(args), "n_test_pairs": len(pairs), "results": rows}
    report = os.path.join(wd, "quality_parity.json")
    with open(report, "w") as f:
        json.dump(out, f, indent=2)

    print("\n| ckpt | model | SSIM | PSNR (dB) | dSSIM | dPSNR (dB) |")
    print("|---|---|---|---|---|---|")
    for which, r in rows.items():
        print(f"| {which} | reference (torch-trained, torch eval) "
              f"| {r['reference_torch']['ssim']:.4f} "
              f"| {r['reference_torch']['psnr']:.2f} | | |")
        print(f"| {which} | same torch weights, OUR engine "
              f"| {r['torch_weights_in_our_engine']['ssim']:.4f} "
              f"| {r['torch_weights_in_our_engine']['psnr']:.2f} "
              f"| {r['same_weights_delta_ssim']:+.4f} "
              f"| {r['same_weights_delta_psnr_db']:+.3f} |")
        print(f"| {which} | ours (JAX-trained, our eval) "
              f"| {r['ours_jax']['ssim']:.4f} "
              f"| {r['ours_jax']['psnr']:.2f} | {r['trained_delta_ssim']:+.4f} "
              f"| {r['trained_delta_psnr_db']:+.3f} |")
    print(f"\nReport: {report}")


if __name__ == "__main__":
    main()
