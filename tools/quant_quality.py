#!/usr/bin/env python
"""Measured int8-PTQ quality delta on TRAINED models.

Protocol (reuses tools/quality_parity.py's synthetic-anatomy pipeline):
 1. synthesize structured train/test volume sets (seeded),
 2. extract HR/LR pairs with the k-space simulator CLI,
 3. train `unet` and `unet_tpu` for --epochs on the TPU,
 4. evaluate each best checkpoint on the held-out pairs twice through the
    inference engine — bf16 vs --quant int8 (self-calibrated on the first
    test batch) — and print the SSIM/PSNR delta table for RESULTS.md.

Usage: python tools/quant_quality.py --workdir /tmp/quantq --epochs 30
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from quality_parity import REPO, run, summarize, synthesize  # noqa: E402


def engine_metrics(ckpt_path, model_type, pairs, quant="none", calib_lrs=(),
                   **infer_kwargs):
    """Held-out SSIM/PSNR/RMSE/MAE of a trained checkpoint served through
    the inference engine. Shared by the quant and tta quality harnesses;
    ``infer_kwargs`` pass through to InferConfig (e.g. tta=True)."""
    import numpy as np
    import cv2
    import jax.numpy as jnp

    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.infer import load_engine
    from mri_superresolution_tpu.ops.metrics import metric_suite

    engine = load_engine(InferConfig(
        model=ModelConfig(model_type=model_type, base_filters=32),
        checkpoint_dir=os.path.dirname(ckpt_path),
        checkpoint_path=ckpt_path, quant=quant,
        quant_calib_slices=max(1, len(calib_lrs)), **infer_kwargs))
    # self-calibrate on TRAIN-split slices so every held-out eval pair is
    # served by the frozen int8 path (no bf16 warm-up leaking into metrics)
    for lr_p in calib_lrs:
        lr = cv2.imread(lr_p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        engine.upscale_image(lr)
    per = []
    for lr_p, hr_p in pairs:
        lr = cv2.imread(lr_p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        hr = cv2.imread(hr_p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0
        out = engine.upscale_image(lr)
        per.append(metric_suite(jnp.asarray(out), jnp.asarray(hr)))
    return summarize(per)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/quant_quality")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n_train_volumes", type=int, default=6)
    ap.add_argument("--n_test_volumes", type=int, default=2)
    ap.add_argument("--n_slices", type=int, default=25)
    ap.add_argument("--hr_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--models", nargs="+", default=["unet", "unet_tpu"])
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    p = {k: os.path.join(wd, k) for k in
         ("data_train", "data_test", "hr_train", "lr_train",
          "hr_test", "lr_test", "ckpt")}

    if not args.skip_train:
        print("[quant_quality] synthesizing volumes", flush=True)
        synthesize(p["data_train"], args.n_train_volumes, args.seed)
        synthesize(p["data_test"], args.n_test_volumes, args.seed + 1)
        for split in ("train", "test"):
            run([sys.executable,
                 os.path.join(REPO, "scripts/extract_paired_slices.py"),
                 "--datasets_dir", p[f"data_{split}"],
                 "--hr_output_dir", p[f"hr_{split}"],
                 "--lr_output_dir", p[f"lr_{split}"],
                 "--n_slices", args.n_slices,
                 "--target_size", args.hr_size, args.hr_size,
                 "--seed", args.seed], tag=f"extract-{split}")
        for mt in args.models:
            run([sys.executable, os.path.join(REPO, "scripts/train.py"),
                 "--full_res_dir", p["hr_train"],
                 "--low_res_dir", p["lr_train"],
                 "--epochs", args.epochs,
                 "--batch_size", args.batch_size,
                 "--ssim_weight", 0.3,
                 "--validation_split", 0.2,
                 "--seed", args.seed,
                 "--model_type", mt,
                 "--checkpoint_dir", p["ckpt"]], tag=f"train-{mt}")

    lr_files = sorted(os.listdir(p["lr_test"]))
    pairs = [(os.path.join(p["lr_test"], f), os.path.join(p["hr_test"], f))
             for f in lr_files
             if os.path.exists(os.path.join(p["hr_test"], f))]
    print(f"[quant_quality] {len(pairs)} held-out pairs", flush=True)

    calib_lrs = [os.path.join(p["lr_train"], f)
                 for f in sorted(os.listdir(p["lr_train"]))[:8]]
    rows = {}
    for mt in args.models:
        ckpt = os.path.join(p["ckpt"], f"best_model_{mt}.ckpt")
        for quant in ("none", "int8"):
            m = engine_metrics(ckpt, mt, pairs, quant,
                               calib_lrs=calib_lrs if quant != "none" else ())
            rows[f"{mt}/{quant}"] = m
            print(f"{mt:<10} {quant:<5} ssim={m['ssim']:.4f} "
                  f"psnr={m['psnr']:.3f} rmse={m['rmse']:.5f}", flush=True)

    print("\n| model | mode | SSIM | PSNR (dB) | dSSIM | dPSNR (dB) |")
    print("|---|---|---|---|---|---|")
    for mt in args.models:
        base = rows[f"{mt}/none"]
        for quant in ("none", "int8"):
            m = rows[f"{mt}/{quant}"]
            print(f"| {mt} | {quant} | {m['ssim']:.4f} | {m['psnr']:.3f} | "
                  f"{m['ssim'] - base['ssim']:+.4f} | "
                  f"{m['psnr'] - base['psnr']:+.3f} |")
    with open(os.path.join(wd, "quant_quality.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
