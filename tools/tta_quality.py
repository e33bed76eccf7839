#!/usr/bin/env python
"""Measured test-time-augmentation (--tta) quality delta on TRAINED models.

Same protocol as tools/quant_quality.py (synthetic-anatomy volumes →
k-space-simulated pairs → train → held-out eval), comparing the engine's
plain forward against the dihedral-ensemble forward (InferConfig.tta):

Usage:
  python tools/tta_quality.py --workdir /tmp/ttaq --epochs 30        # TPU
  python tools/tta_quality.py --workdir /tmp/ttaq --epochs 15 --cpu \
      --hr_size 64 --n_train_volumes 4   # small-scale CPU variant
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from quality_parity import REPO, run, synthesize  # noqa: E402
from quant_quality import engine_metrics  # noqa: E402  (shared helper)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tta_quality")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n_train_volumes", type=int, default=6)
    ap.add_argument("--n_test_volumes", type=int, default=2)
    ap.add_argument("--n_slices", type=int, default=25)
    ap.add_argument("--hr_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend throughout (also forwarded "
                         "to the train/extract subprocesses)")
    ap.add_argument("--augmentation", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="train WITH flip/rotate augmentation (default on: "
                         "TTA assumes approximate flip-equivariance, which "
                         "augmented training encourages; --no-augmentation "
                         "measures the un-augmented control)")
    ap.add_argument("--models", nargs="+", default=["unet", "unet_tpu"])
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    cpu_flag = ["--cpu"] if args.cpu else []

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    p = {k: os.path.join(wd, k) for k in
         ("data_train", "data_test", "hr_train", "lr_train",
          "hr_test", "lr_test", "ckpt")}

    if not args.skip_train:
        print("[tta_quality] synthesizing volumes", flush=True)
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
                 "--seed", args.seed] + cpu_flag, tag=f"extract-{split}")
        for mt in args.models:
            run([sys.executable, os.path.join(REPO, "scripts/train.py"),
                 "--full_res_dir", p["hr_train"],
                 "--low_res_dir", p["lr_train"],
                 "--epochs", args.epochs,
                 "--batch_size", args.batch_size,
                 "--ssim_weight", 0.3,
                 "--validation_split", 0.2,
                 "--seed", args.seed,
                 "--model_type", mt]
                + (["--augmentation"] if args.augmentation else [])
                + ["--checkpoint_dir", p["ckpt"]] + cpu_flag,
                tag=f"train-{mt}")

    lr_files = sorted(os.listdir(p["lr_test"]))
    pairs = [(os.path.join(p["lr_test"], f), os.path.join(p["hr_test"], f))
             for f in lr_files
             if os.path.exists(os.path.join(p["hr_test"], f))]
    print(f"[tta_quality] {len(pairs)} held-out pairs", flush=True)

    rows = {}
    for mt in args.models:
        ckpt = os.path.join(p["ckpt"], f"best_model_{mt}.ckpt")
        for tta in (False, True):
            m = engine_metrics(ckpt, mt, pairs, tta=tta)
            rows[f"{mt}/{'tta' if tta else 'plain'}"] = m
            print(f"{mt:<10} {'tta' if tta else 'plain':<6} "
                  f"ssim={m['ssim']:.4f} psnr={m['psnr']:.3f} "
                  f"rmse={m['rmse']:.5f}", flush=True)

    print("\n| model | mode | SSIM | PSNR (dB) | dSSIM | dPSNR (dB) |")
    print("|---|---|---|---|---|---|")
    for mt in args.models:
        base = rows[f"{mt}/plain"]
        for mode in ("plain", "tta"):
            m = rows[f"{mt}/{mode}"]
            print(f"| {mt} | {mode} | {m['ssim']:.4f} | {m['psnr']:.3f} | "
                  f"{m['ssim'] - base['ssim']:+.4f} | "
                  f"{m['psnr'] - base['psnr']:+.3f} |")
    with open(os.path.join(wd, "tta_quality.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
