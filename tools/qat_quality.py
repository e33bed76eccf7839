#!/usr/bin/env python
"""Measured quantization-aware-training (--qat) quality on TRAINED models.

The question this answers: PTQ int8 serving costs a measured -0.64/-0.75 dB
PSNR on trained models (RESULTS.md 2b, tools/quant_quality.py). Does
training against the serving quantizers (scripts/train.py --qat) claw that
back? Four serving configurations per model family, same protocol as
tools/quant_quality.py (synthetic-anatomy volumes → k-space-simulated
pairs → train → held-out eval through the inference engine):

  bf16       — baseline checkpoint, full-precision serving (the anchor)
  ptq-int8   — baseline checkpoint, --quant int8 self-calibrated on train
               slices (exactly RESULTS.md 2b's configuration)
  qat-int8   — --qat checkpoint served --quant int8 with its trained
               calibration sidecar (the configuration QAT optimizes)
  qat-bf16   — --qat checkpoint served full-precision (what QAT costs the
               bf16 path, since its weights were shaped by the quantizers)

Usage:
  python tools/qat_quality.py --workdir /tmp/qatq --epochs 30        # TPU
  python tools/qat_quality.py --workdir /tmp/qatq --epochs 15 --cpu \
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
    ap.add_argument("--workdir", default="/tmp/qat_quality")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n_train_volumes", type=int, default=6)
    ap.add_argument("--n_test_volumes", type=int, default=2)
    ap.add_argument("--n_slices", type=int, default=25)
    ap.add_argument("--hr_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--qat_decay", type=float, default=0.98)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend throughout (also forwarded "
                         "to the train/extract subprocesses)")
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
          "hr_test", "lr_test", "ckpt", "ckpt_qat")}

    if not args.skip_train:
        print("[qat_quality] synthesizing volumes", flush=True)
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
            base_cmd = [sys.executable, os.path.join(REPO, "scripts/train.py"),
                        "--full_res_dir", p["hr_train"],
                        "--low_res_dir", p["lr_train"],
                        "--epochs", args.epochs,
                        "--batch_size", args.batch_size,
                        "--ssim_weight", 0.3,
                        "--validation_split", 0.2,
                        "--seed", args.seed,
                        "--model_type", mt]
            run(base_cmd + ["--checkpoint_dir", p["ckpt"]] + cpu_flag,
                tag=f"train-{mt}")
            run(base_cmd + ["--checkpoint_dir", p["ckpt_qat"], "--qat",
                            "--qat_decay", args.qat_decay] + cpu_flag,
                tag=f"train-{mt}-qat")

    lr_files = sorted(os.listdir(p["lr_test"]))
    pairs = [(os.path.join(p["lr_test"], f), os.path.join(p["hr_test"], f))
             for f in lr_files
             if os.path.exists(os.path.join(p["hr_test"], f))]
    print(f"[qat_quality] {len(pairs)} held-out pairs", flush=True)

    calib_lrs = [os.path.join(p["lr_train"], f)
                 for f in sorted(os.listdir(p["lr_train"]))[:8]]
    rows = {}
    for mt in args.models:
        base_ckpt = os.path.join(p["ckpt"], f"best_model_{mt}.ckpt")
        qat_ckpt = os.path.join(p["ckpt_qat"], f"best_model_{mt}.ckpt")
        # (tag, ckpt, quant, calib) — qat-int8 needs no streaming calib:
        # load_engine auto-loads the checkpoint's trained sidecar
        configs = [("bf16", base_ckpt, "none", ()),
                   ("ptq-int8", base_ckpt, "int8", calib_lrs),
                   ("qat-int8", qat_ckpt, "int8", ()),
                   ("qat-bf16", qat_ckpt, "none", ())]
        for tag, ckpt, quant, calib in configs:
            m = engine_metrics(ckpt, mt, pairs, quant, calib_lrs=calib)
            rows[f"{mt}/{tag}"] = m
            print(f"{mt:<10} {tag:<9} ssim={m['ssim']:.4f} "
                  f"psnr={m['psnr']:.3f} rmse={m['rmse']:.5f}", flush=True)

    print("\n| model | mode | SSIM | PSNR (dB) | dSSIM | dPSNR (dB) |")
    print("|---|---|---|---|---|---|")
    for mt in args.models:
        base = rows[f"{mt}/bf16"]
        for tag in ("bf16", "ptq-int8", "qat-int8", "qat-bf16"):
            m = rows[f"{mt}/{tag}"]
            print(f"| {mt} | {tag} | {m['ssim']:.4f} | {m['psnr']:.3f} | "
                  f"{m['ssim'] - base['ssim']:+.4f} | "
                  f"{m['psnr'] - base['psnr']:+.3f} |")
    with open(os.path.join(wd, "qat_quality.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
