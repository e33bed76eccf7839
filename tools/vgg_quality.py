#!/usr/bin/env python
"""Measured effect of the random-VGG perceptual fallback on trained quality.

The reference's perceptual loss uses ImageNet-pretrained VGG19 features
(/root/reference/utils/losses.py:90,120-151); this environment has zero
egress, so `perceptual_weight > 0` here trains against a RANDOM VGG19 — a
structural prior, not a semantic one (train/trainer.py warns loudly).
This harness answers the open question from VERDICT r2 item 5: does that
fallback help, hurt, or no-op held-out quality vs `perceptual_weight=0`?

Protocol (same synthetic-anatomy pipeline as tools/quality_parity.py §1b):
 1. synthesize seeded train/test volume sets,
 2. extract HR/LR pairs with the k-space simulator CLI,
 3. train `unet` for --epochs once per loss config:
      perc0   — L1 0.7 + SSIM 0.3 (perceptual off)
      perc0.1 — L1 0.6 + SSIM 0.3 + 0.1 * random-VGG perceptual
 4. evaluate each best checkpoint on the held-out pairs (bf16 engine) and
    print the SSIM/PSNR delta table for RESULTS.md.

Usage: python tools/vgg_quality.py --workdir /tmp/vggq --epochs 30
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from quality_parity import (REPO, ours_infer_metrics, run, summarize,  # noqa: E402
                            synthesize)

CONFIGS = [
    ("perc0", 0.0),
    ("perc0.1", 0.1),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/vgg_quality")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n_train_volumes", type=int, default=6)
    ap.add_argument("--n_test_volumes", type=int, default=2)
    ap.add_argument("--n_slices", type=int, default=25)
    ap.add_argument("--hr_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--models", nargs="+", default=["unet"],
                    choices=["unet", "unet_tpu", "edsr", "simple"],
                    help="model families to A/B (VERDICT r3 item 6 asks "
                         "for both unet families at the full protocol)")
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    p = {k: os.path.join(wd, k) for k in
         ("data_train", "data_test", "hr_train", "lr_train",
          "hr_test", "lr_test")}

    def _populated(d):
        return os.path.isdir(d) and len(os.listdir(d)) > 0

    if not args.skip_train:
        if all(_populated(p[k]) for k in
               ("hr_train", "lr_train", "hr_test", "lr_test")):
            print("[vgg_quality] pairs already extracted — skipping "
                  "synth/extract (resume)", flush=True)
        else:
            print("[vgg_quality] synthesizing volumes", flush=True)
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
        for model in args.models:
            for name, pw in CONFIGS:
                ckpt_dir = os.path.join(wd, f"ckpt_{model}_{name}")
                if os.path.exists(os.path.join(
                        ckpt_dir, f"best_model_{model}.ckpt")):
                    print(f"[vgg_quality] {model}/{name}: checkpoint "
                          "exists — skipping train (resume)", flush=True)
                    continue
                run([sys.executable, os.path.join(REPO, "scripts/train.py"),
                     "--full_res_dir", p["hr_train"],
                     "--low_res_dir", p["lr_train"],
                     "--epochs", args.epochs,
                     "--batch_size", args.batch_size,
                     "--ssim_weight", 0.3,
                     "--perceptual_weight", pw,
                     "--validation_split", 0.2,
                     "--seed", args.seed,
                     "--model_type", model,
                     "--checkpoint_dir", ckpt_dir],
                    tag=f"train-{model}-{name}")

    lr_files = sorted(os.listdir(p["lr_test"]))
    pairs = [(os.path.join(p["lr_test"], f), os.path.join(p["hr_test"], f))
             for f in lr_files
             if os.path.exists(os.path.join(p["hr_test"], f))]
    print(f"[vgg_quality] {len(pairs)} held-out pairs", flush=True)

    rows = {}
    for model in args.models:
        for name, _ in CONFIGS:
            ckpt = os.path.join(wd, f"ckpt_{model}_{name}",
                                f"best_model_{model}.ckpt")
            m = summarize(ours_infer_metrics(ckpt, pairs,
                                             model_type=model))
            rows[f"{model}_{name}"] = m
            print(f"{model}/{name:<8} ssim={m['ssim']:.4f} "
                  f"psnr={m['psnr']:.3f} rmse={m['rmse']:.5f}", flush=True)

    print("\n| model | loss config | SSIM | PSNR (dB) | dSSIM | dPSNR (dB) |")
    print("|---|---|---|---|---|---|")
    for model in args.models:
        base = rows[f"{model}_perc0"]
        for name, _ in CONFIGS:
            m = rows[f"{model}_{name}"]
            print(f"| {model} | {name} | {m['ssim']:.4f} | "
                  f"{m['psnr']:.3f} | "
                  f"{m['ssim'] - base['ssim']:+.4f} | "
                  f"{m['psnr'] - base['psnr']:+.3f} |")
    with open(os.path.join(wd, "vgg_quality.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
