#!/usr/bin/env python
"""Measured quality of the RECOMMENDED QAT recipe: a short `--qat --resume`
fine-tune of a converged bf16 checkpoint (README / RESULTS.md 5k).

Takes an existing tools/qat_quality.py workdir (its 30-epoch bf16
baselines in <workdir>/ckpt and its extracted train/test slices), copies
each baseline's final checkpoint into a fresh fine-tune dir, resumes it
with --qat for `--ft_epochs` more epochs (the trainer detects the flag
flip: it re-initializes the activation ranges from the RESTORED weights
and resets the plateau/early-stop histories), then scores the fine-tuned
best checkpoint through the inference engine served two ways:

  qat-ft-int8 — --quant int8 with the fine-tune's trained sidecar
  qat-ft-bf16 — the same weights served full precision

The within-checkpoint penalty (int8 vs bf16 of the SAME weights) is the
deconfounded number the README quotes. The reference has no quantized
training at all (fp16 autocast only, scripts/train.py:158-163).

Usage (after tools/qat_quality.py populated the workdir):
  python tools/qat_ft_quality.py --workdir /tmp/qatq_full --cpu
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from quality_parity import REPO, run  # noqa: E402
from quant_quality import engine_metrics  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/qat_quality",
                    help="a tools/qat_quality.py workdir with ckpt/ + slices")
    ap.add_argument("--ft_epochs", type=int, default=8,
                    help="fine-tune epochs on top of the baseline's count")
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--qat_decay", type=float, default=0.98)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--suffix", default="",
                    help="suffix for the fine-tune ckpt dirs / output json")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--models", nargs="+", default=["unet", "unet_tpu"])
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    cpu_flag = ["--cpu"] if args.cpu else []

    wd = os.path.abspath(args.workdir)
    rows = {}
    for mt in args.models:
        base = os.path.join(wd, "ckpt", f"final_model_{mt}")
        with open(base + ".json") as f:
            # resume continues from the LAST COMPLETED epoch, not the
            # configured count — an early-stopped baseline would otherwise
            # silently fine-tune for more than ft_epochs
            base_epochs = int(json.load(f)["epoch"]) + 1
        ft_dir = os.path.join(wd, f"ckpt_ft{args.suffix}_{mt}")
        if not args.skip_train:
            os.makedirs(ft_dir, exist_ok=True)
            for ext in (".ckpt", ".json"):
                shutil.copy(base + ext,
                            os.path.join(ft_dir, f"final_model_{mt}{ext}"))
            run([sys.executable, os.path.join(REPO, "scripts/train.py"),
                 "--full_res_dir", os.path.join(wd, "hr_train"),
                 "--low_res_dir", os.path.join(wd, "lr_train"),
                 "--checkpoint_dir", ft_dir,
                 "--epochs", base_epochs + args.ft_epochs,
                 "--batch_size", args.batch_size,
                 "--learning_rate", args.learning_rate,
                 "--ssim_weight", 0.3,
                 "--validation_split", 0.2,
                 "--seed", args.seed,
                 "--model_type", mt,
                 "--resume", "--qat", "--qat_decay", args.qat_decay]
                + cpu_flag, tag=f"ft-{mt}")

        lr_dir = os.path.join(wd, "lr_test")
        pairs = [(os.path.join(lr_dir, f), os.path.join(wd, "hr_test", f))
                 for f in sorted(os.listdir(lr_dir))
                 if os.path.exists(os.path.join(wd, "hr_test", f))]
        ft_ckpt = os.path.join(ft_dir, f"best_model_{mt}.ckpt")
        for tag, quant in (("qat-ft-int8", "int8"), ("qat-ft-bf16", "none")):
            m = engine_metrics(ft_ckpt, mt, pairs, quant)
            rows[f"{mt}/{tag}"] = m
            print(f"{mt:<10} {tag:<12} ssim={m['ssim']:.4f} "
                  f"psnr={m['psnr']:.3f} rmse={m['rmse']:.5f}", flush=True)

    print("\n| model | serving | SSIM | PSNR (dB) | int8-vs-bf16 penalty |")
    print("|---|---|---|---|---|")
    for mt in args.models:
        b = rows[f"{mt}/qat-ft-bf16"]
        q = rows[f"{mt}/qat-ft-int8"]
        print(f"| {mt} | qat-ft int8 | {q['ssim']:.4f} | {q['psnr']:.3f} | "
              f"{q['psnr'] - b['psnr']:+.3f} dB |")
        print(f"| {mt} | qat-ft bf16 | {b['ssim']:.4f} | {b['psnr']:.3f} "
              f"| --- |")
    out = os.path.join(wd, f"qat_ft_quality{args.suffix}.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
