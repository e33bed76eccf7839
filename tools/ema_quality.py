#!/usr/bin/env python
"""Measured EMA (--ema_decay) quality delta on trained models.

Same protocol as tools/tta_quality.py (synthetic-anatomy volumes →
k-space-simulated pairs → train → held-out eval). Two comparisons per
model type, both against the SAME optimizer trajectory (EMA never feeds
back into training, so equal seeds give identical live weights):

1. best-checkpoint A/B: control run (ema_decay 0) vs EMA run — what a user
   actually gets, including EMA-driven best-epoch selection;
2. paired final-epoch raw-vs-EMA: the EMA run's final checkpoint serves
   the averaged weights ('params') and carries the live ones
   ('raw_params') — the selection-free measurement of averaging itself.

Usage:
  python tools/ema_quality.py --workdir /tmp/emaq --epochs 30        # TPU
  python tools/ema_quality.py --workdir /tmp/emaq --epochs 15 --cpu \
      --hr_size 64 --n_train_volumes 4   # small-scale CPU variant
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from quality_parity import REPO, run, synthesize  # noqa: E402
from quant_quality import engine_metrics  # noqa: E402  (shared helper)


def save_raw_as_params(final_ckpt: str, out_path: str) -> bool:
    """Re-write an EMA checkpoint with raw_params as the serving params.
    Returns False when the checkpoint carries no raw_params (EMA off)."""
    from mri_superresolution_tpu.train import checkpoint as ckpt
    params, _, meta, extras = ckpt.load_checkpoint(final_ckpt,
                                                   return_extras=True)
    if "raw_params" not in extras:
        return False
    ckpt.save_checkpoint(out_path, extras["raw_params"], meta=meta)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ema_quality")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--decays", type=float, nargs="+", default=[0.99],
                    help="EMA decays to measure (one training per decay; "
                         "the ema_decay=0 control is shared). Match the "
                         "horizon ~1/(1-d) steps to the run length "
                         "(default run is ~450 optimizer steps → 0.99)")
    ap.add_argument("--learning_rate", type=float, default=1e-4,
                    help="forwarded to train.py: EMA's value depends on "
                         "how noise- vs trend-dominated the trajectory is, "
                         "so measuring at a higher LR probes the noisy "
                         "regime")
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
                    action=argparse.BooleanOptionalAction)
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
          "hr_test", "lr_test")}
    runs = {"control": 0.0}
    runs.update({f"ema{d}": d for d in args.decays})

    if not args.skip_train:
        print("[ema_quality] synthesizing volumes", flush=True)
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
            for tag, decay in runs.items():
                run([sys.executable, os.path.join(REPO, "scripts/train.py"),
                     "--full_res_dir", p["hr_train"],
                     "--low_res_dir", p["lr_train"],
                     "--epochs", args.epochs,
                     "--batch_size", args.batch_size,
                     "--ssim_weight", 0.3,
                     "--validation_split", 0.2,
                     "--learning_rate", args.learning_rate,
                     "--seed", args.seed,
                     "--model_type", mt,
                     "--ema_decay", decay]
                    + (["--augmentation"] if args.augmentation else [])
                    + ["--checkpoint_dir", os.path.join(wd, f"ckpt_{tag}")]
                    + cpu_flag, tag=f"train-{mt}-{tag}")

    lr_files = sorted(os.listdir(p["lr_test"]))
    pairs = [(os.path.join(p["lr_test"], f), os.path.join(p["hr_test"], f))
             for f in lr_files
             if os.path.exists(os.path.join(p["hr_test"], f))]
    print(f"[ema_quality] {len(pairs)} held-out pairs", flush=True)

    rows = {}
    for mt in args.models:
        for tag in runs:
            best = os.path.join(wd, f"ckpt_{tag}", f"best_model_{mt}.ckpt")
            rows[f"{mt}/best_{tag}"] = engine_metrics(best, mt, pairs)
            if runs[tag] > 0:
                # paired final-epoch raw vs EMA (selection-free)
                final = os.path.join(wd, f"ckpt_{tag}",
                                     f"final_model_{mt}.ckpt")
                rows[f"{mt}/final_{tag}"] = engine_metrics(final, mt, pairs)
                raw_ckpt = os.path.join(wd, f"ckpt_{tag}",
                                        f"rawfinal_model_{mt}")
                wrote_raw = save_raw_as_params(final, raw_ckpt)
                if not wrote_raw:
                    raise RuntimeError(
                        f"{final} carries no raw_params extras")
                rows[f"{mt}/finalraw_{tag}"] = engine_metrics(
                    raw_ckpt + ".ckpt", mt, pairs)
        for k in sorted(k for k in rows if k.startswith(mt + "/")):
            m = rows[k]
            print(f"{k:<28} ssim={m['ssim']:.4f} psnr={m['psnr']:.3f} "
                  f"rmse={m['rmse']:.5f}", flush=True)

    print(f"\nlr={args.learning_rate} epochs={args.epochs}")
    print("| model | comparison | SSIM | PSNR (dB) | dSSIM | dPSNR (dB) |")
    print("|---|---|---|---|---|---|")
    for mt in args.models:
        for tag, d in runs.items():
            if d == 0:
                continue
            for base_k, k, name in (
                    (f"{mt}/best_control", f"{mt}/best_{tag}",
                     f"best: control→ema d={d}"),
                    (f"{mt}/finalraw_{tag}", f"{mt}/final_{tag}",
                     f"final d={d}: raw→ema (paired)")):
                base, m = rows[base_k], rows[k]
                print(f"| {mt} | {name} | {m['ssim']:.4f} | "
                      f"{m['psnr']:.3f} | "
                      f"{m['ssim'] - base['ssim']:+.4f} | "
                      f"{m['psnr'] - base['psnr']:+.3f} |")
    with open(os.path.join(wd, "ema_quality.json"), "w") as f:
        json.dump({"decays": args.decays, "lr": args.learning_rate,
                   "epochs": args.epochs, "rows": rows}, f, indent=2)


if __name__ == "__main__":
    main()
