#!/usr/bin/env python
"""Train `edsr` to its convergence plateau and republish its frontier row.

VERDICT r4 item 4: the §6f frontier table's edsr row (17.88 dB) was the
honest 30-epoch number, ~13 dB below the family ceiling — this tool gives
it the convergence budget the others didn't need. Protocol identical to
tools/tta_quality.py (synthetic-anatomy volumes → k-space-simulated pairs
at 128² → train → 50 held-out slices), but with a large epoch budget and
a patience wide enough that ReduceLROnPlateau (factor 0.5 at patience//2)
fires several times before early stopping ends the run.

Usage:
  python tools/edsr_convergence.py --workdir /tmp/edsrconv --epochs 300   # TPU
  python tools/edsr_convergence.py --workdir /tmp/edsrconv --epochs 40 \
      --cpu --hr_size 64 --n_train_volumes 4     # small-scale CPU variant
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from quality_parity import REPO, run, synthesize  # noqa: E402
from quant_quality import engine_metrics  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/edsr_convergence")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--patience", type=int, default=40,
                    help="early-stop patience; the LR plateau fires at "
                         "patience//2 stagnant epochs, so 40 allows several "
                         "halvings before the run ends")
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--n_train_volumes", type=int, default=6)
    ap.add_argument("--n_test_volumes", type=int, default=2)
    ap.add_argument("--n_slices", type=int, default=25)
    ap.add_argument("--hr_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model_type", default="edsr")
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
        print("[edsr_convergence] synthesizing volumes", flush=True)
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
        run([sys.executable, os.path.join(REPO, "scripts/train.py"),
             "--full_res_dir", p["hr_train"],
             "--low_res_dir", p["lr_train"],
             "--epochs", args.epochs,
             "--batch_size", args.batch_size,
             "--ssim_weight", 0.3,
             "--validation_split", 0.2,
             "--seed", args.seed,
             "--model_type", args.model_type,
             "--learning_rate", args.learning_rate,
             "--patience", args.patience,
             "--augmentation",
             "--checkpoint_dir", p["ckpt"]] + cpu_flag,
            tag=f"train-{args.model_type}")

    lr_files = sorted(os.listdir(p["lr_test"]))
    pairs = [(os.path.join(p["lr_test"], f), os.path.join(p["hr_test"], f))
             for f in lr_files
             if os.path.exists(os.path.join(p["hr_test"], f))]
    print(f"[edsr_convergence] {len(pairs)} held-out pairs", flush=True)

    rows = {}
    ckpt = os.path.join(p["ckpt"], f"best_model_{args.model_type}.ckpt")
    for tta in (False, True):
        m = engine_metrics(ckpt, args.model_type, pairs, tta=tta)
        rows[f"{args.model_type}/{'tta' if tta else 'plain'}"] = m
        print(f"{args.model_type:<10} {'tta' if tta else 'plain':<6} "
              f"ssim={m['ssim']:.4f} psnr={m['psnr']:.3f} "
              f"rmse={m['rmse']:.5f}", flush=True)

    rows["protocol"] = {"epochs": args.epochs, "patience": args.patience,
                        "learning_rate": args.learning_rate,
                        "hr_size": args.hr_size, "seed": args.seed}
    with open(os.path.join(wd, f"{args.model_type}_convergence.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
