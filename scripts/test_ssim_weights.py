#!/usr/bin/env python
"""SSIM-weight sweep: subprocess-train one model per weight, then collage.

Parity with the reference sweep (scripts/test_ssim_weights.py:9-145):
sequential subprocess runs of scripts/train.py into ``ssim_weight_{w}/``
dirs under a timestamped output root, then a vertical collage of each run's
latest epoch sample grid.
"""

import argparse
import glob
import os
import subprocess
import sys
from datetime import datetime

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

TRAIN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "train.py")


def run_training_with_ssim_weight(args, ssim_weight, output_dir):
    weight_dir = os.path.join(output_dir, f"ssim_weight_{ssim_weight}")
    os.makedirs(weight_dir, exist_ok=True)
    cmd = [
        sys.executable, TRAIN,
        "--full_res_dir", args.full_res_dir,
        "--low_res_dir", args.low_res_dir,
        "--model_type", args.model_type,
        "--batch_size", str(args.batch_size),
        "--epochs", str(args.epochs),
        "--ssim_weight", str(ssim_weight),
        "--checkpoint_dir", weight_dir,
        "--log_dir", os.path.join(weight_dir, "logs"),
    ]
    if args.augmentation:
        cmd.append("--augmentation")
    if args.use_amp:
        cmd.append("--use_amp")   # maps to bf16 compute (train.py docstring)
    if args.cpu:
        cmd.append("--cpu")
    print(f"Starting training with SSIM weight: {ssim_weight}")
    subprocess.run(cmd, check=True)
    return weight_dir


def create_ssim_weight_collage(weight_dirs, output_path, epoch=-1):
    """Vertical collage of each run's sample grid
    (parity: scripts/test_ssim_weights.py:42-90)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ssim_weights = sorted(weight_dirs.keys())
    fig = plt.figure(figsize=(15, 5 * len(ssim_weights)))
    for i, weight in enumerate(ssim_weights):
        sample_dir = os.path.join(weight_dirs[weight], "samples")
        if not os.path.exists(sample_dir):
            print(f"Warning: No samples found for SSIM weight {weight}")
            continue
        if epoch >= 0:
            image_path = os.path.join(sample_dir,
                                      f"comparison_epoch_{epoch}.png")
        else:
            files = glob.glob(os.path.join(sample_dir,
                                           "comparison_epoch_*.png"))
            if not files:
                print(f"Warning: No comparison images for weight {weight}")
                continue
            image_path = max(files, key=os.path.getctime)
        if not os.path.exists(image_path):
            print(f"Warning: Image {image_path} not found")
            continue
        ax = fig.add_subplot(len(ssim_weights), 1, i + 1)
        ax.imshow(plt.imread(image_path))
        ax.set_title(f"SSIM Weight: {weight}")
        ax.axis("off")
    plt.tight_layout()
    plt.savefig(output_path, dpi=150)
    plt.close()
    print(f"Collage saved to {output_path}")


def main():
    parser = argparse.ArgumentParser(
        description="Test various SSIM weights for MRI Super-resolution")
    parser.add_argument('--full_res_dir', type=str, required=True)
    parser.add_argument('--low_res_dir', type=str, required=True)
    parser.add_argument('--ssim_weights', type=float, nargs='+',
                        default=[0.0, 0.3, 0.5, 0.7, 1.0])
    parser.add_argument('--model_type', type=str, choices=['unet', 'unet_tpu', 'edsr', 'simple'],
                        default='unet')
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--epochs', type=int, default=20)
    parser.add_argument('--augmentation', action='store_true')
    parser.add_argument('--use_amp', action='store_true',
                        help='Forwarded to train.py (mixed precision; maps '
                             'to bfloat16 compute, reference '
                             'scripts/test_ssim_weights.py:116)')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--output_dir', type=str,
                        default='./ssim_weight_comparison')
    args = parser.parse_args()

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    output_dir = f"{args.output_dir}_{timestamp}"
    os.makedirs(output_dir, exist_ok=True)

    weight_dirs = {}
    for weight in args.ssim_weights:
        weight_dirs[weight] = run_training_with_ssim_weight(
            args, weight, output_dir)

    create_ssim_weight_collage(
        weight_dirs, os.path.join(output_dir, "ssim_weight_comparison.png"))
    print(f"\nAll trainings completed. Results saved to {output_dir}")


if __name__ == "__main__":
    main()
