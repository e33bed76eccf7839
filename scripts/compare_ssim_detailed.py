#!/usr/bin/env python
"""Detailed side-by-side comparison of the SSIM-weight sweep models.

Parity with the reference comparator (scripts/compare_ssim_detailed.py:
11-185): discover ``ssim_weight_{w}/`` run dirs, load each run's best
checkpoint, run up to 5 test images through every model, save per-image
full-resolution outputs plus a side-by-side comparison figure.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def create_detailed_comparison(weight_dirs, test_image_dir, output_dir,
                               model_type="unet"):
    import numpy as np
    import cv2
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.infer import load_engine

    engines = {}
    for weight, dir_path in weight_dirs.items():
        try:
            engines[weight] = load_engine(InferConfig(
                model=ModelConfig(model_type=model_type),
                checkpoint_dir=dir_path))
            print(f"Loaded model for SSIM weight {weight} from {dir_path}")
        except FileNotFoundError:
            print(f"Warning: No checkpoint found for SSIM weight {weight} "
                  f"in {dir_path}")
        except Exception as e:
            print(f"Error loading checkpoint for SSIM weight {weight}: {e}")

    test_images = sorted(
        glob.glob(os.path.join(test_image_dir, "*.png")) +
        glob.glob(os.path.join(test_image_dir, "*.jpg")) +
        glob.glob(os.path.join(test_image_dir, "*.tif")))[:5]
    if not test_images:
        print(f"No test images found in {test_image_dir}")
        return
    if not engines:
        print("No models loaded, skipping comparison")
        return

    os.makedirs(output_dir, exist_ok=True)
    for img_path in test_images:
        img_name = os.path.basename(img_path)
        print(f"Processing test image: {img_name}")
        img_output_dir = os.path.join(output_dir,
                                      os.path.splitext(img_name)[0])
        os.makedirs(img_output_dir, exist_ok=True)

        raw = cv2.imread(img_path, cv2.IMREAD_GRAYSCALE)
        cv2.imwrite(os.path.join(img_output_dir, "original.png"), raw)
        img01 = raw.astype(np.float32) / 255.0

        n = len(engines)
        fig, axes = plt.subplots(1, n + 1, figsize=(5 * (n + 1), 5))
        axes[0].imshow(raw, cmap="gray")
        axes[0].set_title("Original Low-Res")
        axes[0].axis("off")

        for i, (weight, engine) in enumerate(sorted(engines.items())):
            out = engine.upscale_image(img01)
            cv2.imwrite(os.path.join(img_output_dir, f"weight_{weight}.png"),
                        np.clip(out * 255, 0, 255).astype(np.uint8))
            axes[i + 1].imshow(out, cmap="gray")
            axes[i + 1].set_title(f"SSIM Weight: {weight}")
            axes[i + 1].axis("off")

        plt.tight_layout()
        plt.savefig(os.path.join(img_output_dir, "comparison.png"), dpi=150)
        plt.close(fig)

    print(f"Detailed comparison saved to {output_dir}")
    print("Individual full-resolution images saved in subdirectories "
          "for each test image")


def main():
    parser = argparse.ArgumentParser(
        description="Create detailed comparison of MRI Super-resolution "
                    "with different SSIM weights")
    parser.add_argument('--weight_dirs', type=str, required=True)
    parser.add_argument('--test_image_dir', type=str, required=True)
    parser.add_argument('--model_type', type=str, choices=['unet', 'unet_tpu', 'edsr', 'simple'],
                        default='unet')
    parser.add_argument('--output_dir', type=str,
                        default='./ssim_detailed_comparison')
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()
    force_cpu_if_requested()

    weight_dirs = {}
    for dirname in os.listdir(args.weight_dirs):
        if dirname.startswith("ssim_weight_"):
            try:
                weight = float(dirname.replace("ssim_weight_", ""))
                weight_dirs[weight] = os.path.join(args.weight_dirs, dirname)
            except ValueError:
                continue
    if not weight_dirs:
        print(f"No weight directories found in {args.weight_dirs}")
        return
    print(f"Found {len(weight_dirs)} weight directories: "
          f"{sorted(weight_dirs.keys())}")
    create_detailed_comparison(weight_dirs, args.test_image_dir,
                               args.output_dir, args.model_type)


if __name__ == "__main__":
    main()
