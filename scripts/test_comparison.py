#!/usr/bin/env python
"""Compare the AI model against classical interpolation baselines on one
random extracted slice pair.

Parity with the reference comparator (scripts/test_comparison.py:259-353):
extract 10 slices from the central 45-55% band at 256x256, pick a random
pair, upscale with {AI model, bilinear, sharp-bilinear, bicubic}, compute
SSIM/PSNR/MSE/RMSE/MAE, write a 2-row comparison figure with difference maps
and a markdown ``metrics.txt`` table.
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def extract_test_slice(test_dataset_dir, hr_dir, lr_dir, logger, seed=None):
    """Extract 10 central slices from the first anat NIfTI, pick one random
    pair (parity: scripts/test_comparison.py:34-90)."""
    import jax
    from mri_superresolution_tpu.data import (extract_from_nifti,
                                              find_nifti_files)

    files = find_nifti_files(test_dataset_dir)
    if not files:
        logger.error("No NIfTI files found in test dataset")
        return None
    nifti_file = files[0]
    logger.info(f"Using NIfTI file: {nifti_file}")
    try:
        extract_from_nifti(nifti_file, hr_dir, lr_dir,
                           rng_key=jax.random.key(seed or 0),
                           n_slices=10, lower_percent=0.45, upper_percent=0.55,
                           target_size=(256, 256), noise_std=5,
                           kspace_crop_factor=0.5, verbose=False)
    except Exception as e:
        logger.error(f"Error extracting slice from {nifti_file}: {e}")
        return None
    hr_files = [f for f in os.listdir(hr_dir) if f.endswith(".png")]
    lr_files = [f for f in os.listdir(lr_dir) if f.endswith(".png")]
    matching = [f for f in hr_files if f in lr_files]
    if not matching:
        logger.error("No matching pairs extracted")
        return None
    chosen = random.choice(matching)
    return {"hr": os.path.join(hr_dir, chosen),
            "lr": os.path.join(lr_dir, chosen)}


def visualize_results(hr_image, lr_image, upscaled_images, metrics,
                      output_path, logger):
    """2-row figure: images + difference maps
    (parity: scripts/test_comparison.py:204-257)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    n_cols = len(upscaled_images) + 2
    plt.figure(figsize=(n_cols * 4, 8))
    plt.subplot(2, n_cols, 1)
    plt.imshow(hr_image, cmap="gray", vmin=0, vmax=1)
    plt.title("HR Reference")
    plt.axis("off")
    plt.subplot(2, n_cols, 2)
    plt.imshow(lr_image, cmap="gray", vmin=0, vmax=1)
    plt.title("LR Input")
    plt.axis("off")
    col = 3
    for method, image in upscaled_images.items():
        plt.subplot(2, n_cols, col)
        plt.imshow(image, cmap="gray", vmin=0, vmax=1)
        plt.title(f"{method}\nSSIM: {metrics[method]['ssim']:.4f}\n"
                  f"PSNR: {metrics[method]['psnr']:.2f}")
        plt.axis("off")
        plt.subplot(2, n_cols, col + n_cols)
        plt.imshow(np.abs(hr_image - image), cmap="hot", vmin=0, vmax=0.5)
        plt.title(f"Difference Map\nMAE: {metrics[method]['mae']:.4f}")
        plt.axis("off")
        col += 1
    plt.tight_layout()
    plt.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close()
    logger.info(f"Saved visualization to {output_path}")


def main():
    parser = argparse.ArgumentParser(
        description="Test and compare upscaling methods")
    parser.add_argument('--test_dataset', type=str, default='./test_dataset')
    parser.add_argument('--output_dir', type=str, default='./test_results')
    parser.add_argument('--checkpoint_dir', type=str, default='./checkpoints')
    parser.add_argument('--model_type', type=str, default='unet')
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--tta', action='store_true',
                        help='Dihedral-ensemble serving for the model '
                             'column (RESULTS.md 5i)')
    parser.add_argument('--cpu', action='store_true')
    args = parser.parse_args()
    force_cpu_if_requested()
    if args.seed is not None:
        random.seed(args.seed)

    import numpy as np
    import cv2
    import jax.numpy as jnp

    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.evalsuite import (INTERP_METHODS,
                                                   upscale_with_interpolation)
    from mri_superresolution_tpu.infer import (load_engine,
                                               preprocess_image_array)
    from mri_superresolution_tpu.ops.metrics import metric_suite
    from mri_superresolution_tpu.utils.logging import setup_logging

    logger = setup_logging("test_model.log")
    os.makedirs(args.output_dir, exist_ok=True)
    hr_dir = os.path.join(args.output_dir, "hr")
    lr_dir = os.path.join(args.output_dir, "lr")
    os.makedirs(hr_dir, exist_ok=True)
    os.makedirs(lr_dir, exist_ok=True)

    logger.info("Extracting test slice...")
    paired = extract_test_slice(args.test_dataset, hr_dir, lr_dir, logger,
                                args.seed)
    if not paired:
        logger.error("Failed to extract test slice")
        return 1
    logger.info(f"Test files: HR={paired['hr']}, LR={paired['lr']}")

    logger.info("Loading model...")
    try:
        engine = load_engine(InferConfig(
            model=ModelConfig(model_type=args.model_type),
            checkpoint_dir=args.checkpoint_dir, tta=args.tta))
    except Exception as e:
        logger.error(f"Error loading model: {e}")
        return 1

    hr_image = cv2.imread(paired["hr"], cv2.IMREAD_GRAYSCALE).astype(
        np.float32) / 255.0
    lr_image = cv2.imread(paired["lr"], cv2.IMREAD_GRAYSCALE).astype(
        np.float32) / 255.0

    upscaled, metrics = {}, {}
    logger.info("Upscaling with AI model...")
    # the model sees the same percentile-normalized input as scripts/infer.py
    raw = cv2.imread(paired["lr"], cv2.IMREAD_GRAYSCALE).astype(np.float32)
    upscaled["AI Model"] = engine.upscale_image(preprocess_image_array(raw))
    for method in INTERP_METHODS:
        logger.info(f"Upscaling with {method}...")
        name = method.replace("_", " ").title()
        upscaled[name] = np.asarray(
            upscale_with_interpolation(jnp.asarray(lr_image), method))

    for method, image in upscaled.items():
        metrics[method] = metric_suite(jnp.asarray(image), jnp.asarray(hr_image))
        logger.info(f"Metrics for {method}: {metrics[method]}")

    visualize_results(hr_image, lr_image, upscaled, metrics,
                      os.path.join(args.output_dir, "comparison.png"), logger)

    metrics_path = os.path.join(args.output_dir, "metrics.txt")
    with open(metrics_path, "w") as f:
        f.write("# Super-Resolution Comparison Metrics\n\n")
        f.write(f"Test file: {os.path.basename(paired['hr'])}\n\n")
        f.write("| Method | SSIM | PSNR | MSE | RMSE | MAE |\n")
        f.write("| --- | --- | --- | --- | --- | --- |\n")
        for method, m in metrics.items():
            f.write(f"| {method} | {m['ssim']:.4f} | {m['psnr']:.2f} | "
                    f"{m['mse']:.6f} | {m['rmse']:.4f} | {m['mae']:.4f} |\n")
    logger.info(f"Results saved to {args.output_dir}")
    logger.info("Testing complete!")
    return 0


if __name__ == '__main__':
    sys.exit(main())
