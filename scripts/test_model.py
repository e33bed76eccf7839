#!/usr/bin/env python
"""End-to-end model evaluation on a fresh NIfTI test set.

Parity with the reference harness (scripts/test_model.py:293-401): compute
the average native slice resolution over all test volumes, derive a square
HR size divisible by 8, extract pairs, re-pad every PNG to the square
canvas, run batched inference per pair, and write a summary grid plus
average SSIM/RMSE/MAE.

TPU-first: all pairs are stacked and super-resolved in one sharded batched
forward rather than one subprocess-style call per image.
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def extract_test_slices(test_dataset_dir, hr_output_dir, lr_output_dir,
                        n_slices, logger, seed=0):
    """Average-resolution analysis + square/%8 extraction + re-padding
    (parity: scripts/test_model.py:34-188)."""
    import numpy as np
    import cv2
    import jax
    from mri_superresolution_tpu import nifti
    from mri_superresolution_tpu.data import (extract_from_nifti,
                                              find_nifti_files)

    os.makedirs(hr_output_dir, exist_ok=True)
    os.makedirs(lr_output_dir, exist_ok=True)

    nifti_files = find_nifti_files(test_dataset_dir)
    if not nifti_files:
        logger.error(f"No NIfTI files found in 'anat' folders within "
                     f"{test_dataset_dir}")
        return None
    logger.info(f"Found {len(nifti_files)} NIfTI files in 'anat' folders.")

    total_w = total_h = total_slices = 0
    for nf in nifti_files:
        try:
            data, _ = nifti.load(nf)
            if data.ndim >= 3:
                height, width = data.shape[:2]
                cnt = data.shape[2]
                total_w += width * cnt
                total_h += height * cnt
                total_slices += cnt
                logger.info(f"File {os.path.basename(nf)}: "
                            f"{width}x{height}, {cnt} slices")
        except Exception as e:
            logger.error(f"Error analyzing resolution for {nf}: {e}")
    if total_slices == 0:
        logger.error("No valid slices found in NIfTI files.")
        return None

    avg_w = int(total_w / total_slices)
    avg_h = int(total_h / total_slices)
    logger.info(f"Average slice resolution: {avg_w}x{avg_h}")
    hr_size = max(avg_w, avg_h)
    if hr_size % 8 != 0:
        hr_size = ((hr_size // 8) + 1) * 8
    lr_size = hr_size // 2
    logger.info(f"Setting HR target size to square and divisible by 8: "
                f"{hr_size}x{hr_size} (LR {lr_size}x{lr_size})")

    key = jax.random.key(seed)
    for nf in nifti_files:
        key, sub = jax.random.split(key)
        try:
            extract_from_nifti(nf, hr_output_dir, lr_output_dir, rng_key=sub,
                               n_slices=n_slices // len(nifti_files) + 1,
                               lower_percent=0.2, upper_percent=0.8,
                               target_size=(avg_w, avg_h), verbose=False)
        except Exception as e:
            logger.error(f"Error extracting slices from {nf}: {e}")

    # re-pad everything onto square canvases (scripts/test_model.py:129-168)
    for d, size in ((hr_output_dir, hr_size), (lr_output_dir, lr_size)):
        for f in os.listdir(d):
            if not f.endswith(".png"):
                continue
            p = os.path.join(d, f)
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            canvas = np.zeros((size, size), np.uint8)
            y0 = (size - img.shape[0]) // 2
            x0 = (size - img.shape[1]) // 2
            canvas[y0:y0 + img.shape[0], x0:x0 + img.shape[1]] = img
            cv2.imwrite(p, canvas)

    hr_files = [f for f in os.listdir(hr_output_dir) if f.endswith(".png")]
    lr_files = set(f for f in os.listdir(lr_output_dir) if f.endswith(".png"))
    paired = [(os.path.join(lr_output_dir, f), os.path.join(hr_output_dir, f))
              for f in sorted(hr_files) if f in lr_files]
    if len(paired) > n_slices:
        paired = random.sample(paired, n_slices)
    logger.info(f"Extracted {len(paired)} paired slices for testing")
    return paired


def create_summary_visualization(results, output_path, logger):
    """Grid: input/output/target rows + average metrics title
    (parity: scripts/test_model.py:226-291)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    import cv2

    n = len(results)
    if n == 0:
        logger.error("No results to visualize")
        return
    cols = min(4, n)
    rows = (n + cols - 1) // cols * 3
    plt.figure(figsize=(cols * 5, rows * 5))
    avg = {}
    for r in results:
        for k, v in (r["metrics"] or {}).items():
            avg[k] = avg.get(k, 0) + v
    for k in avg:
        avg[k] /= n
    title = "Model Evaluation Results\n" + " | ".join(
        f"{k.upper()}: {v:.4f}" for k, v in avg.items())
    plt.suptitle(title, fontsize=16)
    for i, r in enumerate(results):
        row_idx = (i // cols) * 3
        col_idx = i % cols
        imgs = [cv2.imread(r[k], cv2.IMREAD_GRAYSCALE)
                for k in ("input", "output", "target")]
        for j, (img, label) in enumerate(zip(imgs, ("Input", "Output", "Target"))):
            plt.subplot(rows, cols, (row_idx + j) * cols + col_idx + 1)
            plt.imshow(img, cmap="gray", interpolation="none")
            if label == "Output" and r["metrics"]:
                mt = "\n".join(f"{k.upper()}: {v:.4f}"
                               for k, v in r["metrics"].items())
                plt.title(f"{label} {i + 1}\n{mt}", fontsize=8)
            else:
                plt.title(f"{label} {i + 1}")
            plt.axis("off")
    plt.tight_layout()
    plt.subplots_adjust(top=0.95)
    plt.savefig(output_path, dpi=300, bbox_inches="tight")
    logger.info(f"Saved visualization to {output_path}")
    plt.close()


def main():
    parser = argparse.ArgumentParser(
        description="Test MRI super-resolution model on new dataset")
    parser.add_argument('--test_dataset', type=str, default='./test_dataset')
    parser.add_argument('--output_dir', type=str, default='./test_results')
    parser.add_argument('--checkpoint_dir', type=str, default='./checkpoints')
    parser.add_argument('--checkpoint_path', type=str, default=None)
    parser.add_argument('--model_type', type=str, choices=['unet', 'unet_tpu', 'edsr', 'simple'],
                        default='unet')
    parser.add_argument('--base_filters', type=int, default=32)
    parser.add_argument('--n_slices', type=int, default=10)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--bucket', type=int, default=1,
                        help='Pad inputs to a multiple of this to coalesce '
                             'XLA recompiles on mixed-size test sets')
    parser.add_argument('--quant', type=str, choices=['none', 'int8'],
                        default='none',
                        help='int8 PTQ serving: streaming self-calibration '
                             'over the first slices (served bf16), then '
                             'int8 (see --quant_calib_slices)')
    parser.add_argument('--tta', action='store_true',
                        help='Dihedral-ensemble serving (metrics then '
                             'reflect --tta inference; RESULTS.md 5i)')
    parser.add_argument('--quant_calib_slices', type=int, default=2,
                        help='slices of streaming calibration before int8 '
                             'serving starts (kept small so most reported '
                             'metrics are int8-served)')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--use_amp', action='store_true',
                        help='Reference-compat alias (bf16 default)')
    args = parser.parse_args()
    force_cpu_if_requested()
    random.seed(args.seed)

    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.infer import load_engine
    from mri_superresolution_tpu.utils.logging import setup_logging

    logger = setup_logging("test_model.log")
    try:
        os.makedirs(args.output_dir, exist_ok=True)
        hr_dir = os.path.join(args.output_dir, "hr_slices")
        lr_dir = os.path.join(args.output_dir, "lr_slices")
        enhanced_dir = os.path.join(args.output_dir, "enhanced")
        os.makedirs(enhanced_dir, exist_ok=True)

        paired = extract_test_slices(args.test_dataset, hr_dir, lr_dir,
                                     args.n_slices, logger, args.seed)
        if not paired:
            logger.error("No paired slices extracted. Exiting.")
            return 1

        engine = load_engine(InferConfig(
            model=ModelConfig(model_type=args.model_type,
                              base_filters=args.base_filters),
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_path=args.checkpoint_path, bucket=args.bucket,
            quant=args.quant,
            quant_calib_slices=args.quant_calib_slices, tta=args.tta))

        results = []
        for i, (lr_file, hr_file) in enumerate(paired):
            logger.info(f"Processing slice {i + 1}/{len(paired)}: "
                        f"{os.path.basename(lr_file)}")
            out_file = os.path.join(enhanced_dir,
                                    f"enhanced_{os.path.basename(lr_file)}")
            try:
                _, metrics = engine.process_single_image(
                    lr_file, out_file, hr_file)
                results.append({"input": lr_file, "target": hr_file,
                                "output": out_file, "metrics": metrics})
            except Exception as e:
                logger.error(f"Error processing {lr_file}: {e}")

        if results:
            create_summary_visualization(
                results, os.path.join(args.output_dir, "results_summary.png"),
                logger)
            logger.info("=== Testing Results Summary ===")
            avg = {}
            for r in results:
                for k, v in (r["metrics"] or {}).items():
                    avg[k] = avg.get(k, 0) + v
            for k in avg:
                logger.info(f"Average {k.upper()}: {avg[k] / len(results):.4f}")
        logger.info("Testing completed successfully!")
        return 0
    except Exception as e:
        logger.error(f"Error during testing: {e}")
        return 1


if __name__ == '__main__':
    sys.exit(main())
