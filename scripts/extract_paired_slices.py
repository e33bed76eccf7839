#!/usr/bin/env python
"""Extract paired HR/LR slices from NIfTI datasets (device-batched).

CLI parity with the reference extractor (scripts/extract_paired_slices.py:
97-122 flags); the per-slice NumPy loop becomes one jitted batched FFT+RNG
pipeline per volume (mri_superresolution_tpu/data/extraction.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(
        description="Extract both full-resolution and simulated "
                    "low-resolution slices from NIfTI scans.")
    parser.add_argument('--datasets_dir', type=str, default='./datasets')
    parser.add_argument('--hr_output_dir', type=str, default='./training_data')
    parser.add_argument('--lr_output_dir', type=str,
                        default='./training_data_1.5T')
    parser.add_argument('--n_slices', type=int, default=10)
    parser.add_argument('--lower_percent', type=float, default=0.2)
    parser.add_argument('--upper_percent', type=float, default=0.8)
    parser.add_argument('--target_size', type=int, nargs=2, default=[256, 256],
                        help='Target size (width height)')
    parser.add_argument('--noise_std', type=float, default=5)
    parser.add_argument('--kspace_crop_factor', type=float, default=0.5)
    parser.add_argument('--seed', type=int, default=0,
                        help='RNG seed for the simulated noise (our '
                             'extension: reproducible extraction)')
    parser.add_argument('--cpu', action='store_true')
    return parser.parse_args()


def main():
    args = parse_args()
    force_cpu_if_requested()

    import jax
    from mri_superresolution_tpu.data import (extract_from_nifti,
                                              find_nifti_files)

    os.makedirs(args.hr_output_dir, exist_ok=True)
    if args.lr_output_dir:
        os.makedirs(args.lr_output_dir, exist_ok=True)

    print("=== MRI Paired Slice Extraction (TPU) ===")
    print(f"Datasets Directory: {args.datasets_dir}")
    print(f"High-Resolution Output: {args.hr_output_dir} "
          "(LANCZOS letterbox)")
    if args.lr_output_dir:
        print(f"Low-Resolution Output: {args.lr_output_dir} "
              "(k-space simulation + AREA letterbox)")
        print(f"  - K-space Crop Factor: {args.kspace_crop_factor}")
        print(f"  - Noise Standard Deviation: {args.noise_std}")
    print("==========================================")

    key = jax.random.key(args.seed)
    files = find_nifti_files(args.datasets_dir)
    if not files:
        print(f"No NIfTI files found under {args.datasets_dir} "
              "(only anat/ directories are scanned)")
        return
    for nifti_path in files:
        print(f"Processing {nifti_path}")
        key, sub = jax.random.split(key)
        try:
            extract_from_nifti(
                nifti_path, args.hr_output_dir,
                args.lr_output_dir or None,
                rng_key=sub,
                n_slices=args.n_slices,
                lower_percent=args.lower_percent,
                upper_percent=args.upper_percent,
                target_size=tuple(args.target_size),
                noise_std=args.noise_std,
                kspace_crop_factor=args.kspace_crop_factor)
        except Exception as e:
            print(f"Error processing {nifti_path}: {e}")


if __name__ == '__main__':
    main()
