#!/usr/bin/env python
"""Analyze native spatial resolutions of NIfTI datasets.

Parity with the reference analytics entry point (utils/visualise_res.py:
275-339): find NIfTI files in anat/ dirs, export each volume's middle slice
as a native-resolution PNG, and plot the resolution distribution.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))


def main():
    parser = argparse.ArgumentParser(
        description="Analyze original spatial resolutions of NIfTI slices")
    parser.add_argument('--root_dir', type=str, default='./datasets')
    parser.add_argument('--output_png_dir', type=str, default='./png_slices')
    parser.add_argument('--output_viz_file', type=str,
                        default='spatial_resolution_histogram.png')
    args = parser.parse_args()

    from mri_superresolution_tpu.data import find_nifti_files
    from mri_superresolution_tpu.evalsuite.resolution import (
        analyze_resolutions, extract_middle_slice,
        visualize_resolution_histogram)

    files = find_nifti_files(args.root_dir)
    if not files:
        print(f"No NIfTI files found in anat/ folders under {args.root_dir}")
        return 1
    print(f"Found {len(files)} NIfTI files")

    resolutions = [extract_middle_slice(f, args.output_png_dir)
                   for f in files]
    df = analyze_resolutions(resolutions)
    print(df.to_string(index=False))
    visualize_resolution_histogram(df, args.output_viz_file)
    return 0


if __name__ == "__main__":
    sys.exit(main())
