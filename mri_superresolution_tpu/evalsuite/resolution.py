"""Resolution analytics: native-resolution slice export + distribution plots.

Parity with the reference analytics (utils/visualise_res.py): find NIfTI
files under anat/ dirs, export each volume's middle slice as a native-res
PNG, build a Width/Height/Count frequency DataFrame, and render a
bar-histogram plus a count-weighted scatter plot.
"""

from __future__ import annotations

import os
from collections import Counter
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np


def extract_middle_slice(nifti_file: str,
                         output_dir: Optional[str] = None,
                         ) -> Optional[Tuple[int, int]]:
    """Save the middle axial slice at native resolution; returns (w, h)
    (parity: utils/visualise_res.py:32-124)."""
    import cv2
    from mri_superresolution_tpu import nifti
    from mri_superresolution_tpu.data.extraction import (
        generate_bids_identifier, to_uint8)

    try:
        data, _ = nifti.load(nifti_file)
        if data.ndim == 4:
            data = data[:, :, :, 0]
        if data.ndim != 3:
            print(f"Warning: {nifti_file} is {data.ndim}D, skipping")
            return None
        mid = data[:, :, data.shape[2] // 2].astype(np.float32)
        lo, hi = float(mid.min()), float(mid.max())
        norm = (mid - lo) / (hi - lo) if hi > lo else np.zeros_like(mid)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            name = generate_bids_identifier(nifti_file) + "_mid.png"
            cv2.imwrite(os.path.join(output_dir, name), to_uint8(norm))
        h, w = mid.shape
        return (w, h)
    except Exception as e:
        print(f"Error: Could not process {nifti_file}: "
              f"{type(e).__name__} - {e}")
        return None


def analyze_resolutions(resolutions: List[Optional[Tuple[int, int]]]):
    """Frequency DataFrame sorted by count
    (parity: utils/visualise_res.py:126-155)."""
    import pandas as pd

    valid = [r for r in resolutions
             if r is not None and isinstance(r, tuple) and len(r) == 2]
    if not valid:
        print("Warning: No valid resolutions found to analyze.")
        return pd.DataFrame(columns=["Width", "Height", "Count"])
    counts = Counter(valid)
    df = pd.DataFrame(
        [(w, h, c) for (w, h), c in counts.items()],
        columns=["Width", "Height", "Count"])
    return df.sort_values("Count", ascending=False).reset_index(drop=True)


def visualize_resolution_histogram(resolution_df,
                                   output_file: str =
                                   "spatial_resolution_histogram.png") -> None:
    """Bar histogram + count-weighted scatter
    (parity: utils/visualise_res.py:157-272)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if resolution_df.empty:
        print("Cannot generate visualization: Resolution DataFrame is empty.")
        return

    df = resolution_df.copy()
    df["Resolution"] = df.apply(
        lambda row: f"{int(row['Width'])}x{int(row['Height'])}", axis=1)
    bar_df = df.sort_values("Count", ascending=False).head(40)

    plt.figure(figsize=(max(14, len(bar_df) * 0.5), 8))
    bars = plt.bar(bar_df["Resolution"], bar_df["Count"], color="steelblue",
                   width=0.7, edgecolor="black")
    for bar in bars:
        h = bar.get_height()
        plt.text(bar.get_x() + bar.get_width() / 2, h + 0.5, str(int(h)),
                 ha="center", va="bottom", fontweight="bold", fontsize=9)
    plt.title("Histogram of Original Spatial Resolutions (Width x Height)",
              fontsize=16)
    plt.xlabel("Resolution", fontsize=14)
    plt.ylabel("Frequency", fontsize=14)
    plt.xticks(rotation=60, ha="right", fontsize=10)
    plt.grid(axis="y", linestyle="--", alpha=0.7)
    plt.tight_layout()
    plt.savefig(output_file, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Histogram visualization saved to '{output_file}'")

    plt.figure(figsize=(10, 8))
    sc = plt.scatter(df["Width"], df["Height"], s=df["Count"] * 20,
                     alpha=0.7, c=df["Count"], cmap="viridis",
                     edgecolors="black")
    plt.colorbar(sc).set_label("Frequency (Count)", fontsize=12)
    plt.title("Distribution of Spatial Resolutions (Width vs Height)",
              fontsize=16)
    plt.xlabel("Width (pixels)", fontsize=14)
    plt.ylabel("Height (pixels)", fontsize=14)
    plt.grid(True, linestyle="--", alpha=0.7)
    plt.tight_layout()
    # (reference drops the directory here — utils/visualise_res.py:266 —
    # we keep the scatter next to the histogram)
    scatter_output = str(Path(output_file).with_name(
        Path(output_file).stem + "_scatter.png"))
    plt.savefig(scatter_output, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Scatter visualization saved to '{scatter_output}'")
