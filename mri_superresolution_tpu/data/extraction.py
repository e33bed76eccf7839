"""Paired HR/LR slice extraction from NIfTI volumes.

Reference behavior (utils/extraction_utils.py:74-164 and
scripts/extract_paired_slices.py):
- pick ``n_slices`` linspaced z-indices within [lower%, upper%] of the volume,
- HR: percentile-window (0.5/99.5) → min-max to [0,1] → LANCZOS letterbox to
  ``target_size`` → uint8 PNG,
- LR: robust-normalize → k-space low-field simulation → clip [0,1] → AREA
  letterbox to ``target_size/2`` → uint8 PNG with the *same filename* so
  pairs match by name.

TPU-first: the reference loops slice-by-slice on host NumPy; here all slices
of a volume are stacked and run through one jitted batched pipeline
(percentiles vmapped per-slice, one batched FFT, resize as matmuls). PNG
encode/decode stays on host (cv2).
"""

from __future__ import annotations

import functools
import os
import re
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.ops.resize import Interp, letterbox_resize
from mri_superresolution_tpu.ops.normalize import (
    minmax_normalize, percentile_window, robust_normalize)
from mri_superresolution_tpu.ops.kspace import simulate_low_field_mri

_MODALITIES = ("T1w", "T2w", "FLAIR", "BOLD", "PD", "PDw", "DWI")


def generate_bids_identifier(nifti_file: str) -> str:
    """BIDS-entity identifier from a NIfTI filename
    (parity: utils/extraction_utils.py:9-53)."""
    basename = os.path.basename(nifti_file)
    if basename.endswith(".nii.gz"):
        basename = basename[:-7]
    elif basename.endswith(".nii"):
        basename = basename[:-4]

    bids_entities = re.findall(r"([a-zA-Z0-9]+)-([a-zA-Z0-9]+)", basename)
    if bids_entities:
        base_id = "_".join(f"{k}-{v}" for k, v in bids_entities)
        modality_match = re.search(r"_([A-Za-z0-9]+)$", basename)
        if modality_match and modality_match.group(1) in _MODALITIES:
            base_id += f"_{modality_match.group(1)}"
        return base_id
    return basename


def generate_filename(subject: str, slice_idx: int,
                      timepoint: Optional[int] = None) -> str:
    """``Subject[_T{t}]_s{idx:03d}.png`` — identical for HR and LR so pairs
    match by name (parity: utils/extraction_utils.py:55-72)."""
    if timepoint is not None:
        return f"{subject}_T{timepoint}_s{slice_idx:03d}.png"
    return f"{subject}_s{slice_idx:03d}.png"


def select_slice_indices(num_slices: int, lower_percent: float,
                         upper_percent: float, n_slices: int) -> np.ndarray:
    """Linspaced z-indices (parity: utils/extraction_utils.py:112-115)."""
    lower_index = int(lower_percent * num_slices)
    upper_index = int(upper_percent * num_slices)
    idx = np.linspace(lower_index, upper_index, n_slices, dtype=int)
    # upper_percent=1.0 makes upper_index == num_slices, one past the end
    # (the reference crashes there); clamp into range
    return np.clip(idx, 0, num_slices - 1)


@functools.partial(jax.jit, static_argnames=("target_size",))
def hr_pipeline(slices: jnp.ndarray, target_size: Tuple[int, int]) -> jnp.ndarray:
    """Batched HR preprocessing: window → minmax → LANCZOS letterbox.

    ``slices``: (N, H, W) float; ``target_size``: (width, height).
    (Reference path: utils/preprocessing.py:295-374 with LANCZOS letterbox.)
    """
    x = jax.vmap(lambda s: minmax_normalize(percentile_window(s)))(slices)
    return letterbox_resize(x, target_size, Interp.LANCZOS, 0.0)


@functools.partial(jax.jit, static_argnames=("target_size", "kspace_crop_factor",
                                             "noise_std"))
def lr_pipeline(slices: jnp.ndarray, key: jax.Array,
                target_size: Tuple[int, int],
                kspace_crop_factor: float = 0.5,
                noise_std: float = 5.0) -> jnp.ndarray:
    """Batched LR generation: robust-normalize → k-space sim → clip → AREA
    letterbox to target_size/2 (reference utils/extraction_utils.py:136-157).
    """
    x = jax.vmap(robust_normalize)(slices)
    x = simulate_low_field_mri(x, key, kspace_crop_factor, noise_std)
    x = jnp.clip(x, 0.0, 1.0)
    lr_size = (target_size[0] // 2, target_size[1] // 2)
    return letterbox_resize(x, lr_size, Interp.AREA, 0.0)


def to_uint8(img01: np.ndarray) -> np.ndarray:
    """float [0,1] → uint8 [0,255] like the reference's PNG save
    (utils/extraction_utils.py:131)."""
    return np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)


def _imwrite(path: str, img: np.ndarray) -> None:
    """Grayscale PNG write: native stored-mode encoder
    (native/png_loader.cpp, measured ~15-20x cv2 — standard lossless
    PNGs at ~1.4x cv2's file size) with cv2 fallback; pixels identical
    either way (tests/test_native.py pins decode equality). Set
    MRI_SR_PNG_LEVEL to a zlib level 1-9 for smaller files, or to 'cv2'
    to force the cv2 encoder (smallest files, slower)."""
    lvl = os.environ.get("MRI_SR_PNG_LEVEL", "0")
    if lvl != "cv2" and img.dtype == np.uint8 and img.ndim == 2:
        from mri_superresolution_tpu import native
        try:
            level = int(lvl)
        except ValueError:
            level = None          # unparseable env value: cv2 fallback
        if level is not None and native.encode_png(path, img, level=level):
            return
    import cv2
    cv2.imwrite(path, img)


def extract_slices_3d(data: np.ndarray, subject: str, hr_output_dir: str,
                      lr_output_dir: Optional[str] = None,
                      timepoint: Optional[int] = None,
                      n_slices: int = 10,
                      lower_percent: float = 0.2,
                      upper_percent: float = 0.8,
                      target_size: Tuple[int, int] = (256, 256),
                      apply_simulation: bool = True,
                      noise_std: float = 5.0,
                      kspace_crop_factor: float = 0.5,
                      rng_key: Optional[jax.Array] = None,
                      verbose: bool = True) -> List[str]:
    """Extract paired slices from one 3D volume. Returns written filenames."""
    indices = select_slice_indices(data.shape[2], lower_percent,
                                   upper_percent, n_slices)
    stack = np.ascontiguousarray(
        np.transpose(data[:, :, indices], (2, 0, 1))).astype(np.float32)

    hr = np.asarray(hr_pipeline(jnp.asarray(stack), tuple(target_size)))

    lr = None
    if lr_output_dir is not None and apply_simulation:
        if rng_key is None:
            # deterministic across processes (Python's hash() is salted)
            import zlib
            seed = zlib.crc32(f"{subject}|{timepoint}".encode())
            rng_key = jax.random.key(seed)
        lr = np.asarray(lr_pipeline(jnp.asarray(stack), rng_key,
                                    tuple(target_size),
                                    kspace_crop_factor, noise_std))

    written = []
    for i, idx in enumerate(indices):
        filename = generate_filename(subject, int(idx), timepoint)
        hr_path = os.path.join(hr_output_dir, filename)
        _imwrite(hr_path, to_uint8(hr[i]))
        if verbose:
            print(f"Saved HR: {hr_path}")
        if lr is not None:
            lr_path = os.path.join(lr_output_dir, filename)
            _imwrite(lr_path, to_uint8(lr[i]))
            if verbose:
                print(f"Saved LR: {lr_path} (Size: "
                      f"{(target_size[0] // 2, target_size[1] // 2)})")
        written.append(filename)
    return written


def extract_from_nifti(nifti_file: str, hr_output_dir: str,
                       lr_output_dir: Optional[str],
                       rng_key: Optional[jax.Array] = None,
                       **kwargs) -> List[str]:
    """Load one NIfTI file and extract pairs; handles 3D and 4D volumes
    (parity: scripts/extract_paired_slices.py:59-95)."""
    from mri_superresolution_tpu import nifti

    data, _ = nifti.load(nifti_file)
    subject = generate_bids_identifier(nifti_file)
    written: List[str] = []
    if data.ndim == 3:
        written += extract_slices_3d(data, subject, hr_output_dir,
                                     lr_output_dir, rng_key=rng_key, **kwargs)
    elif data.ndim == 4:
        for t in range(data.shape[3]):
            key_t = None
            if rng_key is not None:
                rng_key, key_t = jax.random.split(rng_key)
            written += extract_slices_3d(data[:, :, :, t], subject,
                                         hr_output_dir, lr_output_dir,
                                         timepoint=t, rng_key=key_t, **kwargs)
    else:
        print(f"Unexpected data dimensionality for {nifti_file}: {data.ndim}D")
    return written


def find_nifti_files(datasets_dir: str, anat_only: bool = True) -> List[str]:
    """Walk dataset subfolders; descend only into ``anat/`` directories
    (parity: scripts/extract_paired_slices.py:148-158). A missing root
    returns [] like an empty one, so CLIs emit their clean 'No NIfTI files
    found' message instead of a traceback."""
    if not os.path.isdir(datasets_dir):
        return []
    found = []
    for set_name in sorted(os.listdir(datasets_dir)):
        set_path = os.path.join(datasets_dir, set_name)
        if not os.path.isdir(set_path):
            continue
        for root, _dirs, files in os.walk(set_path):
            if anat_only and os.path.basename(root).lower() != "anat":
                continue
            for file in sorted(files):
                if file.endswith(".nii") or file.endswith(".nii.gz"):
                    found.append(os.path.join(root, file))
    return found
