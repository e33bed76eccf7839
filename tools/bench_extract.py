#!/usr/bin/env python
"""Extraction-pipeline throughput (VERDICT r3 item 8): the data-prep hot
loop, decomposed per stage — mirroring the decode study (RESULTS.md 5m)
on the WRITE side of the data pipeline.

Stages measured per volume (the same calls data/extraction.py makes):
  decode   nifti.load + slice selection + stack
  device   hr_pipeline + lr_pipeline (percentile/minmax, batched k-space
           FFT + Rician noise, matmul resizes) — fetch included
  encode   to_uint8 + cv2.imwrite of every HR/LR PNG pair (host)

Reference anchor: its extraction loop is per-slice host NumPy + cv2
(/root/reference/utils/extraction_utils.py:74-164 +
utils/preprocessing.py:225-293); here the per-volume device pipeline is
one batched jitted program, so the question this tool answers is whether
the HOST encode (cv2 PNG) bounds the pipeline — i.e. whether a native
encoder is warranted.

Usage: python tools/bench_extract.py [--hw 256] [--slices 60] [--volumes 4]
                                     [--cpu]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--slices", type=int, default=60)
    ap.add_argument("--volumes", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    import cv2
    import jax
    import jax.numpy as jnp

    from mri_superresolution_tpu import nifti
    from mri_superresolution_tpu.data.extraction import (hr_pipeline,
                                                         lr_pipeline,
                                                         select_slice_indices,
                                                         to_uint8)

    hw, nsl = args.hw, args.slices
    work = tempfile.mkdtemp(prefix="bench_extract_")
    rng = np.random.default_rng(0)
    vols = []
    for v in range(args.volumes):
        coarse = rng.random((hw // 16, hw // 16, nsl)).astype(np.float32)
        vol = np.stack([cv2.resize(coarse[:, :, k], (hw, hw),
                                   interpolation=cv2.INTER_CUBIC)
                        for k in range(nsl)], axis=2)
        path = os.path.join(work, f"sub-{v:02d}_T1w.nii")
        nifti.save(path, (np.clip(vol, 0, 1) * 3000).astype(np.int16))
        vols.append(path)

    target = (hw, hw)
    n_extract = nsl  # extract every slice (stress the pipeline)

    def stage_decode(path):
        data, _ = nifti.load(path)
        idx = select_slice_indices(n_extract, 0.0, 1.0, data.shape[2])
        return np.ascontiguousarray(
            np.transpose(data[:, :, idx], (2, 0, 1))).astype(np.float32)

    def stage_device(stack):
        hr = hr_pipeline(jnp.asarray(stack), target)
        lr = lr_pipeline(jnp.asarray(stack), jax.random.key(0), target,
                         kspace_crop_factor=0.5, noise_std=5.0)
        return np.asarray(hr), np.asarray(lr)   # fetch = sync

    out_dir = os.path.join(work, "out")

    def stage_encode(hr, lr, tag):
        os.makedirs(out_dir, exist_ok=True)
        for i in range(hr.shape[0]):
            cv2.imwrite(os.path.join(out_dir, f"{tag}_hr_{i:03d}.png"),
                        to_uint8(hr[i]))
            cv2.imwrite(os.path.join(out_dir, f"{tag}_lr_{i:03d}.png"),
                        to_uint8(lr[i]))

    # warm compiles
    s0 = stage_decode(vols[0])
    h0, l0 = stage_device(s0)
    stage_encode(h0, l0, "warm")

    def run_once():
        t = {"decode": 0.0, "device": 0.0, "encode": 0.0}
        for v, path in enumerate(vols):
            t0 = time.perf_counter()
            stack = stage_decode(path)
            t["decode"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            hr, lr = stage_device(stack)
            t["device"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            stage_encode(hr, lr, f"v{v}")
            t["encode"] += time.perf_counter() - t0
        return t

    best = min((run_once() for _ in range(args.repeats)),
               key=lambda t: sum(t.values()))
    total_slices = args.volumes * n_extract
    total = sum(best.values())
    res = {
        "metric": "extraction_pipeline",
        "hw": hw, "slices_per_volume": n_extract,
        "volumes": args.volumes,
        "decode_s": round(best["decode"], 3),
        "device_s": round(best["device"], 3),
        "encode_s": round(best["encode"], 3),
        "total_s": round(total, 3),
        "slices_per_s": round(total_slices / total, 1),
        "volumes_per_s": round(args.volumes / total, 2),
        "encode_fraction": round(best["encode"] / total, 3),
        "stage_slices_per_s": {
            k: round(total_slices / v, 1) for k, v in best.items()},
    }
    print(json.dumps(res))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
