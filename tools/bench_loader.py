#!/usr/bin/env python
"""Measured PNG pair-decode throughput: the training input pipeline's
decode stage across the available implementations.

The reference's DataLoader decodes per item with PIL
(`/root/reference/utils/dataset.py:110-126`: Image.open().convert("L") →
ToTensor) under worker processes; our streaming loader decodes per batch
with a threaded C++ decoder (native/png_loader.cpp via ctypes,
mri_superresolution_tpu/native.py) falling back to a cv2 loop. This
benchmark times the decode stage ALONE (host → float arrays) on the same
files so the comparison is implementation-for-implementation:

  native   — C++ threaded batch decode (our streaming default)
  cv2      — per-file cv2.imread loop (our fallback path)
  pil      — per-file PIL convert("L") + np.asarray (reference decode)
  torchdl  — the reference-style path end-to-end: PIL + ToTensor inside a
             torch DataLoader with worker processes (the closest
             reproduction of the reference's input pipeline)

Usage: python tools/bench_loader.py [--n 512] [--hw 256] [--workers 2]
Writes one markdown table + a JSON blob to stdout.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def make_dataset(root, n, hw, seed=0):
    import cv2
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        img = (rng.random((hw, hw)) * 255).astype(np.uint8)
        p = os.path.join(root, f"s{i:04d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def timeit(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    paths = make_dataset(tmp, args.n, args.hw)
    mb = args.n * args.hw * args.hw / 1e6   # decoded gray bytes

    rows = {}

    from mri_superresolution_tpu import native
    if native.available():
        def run_native():
            out = native.decode_batch(paths, (args.hw, args.hw))
            assert out is not None and out.shape[0] == args.n
            # the real pipeline converts to float on host right after
            # decode (data/dataset.py _assemble); every row must include
            # it for an apples-to-apples comparison
            _ = out.astype(np.float32) / 255.0
        rows["native"] = timeit(run_native, args.repeats)
    else:
        print("[bench_loader] native lib unavailable (build failed?)",
              flush=True)

    import cv2

    def run_cv2():
        for p in paths:
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            _ = img.astype(np.float32) / 255.0
    rows["cv2"] = timeit(run_cv2, args.repeats)

    try:
        from PIL import Image

        def run_pil():
            for p in paths:
                img = Image.open(p).convert("L")
                _ = np.asarray(img, np.float32) / 255.0
        rows["pil"] = timeit(run_pil, args.repeats)
    except ImportError:
        print("[bench_loader] PIL unavailable", flush=True)

    try:
        import torch
        from torch.utils.data import DataLoader, Dataset
        from PIL import Image

        class RefStyle(Dataset):
            def __len__(self):
                return len(paths)

            def __getitem__(self, i):
                img = Image.open(paths[i]).convert("L")
                a = np.asarray(img, np.float32) / 255.0
                return torch.from_numpy(a).unsqueeze(0)

        def run_torchdl():
            dl = DataLoader(RefStyle(), batch_size=32,
                            num_workers=args.workers)
            n = 0
            for b in dl:
                n += b.shape[0]
            assert n == args.n
        rows["torchdl"] = timeit(run_torchdl, args.repeats)
    except ImportError:
        print("[bench_loader] torch unavailable", flush=True)

    print(f"\n{args.n} x {args.hw}^2 gray PNGs ({mb:.0f} MB decoded), "
          f"best of {args.repeats}:")
    print("| decoder | time (s) | images/s | MB/s |")
    print("|---|---|---|---|")
    blob = {"n": args.n, "hw": args.hw}
    for k, t in rows.items():
        print(f"| {k} | {t:.3f} | {args.n / t:.0f} | {mb / t:.0f} |")
        blob[k] = {"s": t, "images_per_s": args.n / t, "mb_per_s": mb / t}
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
