#!/usr/bin/env python
"""Benchmark / ablation driver.

Parity with the reference driver (evaluate.py:131-364): hardware report,
dataset stats + resolution histogram, implementation-details sniffing from
checkpoints, per-image timing+quality benchmarks over {bicubic, bilinear,
sharp_bilinear, unet} → pandas CSV, qualitative comparison figures, and
three modes: single --checkpoint, --ablation_checkpoints_dir, and
--ablation_train_configs (subprocess-trains scripts/train.py per loss
config).

Implementation details come from the checkpoint JSON sidecar (our
checkpoints always carry hyperparams — the reference's sniffing at
evaluate.py:49-60 usually found nothing because train.py never wrote them).
"""

import argparse
import json
import os
import platform
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.abspath(os.path.dirname(__file__)))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def report_hardware():
    import psutil
    import jax
    devices = jax.devices()
    info = {
        "cpu": platform.processor() or platform.machine(),
        "cpu_count": os.cpu_count(),
        "ram_gb": round(psutil.virtual_memory().total / 1e9, 2),
        "accelerator": str(devices[0]) if devices else "None",
        "n_devices": len(devices),
        "backend": jax.default_backend(),
    }
    print("Hardware Info:", info)
    return info


def report_dataset_stats(hr_dir, lr_dir, output_dir):
    import cv2
    from mri_superresolution_tpu.data import PairedSliceDataset
    from mri_superresolution_tpu.evalsuite.resolution import (
        analyze_resolutions, visualize_resolution_histogram)

    dataset = PairedSliceDataset(hr_dir, lr_dir)
    subjects = dataset.get_unique_subjects()
    print(f"Test images: {len(dataset)}, Subjects: {len(subjects)}")
    resolutions = []
    for meta in dataset.metadata:
        img = cv2.imread(meta["full_res_path"], cv2.IMREAD_GRAYSCALE)
        resolutions.append((img.shape[1], img.shape[0]))
    df_res = analyze_resolutions(resolutions)
    hist_path = os.path.join(output_dir, "resolution_histogram.png")
    visualize_resolution_histogram(df_res, hist_path)
    return {"n_images": len(dataset), "subjects": subjects,
            "resolution_histogram": hist_path}


def report_implementation_details(checkpoint_path):
    params = {}
    base = str(checkpoint_path)
    for suffix in (".ckpt", ".pth", ".msgpack"):
        if base.endswith(suffix):
            base = base[:-len(suffix)]
    sidecar = base + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
        cfg = meta.get("config", {})
        for k in ("epochs", "batch_size", "learning_rate", "weight_decay"):
            if k in cfg:
                params[k] = cfg[k]
        for k in ("ssim_weight", "perceptual_weight"):
            if k in cfg.get("loss", {}):
                params[k] = cfg["loss"][k]
        if "base_filters" in cfg.get("model", {}):
            params["base_filters"] = cfg["model"]["base_filters"]
        for k in ("val_loss", "val_ssim", "epoch"):
            if k in meta:
                params[k] = meta[k]
    print("Implementation details:", params)
    return params


def run_benchmarks(test_pairs, engine):
    """Per-image timing+quality over all methods → DataFrame
    (parity: evaluate.py:62-108). Timing includes the host fetch (honest
    wall-clock; on the async TPU tunnel only fetches synchronize)."""
    import numpy as np
    import cv2
    import jax.numpy as jnp
    import pandas as pd
    from mri_superresolution_tpu.evalsuite import upscale_with_interpolation
    from mri_superresolution_tpu.infer import preprocess_image_array
    from mri_superresolution_tpu.ops.metrics import metric_suite

    results = []
    if test_pairs:
        # Warm up every (method, shape) pair so XLA compilation (minutes
        # through the TPU tunnel) never lands inside a timing window — the
        # classical baselines jit-compile per input shape too.
        # discover distinct shapes from the PNG IHDR headers (26 bytes each)
        # instead of decoding every image twice on the single-core host
        def _png_hw(path):
            with open(path, "rb") as f:
                head = f.read(26)
            if head[:8] != b"\x89PNG\r\n\x1a\n" or head[12:16] != b"IHDR":
                img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
                return img.shape
            return (int.from_bytes(head[20:24], "big"),
                    int.from_bytes(head[16:20], "big"))

        shapes = {}
        for lr_path, _ in test_pairs:
            hw = _png_hw(lr_path)
            if hw not in shapes:
                shapes[hw] = cv2.imread(str(lr_path), cv2.IMREAD_GRAYSCALE)
        print(f"Warming up {len(shapes)} distinct input shape(s) x "
              f"{3 + 1} methods (compiles excluded from timings)")
        for warm in shapes.values():
            warm01 = jnp.asarray(warm.astype(np.float32) / 255.0)
            for method in ("bicubic", "bilinear", "sharp_bilinear"):
                np.asarray(upscale_with_interpolation(warm01, method))
            engine.upscale_image(preprocess_image_array(
                warm.astype(np.float32)))
    for lr_path, hr_path in test_pairs:
        hr_img = preprocess_image_array(
            cv2.imread(str(hr_path), cv2.IMREAD_GRAYSCALE).astype(np.float32))
        lr_raw = cv2.imread(str(lr_path), cv2.IMREAD_GRAYSCALE)
        lr_img01 = lr_raw.astype(np.float32) / 255.0
        lr_norm = preprocess_image_array(lr_raw.astype(np.float32))

        per_method = {}
        for method in ("bicubic", "bilinear", "sharp_bilinear"):
            t0 = time.time()
            up = np.asarray(upscale_with_interpolation(
                jnp.asarray(lr_img01), method))
            per_method[method] = (up, time.time() - t0)
        t0 = time.time()
        sr = engine.upscale_image(lr_norm)
        per_method["unet"] = (sr, time.time() - t0)

        for method, (img, dt) in per_method.items():
            m = metric_suite(jnp.asarray(img), jnp.asarray(hr_img))
            m["method"] = method
            m["time"] = dt
            m["image"] = os.path.basename(str(lr_path))
            results.append(m)
    return pd.DataFrame(results)


def qualitative_comparison(test_pairs, engine, output_dir):
    """Top-5 qualitative figures (parity: evaluate.py:110-129)."""
    import numpy as np
    import cv2
    import jax.numpy as jnp
    from mri_superresolution_tpu.evalsuite import upscale_with_interpolation
    from mri_superresolution_tpu.infer import preprocess_image_array
    from mri_superresolution_tpu.ops.metrics import metric_suite
    from mri_superresolution_tpu.utils.logging import setup_logging
    from scripts.test_comparison import visualize_results

    logger = setup_logging("evaluate.log")
    os.makedirs(output_dir, exist_ok=True)
    for i, (lr_path, hr_path) in enumerate(test_pairs[:5]):
        hr_img = preprocess_image_array(
            cv2.imread(str(hr_path), cv2.IMREAD_GRAYSCALE).astype(np.float32))
        lr_raw = cv2.imread(str(lr_path), cv2.IMREAD_GRAYSCALE)
        lr_img01 = lr_raw.astype(np.float32) / 255.0
        bicubic = np.asarray(upscale_with_interpolation(
            jnp.asarray(lr_img01), "bicubic"))
        sr = engine.upscale_image(
            preprocess_image_array(lr_raw.astype(np.float32)))
        ups = {"bicubic": bicubic, "unet": sr}
        metrics = {k: metric_suite(jnp.asarray(v), jnp.asarray(hr_img))
                   for k, v in ups.items()}
        visualize_results(hr_img, lr_img01, ups, metrics,
                          os.path.join(output_dir, f"qualitative_{i}.png"),
                          logger)


def _load_engine_for(checkpoint, base_filters, quant="none", tta=False):
    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.infer import load_engine
    return load_engine(InferConfig(
        model=ModelConfig(base_filters=base_filters),
        checkpoint_dir=os.path.dirname(str(checkpoint)) or ".",
        checkpoint_path=str(checkpoint), quant=quant, tta=tta))


def _evaluate_checkpoint(ckpt_path, test_pairs, output_dir, base_filters,
                         label, quant="none", tta=False):
    impl = report_implementation_details(ckpt_path)
    engine = _load_engine_for(ckpt_path, base_filters, quant, tta)
    df = run_benchmarks(test_pairs, engine)
    df["checkpoint"] = label
    for key, value in impl.items():
        col = str(key).replace(".", "_").replace(" ", "_")
        df[col] = str(value) if isinstance(value, (list, dict)) else value
    qualitative_comparison(test_pairs, engine,
                           os.path.join(output_dir, "qualitative", label))
    return df, impl


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--hr_dir", type=str, help="Test HR images")
    parser.add_argument("--lr_dir", type=str, help="Test LR images")
    group = parser.add_mutually_exclusive_group(required=False)
    group.add_argument("--checkpoint", type=str)
    group.add_argument("--ablation_checkpoints_dir", type=str)
    parser.add_argument("--output_dir", type=str, default="./eval_results")
    parser.add_argument("--base_filters", type=int, default=32)
    parser.add_argument("--ablation_train_configs", type=str,
                        help="JSON list of dicts with loss weights; "
                             "subprocess-trains each config")
    parser.add_argument("--device", type=str, default=None,
                        help="reference-parity alias (evaluate.py:139): "
                             "'cpu' maps to --cpu; 'cuda'/'tpu' keep the "
                             "default accelerator backend")
    parser.add_argument("--train_epochs", type=int, default=100)
    parser.add_argument("--train_batch_size", type=int, default=8)
    parser.add_argument("--train_num_workers", type=int, default=4,
                        help="reference-parity flag (evaluate.py:145); the "
                             "streaming loader sizes its prefetch from it")
    parser.add_argument("--train_learning_rate", type=float, default=1e-4)
    parser.add_argument("--train_full_res_dir", type=str,
                        default="./training_data")
    parser.add_argument("--train_low_res_dir", type=str,
                        default="./training_data_1.5T")
    parser.add_argument("--quant", type=str, choices=["none", "int8"],
                        default="none",
                        help="int8 PTQ serving for the unet column "
                             "(streaming self-calibration; timings and "
                             "metrics then reflect quantized serving)")
    parser.add_argument("--tta", action="store_true",
                        help="dihedral-ensemble serving (timings and "
                             "metrics then reflect --tta inference)")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.device and args.device.lower() == "cpu":
        args.cpu = True
    force_cpu_if_requested(sys.argv + (["--cpu"] if args.cpu else []))

    import pandas as pd
    from mri_superresolution_tpu.data import PairedSliceDataset

    os.makedirs(args.output_dir, exist_ok=True)

    # --- auto-train ablation mode (evaluate.py:149-239) ---
    if args.ablation_train_configs:
        if not args.hr_dir or not args.lr_dir:
            parser.error("--hr_dir and --lr_dir are required for "
                         "--ablation_train_configs")
        with open(args.ablation_train_configs) as f:
            ablation_configs = json.load(f)
        hw = report_hardware()
        checkpoints_dir = "./ablation_checkpoints"
        os.makedirs(checkpoints_dir, exist_ok=True)
        all_dfs, summary = [], {}
        for config in ablation_configs:
            ssim_w = config.get("ssim_weight", 0.0)
            perc_w = config.get("perceptual_weight", 0.0)
            name = f"ssim_{ssim_w}_perc_{perc_w}"
            ckpt_dir = os.path.join(checkpoints_dir, name)
            os.makedirs(ckpt_dir, exist_ok=True)
            cmd = [sys.executable,
                   os.path.join(os.path.dirname(__file__),
                                "scripts", "train.py"),
                   "--full_res_dir", args.train_full_res_dir,
                   "--low_res_dir", args.train_low_res_dir,
                   "--model_type", "unet", "--base_filters", "32",
                   "--checkpoint_dir", ckpt_dir,
                   "--epochs", str(args.train_epochs),
                   "--batch_size", str(args.train_batch_size),
                   "--learning_rate", str(args.train_learning_rate),
                   "--num_workers", str(args.train_num_workers),
                   "--ssim_weight", str(ssim_w),
                   "--perceptual_weight", str(perc_w)]
            if args.cpu:
                cmd.append("--cpu")
            print(f"\nTraining config: {name}")
            subprocess.run(cmd, check=True)
            best = os.path.join(ckpt_dir, "best_model_unet.ckpt")
            if not os.path.exists(best):
                best = os.path.join(ckpt_dir, "final_model_unet.ckpt")
            if not os.path.exists(best):
                print(f"No checkpoint found for {name}, skipping evaluation.")
                continue
            print(f"Evaluating config: {name}")
            eval_dir = os.path.join(args.output_dir, name)
            os.makedirs(eval_dir, exist_ok=True)
            ds = report_dataset_stats(args.hr_dir, args.lr_dir, eval_dir)
            impl = report_implementation_details(best)
            with open(os.path.join(eval_dir, "report.json"), "w") as f:
                json.dump({"hardware": hw, "dataset": ds,
                           "implementation": impl}, f, indent=2)
            dataset = PairedSliceDataset(args.hr_dir, args.lr_dir)
            pairs = [(m["low_res_path"], m["full_res_path"])
                     for m in dataset.metadata]
            df, impl = _evaluate_checkpoint(best, pairs, eval_dir, 32, name,
                                            quant=args.quant, tta=args.tta)
            df.to_csv(os.path.join(eval_dir, "metrics.csv"), index=False)
            all_dfs.append(df)
            summary[name] = impl
        if all_dfs:
            final = pd.concat(all_dfs, ignore_index=True)
            final.to_csv(os.path.join(args.output_dir,
                                      "metrics_ablation.csv"), index=False)
            with open(os.path.join(args.output_dir,
                                   "ablation_summary.json"), "w") as f:
                json.dump(summary, f, indent=2)
        print("\nAblation training and evaluation complete. See",
              args.output_dir)
        return

    hw = report_hardware()
    ds = report_dataset_stats(args.hr_dir, args.lr_dir, args.output_dir)
    dataset = PairedSliceDataset(args.hr_dir, args.lr_dir)
    test_pairs = [(m["low_res_path"], m["full_res_path"])
                  for m in dataset.metadata]

    if args.checkpoint:
        impl = report_implementation_details(args.checkpoint)
        with open(os.path.join(args.output_dir, "report.json"), "w") as f:
            json.dump({"hardware": hw, "dataset": ds,
                       "implementation": impl}, f, indent=2)
        print(f"Evaluating single checkpoint: {args.checkpoint}")
        df, _ = _evaluate_checkpoint(args.checkpoint, test_pairs,
                                     args.output_dir, args.base_filters,
                                     os.path.basename(args.checkpoint),
                                     quant=args.quant, tta=args.tta)
        path = os.path.join(args.output_dir, "metrics.csv")
        df.to_csv(path, index=False)
        print(f"Saved metrics to {path}")

    elif args.ablation_checkpoints_dir:
        with open(os.path.join(args.output_dir, "report_base.json"), "w") as f:
            json.dump({"hardware": hw, "dataset": ds}, f, indent=2)
        files = sorted(list(Path(args.ablation_checkpoints_dir).glob("*.ckpt"))
                       + list(Path(args.ablation_checkpoints_dir).glob("*.pth")))
        if not files:
            print(f"Error: No checkpoint files found in "
                  f"{args.ablation_checkpoints_dir}")
            sys.exit(1)
        all_dfs, summary = [], {}
        for p in files:
            print(f"\n--- Evaluating Checkpoint: {p.name} ---")
            df, impl = _evaluate_checkpoint(
                p, test_pairs, args.output_dir, 32,
                p.name.replace(".ckpt", "").replace(".pth", ""),
                quant=args.quant, tta=args.tta)
            all_dfs.append(df)
            summary[p.name] = impl
        final = pd.concat(all_dfs, ignore_index=True)
        final.to_csv(os.path.join(args.output_dir, "metrics_ablation.csv"),
                     index=False)
        with open(os.path.join(args.output_dir,
                               "ablation_summary.json"), "w") as f:
            json.dump(summary, f, indent=2)

    print("\nEvaluation complete. See", args.output_dir)


if __name__ == "__main__":
    main()
