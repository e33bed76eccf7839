#!/usr/bin/env python
"""Single-image super-resolution inference.

CLI parity with the reference (scripts/infer.py:452-486 flags). Checkpoints
carry their hyperparams, so --base_filters is only a fallback for bare
weight files (the reference's default-mismatch footgun — 32 in train vs 64
in infer — is thereby defused).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(
        description="MRI quality enhancement inference")
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--target', type=str, default=None)
    parser.add_argument('--checkpoint_dir', type=str, default='./checkpoints')
    parser.add_argument('--checkpoint_path', type=str, default=None)
    parser.add_argument('--model_type', type=str, choices=['unet', 'unet_tpu', 'edsr', 'simple'],
                        default='unet')
    parser.add_argument('--base_filters', type=int, default=64)
    parser.add_argument('--show_comparison', action='store_true')
    parser.add_argument('--show_diff', action='store_true')
    parser.add_argument('--save_figure', type=str, default=None,
                        help='Write the comparison/diff figure to this path '
                             '(headless equivalent of plt.show())')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--use_amp', action='store_true',
                        help='Reference-compat alias: bf16 is the default')
    parser.add_argument('--no_bf16', action='store_true')
    parser.add_argument('--bucket', type=int, default=1,
                        help='Pad inputs to a multiple of this before the '
                             'jitted forward (1 = native size, GroupNorm-'
                             'exact; >1 coalesces XLA recompiles)')
    parser.add_argument('--quant', type=str, choices=['none', 'int8'],
                        default='none',
                        help='int8 PTQ serving: per-channel scales self-'
                             'calibrated on this image, then the int8 '
                             'forward produces the output')
    parser.add_argument('--quant_calib_slices', type=int, default=1,
                        help='slices of streaming calibration before int8 '
                             'serving starts (single-image default: 1, so '
                             'the output IS int8-served)')
    parser.add_argument('--quant_calib', type=str, default=None,
                        metavar='PATH',
                        help='JSON sidecar of frozen int8 scales: loaded if '
                             'it exists (deterministic int8 from batch 0), '
                             'otherwise written after self-calibration')
    parser.add_argument('--tta', action='store_true',
                        help='Test-time augmentation: average the forward '
                             'over the dihedral flips (8 transforms for '
                             'square inputs, 4 otherwise) — higher quality '
                             'for n_transforms x the compute (RESULTS.md)')
    parser.add_argument('--artifact', type=str, default=None,
                        help='Serve from a portable AOT artifact '
                             '(tools/export_serving.py) instead of a '
                             'checkpoint: weights + StableHLO program in '
                             'one file, no model code needed. Input size '
                             'must be among the exported shapes.')
    return parser.parse_args()


def main():
    args = parse_args()
    force_cpu_if_requested()

    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.infer import load_engine
    from mri_superresolution_tpu.utils.logging import setup_logging

    logger = setup_logging("inference.log")
    try:
        if args.artifact:
            from mri_superresolution_tpu.infer.export import load_artifact
            engine = load_artifact(args.artifact)
            ignored = [name for name, on in
                       (("--tta", args.tta and engine.mode != "tta"),
                        ("--quant", args.quant != "none"
                         and engine.mode != "int8"),
                        ("--bucket", args.bucket != 1))
                       if on]
            if ignored:
                logger.warning(
                    f"--artifact serves its exported program "
                    f"(mode={engine.mode}); {', '.join(ignored)} are "
                    "IGNORED — export a dedicated artifact "
                    "(tools/export_serving.py --mode tta|int8) or serve "
                    "from a checkpoint for those modes")
            logger.info(f"Serving from artifact {args.artifact}: "
                        f"{engine.model_type} mode={engine.mode}, shapes "
                        f"{engine.shapes} (no model code loaded)")
        else:
            cfg = InferConfig(
                model=ModelConfig(model_type=args.model_type,
                                  base_filters=args.base_filters),
                checkpoint_dir=args.checkpoint_dir,
                checkpoint_path=args.checkpoint_path,
                bf16=not args.no_bf16, bucket=args.bucket,
                quant=args.quant,
                quant_calib_slices=args.quant_calib_slices,
                quant_calib_path=args.quant_calib, tta=args.tta)
            engine = load_engine(cfg)
        fig_path = args.save_figure
        if (args.show_comparison or args.show_diff) and not fig_path:
            fig_path = os.path.splitext(args.output)[0] + "_comparison.png"
        engine.process_single_image(
            input_path=args.input,
            output_path=args.output,
            target_path=args.target,
            show_comparison=args.show_comparison,
            show_diff=args.show_diff,
            save_figures_to=fig_path)
        logger.info("Inference completed successfully!")
        return 0
    except Exception as e:
        logger.error(f"Error during inference: {e}")
        return 1


if __name__ == '__main__':
    sys.exit(main())
