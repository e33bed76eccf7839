#!/usr/bin/env python
"""Full-volume super-resolution: NIfTI in → 2x in-plane NIfTI out.

Our extension beyond the reference (which only does single PNGs): every
axial slice of the volume is percentile-normalized and super-resolved in one
mesh-sharded batched forward (BASELINE config 5's serving path), then the
volume is written back as NIfTI with halved in-plane voxel spacing. Slices
larger than ``--tile`` fall back to halo-tiled inference.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402

_NORM_FN = None  # lazily-built jitted normalize, shared across volumes


def _normalize_stack(stack):
    """Per-slice percentile window + minmax on device. Built ONCE and
    cached: jax.jit keys its cache on the function object, so a fresh
    lambda per volume would recompile for every volume of a directory
    batch (~20 s per repeat compile on the tunnel)."""
    global _NORM_FN
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mri_superresolution_tpu.ops.normalize import (minmax_normalize,
                                                       percentile_window)
    if _NORM_FN is None:
        _NORM_FN = jax.jit(jax.vmap(
            lambda s: minmax_normalize(percentile_window(s))))
    return np.asarray(_NORM_FN(jnp.asarray(stack)))


def _serve_one(args, engine, art, logger, input_path, output_path) -> int:
    """Serve ONE volume through the already-loaded backend (the compiled
    forwards live on the engine/artifact, so directory batches reuse
    them across volumes). Returns 0/1 like a CLI."""
    import numpy as np
    from mri_superresolution_tpu import nifti
    from mri_superresolution_tpu.config import InferConfig

    # a serve_raw ARTIFACT bakes the raw transposed contract; the host
    # path is then identical to the engine's --serve_raw path
    serve_raw = args.serve_raw or (
        art is not None and getattr(art, "normalize_inputs", False))
    transposed = serve_raw and not args.tta
    data, hdr = nifti.load(input_path, raw=serve_raw)
    if data.ndim == 4:
        logger.info("4D input: super-resolving timepoint 0")
        data = data[:, :, :, 0]
    if data.ndim != 3:
        logger.error(f"Expected a 3D volume, got {data.ndim}D")
        return 1
    h, w, n_slices = data.shape
    logger.info(f"Volume {input_path}: {h}x{w}, {n_slices} slices"
                + (f" (raw {data.dtype} served)" if serve_raw else ""))

    if transposed:
        # ZERO-copy host path: the volume's F-order (h, w, n) buffer IS a
        # C-order (n, w, h) array — data.T is already contiguous — and the
        # engine (transpose_io) swaps on DEVICE both ways, returning
        # (N, 2w, 2h) outputs that transpose back into the output volume's
        # F-order for free (measured: the host transpose was the decode
        # bottleneck, tools/bench_serve_e2e.py)
        norm = np.ascontiguousarray(data.T)   # no copy when F-contiguous
    elif serve_raw:
        norm = np.ascontiguousarray(np.transpose(data, (2, 0, 1)))
    else:
        stack = np.ascontiguousarray(np.transpose(data, (2, 0, 1)))
        norm = _normalize_stack(stack.astype(np.float32))

    outs = []
    if art is not None:
        if (h, w) not in art.shapes:
            if serve_raw:
                logger.error(
                    f"serve_raw artifact has no program for {h}x{w} and "
                    "cannot pad (zero pads would dilute the baked "
                    "device-side normalize); re-export with this exact "
                    f"shape (exported: {art.shapes})")
                return 1
            if art.mode == "tta":
                logger.error(
                    f"tta-mode artifact has no program for {h}x{w} and "
                    "cannot serve it by padding (the baked ensemble would "
                    "transform the zero margin); re-export with this "
                    f"exact shape (exported: {art.shapes})")
                return 1
            if getattr(art, "spatial", None):
                logger.error(
                    f"spatial artifact has no program for {h}x{w} and "
                    "cannot serve it by padding (H must stay % "
                    f"{8 * art.spatial['n_space']}); re-export with this "
                    f"exact shape (exported: {art.shapes})")
                return 1
            logger.warning(
                f"No exact program for {h}x{w}; slices will be zero-padded "
                "to the smallest fitting exported shape (same GroupNorm-"
                "statistics caveat as the engine's bucket padding)")
        if art.mode == "int8" and not art.routed:
            # legacy (pre-routing) int8 artifacts hold ONE program and
            # cannot apply the engine's near-empty bf16 guardrail; warn
            # when this volume actually has such slices (engine.py:345).
            # Routed artifacts carry a baked bf16 fallback per shape and
            # route per batch automatically.
            from mri_superresolution_tpu.ops.quant import (
                FOREGROUND_INTENSITY)
            frac = (np.abs(norm) > FOREGROUND_INTENSITY).mean(axis=(1, 2))
            thresh = InferConfig().quant_min_foreground
            n_empty = int((frac < thresh).sum())
            if n_empty:
                logger.warning(
                    f"{n_empty}/{n_slices} slices are <{thresh:.0%} "
                    "foreground; this legacy int8 artifact serves them "
                    "int8 (noise floor ~26 dB on near-blank slices). "
                    "Re-export (routed fallback is now built in) or "
                    "serve from the checkpoint.")
        try:
            starts = list(range(0, n_slices, args.batch_size))
            # pipelined: batch i+1 dispatches while batch i's output
            # downloads (ServingArtifact.upscale_batches)
            for s, out in zip(starts, art.upscale_batches(
                    (norm[i:i + args.batch_size] for i in starts),
                    pad=True)):
                outs.append(out)
                logger.info(f"Upscaled slices {s}..{s + len(out) - 1}")
        except ValueError as e:
            logger.error(str(e))
            return 1
        outs = [np.concatenate(outs, axis=0)]
    elif max(h, w) > args.tile:
        logger.info(f"Slice {h}x{w} exceeds tile={args.tile}; "
                    "using halo-tiled inference")
        if serve_raw:
            logger.error("--serve_raw does not support the tiled path "
                         "(per-tile normalize would differ); rerun "
                         "without it or use --spatial_shards")
            return 1
        for i in range(n_slices):
            outs.append(engine.upscale_tiled(norm[i], tile=args.tile))
    else:
        starts = list(range(0, n_slices, args.batch_size))
        # pipelined: batch i+1 computes while batch i's output downloads
        for start, out in zip(starts, engine.upscale_batches(
                norm[s:s + args.batch_size] for s in starts)):
            outs.append(out)
            logger.info(f"Upscaled slices {start}..{start + len(out) - 1}")
        outs = [np.concatenate(outs, axis=0)]
    sr = np.concatenate([o if o.ndim == 3 else o[None] for o in outs], axis=0)
    # transpose_io outputs are (n, 2w, 2h): .T is the F-contiguous
    # (2h, 2w, n) volume with no copy; standard outputs transpose normally
    sr_vol = sr.T if transposed else np.transpose(sr, (1, 2, 0))

    zooms = list(hdr.zooms) + [1.0] * 3
    out_zooms = (zooms[0] / 2.0, zooms[1] / 2.0, zooms[2])
    # integer-coded outputs carry the slope that decodes back to [0,1]
    from mri_superresolution_tpu.ops.functional import unit_slope
    slope = unit_slope(sr_vol.dtype)
    if sr_vol.dtype == np.float64:  # float32 stays a no-copy view
        sr_vol = sr_vol.astype(np.float32)
    nifti.save(output_path, sr_vol, zooms=out_zooms, scl_slope=slope)
    logger.info(f"Wrote {output_path}: {sr_vol.shape} {sr_vol.dtype} at "
                f"spacing {out_zooms}")

    if args.save_png_dir:
        import cv2
        os.makedirs(args.save_png_dir, exist_ok=True)
        base = os.path.splitext(os.path.basename(input_path))[0]
        to_u8 = {np.dtype(np.uint8): lambda s: s,
                 np.dtype(np.int16): lambda s: np.round(
                     s * (255.0 / 32767.0)).astype(np.uint8)}
        conv = to_u8.get(sr.dtype,
                         lambda s: np.clip(s * 255, 0, 255).astype(np.uint8))
        for i in range(sr.shape[0]):
            plane = sr[i].T if transposed else sr[i]
            cv2.imwrite(os.path.join(args.save_png_dir,
                                     f"{base}_s{i:03d}.png"),
                        conv(plane))
        logger.info(f"Wrote {sr.shape[0]} PNGs to {args.save_png_dir}")
    return 0


def main():
    parser = argparse.ArgumentParser(
        description="Super-resolve a whole NIfTI volume (2x in-plane)")
    parser.add_argument('--input', type=str, required=True,
                        help='Input .nii/.nii.gz volume, or a DIRECTORY: '
                             'every volume in it is served through the '
                             'one loaded backend (compiled forwards '
                             'shared), outputs written as <stem>_sr.nii* '
                             'under --output')
    parser.add_argument('--output', type=str, required=True,
                        help='Output .nii/.nii.gz volume (or output '
                             'directory when --input is a directory)')
    parser.add_argument('--checkpoint_dir', type=str, default='./checkpoints')
    parser.add_argument('--checkpoint_path', type=str, default=None)
    parser.add_argument('--artifact', type=str, default=None,
                        help='Serve from a portable AOT artifact '
                             '(tools/export_serving.py) instead of a '
                             'checkpoint — no model code loaded. Slices '
                             'with no exact exported (H, W) program are '
                             'zero-padded to the smallest fitting shape '
                             '(refused for tta-mode artifacts). '
                             'Incompatible with --quant/--spatial_shards/'
                             '--serve_raw/--out_dtype/--tta (bake those '
                             'into the artifact at export time).')
    parser.add_argument('--model_type', type=str,
                        choices=['unet', 'unet_tpu', 'edsr', 'simple'], default='unet')
    parser.add_argument('--base_filters', type=int, default=32)
    parser.add_argument('--batch_size', type=int, default=64,
                        help='Slices per forward pass')
    parser.add_argument('--tile', type=int, default=512,
                        help='Use halo-tiled inference above this slice size')
    parser.add_argument('--num_devices', type=int, default=0,
                        help='Mesh size for sharded batches (0 = all)')
    parser.add_argument('--save_png_dir', type=str, default=None,
                        help='Optionally also dump per-slice PNGs here')
    parser.add_argument('--cpu', action='store_true')
    parser.add_argument('--no_bf16', action='store_true')
    parser.add_argument('--bucket', type=int, default=1,
                        help='Pad slices to a multiple of this before the '
                             'jitted forward (1 = native size)')
    parser.add_argument('--quant', type=str, choices=['none', 'int8'],
                        default='none',
                        help='int8 PTQ serving: streaming self-calibration '
                             'over the first batches (served bf16), then '
                             'int8 (see --quant_calib_slices)')
    parser.add_argument('--quant_calib_slices', type=int, default=8,
                        help='slices of streaming calibration before int8 '
                             'serving starts (one typical volume batch '
                             'completes it)')
    parser.add_argument('--quant_calib', type=str, default=None,
                        metavar='PATH',
                        help='JSON sidecar of frozen int8 scales: loaded if '
                             'it exists (deterministic int8 from batch 0), '
                             'otherwise written after self-calibration')
    parser.add_argument('--spatial_shards', type=int, default=1,
                        help='Shard each slice\'s row axis over this many '
                             'mesh devices (halo-exchange spatial '
                             'parallelism) for slices too large per chip; '
                             'must divide the visible device count')
    parser.add_argument('--tta', action='store_true',
                        help='Test-time augmentation: average the forward '
                             'over the dihedral flips (8 transforms for '
                             'square slices, 4 otherwise)')
    parser.add_argument('--serve_raw', action='store_true',
                        help='Upload the stored voxel values (e.g. int16) '
                             'and normalize ON DEVICE inside the serving '
                             'program — 2-4x less host->device transfer '
                             'and no host percentile cost. Exact: the '
                             'percentile+minmax normalize is invariant to '
                             'the NIfTI scl_slope scaling it skips. '
                             'Not available with --quant int8.')
    parser.add_argument('--out_dtype', type=str, default='float32',
                        choices=['float32', 'int16', 'uint8'],
                        help='Output voxel coding. int16/uint8 pack '
                             'round(y*32767 / y*255) ON DEVICE (2-4x less '
                             'device->host transfer) and store the NIfTI '
                             'scl_slope that decodes back to [0,1]; '
                             'int16 adds ~90 dB quantization SNR — far '
                             'above the model PSNR. float32 = exact.')
    args = parser.parse_args()
    force_cpu_if_requested()

    from mri_superresolution_tpu.config import InferConfig, ModelConfig
    from mri_superresolution_tpu.infer import load_engine
    from mri_superresolution_tpu.utils.logging import setup_logging

    logger = setup_logging("inference.log")
    art = None
    if args.artifact:
        from mri_superresolution_tpu.infer.export import load_artifact
        art = load_artifact(args.artifact)
        # a flag whose mode IS baked into the artifact is satisfied, not
        # incompatible (mirrors infer.py's mode-aware handling)
        import numpy as _np
        bad = [name for name, on in
               (("--quant", args.quant != "none" and art.mode != "int8"),
                ("--spatial_shards", args.spatial_shards != 1
                 and (art.spatial or {}).get("n_space")
                 != args.spatial_shards),
                # satisfied (not incompatible) when the artifact bakes it
                ("--serve_raw", args.serve_raw
                 and not getattr(art, "normalize_inputs", False)),
                ("--out_dtype", args.out_dtype != "float32"
                 and _np.dtype(args.out_dtype) != art.out_dtype),
                ("--tta", args.tta and art.mode != "tta"))
               if on]
        if bad:
            logger.error(
                f"--artifact is incompatible with {', '.join(bad)}; bake "
                "those modes into the artifact at export time "
                "(tools/export_serving.py --mode tta|int8) or serve from "
                "a checkpoint")
            return 1
        ignored = [name for name, on in
                   (("--bucket", args.bucket != 1),
                    ("--num_devices", args.num_devices != 0))
                   if on]
        if ignored:
            logger.warning(f"{', '.join(ignored)} are IGNORED with "
                           "--artifact (programs run at their exported "
                           "shapes on the default device)")
        logger.info(f"Serving from artifact {args.artifact}: "
                    f"{art.model_type} mode={art.mode}, shapes "
                    f"{art.shapes} (no model code loaded)")
        engine = None
    else:
        engine = load_engine(
            InferConfig(model=ModelConfig(model_type=args.model_type,
                                          base_filters=args.base_filters),
                        checkpoint_dir=args.checkpoint_dir,
                        checkpoint_path=args.checkpoint_path,
                        bf16=not args.no_bf16, bucket=args.bucket,
                        spatial_shards=args.spatial_shards, quant=args.quant,
                        quant_calib_slices=args.quant_calib_slices,
                        quant_calib_path=args.quant_calib, tta=args.tta,
                        normalize_inputs=args.serve_raw,
                        transpose_io=args.serve_raw and not args.tta,
                        out_dtype=args.out_dtype),
            num_devices=args.num_devices)
    is_dir = os.path.isdir(args.input)
    inputs = [args.input]
    if is_dir:
        import glob
        inputs = sorted(glob.glob(os.path.join(args.input, "*.nii"))
                        + glob.glob(os.path.join(args.input, "*.nii.gz")))
        if not inputs:
            logger.error(f"No .nii/.nii.gz volumes in {args.input}")
            return 1
        try:
            os.makedirs(args.output, exist_ok=True)
        except OSError as e:
            logger.error(f"Cannot create output directory "
                         f"{args.output}: {e}")
            return 1
        logger.info(f"Batch mode: {len(inputs)} volume(s) from "
                    f"{args.input} -> {args.output}/ (one loaded backend, "
                    "compiled forwards shared across volumes)")
    failed = 0
    for ip in inputs:
        if not is_dir:
            op = args.output
        else:
            base = os.path.basename(ip)
            stem, ext = ((base[:-7], ".nii.gz") if base.endswith(".nii.gz")
                         else (os.path.splitext(base)[0], ".nii"))
            op = os.path.join(args.output, stem + "_sr" + ext)
        try:
            failed += _serve_one(args, engine, art, logger, ip, op) != 0
        except Exception as e:
            # one corrupt/unreadable volume must not abort a directory
            # batch: count it failed and keep serving the rest
            logger.error(f"{ip}: {type(e).__name__}: {e}")
            failed += 1
            if not is_dir:
                return 1
    if args.quant != "none" and engine is not None:
        logger.info(engine.quant_summary())
    if failed:
        logger.error(f"{failed}/{len(inputs)} volume(s) failed")
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
