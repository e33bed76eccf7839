#!/usr/bin/env python
"""Train the MRI super-resolution model (TPU data-parallel).

CLI parity with the reference trainer (scripts/train.py:486-548 flags),
with TPU-native replacements: --use_amp maps to bfloat16 compute (on by
default; --no_bf16 disables), --num_devices sizes the data mesh, --resume
restores the full train state (a capability the reference lacks), and
--num_workers is accepted for compatibility (data loading is in-memory +
on-device here, no worker processes).
"""

import argparse
import random
import sys

sys.path.insert(0, __import__("os").path.abspath(
    __import__("os").path.join(__import__("os").path.dirname(__file__), "..")))

from scripts._bootstrap import force_cpu_if_requested  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(
        description="Train MRI quality enhancement model")
    parser.add_argument('--full_res_dir', type=str, required=True,
                        help='Directory containing high-quality MRI slices')
    parser.add_argument('--low_res_dir', type=str, required=True,
                        help='Directory containing low-quality MRI slices')
    parser.add_argument('--model_type', type=str, choices=['unet', 'unet_tpu', 'edsr', 'simple'],
                        default='unet')
    parser.add_argument('--base_filters', type=int, default=32)
    parser.add_argument('--num_blocks', type=int, default=8,
                        help='edsr only: residual trunk depth (checkpoints '
                             'carry it, so serving needs no flag)')
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--epochs', type=int, default=100)
    parser.add_argument('--learning_rate', type=float, default=1e-4)
    parser.add_argument('--weight_decay', type=float, default=1e-5)
    parser.add_argument('--ssim_weight', type=float, default=0.3)
    parser.add_argument('--perceptual_weight', type=float, default=0.0)
    parser.add_argument('--vgg_layer_idx', type=int, default=35)
    parser.add_argument('--perceptual_loss_type', type=str, default='l1',
                        choices=['l1', 'l2', 'mse'])
    parser.add_argument('--initial_alpha', type=float, default=0.0)
    parser.add_argument('--validation_split', type=float, default=0.2)
    parser.add_argument('--split_by_subject', action='store_true',
                        help='Split train/val at the subject level '
                             '(no subject leakage; our extension)')
    parser.add_argument('--patience', type=int, default=10)
    parser.add_argument('--num_workers', type=int, default=0,
                        help='Accepted for reference compatibility; the '
                             'streaming loader sizes its own decode pool')
    parser.add_argument('--streaming', type=str, default='auto',
                        choices=['auto', 'on', 'off'],
                        help='Data loading: off = decode all pairs up front '
                             '(fastest, small datasets); on = bounded-RAM '
                             'per-batch decode with prefetch (reference '
                             'DataLoader semantics); auto = stream when the '
                             'decoded dataset exceeds --streaming_threshold_mb')
    parser.add_argument('--streaming_prefetch', type=int, default=2,
                        help='Batches decoded ahead in streaming mode')
    parser.add_argument('--remat', action='store_true',
                        help='Rematerialize the forward in the backward '
                             '(jax.checkpoint): peak training memory drops '
                             'to ~one forward for one extra forward of '
                             'FLOPs; identical gradients. Composes with '
                             '--spatial_shards')
    parser.add_argument('--spatial_shards', type=int, default=1,
                        help='Shard slice ROWS over this many devices during '
                             'training (shard_map halo forward/backward; for '
                             'slices too large per chip). Requires '
                             'unet/unet_tpu, LR H %% (8*shards) == 0, and '
                             'shards | devices. 1 = batch DP only')
    parser.add_argument('--grad_accum', type=int, default=1,
                        help='Split each batch into this many sequential '
                             'microbatches inside the jitted step, '
                             'accumulating fp32 gradients (lax.scan): '
                             'activation memory scales 1/N while the '
                             'optimizer update stays the exact full-batch '
                             'one (weighted-mean losses recombine exactly; '
                             'the only inexact edge — a microbatch '
                             'saturating the SSIM clip — is detected and '
                             'logged). Composes with --remat and '
                             '--spatial_shards')
    parser.add_argument('--opt_shard', action='store_true',
                        help='ZeRO-1-style optimizer-state sharding: store '
                             "Adam's m/v moments sharded over the data "
                             'axis (~1/n_devices per-device optimizer '
                             'memory; GSPMD all-gathers the update). '
                             'Values unchanged — placement only')
    parser.add_argument('--ema_decay', type=float, default=0.0,
                        help='Exponential moving average of the weights '
                             '(Polyak): ema = d*ema + (1-d)*params after '
                             'each optimizer step. Validation, best-model '
                             'selection, and the checkpointed serving '
                             'params use the averaged weights (live '
                             'weights kept alongside for --resume). '
                             '0 = off; typical 0.99-0.999 (horizon '
                             '~1/(1-d) steps)')
    parser.add_argument('--qat', action='store_true',
                        help='Quantization-aware training for the int8 '
                             'serving path: the forward simulates the '
                             'exact int8 serving arithmetic in float with '
                             'straight-through gradients, so the weights '
                             'learn to absorb the quantization noise PTQ '
                             'merely suffers. Validation scores the '
                             'quantized forward; checkpoints export a '
                             'frozen calibration sidecar '
                             '(<checkpoint>.calib.json) — serve with '
                             '--quant int8 --quant_calib <sidecar>. '
                             'Composes with --spatial_shards (row-sharded '
                             'fake-quant forward)')
    parser.add_argument('--qat_decay', type=float, default=0.98,
                        help='EMA decay of the QAT running per-channel '
                             'activation ranges (horizon ~1/(1-d) steps)')
    parser.add_argument('--save_every_steps', type=int, default=0,
                        help='Mid-epoch checkpoint cadence for '
                             'preemption-safe training: every N optimizer '
                             'steps write step_model_<type>.ckpt with the '
                             'batch cursor; --resume restarts inside the '
                             'interrupted epoch bit-identically '
                             '(deterministic loader order + per-(epoch,'
                             'batch) augmentation keys). 0 = off')
    parser.add_argument('--multihost', action='store_true',
                        help='Multi-host data-parallel training: one '
                             'process per host, connected via '
                             'jax.distributed so the data mesh spans every '
                             "host's devices (gradient psums ride ICI). "
                             'With no further flags, TPU-pod auto-detection '
                             'configures the cluster; on generic clusters '
                             'pass --coordinator/--num_processes/'
                             '--process_id. Process 0 owns checkpoints, '
                             'logs, and the stdout protocol')
    parser.add_argument('--coordinator', type=str, default=None,
                        help='host:port of process 0 (multihost; omit on '
                             'TPU pods for auto-detection)')
    parser.add_argument('--num_processes', type=int, default=None,
                        help='total process count (multihost; omit on TPU '
                             'pods)')
    parser.add_argument('--process_id', type=int, default=None,
                        help='this process\'s rank (multihost; omit on TPU '
                             'pods)')
    parser.add_argument('--streaming_threshold_mb', type=int, default=2048,
                        help='auto mode streams past this decoded size')
    parser.add_argument('--seed', type=int, default=random.randint(1, 10000))
    parser.add_argument('--augmentation', action='store_true')
    parser.add_argument('--use_tensorboard', action='store_true')
    parser.add_argument('--use_amp', action='store_true',
                        help='Reference-compat alias: bf16 is already the '
                             'default on TPU')
    parser.add_argument('--no_bf16', action='store_true',
                        help='Disable bfloat16 compute (fp32 everywhere)')
    parser.add_argument('--cpu', action='store_true',
                        help='Force CPU backend')
    parser.add_argument('--num_devices', type=int, default=0,
                        help='TOTAL device pool for the mesh (0 = all '
                             'visible). With --spatial_shards S the pool is '
                             'split (num_devices/S data) x (S space), so '
                             'the DATA-parallel width is num_devices/S — '
                             'the startup log prints the resulting mesh')
    parser.add_argument('--resume', action='store_true',
                        help='Resume from the final checkpoint if present')
    parser.add_argument('--vgg_weights', type=str, default=None,
                        help='.npz VGG19 weights for the perceptual loss')
    parser.add_argument('--profile_dir', type=str, default=None,
                        help='Write a jax.profiler trace of one epoch here')
    parser.add_argument('--checkpoint_dir', type=str, default='./checkpoints')
    parser.add_argument('--log_dir', type=str, default='./logs')
    return parser.parse_args()


def main():
    args = parse_args()
    if args.multihost:
        # ordering: platform selection → distributed init → backend
        # watchdog (the first backend touch must see the global cluster)
        from scripts._bootstrap import (fail_fast_on_dead_backend,
                                        select_platform)
        select_platform()
        from mri_superresolution_tpu.parallel import multihost
        multihost.initialize(args.coordinator, args.num_processes,
                             args.process_id)
        fail_fast_on_dead_backend()
    else:
        force_cpu_if_requested()

    from mri_superresolution_tpu.config import (AugmentConfig, LossConfig,
                                                ModelConfig, TrainConfig)
    from mri_superresolution_tpu.train import train

    cfg = TrainConfig(
        full_res_dir=args.full_res_dir,
        low_res_dir=args.low_res_dir,
        model=ModelConfig(model_type=args.model_type,
                          base_filters=args.base_filters,
                          num_blocks=args.num_blocks,
                          initial_alpha=args.initial_alpha),
        loss=LossConfig(ssim_weight=args.ssim_weight,
                        perceptual_weight=args.perceptual_weight,
                        vgg_layer_idx=args.vgg_layer_idx,
                        perceptual_loss_type=args.perceptual_loss_type),
        augment=AugmentConfig(enabled=args.augmentation),
        batch_size=args.batch_size,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        validation_split=args.validation_split,
        split_by_subject=args.split_by_subject,
        patience=args.patience,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        log_dir=args.log_dir,
        use_tensorboard=args.use_tensorboard,
        bf16=not args.no_bf16,
        num_data_devices=args.num_devices,
        resume=args.resume,
        vgg_weights=args.vgg_weights,
        profile_dir=args.profile_dir,
        streaming=args.streaming,
        streaming_prefetch=args.streaming_prefetch,
        streaming_threshold_mb=args.streaming_threshold_mb,
        spatial_shards=args.spatial_shards,
        remat=args.remat,
        grad_accum=args.grad_accum,
        ema_decay=args.ema_decay,
        opt_shard=args.opt_shard,
        qat=args.qat,
        qat_decay=args.qat_decay,
        save_every_steps=args.save_every_steps,
    )
    train(cfg)


if __name__ == '__main__':
    main()
