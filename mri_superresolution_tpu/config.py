"""One typed config shared by every entry point.

The reference re-declares argparse flags per script with inconsistent
defaults (SURVEY.md §5: base_filters 32 in train vs 64 in infer, batch_size
8 vs README's 4). Here a single source of truth holds the canonical
defaults; CLIs build these dataclasses from their flags.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class ModelConfig:
    """U-Net hyperparameters (reference models/unet_model.py:116-129)."""
    model_type: str = "unet"
    in_channels: int = 1
    out_channels: int = 1
    base_filters: int = 32
    initial_alpha: float = 0.0  # percentage 0-100, normalized /100 internally
    num_blocks: int = 8         # trunk depth (edsr family only)


@dataclass
class LossConfig:
    """CombinedLoss weights (reference utils/losses.py:153-198).
    l1_weight = 1 - ssim_weight - perceptual_weight, derived."""
    ssim_weight: float = 0.3
    perceptual_weight: float = 0.0
    vgg_layer_idx: int = 35        # relu5_4 features in VGG19
    perceptual_loss_type: str = "l1"
    window_size: int = 11
    sigma: float = 1.5
    val_range: float = 1.0

    @property
    def l1_weight(self) -> float:
        return 1.0 - self.ssim_weight - self.perceptual_weight

    def validate(self) -> None:
        if not 0 <= self.ssim_weight <= 1:
            raise ValueError("ssim_weight must be between 0 and 1")
        if not 0 <= self.perceptual_weight <= 1:
            raise ValueError("perceptual_weight must be between 0 and 1")
        if self.ssim_weight + self.perceptual_weight > 1:
            raise ValueError("Sum of ssim_weight and perceptual_weight cannot exceed 1")


@dataclass
class AugmentConfig:
    """Paired augmentation defaults (reference utils/dataset.py:71-81)."""
    enabled: bool = False
    flip_prob: float = 0.5
    rotate_prob: float = 0.5
    rotate_range: Tuple[float, float] = (-5.0, 5.0)
    brightness_prob: float = 0.3
    brightness_range: Tuple[float, float] = (0.9, 1.1)
    contrast_prob: float = 0.3
    contrast_range: Tuple[float, float] = (0.9, 1.1)
    noise_prob: float = 0.2      # applied to the LR image only
    noise_std: float = 0.01


@dataclass
class TrainConfig:
    """Training loop config (reference scripts/train.py:486-548 defaults)."""
    full_res_dir: str = ""
    low_res_dir: str = ""
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    batch_size: int = 8
    epochs: int = 100
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    validation_split: float = 0.2
    split_by_subject: bool = False  # subject-level split (no leakage)
    patience: int = 10
    seed: int = 42
    checkpoint_dir: str = "./checkpoints"
    log_dir: str = "./logs"
    use_tensorboard: bool = False
    bf16: bool = True            # bfloat16 compute (TPU-native mixed precision)
    # TOTAL device pool for the mesh (0 = all visible). With
    # spatial_shards > 1 the pool splits into a (num/S data, S space) mesh,
    # so data-parallel width is num_data_devices/spatial_shards (the same
    # convention the inference engine uses; the trainer logs the mesh).
    num_data_devices: int = 0
    resume: bool = False         # resume from latest checkpoint (our extension)
    vgg_weights: Optional[str] = None  # .npz VGG19 weights for perceptual loss
    profile_dir: Optional[str] = None  # write a jax.profiler trace here
    # Data loading: "off" = decode the whole dataset up front into two
    # contiguous host arrays (fastest at demo scale), "on" = bounded-RAM
    # streaming (per-batch threaded decode + background prefetch, matching
    # the reference DataLoader's lazy semantics, scripts/train.py:215-233),
    # "auto" = stream only when the decoded dataset would exceed
    # streaming_threshold_mb.
    streaming: str = "auto"
    streaming_prefetch: int = 2        # batches decoded ahead (bounds RAM)
    streaming_threshold_mb: int = 2048
    # Shard each slice's ROW axis over this many mesh devices during
    # training (parallel/spatial.py build_spatial_loss: forward, loss AND
    # backward run under shard_map with ppermute halos + psum stats; the
    # gradient is the exact transpose). Per-device activation / VGG /
    # grad-tape memory scales 1/spatial_shards — for slices too large to
    # train on one chip. 1 = batch DP only (default). Requires model_type
    # 'unet'/'unet_tpu', LR H % (8*spatial_shards) == 0, and
    # spatial_shards | visible devices.
    spatial_shards: int = 1
    # Rematerialize the forward in the backward pass (jax.checkpoint):
    # peak training HBM drops to ~the forward's working set for one extra
    # forward's FLOPs. Identical gradients. Composes with spatial_shards.
    remat: bool = False
    # Split each optimizer step's batch into this many sequential
    # microbatches inside the jitted step (lax.scan), accumulating fp32
    # gradients — activation memory scales 1/grad_accum while the update
    # stays the full-batch one. Exact: every loss term is a weighted mean,
    # so per-microbatch gradients scaled by the microbatch weight-sum and
    # divided by the global weight-sum recombine to the full-batch gradient
    # (the only batch-nonlinear point, the SSIM clip at the batch mean
    # [reference utils/losses.py:221], is applied per microbatch — identical
    # whenever every microbatch's mean SSIM lies inside (0,1), i.e. always
    # in practice; the trainer counts saturated microbatches and logs a
    # warning if any occur; tests/test_train.py asserts equality).
    # Composes with remat and spatial_shards. 1 = off (default).
    grad_accum: int = 1
    # Exponential moving average of the weights (Polyak averaging), a
    # serving-quality capability the reference does not offer: after each
    # optimizer step ema = decay*ema + (1-decay)*params (fp32, initialized
    # to the initial params so no bias correction is needed). When > 0:
    # validation, best-model selection, and the checkpointed serving params
    # all use the EMA weights (the live weights are stored alongside under
    # "raw_params" so --resume restores the exact optimizer trajectory).
    # 0 = off (default). Typical values 0.99-0.999; match the horizon
    # ~1/(1-decay) steps to the run length. Composes with every other
    # trainer feature (grad_accum applies EMA once per optimizer step).
    ema_decay: float = 0.0
    # ZeRO-1-style optimizer-state sharding (parallel/mesh.zero1_shardings):
    # Adam's m/v moments are STORED sharded over the data axis (largest
    # divisible axis per leaf) instead of replicated — per-device optimizer
    # memory scales ~1/n_data for the cost of an update all-gather over
    # ICI. Values are unchanged (the Adam update is elementwise); GSPMD
    # inserts the collectives from the declared in/out shardings. Composes
    # with every other trainer feature. Off by default (a ~2M-param model
    # doesn't need it; it exists for the framework's scaling story and for
    # large custom models).
    opt_shard: bool = False
    # Quantization-aware training for the int8 serving path: the forward
    # simulates models/quant_forward.py's exact int8 arithmetic in float
    # (per-input-channel activation scales folded into per-output-channel
    # weight quantization) with straight-through gradients, so the weights
    # learn to absorb the quantization noise post-training quantization
    # merely suffers (PTQ measured -0.64/-0.75 dB PSNR, RESULTS.md 2b).
    # Per-site per-channel activation ranges are tracked as an EMA of each
    # batch's abs-max (decay qat_decay below), validated/early-stopped on
    # the QUANTIZED forward, checkpointed for exact resume, and exported as
    # a frozen calibration sidecar (<checkpoint>.calib.json) — serve with
    # --quant int8 --quant_calib <sidecar>. Supports every int8 serving
    # family (models/quant_forward.supported_types()); composes with
    # grad_accum/ema/opt_shard AND spatial_shards (the row-sharded
    # fake-quant forward lives in parallel/spatial.py: same site set,
    # batch statistics pmax'd over both mesh axes).
    # The reference has no quantized training (fp16 autocast only,
    # scripts/train.py:158-163).
    qat: bool = False
    qat_decay: float = 0.98    # amax EMA decay (horizon ~1/(1-d) steps)
    # Step-granular (mid-epoch) checkpointing for preemption-safe training
    # (SURVEY.md §5 "deterministic data order for restart"): every N
    # optimizer steps write step_model_<type>.ckpt carrying the epoch's
    # batch cursor; --resume restarts INSIDE the interrupted epoch at the
    # exact next batch — the loader order is (seed, epoch)-deterministic
    # and augmentation keys are derived from (seed, epoch, batch), so the
    # resumed trajectory is bit-identical to the uninterrupted one
    # (tests/test_train.py kill-and-resume). Each save fetches the full
    # train state to the host (~1 s over the TPU tunnel) — size N to your
    # preemption risk. 0 = epoch-granular only (default).
    save_every_steps: int = 0


@dataclass
class ExtractConfig:
    """Paired-slice extraction config
    (reference scripts/extract_paired_slices.py:98-122 defaults)."""
    datasets_dir: str = "./datasets"
    hr_output_dir: str = "./training_data"
    lr_output_dir: str = "./training_data_1.5T"
    n_slices: int = 10
    lower_percent: float = 0.2
    upper_percent: float = 0.8
    target_size: Tuple[int, int] = (256, 256)  # (width, height)
    noise_std: float = 5.0
    kspace_crop_factor: float = 0.5
    seed: int = 0


@dataclass
class InferConfig:
    """Inference config (reference scripts/infer.py:452-486)."""
    model: ModelConfig = field(default_factory=ModelConfig)
    checkpoint_dir: str = "./checkpoints"
    checkpoint_path: Optional[str] = None
    bf16: bool = True
    batch_size: int = 8          # for batched/full-volume inference
    # Spatial shape bucket: inputs are zero-padded to a multiple of this
    # before the jitted forward. 1 = native sizes (GroupNorm-exact, default;
    # matches the reference); larger values trade slight padding distortion
    # for far fewer XLA recompiles on heterogeneous-size test sets (each new
    # shape costs minutes through the TPU tunnel — the engine logs each one).
    bucket: int = 1
    # Shard each slice's ROW axis over this many mesh devices
    # (parallel/spatial.py: ppermute halos + psum GroupNorm stats) instead
    # of replicating the whole slice per device. 1 = batch DP only. Use for
    # slices too large for one chip; requires model_type 'unet'/'unet_tpu' and
    # spatial_shards | visible devices.
    spatial_shards: int = 1
    # "int8" enables post-training-quantized serving (ops/quant.py): conv
    # weights per-output-channel int8 with per-INPUT-channel activation
    # scales folded in, self-calibrated on the first served slices.
    # Measured 1.78-2.02x per conv on v5e (tools/bench_int8_probe.py);
    # end-to-end numbers + quality deltas in RESULTS.md 2b. "none" = bf16.
    quant: str = "none"
    # Streaming self-calibration length in SLICES: content-rich batches
    # run at full bf16 precision while per-site activation statistics
    # accumulate, until this many real slices have been seen; int8 serving
    # starts with the batch that completes calibration. One typical volume
    # batch (>= 8 slices) completes it immediately.
    quant_calib_slices: int = 8
    # Quality guardrail: batches whose mean foreground fraction (pixels with
    # |x| > 0.05) falls below this route to the exact bf16 path instead of
    # int8. Near-empty slices are where the int8 noise floor (~26 dB PSNR,
    # measured) dominates — and they are also the cheapest to serve at full
    # precision. 0 disables routing.
    quant_min_foreground: float = 0.05
    # Path to a JSON sidecar of frozen int8 calibration scales. If the file
    # exists it is loaded (int8 from batch 0, byte-deterministic across
    # processes); otherwise the streaming self-calibration runs and saves
    # its frozen scales here for later runs. None = in-process only.
    quant_calib_path: Optional[str] = None
    # Test-time augmentation: average the forward over the dihedral flips
    # (8 transforms for square inputs, 4 otherwise) — a quality/compute
    # trade the reference does not offer (measured delta in RESULTS.md).
    # Shape-preserving, so one compiled program serves all transforms.
    tta: bool = False
    # Serving-transfer controls (host link is the volume-serving long pole;
    # tools/bench_serve_e2e.py): normalize RAW uint8/uint16/int16 inputs on
    # device (upload 1-2 bytes/pixel instead of fp32's 4), and/or pack
    # outputs to uint8/int16 on device before the fetch. float32 output =
    # exact legacy behavior.
    normalize_inputs: bool = False
    out_dtype: str = "float32"
    # Zero-copy volume layout: batches arrive (N, w, h) — the free C-view
    # of a NIfTI F-order buffer — and outputs return (N, 2w, 2h); both
    # swaps run on device. Requires normalize_inputs; infer_volume's
    # --serve_raw sets it automatically.
    transpose_io: bool = False


def to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg) -> str:
    return json.dumps(to_dict(cfg), indent=2, sort_keys=True)


def _build(cls, data: dict):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            continue
        ftype = fields[k].type
        if isinstance(v, dict) and "Config" in str(ftype):
            sub = {"model": ModelConfig, "loss": LossConfig,
                   "augment": AugmentConfig}.get(k)
            kwargs[k] = _build(sub, v) if sub else v
        elif isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def train_config_from_dict(data: dict) -> TrainConfig:
    return _build(TrainConfig, data)


def model_config_from_dict(data: dict) -> ModelConfig:
    return _build(ModelConfig, data)
