"""Data-parallel trainer: jitted bf16 train/eval steps over a device mesh.

Reference behavior reproduced (scripts/train.py:142-484): Adam(lr 1e-4, wd
1e-5 as L2-in-Adam), ReduceLROnPlateau(factor .5, patience patience//2),
seeded train/val split, per-batch SSIM metric, JSON-line progress protocol,
best/final checkpointing, early stopping, optional TensorBoard, periodic
sample grids.

TPU-first design:
- one jitted ``train_step`` over a 1-D data mesh: batch sharded on
  ``('data',)``, params replicated, gradients globally reduced by GSPMD over
  ICI — no hand-written collectives,
- bfloat16 compute with fp32 master params (no GradScaler needed — bf16 has
  fp32's exponent range, unlike the reference's CUDA fp16 AMP at
  scripts/train.py:158-163),
- augmentation runs inside the step on device (ops/augment.py),
- the train state is donated every step (no HBM copies),
- the learning rate enters as a device scalar so plateau reductions never
  recompile,
- partial final batches are padded + masked (static shapes, exact losses).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from mri_superresolution_tpu.config import TrainConfig, to_dict
from mri_superresolution_tpu.data import (BatchLoader, PairedSliceDataset,
                                          StreamingBatchLoader,
                                          subject_split, train_val_split)
from mri_superresolution_tpu.losses import CombinedLoss
from mri_superresolution_tpu.models import build_model
from mri_superresolution_tpu.models import vgg as vgg_mod
from mri_superresolution_tpu.ops.augment import augment_pair
from mri_superresolution_tpu.ops.ssim import ssim
from mri_superresolution_tpu.parallel import (build_spatial_loss,
                                              data_sharding, make_mesh,
                                              make_spatial_mesh,
                                              replicated_sharding,
                                              zero1_shardings)
from mri_superresolution_tpu.train import checkpoint as ckpt
from mri_superresolution_tpu.train.plateau import (EarlyStopping,
                                                   ReduceLROnPlateau)
from mri_superresolution_tpu.utils.logging import log_message, setup_logging


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    # Polyak EMA of params (None when ema_decay == 0 — an empty pytree
    # subtree, so checkpoints and shardings of EMA-free runs are unchanged)
    ema_params: Any = None
    # QAT running per-site per-channel |activation| maxima (None when
    # cfg.qat is off): {site: (Cin,) fp32}, EMA-updated each step from the
    # batch statistic the fakequant forward records, persisted in
    # checkpoint extras and exported as the int8 serving calibration
    # sidecar (models/quant_forward.save_scales format)
    qat_amax: Any = None


def make_optimizer(weight_decay: float) -> optax.GradientTransformation:
    """torch-style Adam: L2 (wd·θ added to the gradient *before* the moment
    estimates — torch.optim.Adam semantics, scripts/train.py:186) followed by
    Adam scaling. The lr is applied separately in the step."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def _make_train_step(compute_loss, optimizer, augment_cfg,
                     grad_accum: int = 1, ema_decay: float = 0.0,
                     qat_decay: float = 0.0) -> Any:
    """Shared train-step skeleton (augment → value_and_grad → torch-style
    Adam update). ``compute_loss(params, qat_amax, hr, lo, w) ->
    (total, comps)`` with ``comps["ssim_metric"]`` present (``qat_amax`` is
    None and ignored on non-QAT paths; QAT closures must also return the
    batch statistic under ``comps["qat_batch_amax"]`` — foreground-only,
    zeros when no sample qualifies — plus the ``comps["qat_any_fg"]``
    flag that gates the EMA update); the DP and spatially-sharded
    builders differ only in this closure.

    ``grad_accum > 1`` scans ``compute_loss``'s value_and_grad over that
    many sequential microbatches, accumulating fp32 gradients — activation
    memory scales 1/grad_accum. The recombination is EXACT: every loss term
    is a weighted mean num/den over the batch (den = Σ sample weights, which
    carries no gradient), so scaling each microbatch's gradient by its own
    den_i and dividing the sum by the global den reproduces the full-batch
    gradient bit-for-reassociation. Augmentation runs on the full batch
    BEFORE the split, so the randomness is identical to grad_accum=1."""

    def _accumulate(params, qat_amax, hr, lo, w):
        a = grad_accum
        split = lambda t: t.reshape(a, t.shape[0] // a, *t.shape[1:])
        vg = jax.value_and_grad(compute_loss, has_aux=True)
        g0 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        zero = jnp.zeros((), jnp.float32)
        # QAT batch amax recombines exactly: max over microbatch maxima ==
        # full-batch max over foreground samples (every microbatch
        # quantizes with the SAME running amax from step start, so gradient
        # exactness is unaffected; background microbatches contribute exact
        # zeros — a neutral element — and the foreground flags OR together,
        # so the recombined statistic equals the grad_accum=1 one)
        amax0 = (jax.tree_util.tree_map(jnp.zeros_like, qat_amax)
                 if qat_amax is not None else ())
        fg0 = jnp.zeros((), jnp.bool_)

        def body(carry, xs):
            g_acc, num_loss, num_ssim, n_sat, amax_acc, fg_acc = carry
            hr_i, lo_i, w_i = xs
            (loss_i, comps_i), g_i = vg(params, qat_amax, hr_i, lo_i, w_i)
            if qat_amax is not None:
                amax_acc = jax.tree_util.tree_map(
                    jnp.maximum, amax_acc, comps_i["qat_batch_amax"])
                fg_acc = fg_acc | comps_i["qat_any_fg"]
            den_i = jnp.sum(w_i.astype(jnp.float32))
            ssim_i = comps_i["ssim_metric"]
            # the SSIM batch-mean clip (losses/combined.py:81) is the one
            # batch-nonlinear point: count microbatches that saturate it
            # (trainer warns — there the accumulated gradient follows the
            # per-microbatch clip, not the exact full-batch one)
            sat_i = ((den_i > 0) &
                     ((ssim_i <= 0.0) | (ssim_i >= 1.0))).astype(jnp.float32)
            g_acc = jax.tree_util.tree_map(
                lambda acc, g: acc + den_i * g.astype(jnp.float32),
                g_acc, g_i)
            return (g_acc, num_loss + den_i * loss_i,
                    num_ssim + den_i * ssim_i, n_sat + sat_i, amax_acc,
                    fg_acc), None

        (g_acc, num_loss, num_ssim, n_sat, amax_acc, fg_acc), _ = \
            jax.lax.scan(body, (g0, zero, zero, zero, amax0, fg0),
                         (split(hr), split(lo), split(w)))
        den = jnp.maximum(jnp.sum(w.astype(jnp.float32)), 1e-12)
        grads = jax.tree_util.tree_map(
            lambda g, p: (g / den).astype(p.dtype), g_acc, params)
        comps = {"ssim_metric": num_ssim / den, "ssim_clip_micros": n_sat}
        if qat_amax is not None:
            comps["qat_batch_amax"] = amax_acc
            comps["qat_any_fg"] = fg_acc
        return num_loss / den, comps, grads

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   lr: jnp.ndarray, key: jax.Array):
        hr, lo, w = batch["hr"], batch["lr"], batch["weight"]
        if augment_cfg is not None and augment_cfg.enabled:
            hr, lo = augment_pair(hr, lo, key, augment_cfg)

        if grad_accum > 1:
            loss, comps, grads = _accumulate(state.params, state.qat_amax,
                                             hr, lo, w)
        else:
            (loss, comps), grads = jax.value_and_grad(
                lambda p: compute_loss(p, state.qat_amax, hr, lo, w),
                has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema_decay > 0.0:
            # Polyak average in the params' own dtype (fp32 masters). EMA is
            # initialized to the initial params, so no bias correction term.
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema, params)
        qat_amax = state.qat_amax
        if qat_amax is not None:
            # EMA of the batch abs-max (standard moving-range observer):
            # tracks the activation distribution as the weights move, while
            # smoothing over batch-to-batch outliers. Gated on the batch
            # containing ANY foreground sample: background batches record
            # zeros (a neutral max element for grad_accum recombination),
            # and decaying the range toward those zeros would be wrong —
            # the update must be an exact no-op instead.
            any_fg = comps["qat_any_fg"]
            qat_amax = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    any_fg,
                    qat_decay * a + (1.0 - qat_decay) * b.astype(a.dtype),
                    a),
                qat_amax, comps["qat_batch_amax"])
        metrics = {"loss": loss, "ssim": comps["ssim_metric"]}
        if "ssim_clip_micros" in comps:
            metrics["ssim_clip_micros"] = comps["ssim_clip_micros"]
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema,
                          qat_amax=qat_amax), metrics

    return train_step


def build_train_step(model, loss_fn: CombinedLoss, optimizer,
                     augment_cfg, ssim_cfg, remat: bool = False,
                     grad_accum: int = 1, ema_decay: float = 0.0,
                     qat_fwd=None, qat_decay: float = 0.0) -> Any:
    """Returns train_step(state, batch, lr, key) → (state, metrics).

    Model-side rematerialization lives in the MODEL itself
    (build_model(..., remat=True): per-block flax.linen.remat); ``remat``
    here additionally checkpoints the LOSS graph, so the backward holds
    only the model output instead of the SSIM blur tape. A single
    whole-forward jax.checkpoint was measured a no-op for peak memory
    (tools/bench_remat_mem.py) — segmentation is what saves.

    ``qat_fwd`` (models/quant_forward.build_fakequant_forward) replaces the
    flax forward with the int8-serving fake-quant simulation; the state's
    running amax feeds the quantizers and is EMA-updated with ``qat_decay``
    from each batch's recorded statistic. Note: under QAT the forward is
    the functional one, so model-side flax remat does not apply (the
    loss-graph checkpoint above still does)."""

    def loss_call(out, hr, w):
        total, comps = loss_fn(out, hr, sample_weights=w)
        if "ssim_metric" not in comps:   # ssim_weight == 0: metric only
            comps = dict(comps, ssim_metric=ssim(
                out, hr, ssim_cfg.window_size, ssim_cfg.sigma,
                ssim_cfg.val_range, sample_weights=w))
        return total, comps

    if remat:
        loss_call = jax.checkpoint(loss_call)

    def compute_loss(params, qat_amax, hr, lo, w):
        if qat_fwd is not None:
            out, batch_amax, any_fg = qat_fwd(params, qat_amax, lo)
            total, comps = loss_call(out, hr, w)
            return total, dict(comps, qat_batch_amax=batch_amax,
                               qat_any_fg=any_fg)
        out = model.apply({"params": params}, lo)
        return loss_call(out, hr, w)

    return _make_train_step(compute_loss, optimizer, augment_cfg,
                            grad_accum=grad_accum, ema_decay=ema_decay,
                            qat_decay=qat_decay)


def build_eval_step(model, loss_fn: CombinedLoss, ssim_cfg,
                    qat_fwd=None) -> Any:
    """With ``qat_fwd``, ``params`` is the pair (params, qat_amax) and
    validation scores the fake-quant forward — the serving-relevant metric
    under QAT (plateau LR, early stopping and best-model selection then
    track int8-serving quality, not bf16 quality)."""
    def eval_step(params, batch):
        hr, lo, w = batch["hr"], batch["lr"], batch["weight"]
        if qat_fwd is not None:
            params, qat_amax = params
            out, _, _ = qat_fwd(params, qat_amax, lo)
        else:
            out = model.apply({"params": params}, lo)
        total, comps = loss_fn(out, hr, sample_weights=w)
        ssim_metric = comps.get(
            "ssim_metric",
            ssim(out, hr, ssim_cfg.window_size, ssim_cfg.sigma,
                 ssim_cfg.val_range, sample_weights=w))
        return {"loss": total, "ssim": ssim_metric}, out

    return eval_step


def build_spatial_train_step(sharded_loss, optimizer, augment_cfg,
                             grad_accum: int = 1,
                             ema_decay: float = 0.0,
                             qat: bool = False,
                             qat_decay: float = 0.0) -> Any:
    """Spatially-sharded (SP) train step: same (state, batch, lr, key) →
    (state, metrics) contract as build_train_step, but the forward, loss
    and backward all run row-sharded under shard_map
    (parallel/spatial.build_spatial_loss) — per-device activation, VGG and
    gradient-tape memory scale 1/n_space. Augmentation runs under plain
    GSPMD before the shard_map (it rotates whole images, so it is not
    shard-local; the input batch is small).

    ``qat=True`` requires ``sharded_loss`` built with ``qat_sites``
    (its signature then takes qat_amax and its comps carry the QAT
    batch-statistic contract — already pmax'd over both mesh axes, so the
    shared skeleton's EMA update sees exactly the dense statistic)."""

    def compute_loss(params, qat_amax, hr, lo, w):
        if qat:
            total, comps, _ = sharded_loss(params, qat_amax, hr, lo, w)
        else:
            total, comps, _ = sharded_loss(params, hr, lo, w)
        return total, comps

    return _make_train_step(compute_loss, optimizer, augment_cfg,
                            grad_accum=grad_accum, ema_decay=ema_decay,
                            qat_decay=qat_decay)


def build_spatial_eval_step(sharded_loss, qat: bool = False) -> Any:
    """With ``qat``, ``params`` is the (params, qat_amax) pair and
    validation scores the row-sharded fake-quant forward (same
    serving-relevant metric as the dense QAT eval step)."""
    def eval_step(params, batch):
        hr, lo, w = batch["hr"], batch["lr"], batch["weight"]
        if qat:
            params, qat_amax = params
            total, comps, out = sharded_loss(params, qat_amax, hr, lo, w)
        else:
            total, comps, out = sharded_loss(params, hr, lo, w)
        return {"loss": total, "ssim": comps["ssim_metric"]}, out

    return eval_step


def save_example_images(low_res, high_res, output, epoch: int,
                        save_dir: str) -> None:
    """Sample grid PNG per epoch (parity: scripts/train.py:93-131)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(save_dir, exist_ok=True)
    samples = min(4, low_res.shape[0])
    plt.figure(figsize=(15, 5))
    titles = ("Low Resolution", "Generated", "High Resolution")
    for i in range(samples):
        imgs = (np.asarray(low_res[i, :, :, 0]),
                np.asarray(output[i, :, :, 0]),
                np.asarray(high_res[i, :, :, 0]))
        for j, img in enumerate(imgs):
            plt.subplot(samples, 3, i * 3 + j + 1)
            plt.imshow(img, cmap="gray")
            if i == 0:
                plt.title(titles[j])
            plt.axis("off")
    plt.tight_layout()
    plt.savefig(os.path.join(save_dir, f"comparison_epoch_{epoch}.png"), dpi=150)
    plt.close()


def train(cfg: TrainConfig,
          progress_cb=None) -> str:
    """Run training; returns the final checkpoint path."""
    # Multi-host: scripts/train.py --multihost ran jax.distributed
    # initialization before calling in; here that only means (a) host-side
    # writes happen once (process 0), (b) batches are placed with
    # make_array_from_callback instead of device_put, (c) the stdout JSON
    # protocol speaks from process 0 only. The mesh/sharding/step code is
    # IDENTICAL — GSPMD shardings span hosts by construction.
    multihost_on = jax.process_count() > 1
    main_process = jax.process_index() == 0
    if multihost_on:
        from mri_superresolution_tpu.parallel import multihost
        if not main_process:
            from mri_superresolution_tpu.utils import logging as log_mod
            log_mod.set_quiet(True)
    logfile = ("training.log" if main_process
               else f"training.p{jax.process_index()}.log")
    os.makedirs(cfg.log_dir, exist_ok=True)
    logger = setup_logging(os.path.join(cfg.log_dir, logfile))
    if multihost_on:
        # every process must derive the IDENTICAL data order and model
        # init; an unseeded --seed default draws per-process randomness,
        # so process 0's seed wins (parallel/multihost.agree)
        agreed = int(multihost.agree(cfg.seed))
        if agreed != cfg.seed:
            logger.warning(
                f"Multi-host: replacing this process's seed {cfg.seed} "
                f"with process 0's {agreed} (seeds must agree; pass an "
                f"explicit --seed to silence this)")
            cfg.seed = agreed
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    os.makedirs(os.path.join(cfg.checkpoint_dir, "samples"), exist_ok=True)

    qat_on = cfg.qat
    if qat_on:
        from mri_superresolution_tpu.models import quant_forward
        if not quant_forward.supported(cfg.model.model_type):
            raise ValueError(
                f"--qat supports the int8 serving families "
                f"{quant_forward.supported_types()} "
                f"(models/quant_forward.py), not "
                f"{cfg.model.model_type!r}")
        if not 0.0 < cfg.qat_decay < 1.0:
            raise ValueError(
                f"qat_decay must be in (0, 1), got {cfg.qat_decay}")

    spatial = cfg.spatial_shards > 1
    if spatial and multihost_on:
        # Composes: the (data, space) mesh spans the global device list,
        # so when a space-neighbor pair straddles a process boundary the
        # shard_map halo ppermutes (and the space-axis GN/loss psums) ride
        # the cross-host transport — validated with two real coordinated
        # processes vs a single-process run on the same global mesh
        # (tests/test_multihost.py::test_multihost_spatial_training).
        log_message(f"Multi-host spatially-sharded training: space-axis "
                    f"halo exchanges and statistic reductions cross host "
                    f"boundaries where the {cfg.spatial_shards}-way space "
                    f"axis spans processes")
    if spatial:
        from mri_superresolution_tpu.parallel import spatial as _sp
        if cfg.model.model_type not in _sp.supported_types():
            raise ValueError(
                f"spatial_shards > 1 supports model types "
                f"{_sp.supported_types()} (parallel/spatial.py "
                f"topologies), not {cfg.model.model_type!r}")
        base = make_mesh(cfg.num_data_devices)
        n_all = base.devices.size
        if n_all % cfg.spatial_shards != 0:
            raise ValueError(
                f"spatial_shards={cfg.spatial_shards} must divide the "
                f"{n_all} mesh device(s) "
                f"({'capped by --num_devices; ' if cfg.num_data_devices else ''}"
                f"{len(jax.devices())} visible)")
        n_batch_shards = n_all // cfg.spatial_shards
        mesh = make_spatial_mesh(n_batch_shards, cfg.spatial_shards,
                                 devices=list(base.devices.flat))
        log_message(f"Spatially-sharded training: ({n_batch_shards} data x "
                    f"{cfg.spatial_shards} space) mesh — row-sharded "
                    f"forward/loss/backward (ppermute halos, psum stats)")
    else:
        mesh = make_mesh(cfg.num_data_devices)
        n_batch_shards = mesh.devices.size
    n_dev = mesh.devices.size
    log_message(f"Using mesh with {n_dev} device(s): "
                f"{[str(d) for d in mesh.devices.flat]}")
    if multihost_on:
        log_message(f"Multi-host training: {jax.process_count()} processes "
                    f"x {jax.local_device_count()} local device(s); process "
                    f"0 writes checkpoints/logs/protocol "
                    f"(parallel/multihost.py)")

    # --- data ---
    dataset = PairedSliceDataset(cfg.full_res_dir, cfg.low_res_dir)
    if len(dataset) == 0:
        raise RuntimeError("No valid HR/LR pairs found")
    if cfg.split_by_subject:
        train_idx, val_idx = subject_split(dataset.subjects,
                                           cfg.validation_split, cfg.seed)
        log_message(f"Subject-level split: {len(train_idx)} train / "
                    f"{len(val_idx)} val slices")
    else:
        train_idx, val_idx = train_val_split(len(dataset),
                                             cfg.validation_split, cfg.seed)
    if cfg.grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {cfg.grad_accum}")
    # batch must divide evenly across the batch-sharding axis, and (with
    # gradient accumulation) into grad_accum equal microbatches
    quantum = n_batch_shards * cfg.grad_accum
    batch_size = int(-(-cfg.batch_size // quantum) * quantum)
    if batch_size != cfg.batch_size:
        log_message(f"Rounding batch_size {cfg.batch_size} → {batch_size} "
                    f"to divide the {n_batch_shards}-way data axis"
                    + (f" x {cfg.grad_accum} gradient-accumulation "
                       f"microbatches" if cfg.grad_accum > 1 else ""))
    if cfg.grad_accum > 1:
        log_message(f"Gradient accumulation: {cfg.grad_accum} sequential "
                    f"microbatches of {batch_size // cfg.grad_accum} per "
                    f"optimizer step (exact full-batch update; activation "
                    f"memory scales 1/{cfg.grad_accum})")
    decoded_mb = dataset.estimated_decoded_mb()
    use_streaming = cfg.streaming == "on" or (
        cfg.streaming == "auto" and decoded_mb > cfg.streaming_threshold_mb)
    if use_streaming:
        # bounded-RAM path: per-batch threaded decode + background prefetch
        # (reference DataLoader semantics, scripts/train.py:215-233); peak
        # host RAM is O(prefetch * batch) instead of the whole dataset
        log_message(f"Streaming data loading: dataset decodes to "
                    f"{decoded_mb:.0f} MiB; holding "
                    f"{cfg.streaming_prefetch} prefetched batch(es) in RAM")
        train_loader = StreamingBatchLoader(
            dataset, train_idx, batch_size, shuffle=True, seed=cfg.seed,
            prefetch=cfg.streaming_prefetch)
        val_loader = StreamingBatchLoader(
            dataset, val_idx, batch_size, shuffle=False, seed=cfg.seed,
            prefetch=cfg.streaming_prefetch)
        sample_hw = dataset.item_hw()[0]
    else:
        lr_arr, hr_arr = dataset.load_all()
        train_loader = BatchLoader(lr_arr, hr_arr, train_idx, batch_size,
                                   shuffle=True, seed=cfg.seed)
        val_loader = BatchLoader(lr_arr, hr_arr, val_idx, batch_size,
                                 shuffle=False, seed=cfg.seed)
        sample_hw = lr_arr.shape[1:3]

    # --- model / loss / optimizer ---
    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    # remat: per-block flax.linen.remat — same param tree, so checkpoints
    # and the remat-free inference engine are unaffected
    model = build_model(cfg.model, dtype=dtype, remat=cfg.remat)
    rng = jax.random.key(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    params = jax.jit(
        lambda r: model.init(
            r, jnp.zeros((1, *sample_hw, cfg.model.in_channels)))["params"]
    )(init_rng)

    vgg_params = None
    if cfg.loss.perceptual_weight > 0:
        if cfg.vgg_weights:
            vgg_params = vgg_mod.load_params_npz(cfg.vgg_weights)
            log_message(f"Loaded VGG19 weights from {cfg.vgg_weights}")
        else:
            # Semantics-changing substitution — the reference uses ImageNet
            # VGG19 (utils/losses.py:90); a random CNN is only a structural
            # prior. Warn loudly so nobody mistakes this for parity.
            log_message(
                "WARNING: perceptual_weight > 0 but no --vgg_weights given. "
                "Falling back to RANDOM VGG features (a structural prior, "
                "NOT the reference's ImageNet-pretrained perceptual loss). "
                "Measured effect at weight 0.1: a no-op on trained quality "
                "(-0.0005 SSIM / +0.047 dB PSNR vs perceptual_weight=0; "
                "RESULTS.md 5d). Convert real weights with "
                "tools/fetch_vgg_weights.py on a networked machine and pass "
                "--vgg_weights, or set perceptual_weight=0 for exact "
                "reference-loss semantics.",
                message_type="warning")
            vgg_params = vgg_mod.random_params(jax.random.key(0),
                                               cfg.loss.vgg_layer_idx)
    qat_fwd = None
    qat_amax0 = None
    if qat_on:
        # Quantization-aware training: the forward runs the int8 serving
        # arithmetic in float with straight-through gradients, so the
        # weights learn to absorb the quantization noise PTQ merely suffers
        # (RESULTS.md 2b: PTQ costs -0.64/-0.75 dB on trained models).
        qat_fwd = quant_forward.build_fakequant_forward(
            cfg.model.model_type, dtype)
        # Shape-only skeleton of the running activation-range statistic
        # (zero device work). The REAL calibration runs after the resume
        # block below, on whichever weights this run actually trains — the
        # recommended `--qat --resume` fine-tune recipe must measure the
        # converged checkpoint's activation ranges, not the random init's.
        qat_amax0 = quant_forward.amax_template(
            params, (1, *sample_hw, cfg.model.in_channels),
            cfg.model.model_type, dtype)
        log_message(
            f"QAT enabled (amax EMA decay {cfg.qat_decay}): training "
            f"simulates the int8 serving quantizers (per-input-channel "
            f"activation scales, per-output-channel weights) with "
            f"straight-through gradients; validation/best-model selection "
            f"score the quantized forward; checkpoints export a frozen "
            f"calibration sidecar (<checkpoint>.calib.json) — serve with "
            f"--quant int8 --quant_calib <sidecar>")

    if not 0.0 <= cfg.ema_decay < 1.0:
        raise ValueError(f"ema_decay must be in [0, 1), got {cfg.ema_decay}")
    ema_on = cfg.ema_decay > 0.0
    if ema_on:
        log_message(
            f"EMA of weights enabled (decay {cfg.ema_decay}, horizon "
            f"~{1.0 / (1.0 - cfg.ema_decay):.0f} steps): validation, "
            f"best-model selection, and checkpointed serving params use the "
            f"averaged weights; live weights stored under 'raw_params' for "
            f"--resume")
    optimizer = make_optimizer(cfg.weight_decay)
    opt_state = optimizer.init(params)
    # ema_0 = params_0, as a DISTINCT buffer: the train step donates the
    # whole state, and XLA rejects donating the same buffer twice
    copy_tree = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
    # qat_amax starts as None even under QAT: the real calibration is
    # deferred past the resume block (see below) so it measures the weights
    # this run actually starts from; qat_amax0 is only a shape template
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state,
                       ema_params=copy_tree(params) if ema_on else None,
                       qat_amax=None)

    scheduler = ReduceLROnPlateau(cfg.learning_rate, factor=0.5,
                                  patience=cfg.patience // 2)
    early = EarlyStopping(cfg.patience)
    start_epoch = 0

    names = ckpt.checkpoint_paths(cfg.checkpoint_dir, cfg.model.model_type)
    start_cursor = 0

    def _meta_step(base: str) -> int:
        """Optimizer step count from a checkpoint's JSON sidecar; -1 when
        the pair is absent/unreadable (never resumed from)."""
        if not (os.path.exists(base + ".ckpt")
                and os.path.exists(base + ".json")):
            return -1
        try:
            with open(base + ".json") as f:
                return int(json.load(f).get("step", 0))
        except (ValueError, OSError):
            return -1

    # Resume source: whichever of final (epoch-granular) / step (mid-epoch,
    # cfg.save_every_steps) is further along the optimizer trajectory —
    # a preempted run's step checkpoint outruns the last final save.
    resume_base = None
    if cfg.resume:
        # ties prefer FINAL: equal step counts mean the same trajectory
        # point, but final's meta carries the last epoch's validated
        # scheduler/early-stop state while step's predates it
        cands = sorted((_meta_step(names[k]), k == "final", k)
                       for k in ("final", "step"))
        if cands[-1][0] >= 0:
            resume_base = names[cands[-1][2]]
    if resume_base is not None:
        params_r, opt_r, meta, extras = ckpt.load_checkpoint(
            resume_base + ".ckpt", opt_state_template=opt_state,
            return_extras=True)
        from flax import serialization
        # EMA checkpoints store the averaged weights as "params" (what
        # serving loads) and the live weights as "raw_params"; resume the
        # optimizer trajectory from the live ones
        live_r = extras.get("raw_params", params_r)
        ema_r = None
        if ema_on:
            # copy: when raw_params is absent both trees restore from the
            # same arrays, which must not alias under buffer donation
            ema_r = copy_tree(serialization.from_state_dict(params, params_r))
            if "raw_params" not in extras:
                log_message("Resuming with EMA enabled from a checkpoint "
                            "without EMA state: initializing the average "
                            "from the restored weights")
        qat_r = None
        if qat_on and "qat_amax" in extras:
            qat_r = serialization.from_state_dict(qat_amax0,
                                                  extras["qat_amax"])
        elif qat_on:
            log_message("Resuming with QAT enabled from a checkpoint "
                        "without QAT state: the running activation ranges "
                        "will be re-initialized from one batch through the "
                        "RESTORED weights")
        state = TrainState(
            step=jnp.asarray(int(meta.get("step", 0)), jnp.int32),
            params=serialization.from_state_dict(params, live_r),
            opt_state=opt_r if opt_r is not None else opt_state,
            ema_params=ema_r, qat_amax=qat_r)
        prev_qat = bool((meta.get("config") or {}).get("qat", False))
        if qat_on != prev_qat:
            # The QAT flag flipped across the resume (e.g. fine-tuning a
            # converged bf16 checkpoint with --qat, the standard QAT
            # recipe): validation now scores a DIFFERENT forward, so the
            # restored LR-plateau/early-stop histories — and the restored
            # best-val threshold best_model saving compares against —
            # would be calibrated to the wrong metric. Reset them; the
            # optimizer trajectory and weights still resume.
            log_message(
                f"Resumed checkpoint was trained with qat={prev_qat}; this "
                f"run uses qat={qat_on}. Validation now scores a different "
                f"forward, so the LR-plateau and early-stopping histories "
                f"are reset (weights and optimizer state still resume).")
        else:
            scheduler.load_state_dict(meta["scheduler"])
            early.load_state_dict(meta["early_stopping"])
        start_cursor = int(meta.get("batch_cursor", 0))
        if start_cursor >= len(train_loader) > 0:
            # cursor at/past the epoch's end (e.g. batch size changed
            # across the resume): treat the interrupted epoch as complete
            log_message(f"Step-checkpoint batch cursor {start_cursor} >= "
                        f"{len(train_loader)} batches/epoch; resuming at "
                        f"the next epoch")
            start_cursor = 0
            meta["epoch"] = int(meta.get("epoch", 0))  # +1 applied below
        if start_cursor > 0:
            # mid-epoch step checkpoint: re-enter the SAME epoch and skip
            # its first batches — the loader order is (seed, epoch)-
            # deterministic and augmentation keys fold (epoch, batch), so
            # the continuation is bit-identical to an uninterrupted run
            start_epoch = int(meta.get("epoch", 0))
            log_message(f"Resumed from {resume_base}.ckpt mid-epoch "
                        f"{start_epoch} at batch {start_cursor} "
                        f"(step {int(meta.get('step', 0))})")
        else:
            start_epoch = int(meta.get("epoch", -1)) + 1
            log_message(f"Resumed from {resume_base}.ckpt at epoch "
                        f"{start_epoch}")

    # --- sharding / compilation ---
    rsh = replicated_sharding(mesh)

    qat_serving_calib = None
    if qat_on and (state.qat_amax is None or ema_on):
        # One retained calibration batch (identical bytes on every
        # process under --multihost) + one jitted full-precision
        # calibration forward, shared by the deferred range init below and
        # the per-epoch EMA-weights recalibration.
        first_batch = next(iter(train_loader.epoch(0)))
        calib_np = np.asarray(first_batch["lr"])
        del first_batch
        _calib_jit = jax.jit(quant_forward.build_calib_forward(
            cfg.model.model_type, dtype, jit_fn=False))

        def _run_calib(p, x):
            _, amax = _calib_jit(p, x)
            return {k: v for k, v in amax.items() if k != "__out__"}

        if state.qat_amax is None:
            # Deferred until after the resume block ON PURPOSE: the
            # recommended `--qat --resume` fine-tune recipe must measure
            # the CONVERGED checkpoint's activation ranges, not the random
            # init's (which would mis-scale every quantizer for the first
            # ~1/(1-qat_decay) steps and mis-score epoch-0 validation /
            # best-model selection).
            log_message("QAT: initializing the running activation ranges "
                        "from one batch through the current weights")
            state = state.replace(
                qat_amax=_run_calib(state.params, jnp.asarray(calib_np)))
        if ema_on:
            # The checkpoint SERVES the EMA weights while the running
            # ranges track the LIVE-weights forward; each epoch the
            # sidecar/validation scales are re-measured on the averaged
            # weights so the served weights and the frozen scales describe
            # the same network (the running stat still feeds the
            # quantizers during training and resumes from extras).
            calib_x = (jax.device_put(calib_np, rsh) if multihost_on
                       else jnp.asarray(calib_np))
            qat_serving_calib = lambda p: _run_calib(p, calib_x)  # noqa: E731

    if cfg.opt_shard:
        # ZeRO-1: store Adam moments sharded over the data axis; params
        # (and the EMA tree, which serving reads whole) stay replicated
        full = lambda t: jax.tree_util.tree_map(lambda _: rsh, t)  # noqa: E731
        state_sh = TrainState(
            step=rsh, params=full(state.params),
            opt_state=zero1_shardings(state.opt_state, mesh),
            ema_params=full(state.ema_params),
            qat_amax=full(state.qat_amax))
        leaves = jax.tree_util.tree_leaves(
            state_sh.opt_state, is_leaf=lambda s: hasattr(s, "spec"))
        n_sharded = sum(1 for s in leaves if not s.is_fully_replicated)
        log_message(f"ZeRO-1 optimizer-state sharding: {n_sharded}/"
                    f"{len(leaves)} moment tensors stored sharded over the "
                    f"{mesh.shape['data']}-way data axis (~1/"
                    f"{mesh.shape['data']} per-device optimizer memory)")
    else:
        state_sh = rsh
    if multihost_on:
        # jit/eager-computed leaves are committed to process-local devices,
        # which a cross-process device_put rejects; every process computed
        # identical values (same seed / same checkpoint bytes), so routing
        # through host numpy is exact
        state = jax.tree_util.tree_map(np.asarray, state)
    state = jax.device_put(state, state_sh)

    if spatial:
        h, w = sample_hw
        if h % (8 * cfg.spatial_shards) != 0 or w % 8 != 0:
            raise ValueError(
                f"spatial_shards={cfg.spatial_shards} training needs LR "
                f"H % {8 * cfg.spatial_shards} == 0 and W % 8 == 0; got "
                f"{h}x{w}. Re-extract with a conforming --target_size or "
                f"reduce spatial_shards.")
        from jax.sharding import NamedSharding, PartitionSpec as P
        x4 = NamedSharding(mesh, P("data", "space"))
        dsh = {"hr": x4, "lr": x4, "weight": NamedSharding(mesh, P("data"))}
        if qat_on and cfg.remat:
            log_message(
                "QAT + spatial: model-side remat segments are disabled "
                "(the fake-quant trace context cannot cross jax.checkpoint "
                "scopes — same restriction as dense QAT); the loss-graph "
                "checkpoint still applies.")
        sharded_loss = build_spatial_loss(
            mesh, sample_hw, cfg.loss, model_type=cfg.model.model_type,
            dtype=dtype, vgg_params=vgg_params, remat=cfg.remat,
            qat_sites=sorted(qat_amax0) if qat_on else None)
        train_step = jax.jit(
            build_spatial_train_step(sharded_loss, optimizer, cfg.augment,
                                     grad_accum=cfg.grad_accum,
                                     ema_decay=cfg.ema_decay,
                                     qat=qat_on, qat_decay=cfg.qat_decay),
            in_shardings=(state_sh, dsh, None, None),
            out_shardings=(state_sh, rsh),
            donate_argnums=(0,))
        eval_step = jax.jit(
            build_spatial_eval_step(sharded_loss, qat=qat_on),
            in_shardings=(rsh, dsh),
            out_shardings=({"loss": rsh, "ssim": rsh}, x4))
    else:
        # the dense loss bundle is only built (and only used) on this path;
        # spatial mode composes the same loss inside build_spatial_loss
        loss_fn = CombinedLoss(cfg.loss, vgg_params=vgg_params)
        dsh = data_sharding(mesh)
        train_step = jax.jit(
            build_train_step(model, loss_fn, optimizer, cfg.augment,
                             cfg.loss, remat=cfg.remat,
                             grad_accum=cfg.grad_accum,
                             ema_decay=cfg.ema_decay,
                             qat_fwd=qat_fwd, qat_decay=cfg.qat_decay),
            in_shardings=(state_sh, dsh, None, None),
            out_shardings=(state_sh, rsh),
            donate_argnums=(0,))
        eval_step = jax.jit(
            build_eval_step(model, loss_fn, cfg.loss, qat_fwd=qat_fwd),
            in_shardings=(rsh, dsh),
            out_shardings=(rsh, dsh))

    # per-key batch sharding (spatial mode shards hr/lr rows but not weight)
    _sh = (dsh.__getitem__ if isinstance(dsh, dict) else lambda _k: dsh)
    # batch placement: single-process device_put, or multi-host global-array
    # assembly from each host's identical copy (parallel/multihost.py)
    if multihost_on:
        _place = lambda v, s: multihost.put_global(np.asarray(v), s)  # noqa: E731
    else:
        _place = jax.device_put

    writer = None
    if cfg.use_tensorboard and main_process:
        try:
            from torch.utils.tensorboard import SummaryWriter
            writer = SummaryWriter(cfg.log_dir)
        except ImportError:
            log_message("TensorBoard not available; skipping")

    log_message({
        "type": "params",
        "model_type": cfg.model.model_type,
        "batch_size": batch_size,
        "epochs": cfg.epochs,
        "learning_rate": cfg.learning_rate,
        "weight_decay": cfg.weight_decay,
        "ssim_weight": cfg.loss.ssim_weight,
        "perceptual_weight": cfg.loss.perceptual_weight,
        "initial_alpha": cfg.model.initial_alpha,
        "augmentation": cfg.augment.enabled,
        "validation_split": cfg.validation_split,
        "patience": cfg.patience,
        "num_devices": n_dev,
        "bf16": cfg.bf16,
        "seed": cfg.seed,
        "ema_decay": cfg.ema_decay,
        "qat": cfg.qat,
    }, "params")

    if len(val_idx) == 0:
        log_message(
            "WARNING: validation_split leaves 0 validation slices — the LR "
            "scheduler, early stopping, and best-model checkpointing are all "
            "validation-driven and will be DISABLED this run (only the final "
            "checkpoint is written). The reference degrades the same way; "
            "set --validation_split > 0 to restore them.",
            message_type="warning")

    def save_state(base: str, meta: Dict[str, Any]) -> None:
        """Checkpoint the CURRENT state: serving params (EMA if on), live
        weights + QAT ranges in extras, and — under QAT — the frozen int8
        calibration sidecar the inference engine consumes via
        --quant_calib (same format as scripts/infer.py --quant_calib
        save). Multi-host: the gather below is a COLLECTIVE (ZeRO-1
        moments may be sharded ACROSS hosts, so process 0 alone cannot
        read them) — every process executes it, reached only under
        conditions that are identical on all processes (replicated val
        metrics); process 0 alone then writes."""
        src = multihost.fetch_tree(state) if multihost_on else state
        if not main_process:
            return
        extras: Dict[str, Any] = {}
        if ema_on:
            extras["raw_params"] = src.params
        if qat_on:
            extras["qat_amax"] = src.qat_amax
        ckpt.save_checkpoint(
            base, src.ema_params if ema_on else src.params,
            src.opt_state, meta=meta, extras=extras or None)
        if qat_on:
            # Under EMA the sidecar ranges are re-measured on the served
            # (averaged) weights each epoch (serving_amax); otherwise the
            # running live-weights statistic IS the served network's.
            amax_out = serving_amax if serving_amax is not None \
                else src.qat_amax
            quant_forward.save_scales(
                base + ".calib.json",
                quant_forward.scales_from_amax(jax.device_get(amax_out)),
                cfg.model.model_type)
        else:
            # A prior --qat run in this checkpoint_dir may have left a
            # calibration sidecar describing the OLD weights; load_engine
            # auto-loads it for --quant int8, so drop it when the
            # checkpoint it belonged to is overwritten by a non-QAT run.
            stale = base + ".calib.json"
            if os.path.exists(stale):
                os.remove(stale)
                log_message(f"Removed stale QAT calibration sidecar "
                            f"{stale} (its checkpoint was overwritten by "
                            f"a non-QAT run)")

    vis_frequency = max(1, cfg.epochs // 20)
    n_train_batches = len(train_loader)
    hyper_meta = {"config": to_dict(cfg)}
    final_val_loss, final_val_ssim = float("inf"), 0.0
    # QAT+EMA: scales measured on the served (averaged) weights. Any run
    # with epochs left re-measures this each epoch BEFORE its first use
    # (pre-validation, ahead of every save_state), so the startup seed is
    # only needed — and only paid — when the epoch loop never runs (a
    # zero-epoch resume re-save must still export EMA-consistent scales).
    # Stays None without EMA (save_state then exports the running
    # statistic, which IS the served network's). Computed OUTSIDE
    # save_state's main-process gate: the calibration jit is a collective
    # under --multihost, and start_epoch/cfg.epochs agree on every
    # process so the gate cannot deadlock.
    serving_amax = (qat_serving_calib(state.ema_params)
                    if qat_serving_calib is not None
                    and start_epoch >= cfg.epochs else None)

    # optional profiler trace of the first post-warmup epoch (SURVEY.md §5:
    # the reference only has wall-clock timing; we expose a real trace)
    profiling = False
    if cfg.profile_dir:
        os.makedirs(cfg.profile_dir, exist_ok=True)

    # host-side optimizer-step counter for --save_every_steps (reading
    # state.step each step would force a device sync; one fetch here)
    host_step = int(state.step)

    epoch = start_epoch - 1
    for epoch in range(start_epoch, cfg.epochs):
        profile_epoch = min(start_epoch + 1, cfg.epochs - 1)
        if (cfg.profile_dir and main_process and epoch == profile_epoch
                and not profiling):
            try:
                jax.profiler.start_trace(cfg.profile_dir)
                profiling = True
            except Exception as e:  # some backends can't trace (e.g. tunnels)
                log_message(f"Profiler unavailable on this backend: {e}")
                cfg.profile_dir = None
        epoch_start = time.time()
        # Metrics stay on device until epoch end: a host fetch per step would
        # serialize dispatch (costly over an async TPU tunnel, where only
        # fetches synchronize). Only the sparse batch_update log syncs.
        loss_accs, ssim_accs, clip_accs = [], [], []
        skip_to = start_cursor if epoch == start_epoch else 0
        for batch_idx, batch in enumerate(train_loader.epoch(epoch)):
            if batch_idx < skip_to:
                # mid-epoch resume: fast-forward the deterministic loader
                # to the checkpointed batch cursor (the skipped batches
                # were trained before the preemption)
                continue
            # keys derived from (seed, epoch, batch) — a resumed run sees the
            # same augmentation randomness a continuous run would have
            step_key = jax.random.fold_in(jax.random.fold_in(rng, epoch),
                                          batch_idx)
            batch = {k: _place(v, _sh(k)) for k, v in batch.items()}
            state, metrics = train_step(state, batch,
                                        jnp.asarray(scheduler.lr, jnp.float32),
                                        step_key)
            host_step += 1
            loss_accs.append(metrics["loss"])
            ssim_accs.append(metrics["ssim"])
            if "ssim_clip_micros" in metrics:
                clip_accs.append(metrics["ssim_clip_micros"])
            if batch_idx % max(10, n_train_batches // 10) == 0:
                loss_v = float(metrics["loss"])
                log_message({"epoch": epoch, "batch": batch_idx,
                             "total_batches": n_train_batches,
                             "loss": loss_v}, "batch_update")
                if progress_cb:
                    progress_cb(epoch, batch_idx, loss_v)
            if (cfg.save_every_steps > 0
                    and host_step % cfg.save_every_steps == 0):
                # preemption-safe mid-epoch checkpoint: next run resumes
                # at batch_cursor of THIS epoch, bit-identically. Under
                # QAT+EMA the serving sidecar keeps the epoch's
                # serving_amax (re-measured at each validation).
                save_state(
                    names["step"],
                    meta={**hyper_meta, "epoch": epoch,
                          "batch_cursor": batch_idx + 1,
                          "step": host_step,
                          "val_loss": final_val_loss,
                          "val_ssim": final_val_ssim,
                          "scheduler": scheduler.state_dict(),
                          "early_stopping": early.state_dict()})
        train_loss = float(jnp.mean(jnp.stack(loss_accs))) if loss_accs else 0.0
        train_ssim = float(jnp.mean(jnp.stack(ssim_accs))) if ssim_accs else 0.0
        if clip_accs and cfg.loss.ssim_weight > 0:
            n_sat = int(float(jnp.sum(jnp.stack(clip_accs))))
            if n_sat:
                log_message(
                    f"WARNING: {n_sat} gradient-accumulation microbatch(es) "
                    f"saturated the SSIM clip this epoch — for those steps "
                    f"the accumulated gradient follows the per-microbatch "
                    f"clip, not the exact full-batch one (RESULTS.md 5g). "
                    f"Typically transient at initialization; persistent "
                    f"saturation suggests a data or loss-weight problem.",
                    message_type="warning")

        # --- validation (every epoch, scripts/train.py:279-280) ---
        val_losses, val_ssims = [], []
        n_val = 0
        vis_batch, vis_out = None, None
        # with EMA, validation (and therefore LR plateau / early-stop /
        # best-model selection) scores the averaged weights — they are what
        # the checkpoint serves; with QAT it scores the fake-quant forward
        # (the int8-serving-relevant metric)
        eval_params = state.ema_params if ema_on else state.params
        if qat_on:
            if qat_serving_calib is not None:
                # EMA: score (and later export) scales measured on the
                # averaged weights actually being served/validated
                serving_amax = qat_serving_calib(state.ema_params)
            eval_params = (eval_params, serving_amax if serving_amax
                           is not None else state.qat_amax)
        for batch in val_loader.epoch():
            dev_batch = {k: _place(v, _sh(k)) for k, v in batch.items()}
            metrics, out = eval_step(eval_params, dev_batch)
            val_losses.append(metrics["loss"])
            val_ssims.append(metrics["ssim"])
            n_val += 1
            vis_batch, vis_out = batch, out
        val_loss = float(jnp.mean(jnp.stack(val_losses))) if n_val else 0.0
        val_ssim = float(jnp.mean(jnp.stack(val_ssims))) if n_val else 0.0
        if n_val:
            prev_lr = scheduler.lr
            new_lr = scheduler.step(val_loss)
            if new_lr != prev_lr:
                log_message(f"Learning rate adjusted from {prev_lr:.2e} "
                            f"to {new_lr:.2e}")
            if early.update(val_loss):
                save_state(
                    names["best"],
                    meta={**hyper_meta, "epoch": epoch,
                          "step": int(state.step),
                          "val_loss": val_loss, "val_ssim": val_ssim,
                          "scheduler": scheduler.state_dict(),
                          "early_stopping": early.state_dict()})
                log_message(f"Saved best model with validation loss: "
                            f"{val_loss:.6f}")
            final_val_loss, final_val_ssim = val_loss, val_ssim

        if profiling:
            try:
                jax.profiler.stop_trace()
                log_message(f"Wrote profiler trace to {cfg.profile_dir}")
            except Exception as e:
                log_message(f"Profiler stop failed: {e}")
            profiling = False

        elapsed = time.time() - epoch_start
        # a mid-epoch-resumed epoch only ran its remaining batches
        n_seen = max(0, len(train_idx) - skip_to * batch_size)
        log_message({
            "epoch": epoch, "total_epochs": cfg.epochs,
            "train_loss": train_loss,
            "val_loss": val_loss if n_val else "N/A",
            "train_ssim": train_ssim,
            "val_ssim": val_ssim if n_val else "N/A",
            "elapsed": elapsed, "lr": scheduler.lr,
            "slices_per_sec": n_seen / max(elapsed, 1e-9),
            "slices_per_sec_per_chip": n_seen / max(elapsed, 1e-9) / n_dev,
            "steps_per_sec": n_train_batches / max(elapsed, 1e-9),
        }, "epoch_summary")

        if writer:
            writer.add_scalar("Loss/train", train_loss, epoch)
            writer.add_scalar("SSIM/train", train_ssim, epoch)
            if n_val:
                writer.add_scalar("Loss/val", val_loss, epoch)
                writer.add_scalar("SSIM/val", val_ssim, epoch)

        if epoch % vis_frequency == 0 and vis_batch is not None:
            # vis_out is data-sharded; under multi-host the fetch is an
            # allgather COLLECTIVE — the gating condition is identical on
            # every process, so they all reach it together
            out_np = (multihost.fetch(vis_out) if multihost_on
                      else np.asarray(vis_out))
            if main_process:
                save_example_images(vis_batch["lr"], vis_batch["hr"],
                                    out_np, epoch,
                                    os.path.join(cfg.checkpoint_dir,
                                                 "samples"))

        if n_val and early.should_stop:
            log_message(f"Early stopping triggered after {epoch + 1} epochs")
            break

    # --- final checkpoint (scripts/train.py:467-477) ---
    save_state(
        names["final"],
        meta={**hyper_meta, "epoch": epoch, "step": int(state.step),
              "val_loss": final_val_loss, "val_ssim": final_val_ssim,
              "scheduler": scheduler.state_dict(),
              "early_stopping": early.state_dict()})
    # a completed run supersedes its mid-epoch step checkpoint: leaving it
    # would let a LATER fresh run in this dir resume from THIS run's
    # trajectory (resume prefers the larger step count) — same staleness
    # rule as the QAT sidecar cleanup above (r4 review)
    if main_process:
        for suffix in (".ckpt", ".json"):
            stale_step = names["step"] + suffix
            if os.path.exists(stale_step):
                os.remove(stale_step)
    log_message(f"Training completed. Final model saved to "
                f"{names['final']}.ckpt")
    if writer:
        writer.close()
    return names["final"] + ".ckpt"
