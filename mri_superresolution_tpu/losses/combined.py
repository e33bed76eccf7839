"""Composite training loss: L1 + SSIM + optional VGG perceptual.

Parity with the reference ``CombinedLoss`` (utils/losses.py:153-240):
``total = l1_w * L1 + ssim_w * (1 - clip(SSIM, 0, 1)) + perc_w * Perc`` with
``l1_w = 1 - ssim_w - perc_w``, SSIM window 11 / sigma 1.5 / val_range 1.0,
and target features stop-gradiented in the perceptual term
(utils/losses.py:146-147).

Everything is a pure jittable function; per-sample weights extend the
reference (unweighted) semantics to masked/padded batches so jit shapes stay
static without skewing the loss.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import LossConfig
from mri_superresolution_tpu.models import vgg as vgg_mod
from mri_superresolution_tpu.ops.ssim import ssim


def _weighted_mean(per_sample: jnp.ndarray,
                   sample_weights: Optional[jnp.ndarray]) -> jnp.ndarray:
    if sample_weights is None:
        return jnp.mean(per_sample)
    w = sample_weights.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-12)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray,
            sample_weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    per = jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=tuple(range(1, a.ndim)))
    return _weighted_mean(per, sample_weights)


def compose_loss(cfg: LossConfig, out32: jnp.ndarray, tgt32: jnp.ndarray,
                 sample_weights, *, per_sample_mean, weighted_mean,
                 ssim_per_sample, vgg_features,
                 always_ssim_metric: bool = False,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The single copy of the CombinedLoss composition (reference
    utils/losses.py:153-240), parameterized by its reduction/feature
    primitives so the dense path and the spatially-sharded path
    (parallel/spatial.py, psum'd means + halo'd blurs/convs) cannot
    silently diverge:

    - ``per_sample_mean(x) -> (B,)``: mean over every non-batch axis,
    - ``weighted_mean(per, w) -> scalar``: weighted mean over the batch,
    - ``ssim_per_sample(a, b) -> (B,)``: per-sample SSIM index,
    - ``vgg_features(x) -> features``: VGG stack up to cfg.vgg_layer_idx.

    ``always_ssim_metric`` additionally reports the (unclipped) SSIM as
    ``ssim_metric`` when ssim_weight == 0 — callers that need a static
    comps tree regardless of cfg (the shard_map path) rely on it.
    """
    total = jnp.asarray(0.0, jnp.float32)
    comps: Dict[str, jnp.ndarray] = {}

    if cfg.l1_weight > 0:
        l1 = weighted_mean(per_sample_mean(jnp.abs(out32 - tgt32)),
                           sample_weights)
        total = total + cfg.l1_weight * l1
        comps["l1_loss"] = l1

    if cfg.ssim_weight > 0 or always_ssim_metric:
        ssim_raw = weighted_mean(ssim_per_sample(out32, tgt32),
                                 sample_weights)
    if cfg.ssim_weight > 0:
        ssim_val = jnp.clip(ssim_raw, 0.0, 1.0)  # utils/losses.py:221
        ssim_l = 1.0 - ssim_val
        total = total + cfg.ssim_weight * ssim_l
        comps["ssim_loss"] = ssim_l
        comps["ssim_metric"] = ssim_val
    elif always_ssim_metric:
        comps["ssim_metric"] = ssim_raw

    if cfg.perceptual_weight > 0:
        fg = vgg_features(out32)
        ft = jax.lax.stop_gradient(vgg_features(tgt32))  # losses.py:146-147
        if cfg.perceptual_loss_type == "l1":
            per = per_sample_mean(jnp.abs(fg - ft))
        elif cfg.perceptual_loss_type in ("l2", "mse"):
            per = per_sample_mean(jnp.square(fg - ft))
        else:
            raise ValueError(
                f"Unsupported perceptual loss: {cfg.perceptual_loss_type}")
        perc = weighted_mean(per, sample_weights)
        total = total + cfg.perceptual_weight * perc
        comps["perceptual_loss"] = perc

    return total, comps


def _dense_per_sample_mean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


class CombinedLoss:
    """Callable loss bundle. Instantiate once (host), call inside jit.

    Args:
        cfg: LossConfig (weights validated like utils/losses.py:166-171).
        vgg_params: VGG19 param tree — required iff perceptual_weight > 0.
    """

    def __init__(self, cfg: LossConfig, vgg_params: Optional[dict] = None):
        cfg.validate()
        self.cfg = cfg
        self.vgg_params = vgg_params
        if cfg.perceptual_weight > 0 and vgg_params is None:
            raise ValueError(
                "perceptual_weight > 0 requires VGG19 weights "
                "(pass vgg_params; see models/vgg.py for loading options)")

    def __call__(self, output: jnp.ndarray, target: jnp.ndarray,
                 sample_weights: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        return compose_loss(
            cfg, output.astype(jnp.float32), target.astype(jnp.float32),
            sample_weights,
            per_sample_mean=_dense_per_sample_mean,
            weighted_mean=_weighted_mean,
            ssim_per_sample=lambda a, b: ssim(
                a, b, cfg.window_size, cfg.sigma, cfg.val_range,
                size_average=False),
            vgg_features=lambda x: vgg_mod.extract_features(
                self.vgg_params, x, cfg.vgg_layer_idx))
