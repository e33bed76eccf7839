"""Batched, shape-bucketed inference engine.

Reference behavior reproduced (scripts/infer.py): percentile-clip [0.5,99.5]
+ min-max normalize inputs (:97-130), clamp outputs to [0,1] (:276),
optional histogram matching against a normalized target (:278-314), metrics
with bicubic target resize on shape mismatch (:317-324), PNG +
comparison/diff figure outputs (:173-228,336-394).

TPU-first design:
- one jitted forward per shape bucket: inputs are zero-padded up to a
  multiple of ``bucket`` (default 32) so arbitrary sizes reuse a handful of
  compiled programs instead of recompiling per image
  (the reference merely warns on non-%8 inputs, scripts/infer.py:119-121);
  outputs are cropped back to exactly 2x the original size,
- batches shard over the data mesh for full-volume throughput,
- bf16 compute, fp32 in/out,
- optional row-sharded serving over a (data, space) mesh
  (``spatial_shards``, parallel/spatial.py) for slices too large per chip,
- optional int8 PTQ serving (``quant="int8"``, models/quant_forward.py)
  with streaming self-calibration and a content-aware bf16 guardrail.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mri_superresolution_tpu.config import InferConfig, ModelConfig
from mri_superresolution_tpu.models import build_model
from mri_superresolution_tpu.ops.metrics import (mae, match_histograms_np,
                                                 mse)
from mri_superresolution_tpu.ops.resize import Interp, resize
from mri_superresolution_tpu.ops.ssim import ssim
from mri_superresolution_tpu.parallel import (data_sharding, make_mesh,
                                              replicated_sharding)
from mri_superresolution_tpu.train import checkpoint as ckpt
from mri_superresolution_tpu.utils.logging import setup_logging

logger = setup_logging("inference.log", "mri_superresolution_tpu.infer")


def preprocess_image_array(image: np.ndarray,
                           min_percentile: float = 0.5,
                           max_percentile: float = 99.5) -> np.ndarray:
    """Percentile clip + min-max normalize to [0,1]
    (parity: scripts/infer.py:97-130)."""
    x = image.astype(np.float32)
    lo = np.percentile(x, min_percentile)
    hi = np.percentile(x, max_percentile)
    x = np.clip(x, lo, hi)
    if hi > lo:
        x = (x - lo) / (hi - lo)
    return x


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# Per-pixel intensity above which a pixel counts as foreground, for the
# int8 content guardrail. Distinct from ``quant_min_foreground`` (the
# FRACTION of such pixels below which a batch routes to bf16). Shared
# with the QAT fakequant forward (single source: ops/quant.py).
from mri_superresolution_tpu.ops.quant import FOREGROUND_INTENSITY  # noqa: E402


class InferenceEngine:
    """Holds a model + params and serves padded, bucketed, sharded forwards."""

    def __init__(self, model_cfg: ModelConfig, params,
                 bf16: bool = True, bucket: int = 1,
                 num_devices: int = 1, spatial_shards: int = 1,
                 quant: str = "none", quant_calib_slices: int = 8,
                 quant_min_foreground: float = 0.05,
                 quant_calib_path: Optional[str] = None,
                 tta: bool = False, normalize_inputs: bool = False,
                 out_dtype=None, transpose_io: bool = False):
        self.model_cfg = model_cfg
        # Serving-transfer controls (tools/bench_serve_e2e.py; the host
        # link — PCIe, or worse a tunnel — is the volume-serving long
        # pole, measured 20-40 MB/s here vs ~45 ms of compute per
        # 64x256^2 batch):
        # - normalize_inputs: batches arrive RAW (uint8/uint16/int16/
        #   float) and the percentile-window + minmax normalize runs ON
        #   DEVICE inside the serving program — the host uploads 1-2
        #   bytes/pixel instead of 4, and the host never spends CPU on
        #   percentiles (~5 ms/slice). Padding stays exact: the
        #   normalize sees the unpadded slice, the zero-pad happens
        #   after it in the same program.
        # - out_dtype uint8/int16: outputs are packed on device
        #   (round(y*255) / round(y*32767)) and fetched at 1-2
        #   bytes/pixel. uint8 is bit-exact for the PNG path (the same
        #   rounding the writer applies); int16 adds ~90 dB of
        #   quantization SNR headroom over the model's ~30 dB PSNR.
        # transpose_io: batches arrive (N, w, h) — the TRANSPOSED slice
        # layout a NIfTI volume's F-order buffer exposes as a free
        # C-contiguous view (volume (h, w, n) F-order == buffer (n, w, h)
        # C-order) — and outputs return (N, 2w, 2h), which the host
        # writes back F-order byte-for-byte. Both swaps run ON DEVICE
        # (an XLA transpose), so whole-volume serving does ZERO host
        # copies on either side: measured 360 -> thousands of slices/s
        # on the host decode stage (tools/bench_serve_e2e.py).
        self.transpose_io = bool(transpose_io)
        self.normalize_inputs = bool(normalize_inputs)
        if transpose_io and not normalize_inputs:
            raise ValueError("transpose_io requires normalize_inputs (the "
                             "device-side input path does the swap)")
        self.out_dtype = np.dtype(out_dtype if out_dtype is not None
                                  else np.float32)
        if self.out_dtype not in (np.dtype(np.float32), np.dtype(np.uint8),
                                  np.dtype(np.int16)):
            raise ValueError(f"out_dtype must be float32/uint8/int16, got "
                             f"{self.out_dtype}")
        if normalize_inputs and quant == "int8":
            raise ValueError(
                "normalize_inputs is incompatible with --quant int8: the "
                "engine's content-aware routing reads normalized [0,1] "
                "pixels on the host; normalize on the host for int8 "
                "serving")
        if transpose_io and tta:
            raise ValueError(
                "transpose_io does not compose with tta (the ensemble's "
                "transform table is defined on (N, h, w) batches); serve "
                "TTA volumes through the standard layout")
        self._norm_fn: dict = {}     # (dtype,nb,h,w,bh,bw) -> device program
        self._pack_jit = None        # device-side output packing
        # test-time augmentation: average the forward over the dihedral
        # flips (8 transforms for square inputs, 4 otherwise). Dense,
        # frozen-int8 AND row-sharded batches run the ON-DEVICE ensemble
        # (ops/tta.py: one jitted program, one host<->device round trip;
        # the spatial variant wraps the shard_map forward in the traced
        # loop body); only still-calibrating int8 falls back to the
        # host-side loop over the single-forward program
        self.tta = tta
        self._tta_fwd: dict = {}     # square? -> jitted device ensemble
        self._dtype = jnp.bfloat16 if bf16 else jnp.float32
        self.model = build_model(model_cfg, dtype=self._dtype)
        self.spatial_shards = spatial_shards
        if quant not in ("none", "int8"):
            raise ValueError(f"unknown quant mode {quant!r}")
        if quant == "int8":
            from mri_superresolution_tpu.models import quant_forward
            if not quant_forward.supported(model_cfg.model_type):
                raise ValueError(
                    f"--quant int8 supports model types "
                    f"{quant_forward.supported_types()}, not "
                    f"{model_cfg.model_type!r}")
            if quant_calib_slices < 1:
                raise ValueError("quant_calib_slices must be >= 1")
            if model_cfg.model_type == "unet_tpu":
                logger.warning(
                    "--quant int8 on model type 'unet_tpu' is MEASURED "
                    "SLOWER than bf16 end-to-end (2,458 vs 2,558 slices/s/"
                    "chip, RESULTS.md §2b) — the bf16→int8 quantize pass "
                    "outweighs the conv wins at its shallow final stage. "
                    "Prefer plain bf16 unless you need the memory savings.")
        self.quant = quant
        self.quant_calib_path = quant_calib_path
        self.quant_calib_slices = quant_calib_slices
        self.quant_min_foreground = quant_min_foreground
        self._quant_scales = None    # frozen per-site scales (None while
        #                              calibrating; set by _build_int8 —
        #                              the "scales frozen" indicator for
        #                              BOTH the dense and spatial paths)
        self._quant_fwd = None       # dense int8 forward (built on freeze)
        self._quant_fn_raw = None    # its unjitted body (TTA wraps it)
        self._calib_fwd = None       # bf16 forward that also records amax
        self._spatial_int8_cache: dict = {}   # (bh, bw) -> jitted int8 fwd
        self._spatial_calib_cache: dict = {}  # (bh, bw) -> jitted calib fwd
        self._calib_amax: dict = {}
        self._calib_seen = 0         # real (un-padded) slices calibrated on
        self._quant_batches = {"int8": 0, "bf16": 0}
        self._last_quant_mode = None  # precision the last int8-path batch
        #                               was actually served at (TTA reads it)
        if spatial_shards > 1:
            # Row-sharded forwards (parallel/spatial.py): each slice is
            # split over `spatial_shards` devices with ppermute halos; the
            # remaining devices form the batch axis.
            from mri_superresolution_tpu.parallel import make_spatial_mesh
            from mri_superresolution_tpu.parallel import spatial as _sp
            if model_cfg.model_type not in _sp.supported_types():
                raise ValueError(
                    f"spatial_shards > 1 supports the "
                    f"{_sp.supported_types()} topologies, not "
                    f"{model_cfg.model_type!r}")
            from mri_superresolution_tpu.utils import backend
            n_vis = (num_devices if num_devices and num_devices > 0
                     else len(backend.devices()))
            if n_vis % spatial_shards != 0:
                raise ValueError(f"spatial_shards={spatial_shards} must "
                                 f"divide the {n_vis} mesh devices")
            self.mesh = make_spatial_mesh(n_vis // spatial_shards,
                                          spatial_shards)
            self.n_devices = n_vis // spatial_shards  # batch-axis width
            self._spatial_fwd_cache: dict = {}
        else:
            self.mesh = make_mesh(num_devices)
            self.n_devices = self.mesh.devices.size
        self._rsh = replicated_sharding(self.mesh)
        self._dsh = data_sharding(self.mesh)
        self.params = jax.device_put(params, self._rsh)
        self.bucket = bucket
        self._compiled_shapes: set = set()
        self._forward = jax.jit(
            lambda p, x: jnp.clip(self.model.apply({"params": p}, x), 0.0, 1.0),
            in_shardings=(self._rsh, self._dsh),
            out_shardings=self._dsh)
        if (self.quant == "int8" and quant_calib_path
                and os.path.exists(quant_calib_path)):
            # deterministic serving: reuse previously frozen scales instead
            # of re-calibrating on whatever data arrives first
            from mri_superresolution_tpu.models import quant_forward
            scales, saved_type = quant_forward.load_scales(quant_calib_path)
            if saved_type != model_cfg.model_type:
                raise ValueError(
                    f"{quant_calib_path} holds scales for model type "
                    f"{saved_type!r}, not {model_cfg.model_type!r}")
            self._build_int8(scales)
            logger.info(f"int8 PTQ: loaded {len(scales)} frozen activation "
                        f"scales from {quant_calib_path}; serving int8 from "
                        "the first batch")

    def _build_int8(self, scales) -> None:
        """Freeze ``scales`` into the int8 serving forward. Dense engines
        build the shape-polymorphic jitted forward now; row-sharded
        (spatial) engines build one program per (bh, bw) lazily
        (_spatial_int8_fwd) since the shard_map topology is
        shape-specialized."""
        self._quant_scales = scales
        if self.spatial_shards > 1:
            # Validate the scales NOW (a truncated/mismatched sidecar must
            # fail at construction, like the dense path) and precompute
            # the folded int8 weights ONCE — every per-shape spatial
            # forward and TTA ensemble reuses them instead of re-fetching
            # the param tree and re-quantizing per bucket shape.
            from mri_superresolution_tpu.models import quant_forward
            self._host_params = jax.device_get(self.params)
            self._spatial_qweights = quant_forward.int8_qweights(
                self._host_params, scales, self.model_cfg.model_type)
            return
        from mri_superresolution_tpu.models import quant_forward
        fn = quant_forward.build_int8_forward(
            jax.device_get(self.params), scales,
            self.model_cfg.model_type, dtype=self._dtype)
        # raw (unjitted) clipped forward, kept for the on-device TTA
        # ensemble to wrap once scales are frozen (_tta_once)
        self._quant_fn_raw = lambda p, a: jnp.clip(fn(p, a), 0.0, 1.0)
        self._quant_fwd = jax.jit(
            self._quant_fn_raw,
            in_shardings=(self._rsh, self._dsh),
            out_shardings=self._dsh)

    def _spatial_int8_raw(self, bh: int, bw: int):
        """Unjitted row-sharded frozen-scale int8 forward for one bucket
        shape (parallel/spatial.build_spatial_int8_forward_raw) — the
        engine's int8 x spatial serving path (VERDICT r4 item 3); the
        on-device TTA ensemble wraps the same raw body. The folded int8
        weights were validated + computed once at freeze (_build_int8)."""
        from mri_superresolution_tpu.parallel.spatial import (
            build_spatial_int8_forward_raw)
        raw = build_spatial_int8_forward_raw(
            self.mesh, (bh, bw), self._host_params,
            self._quant_scales, self.model_cfg.model_type,
            dtype=self._dtype, qweights=self._spatial_qweights)
        return lambda p, a: jnp.clip(raw(p, a), 0.0, 1.0)

    def _spatial_int8_fwd(self, bh: int, bw: int):
        key = (bh, bw)
        if key not in self._spatial_int8_cache:
            self._spatial_int8_cache[key] = jax.jit(
                self._spatial_int8_raw(bh, bw))
        return self._spatial_int8_cache[key]

    def _spatial_calib_fwd(self, bh: int, bw: int):
        """Jitted row-sharded calib forward (bf16 value + pmax'd per-site
        amax) for one bucket shape — spatial streaming self-calibration."""
        key = (bh, bw)
        if key not in self._spatial_calib_cache:
            from mri_superresolution_tpu.models import quant_forward
            from mri_superresolution_tpu.parallel.spatial import (
                build_spatial_calib_forward_raw)
            sites = sorted(quant_forward.amax_template(
                self.params, (1, bh, bw, 1), self.model_cfg.model_type,
                dtype=self._dtype))
            raw = build_spatial_calib_forward_raw(
                self.mesh, (bh, bw), sites, self.model_cfg.model_type,
                dtype=self._dtype)
            self._spatial_calib_cache[key] = jax.jit(raw)
        return self._spatial_calib_cache[key]

    def _bucket_hw(self, h: int, w: int) -> Tuple[int, int]:
        bh = _round_up(max(h, 8), self.bucket)
        bw = _round_up(max(w, 8), self.bucket)
        if self.spatial_shards > 1:
            # row-sharded path needs H | 8*shards, W | 8 (spatial.py); like
            # bucket > 1 this trades GroupNorm-exactness at non-conforming
            # sizes for shard-local pooling
            bh = _round_up(bh, 8 * self.spatial_shards)
            bw = _round_up(bw, 8)
        return bh, bw

    def _maybe_pack(self, y) -> jnp.ndarray:
        """Device-side output packing (fp32 [0,1] -> uint8/int16) so the
        fetch moves 1-2 bytes/pixel; identity at the default float32.
        ops/functional.pack_unit is the single packing source (shared
        with artifacts and the daemon's scl_slope)."""
        from mri_superresolution_tpu.ops.functional import pack_unit
        if self.out_dtype == np.dtype(np.float32):
            return y
        if self._pack_jit is None:
            self._pack_jit = jax.jit(
                lambda t: pack_unit(t, self.out_dtype))
        return self._pack_jit(y)

    def _pack_host(self, y: np.ndarray) -> np.ndarray:
        """Host-side twin of :meth:`_maybe_pack` (host-loop TTA packs the
        ensemble MEAN, matching the on-device ensemble's pack-after-mean)."""
        from mri_superresolution_tpu.ops.functional import pack_unit_np
        return pack_unit_np(y, self.out_dtype)

    def _normalized_input(self, batch: np.ndarray, nb: int,
                          bh: int, bw: int) -> jnp.ndarray:
        """Upload the RAW (n, h, w) batch and run the reference
        percentile-window + minmax normalize (scripts/infer.py:97-130
        semantics, ops/normalize.py) per slice ON DEVICE, zero-padding to
        the (bh, bw) bucket afterwards — the percentiles see only real
        pixels, so bucketed serving stays normalize-exact."""
        from mri_superresolution_tpu.ops.normalize import (minmax_normalize,
                                                           percentile_window)
        n = batch.shape[0]
        h, w = ((batch.shape[2], batch.shape[1]) if self.transpose_io
                else (batch.shape[1], batch.shape[2]))
        key = (batch.dtype.str, nb, h, w, bh, bw)
        if key not in self._norm_fn:
            def run(x):
                if self.transpose_io:
                    # (nb, w, h) -> (nb, h, w): an XLA transpose on device
                    # replaces the cache-hostile host transpose of the
                    # volume's F-order buffer
                    x = x.swapaxes(1, 2)
                y = jax.vmap(
                    lambda s: minmax_normalize(percentile_window(s)))(x)
                y = y[..., None]
                if (bh, bw) != (h, w):
                    y = jnp.pad(y, ((0, 0), (0, bh - h), (0, bw - w),
                                    (0, 0)))
                return y
            self._norm_fn[key] = jax.jit(run, in_shardings=(self._dsh,),
                                         out_shardings=self._dsh)
        if n == nb:
            # already device-divisible: upload the caller's buffer as-is
            # (the zero-copy volume path lands here every full batch)
            return self._norm_fn[key](np.ascontiguousarray(batch))
        x = np.zeros((nb,) + batch.shape[1:], batch.dtype)
        x[:n] = batch
        return self._norm_fn[key](x)

    def _route_bf16(self, x, count: bool = True) -> jnp.ndarray:
        self._last_quant_mode = "bf16"
        if count:
            self._quant_batches["bf16"] += 1
        if self.spatial_shards > 1:
            return self._spatial_forward(x.shape[1], x.shape[2])(
                self.params, jnp.asarray(x))
        return self._forward(self.params, jnp.asarray(x))

    def _quant_upscale(self, x: np.ndarray, n_real_slices: int,
                       foreground_frac: float, calib_ok: bool = True,
                       count: bool = True, force_bf16: bool = False):
        """int8 PTQ serving with streaming self-calibration
        (models/quant_forward.py): content-rich batches run a full-bf16
        forward that simultaneously records each conv site's
        per-input-channel |x| range until ``quant_calib_slices`` real
        slices have been observed; the scales then freeze (folded into the
        int8 weights) and later batches run int8. A batch that single-
        handedly completes calibration is itself re-served int8 (so a
        one-image ``--quant int8`` run produces int8 output). Static
        scales keep every quantize a fusable elementwise op and are
        shape-independent, so one calibration serves all later shapes.

        ``foreground_frac`` is measured on the REAL pixels (before batch /
        bucket zero-padding, which would dilute it). Near-empty batches
        (< ``quant_min_foreground`` fraction of pixels above
        FOREGROUND_INTENSITY) are excluded from calibration — background
        slices at a volume's edges would freeze scales that hard-clip
        later anatomy — and are always served on the exact bf16 path,
        where the int8 noise floor (~26 dB PSNR, tools/quant_quality.py)
        would otherwise dominate their much-lower bf16 error.

        ``count=False`` suppresses the ``_quant_batches`` bookkeeping
        (TTA's non-identity members: one ensemble counts as ONE batch,
        matching the on-device path). ``force_bf16`` pins the exact path
        regardless of calibration state — the host TTA loop uses it so an
        ensemble whose identity pass was served bf16 stays uniformly bf16
        even when that pass itself froze the scales mid-ensemble."""
        from mri_superresolution_tpu.models import quant_forward

        if force_bf16 or foreground_frac < self.quant_min_foreground:
            return self._route_bf16(x, count=count)
        if self._quant_scales is None and not calib_ok:
            # TTA's non-identity transforms while calibrating: serve bf16
            # WITHOUT feeding the statistics (the identity pass already
            # counted these slices — 8 flips of one slice are not 8
            # calibration slices)
            return self._route_bf16(x, count=count)

        if self._quant_scales is None:
            if self.spatial_shards > 1:
                # row-sharded calib forward, shape-specialized per bucket
                calib = self._spatial_calib_fwd(x.shape[1], x.shape[2])
            else:
                if self._calib_fwd is None:
                    raw = quant_forward.build_calib_forward(
                        self.model_cfg.model_type, dtype=self._dtype,
                        jit_fn=False)
                    # same sharding contract as the serving forwards:
                    # batch data-sharded, params replicated
                    self._calib_fwd = jax.jit(
                        raw, in_shardings=(self._rsh, self._dsh),
                        out_shardings=(self._dsh, None))
                calib = self._calib_fwd
            first = self._calib_seen == 0
            y, amax = calib(self.params, jnp.asarray(x))
            for k, v in jax.device_get(amax).items():
                v = np.asarray(v, np.float32)
                self._calib_amax[k] = (np.maximum(self._calib_amax[k], v)
                                       if k in self._calib_amax else v)
            self._calib_seen += max(n_real_slices, 1)
            if self._calib_seen < self.quant_calib_slices:
                logger.info(f"int8 PTQ: calibrating "
                            f"({self._calib_seen}/{self.quant_calib_slices} "
                            "slices seen); serving bf16 meanwhile")
                self._last_quant_mode = "bf16"
                if count:
                    self._quant_batches["bf16"] += 1
                return jnp.clip(y, 0.0, 1.0)
            scales = quant_forward.scales_from_amax(self._calib_amax)
            logger.info(f"int8 PTQ: froze {len(scales)} activation scales "
                        f"after {self._calib_seen} calibration slice(s)")
            self._build_int8(scales)
            if self.quant_calib_path:
                quant_forward.save_scales(self.quant_calib_path, scales,
                                          self.model_cfg.model_type)
                logger.info(f"int8 PTQ: saved frozen scales to "
                            f"{self.quant_calib_path} — later runs will "
                            "serve int8 deterministically from batch 0")
            if not first:
                # this batch already has a bf16 result from the calib
                # forward — serve it (no second forward); int8 starts with
                # the next batch
                self._last_quant_mode = "bf16"
                if count:
                    self._quant_batches["bf16"] += 1
                return jnp.clip(y, 0.0, 1.0)
            # single-batch calibration: re-serve this batch int8

        self._last_quant_mode = "int8"
        if count:
            self._quant_batches["int8"] += 1
        if self.spatial_shards > 1:
            return self._spatial_int8_fwd(x.shape[1], x.shape[2])(
                self.params, jnp.asarray(x))
        return self._quant_fwd(self.params, jnp.asarray(x))

    @property
    def quant_calibrating(self) -> bool:
        """True while int8 streaming self-calibration is still counting
        real slices (scales not yet frozen). The serving daemon's batcher
        disables zero-row batch padding during this phase so pad rows are
        never counted as calibration slices (_calib_seen contract)."""
        return self.quant == "int8" and self._quant_scales is None

    def quant_summary(self) -> str:
        """One-line serving account for CLIs to log after a --quant run."""
        c = self._quant_batches
        state = ("scales frozen" if self._quant_scales is not None else
                 f"calibration INCOMPLETE "
                 f"({self._calib_seen}/{self.quant_calib_slices} slices — "
                 "all batches were served bf16; lower --quant_calib_slices "
                 "or serve more data)")
        return (f"int8 PTQ summary: {c['int8']} batch(es) served int8, "
                f"{c['bf16']} bf16 (calibration/near-empty routing); {state}")

    def _spatial_forward(self, bh: int, bw: int):
        from mri_superresolution_tpu.parallel import build_spatial_forward
        key = (bh, bw)
        if key not in self._spatial_fwd_cache:
            fwd = build_spatial_forward(self.mesh, (bh, bw),
                                        dtype=self._dtype,
                                        model_type=self.model_cfg.model_type)
            self._spatial_fwd_cache[key] = jax.jit(
                lambda p, x: jnp.clip(fwd(p, x), 0.0, 1.0))
        return self._spatial_fwd_cache[key]

    def upscale_batch(self, batch: np.ndarray) -> np.ndarray:
        """(N, h, w) float [0,1] → (N, 2h, 2w) float [0,1].

        Runs at native spatial size by default (bucket=1): the model is fully
        convolutional, and spatial zero-padding would shift every GroupNorm's
        whole-image statistics and measurably change outputs — the reference
        likewise runs native sizes (scripts/infer.py:119-121). A bucket > 1
        trades that exactness for fewer recompiles in mixed-size serving
        (padding distortion grows with the padded fraction). Exception:
        ``spatial_shards > 1`` additionally pads H to a multiple of
        8*shards (and W to 8) even at bucket=1, so non-conforming sizes are
        NOT GroupNorm-exact on the spatial path (a warning is logged with
        the padded fraction). The batch axis is padded to a
        device-divisible count and cropped after.

        With ``tta=True`` the result is the mean over the dihedral
        transforms of t⁻¹(upscale(t(x))) — 8 transforms when h == w, the 4
        flips otherwise; composes with bucketing, int8 and spatial
        sharding. Dense batches run the ensemble ON DEVICE (ops/tta.py):
        transforms + forwards + mean in one jitted program, one
        host↔device round trip instead of n_transforms serialized
        upload/forward/fetch trips — including under shape bucketing
        (each member is zero-padded AFTER its dihedral transform inside
        the traced body and cropped before its inverse, the host loop's
        exact order) and including int8 once its scales are frozen
        (sidecar-loaded or calibration complete), with the near-empty
        bf16 routing decided once per batch (dihedral transforms
        preserve the foreground fraction). Row-sharded (spatial) batches
        ALSO run on device: the ensemble wraps the shard_map forward, so
        halo ppermutes and the dihedral loop compile into one program.
        Only int8 STILL CALIBRATING (host-side routing state machine)
        falls back to the host-side loop,
        where every transform preserves the input shape so ONE compiled
        single-forward program serves all of them. int8 caveat: during
        streaming calibration only the untransformed pass feeds the amax
        statistics (each real slice counts once, not n_transforms times)
        and the remaining transforms follow the same precision the
        identity pass was served at — one ensemble never mixes bf16 and
        int8 members.
        """
        if not self.tta:
            return self._upscale_once(batch)
        n, h, w = batch.shape
        if self._tta_on_device():
            return self._tta_once(batch)
        from mri_superresolution_tpu.ops.tta import dihedral_pairs
        transforms = dihedral_pairs(square=(h == w))
        acc = np.zeros((n, 2 * h, 2 * w), np.float32)
        force_bf16 = False
        for i, (t, inv) in enumerate(transforms):
            # members fetch UNPACKED: the ensemble averages in fp32 and
            # packs the mean (the on-device ensemble's order)
            acc += np.asarray(
                inv(self._upscale_once(np.ascontiguousarray(t(batch)),
                                       _quant_calib_ok=(i == 0),
                                       _quant_count=(i == 0),
                                       _quant_force_bf16=force_bf16,
                                       _pack=False)))
            if i == 0 and self.quant == "int8":
                # the remaining members follow the identity pass's served
                # precision — one ensemble never mixes bf16 and int8, even
                # when the identity pass itself completes calibration
                force_bf16 = self._last_quant_mode == "bf16"
        return self._pack_host(acc / len(transforms))

    def _tta_on_device(self) -> bool:
        """True when a --tta batch runs as ONE device dispatch (ops/tta.py):
        dense OR row-sharded forwards and, under int8, frozen scales (the
        spatial ensemble wraps the shard_map forward — bf16 or frozen-int8
        — inside the traced loop body). The one host-loop ensemble left is
        still-calibrating int8 — its routing state machine lives on the
        host. May flip host→device mid-stream when calibration completes;
        never the other way."""
        return self.quant != "int8" or self._quant_scales is not None

    def _tta_once(self, batch: np.ndarray) -> np.ndarray:
        return np.asarray(self._tta_dispatch(batch))

    def _tta_dispatch(self, batch: np.ndarray) -> jnp.ndarray:
        """On-device dihedral ensemble (ops/tta.py) for dense batches:
        numerically the host loop's math (same forwards, transform-then-
        pad order, fp32 mean) in one dispatch. Costs one extra compile
        per square/rect (x bf16/int8) variant — ONE forward body under a
        lax.fori_loop (ops/tta.py; inlining all members OOMs HBM at
        serving batch sizes). Shape buckets are honored inside the traced
        body (each member is padded AFTER its transform and cropped
        before its inverse, via bucket_fn=self._bucket_hw). With frozen
        int8 scales the ensemble wraps the int8 forward, after the same
        per-batch near-empty bf16 routing the host path applies (the
        dihedral transforms preserve the foreground fraction, so one
        routing decision serves all members)."""
        from mri_superresolution_tpu.ops.tta import build_tta_ensemble

        n, h, w = batch.shape
        bh, bw = self._bucket_hw(h, w)
        nb = _round_up(max(n, 1), self.n_devices)
        square = h == w
        mode = "bf16"
        if self.quant == "int8":
            frac = float((np.abs(batch) > FOREGROUND_INTENSITY).mean())
            if frac >= self.quant_min_foreground:
                mode = "int8"
            self._quant_batches[mode] += 1
        spatial = self.spatial_shards > 1
        # the row-sharded raw forward is built per (bh, bw) — key on it;
        # dense ensembles stay shape-polymorphic (bucket resolved at trace)
        key = (square, mode, (bh, bw) if spatial else None)
        if key not in self._tta_fwd:
            if spatial:
                from mri_superresolution_tpu.parallel.spatial import (
                    build_spatial_forward_raw, spatial_input_sharding)
                if mode == "int8":
                    # frozen-scale row-sharded int8 forward in the traced
                    # ensemble body (near-empty routing already decided
                    # per batch above, like the dense int8 ensemble)
                    raw = self._spatial_int8_raw(bh, bw)
                else:
                    sp_raw = build_spatial_forward_raw(
                        self.mesh, (bh, bw), dtype=self._dtype,
                        model_type=self.model_cfg.model_type)
                    raw = lambda p, a: jnp.clip(sp_raw(p, a), 0.0, 1.0)
                x_sh = spatial_input_sharding(self.mesh)
            else:
                raw = (self._quant_fn_raw if mode == "int8" else
                       lambda p, a: jnp.clip(
                           self.model.apply({"params": p}, a), 0.0, 1.0))
                x_sh = self._dsh
            self._tta_fwd[key] = jax.jit(
                build_tta_ensemble(raw, square=square,
                                   bucket_fn=self._bucket_hw),
                in_shardings=(self._rsh, x_sh),
                out_shardings=x_sh)
        if ("tta", mode, nb, h, w) not in self._compiled_shapes:
            self._compiled_shapes.add(("tta", mode, nb, h, w))
            padded = ("" if (bh, bw) == (h, w) else
                      f" (members padded to {bh}x{bw} in-program)")
            shard = (f", rows sharded {self.spatial_shards}-way"
                     if spatial else "")
            logger.info(
                f"Compiling on-device {mode} TTA ensemble "
                f"({8 if square else 4} members, one looped forward "
                f"body) for shape ({nb}, {h}, {w}){padded}{shard} — one "
                "host↔device round trip per batch instead of one per "
                "transform.")
            if spatial and (bh > h or bw > w):
                logger.warning(
                    f"spatial_shards={self.spatial_shards} pads {h}x{w} "
                    f"TTA members to {bh}x{bw}: whole-image GroupNorm "
                    "statistics differ from the dense forward (same "
                    "caveat as non-TTA spatial serving).")
        if self.normalize_inputs:
            # normalize commutes with every dihedral transform (the
            # percentile/minmax statistics are permutation-invariant), so
            # normalizing once before the ensemble is exact; the bucket
            # pad still happens per member inside the traced body
            xd = self._normalized_input(batch, nb, h, w)
        else:
            x = np.zeros((nb, h, w, 1), np.float32)
            x[:n, :, :, 0] = batch
            xd = jnp.asarray(x)
        y = self._tta_fwd[key](self.params, xd)
        # device slice enqueued NOW (before any later batch's forward) so a
        # pipelined caller's deferred fetch never waits on newer work
        return self._maybe_pack(y[:n, :, :, 0])

    def _upscale_once(self, batch: np.ndarray,
                      _quant_calib_ok: bool = True,
                      _quant_count: bool = True,
                      _quant_force_bf16: bool = False,
                      _pack: bool = True) -> np.ndarray:
        return np.asarray(self._dispatch_once(
            batch, _quant_calib_ok=_quant_calib_ok,
            _quant_count=_quant_count,
            _quant_force_bf16=_quant_force_bf16, _pack=_pack))

    def _dispatch_once(self, batch: np.ndarray,
                       _quant_calib_ok: bool = True,
                       _quant_count: bool = True,
                       _quant_force_bf16: bool = False,
                       _pack: bool = True) -> jnp.ndarray:
        """One forward dispatched to the device, output slice enqueued,
        NOTHING fetched — the returned array is a future a pipelined
        caller (``upscale_batches``) materializes later."""
        n = batch.shape[0]
        h, w = ((batch.shape[2], batch.shape[1]) if self.transpose_io
                else (batch.shape[1], batch.shape[2]))
        bh, bw = self._bucket_hw(h, w)
        nb = _round_up(max(n, 1), self.n_devices)
        if (nb, bh, bw) not in self._compiled_shapes:
            self._compiled_shapes.add((nb, bh, bw))
            extra = ("" if self.quant != "int8" else
                     " int8 serving compiles up to twice more per shape "
                     "(calibration forward + frozen-scale int8 forward).")
            logger.info(
                f"Compiling forward for padded shape ({nb}, {bh}, {bw}) — "
                f"{len(self._compiled_shapes)} distinct shape(s) so far. "
                "Heterogeneous test sets recompile per shape (minutes on the "
                f"TPU tunnel); set bucket > 1 (e.g. --bucket 32) to coalesce."
                f"{extra}")
            if self.spatial_shards > 1 and (bh > h or bw > w):
                pad_frac = 1.0 - (h * w) / (bh * bw)
                logger.warning(
                    f"spatial_shards={self.spatial_shards} pads "
                    f"{h}x{w} inputs to {bh}x{bw} "
                    f"({pad_frac:.1%} zero pixels): whole-image GroupNorm "
                    "statistics now differ from the dense forward. Use "
                    f"H % {8 * self.spatial_shards} == 0, W % 8 == 0 "
                    "inputs for exact spatial serving.")
        if self.normalize_inputs:
            xd = self._normalized_input(batch, nb, bh, bw)
            y = (self._spatial_forward(bh, bw)(self.params, xd)
                 if self.spatial_shards > 1
                 else self._forward(self.params, xd))
        else:
            x = np.zeros((nb, bh, bw, 1), np.float32)
            x[:n, :h, :w, 0] = batch
            if self.quant == "int8":
                # dense AND row-sharded int8 (the routing/calibration
                # state machine dispatches to the spatial forwards itself)
                y = self._quant_upscale(
                    x, n,
                    float((np.abs(batch) > FOREGROUND_INTENSITY).mean()),
                    calib_ok=_quant_calib_ok, count=_quant_count,
                    force_bf16=_quant_force_bf16)
            elif self.spatial_shards > 1:
                y = self._spatial_forward(bh, bw)(self.params,
                                                  jnp.asarray(x))
            else:
                y = self._forward(self.params, jnp.asarray(x))
        # device slice (see _tta_dispatch for why it's enqueued here)
        y = y[:n, :2 * h, :2 * w, 0]
        if self.transpose_io:
            # return (N, 2w, 2h): the host writes it back into the output
            # volume's F-order buffer byte-for-byte, no transpose copy
            y = y.swapaxes(1, 2)
        return self._maybe_pack(y) if _pack else y

    def upscale_batches(self, batches,
                        depth: int = 2) -> "Iterator[np.ndarray]":
        """Pipelined serving over an iterable of (N, h, w) batches: yields
        exactly ``map(self.upscale_batch, batches)`` (same values, same
        order, same compile/calibration/TTA state machine — the stateful
        int8 routing runs at dispatch time in batch order) but dispatches
        up to ``depth`` batches' uploads + forwards to the device BEFORE
        fetching batch i's output, so the device→host fetch — a blocking
        RPC moving 4·N·(2h·2w) bytes per batch on the axon tunnel,
        typically the long pole of volume serving — overlaps later
        batches' uploads AND compute instead of serializing after them.
        depth=1 is classic double buffering; depth=2 (default) also
        overlaps the NEXT upload with the current fetch — measured 35%
        faster whole-volume serving on the tunnel (the serving daemon's
        z-chunked handler keeps the same 2-deep window, RESULTS §7e) at
        the cost of ``depth`` extra output buffers resident on device.
        The reference's inference loop has no analogue
        (scripts/infer.py:230-276 is strictly sequential). Host-loop TTA
        ensembles (still-calibrating int8) are inherently synchronous —
        those batches flush the pipeline and run sequentially; a
        mid-stream calibration freeze re-enables pipelining from the
        next batch.
        """
        from collections import deque
        depth = max(1, int(depth))
        window: deque = deque()
        for b in batches:
            if self.tta and not self._tta_on_device():
                while window:
                    yield np.asarray(window.popleft())
                yield self.upscale_batch(b)
                continue
            window.append(self._tta_dispatch(b) if self.tta
                          else self._dispatch_once(b))
            if len(window) > depth:
                yield np.asarray(window.popleft())
        while window:
            yield np.asarray(window.popleft())

    def upscale_image(self, image01: np.ndarray) -> np.ndarray:
        return self.upscale_batch(image01[None])[0]

    def upscale_tiled(self, image01: np.ndarray, tile: int = 256,
                      halo: int = 16) -> np.ndarray:
        """Spatially-tiled upscale with halo overlap for slices too large to
        fit one forward pass.

        This is the spatial analogue of sequence parallelism for this
        workload (SURVEY.md §2.2/§5): the slice is cut into ``tile``-sized
        patches with a ``halo``-pixel overlap; all tiles run as ONE sharded
        batch over the mesh, and the 2x-upscaled interiors are stitched,
        discarding the halos so tile seams carry full receptive-field
        context. The reference has no counterpart (it warns on large inputs
        and runs them whole, scripts/infer.py:119-121).
        """
        h, w = image01.shape
        if h <= tile and w <= tile:
            return self.upscale_image(image01)
        if self.normalize_inputs:
            raise ValueError(
                "normalize_inputs normalizes per forward-pass input, which "
                "under tiling would be per-TILE, not per-slice; normalize "
                "on the host (or use spatial_shards) for tiled serving")
        stride = tile - 2 * halo
        assert stride > 0, "tile must exceed 2*halo"
        ys = list(range(0, max(h - 2 * halo, 1), stride))
        xs = list(range(0, max(w - 2 * halo, 1), stride))
        # pad so every tile is fully in-bounds
        pad_h = ys[-1] + tile - h if ys[-1] + tile > h else 0
        pad_w = xs[-1] + tile - w if xs[-1] + tile > w else 0
        padded = np.pad(image01, ((0, pad_h), (0, pad_w)), mode="reflect")

        tiles = np.stack([padded[y:y + tile, x:x + tile]
                          for y in ys for x in xs])
        up = self.upscale_batch(tiles)  # (n, 2*tile, 2*tile)

        out = np.zeros((2 * (h + pad_h), 2 * (w + pad_w)), self.out_dtype)
        i = 0
        for y in ys:
            for x in xs:
                # interior region of this tile (keep halo only at borders)
                y0 = 0 if y == 0 else halo
                x0 = 0 if x == 0 else halo
                y1 = tile if y + tile >= h + pad_h else tile - halo
                x1 = tile if x + tile >= w + pad_w else tile - halo
                out[2 * (y + y0):2 * (y + y1), 2 * (x + x0):2 * (x + x1)] = \
                    up[i, 2 * y0:2 * y1, 2 * x0:2 * x1]
                i += 1
        return out[:2 * h, :2 * w]

    # ------------------------------------------------------------- metrics

    @staticmethod
    def calculate_metrics(output01: np.ndarray,
                          target01: np.ndarray) -> Dict[str, float]:
        """SSIM/RMSE/MAE (parity: scripts/infer.py:148-171); target is
        bicubic-resized if shapes differ (scripts/infer.py:317-324)."""
        if output01.shape != target01.shape:
            logger.warning(
                f"Target shape {target01.shape} differs from output "
                f"{output01.shape}; resizing target with bicubic")
            target01 = np.asarray(resize(jnp.asarray(target01),
                                         output01.shape, Interp.CUBIC))
        o = jnp.asarray(output01)[None, :, :, None]
        t = jnp.asarray(target01)[None, :, :, None]
        m = float(mse(o, t))
        return {
            "ssim": float(ssim(o, t)),
            "rmse": float(np.sqrt(m)),
            "mae": float(mae(o, t)),
        }

    # ------------------------------------------------------- single image

    def process_single_image(self, input_path: str, output_path: str,
                             target_path: Optional[str] = None,
                             show_comparison: bool = False,
                             show_diff: bool = False,
                             save_figures_to: Optional[str] = None,
                             ) -> Tuple[np.ndarray, Optional[Dict[str, float]]]:
        """Full single-image pipeline (parity: scripts/infer.py:230-396).

        Returns (output float [0,1] array, metrics or None).
        """
        import cv2

        raw = cv2.imread(input_path, cv2.IMREAD_GRAYSCALE)
        if raw is None:
            raise RuntimeError(f"Error loading image {input_path}")
        h, w = raw.shape
        if h % 8 != 0 or w % 8 != 0:
            logger.warning(
                f"Input image dimensions ({h}x{w}) are not divisible by 8. "
                "Padded internally to the shape bucket.")
        inp01 = preprocess_image_array(raw)

        target01 = None
        if target_path and os.path.exists(target_path):
            traw = cv2.imread(target_path, cv2.IMREAD_GRAYSCALE)
            if traw is not None:
                target01 = preprocess_image_array(traw)
                logger.info(f"Loaded target image {target_path} with shape "
                            f"{target01.shape}")

        out01 = self.upscale_image(inp01)

        # histogram matching vs the normalized target (scripts/infer.py:278-314)
        out_adj = out01
        if target01 is not None:
            try:
                logger.info("Applying histogram matching using target image "
                            "as reference.")
                out_adj = np.clip(
                    match_histograms_np(out01, target01), 0.0, 1.0)
            except Exception as e:  # fall back to raw output (:311-313)
                logger.error(f"Error during histogram matching: {e}. "
                             "Using raw model output.")
                out_adj = out01

        metrics = None
        if target01 is not None:
            metrics = self.calculate_metrics(out01, target01)
            for k, v in metrics.items():
                logger.info(f"{k.upper()}: {v:.4f}")

        cv2.imwrite(output_path, np.clip(out_adj * 255, 0, 255).astype(np.uint8))
        logger.info(f"Enhanced image saved to {output_path}")

        if (show_comparison or show_diff) and save_figures_to:
            self._save_figures(inp01, out_adj, target01, metrics,
                               show_diff, save_figures_to)
        return out_adj, metrics

    @staticmethod
    def _save_figures(inp01, out01, target01, metrics, show_diff,
                      save_path: str) -> None:
        """Comparison/diff figure (parity: scripts/infer.py:173-228)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        has_target = target01 is not None
        n_cols = 2 + int(has_target) + int(has_target and show_diff)
        plt.figure(figsize=(n_cols * 4, 5))
        plt.subplot(1, n_cols, 1)
        plt.imshow(inp01, cmap="gray")
        plt.title("Input Low-Resolution")
        plt.axis("off")
        plt.subplot(1, n_cols, 2)
        plt.imshow(out01, cmap="gray")
        plt.title("Super-Resolution Output")
        plt.axis("off")
        if has_target:
            plt.subplot(1, n_cols, 3)
            plt.imshow(target01, cmap="gray")
            plt.title("Ground Truth")
            plt.axis("off")
        if has_target and show_diff:
            t = target01
            if t.shape != out01.shape:
                t = np.asarray(resize(jnp.asarray(t), out01.shape, Interp.CUBIC))
            diff = np.abs(out01 - t)
            plt.subplot(1, n_cols, 4)
            im = plt.imshow(diff, cmap="hot", vmin=0, vmax=0.5)
            plt.title("Absolute Difference")
            plt.axis("off")
            plt.colorbar(im, fraction=0.046, pad=0.04)
        if metrics:
            text = "\n".join(f"{k.upper()}: {v:.4f}" for k, v in metrics.items())
            plt.figtext(0.5, 0.01, text, ha="center", fontsize=12,
                        bbox={"facecolor": "orange", "alpha": 0.2, "pad": 5})
        plt.tight_layout()
        plt.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close()


def load_engine(cfg: InferConfig, num_devices: int = 1) -> InferenceEngine:
    """Resolve the checkpoint (explicit path or best→final→any discovery,
    scripts/infer.py:74-95 + 416-423) and build an engine."""
    if cfg.checkpoint_path and os.path.exists(cfg.checkpoint_path):
        path = cfg.checkpoint_path
        logger.info(f"Using specified checkpoint: {path}")
    else:
        path = ckpt.find_best_checkpoint(cfg.checkpoint_dir,
                                         cfg.model.model_type)
        logger.info(f"Automatically selected checkpoint: {path}")
    params, meta = ckpt.load_params_any(path)
    model_cfg = cfg.model
    mc = (meta.get("config") or {}).get("model") if isinstance(meta, dict) else None
    if mc:
        # checkpoints carry their hyperparams — trust them over CLI defaults
        from mri_superresolution_tpu.config import model_config_from_dict
        model_cfg = model_config_from_dict(mc)
        logger.info(f"Model hyperparams from checkpoint: "
                    f"base_filters={model_cfg.base_filters}")
    quant_calib_path = cfg.quant_calib_path
    if cfg.quant == "int8" and not quant_calib_path:
        # QAT checkpoints (train.py --qat) carry a frozen calibration
        # sidecar: auto-load it so the model serves with the exact scales
        # it trained against (streaming self-calibration would otherwise
        # re-estimate them from serving data)
        sidecar = ckpt.calib_sidecar_path(path)
        if os.path.exists(sidecar):
            quant_calib_path = sidecar
            logger.info(f"Found QAT calibration sidecar {sidecar}; "
                        f"serving with the trained activation scales")
    return InferenceEngine(model_cfg, params, bf16=cfg.bf16,
                           bucket=cfg.bucket, num_devices=num_devices,
                           spatial_shards=cfg.spatial_shards,
                           quant=cfg.quant,
                           quant_calib_slices=cfg.quant_calib_slices,
                           quant_min_foreground=cfg.quant_min_foreground,
                           quant_calib_path=quant_calib_path,
                           tta=cfg.tta,
                           normalize_inputs=cfg.normalize_inputs,
                           out_dtype=cfg.out_dtype,
                           transpose_io=cfg.transpose_io)
