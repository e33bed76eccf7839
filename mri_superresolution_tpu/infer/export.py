"""Portable serving artifacts via jax.export (VERDICT r3 item 9).

An artifact is ONE file containing the AOT-lowered (StableHLO) serving
forward with the weights baked in as constants — loadable and runnable
WITHOUT the model code, checkpoint format, or even this package's models/
tree (only jax + this module's ~100 lines of container parsing). The
nearest reference analogue is ``load_model`` rebuilding the architecture
in Python and loading a state dict (/root/reference/scripts/infer.py:41-72);
this is the TPU-native improvement: the compiler IR is the interchange
format, so serving hosts need no torch/flax model zoo and cannot drift
from the training-time architecture.

Design:
- the batch dimension is SYMBOLIC (one program serves any batch size);
- H and W are specialized per shape — the U-Net's pad-to-match logic is
  Python control flow on concrete dims (symbolic H/W fails to trace), so
  an artifact carries one program per requested (H, W), mirroring the
  engine's shape-bucket design;
- programs are exported for both 'cpu' and 'tpu' lowering platforms, so
  one artifact serves a TPU pod and a CPU fallback host;
- container format: magic + JSON header + length-prefixed serialized
  programs (no pickle anywhere).

Exactness: the exported program is the SAME jitted clipped forward the
engine runs (tests/test_export.py pins artifact output == engine output).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

MAGIC = b"MRISRX1\n"


def export_artifact(path: str, params, model_cfg,
                    shapes: Sequence[Tuple[int, int]],
                    bf16: bool = True,
                    platforms: Sequence[str] = ("cpu", "tpu"),
                    mode: str = "plain",
                    quant_scales=None,
                    min_foreground: float = 0.05,
                    serve_raw: bool = False,
                    raw_dtype: str = "int16",
                    out_dtype: str = "float32",
                    spatial_shards: int = 1,
                    spatial_devices: int = 0,
                    spatial_batch: int = 0) -> None:
    """AOT-lower the clipped serving forward at each (H, W) in ``shapes``
    (batch symbolic) and write the single-file artifact.

    ``mode`` selects which serving program is baked in:
    - "plain": the bf16/fp32 clipped forward (default);
    - "tta":   the full on-device dihedral ensemble (ops/tta.py — 8
               members for square shapes, 4 otherwise) as ONE program,
               so artifact hosts get TTA without any ensemble logic;
    - "int8":  the frozen-scale int8 forward (requires ``quant_scales``,
               e.g. loaded from a QAT sidecar via quant_forward
               .load_scales) with the quantized weights baked in. Each
               shape carries TWO programs — int8 and the plain forward —
               and the loader applies the engine's content-aware
               routing (a batch under ``min_foreground`` fraction of
               foreground pixels serves bf16: int8's noise floor is
               ~26 dB PSNR on near-blank slices, infer/engine.py:345),
               so artifact hosts keep the quality guardrail for free.

    Transfer controls (VERDICT r4 item 1b — the engine's measured 2.6x
    zero-copy path for AOT hosts, infer/engine.py:81-110):
    - ``out_dtype`` "int16"/"uint8": outputs pack ON DEVICE
      (round(y*32767) / round(y*255)), so the host fetches 1-2
      bytes/pixel. Composes with "plain" and "tta" (the ensemble packs
      its fp32 MEAN, the engine's order); refused for "int8" (its routed
      fallback pairing stays float — serve packed int8 from a
      checkpoint engine).
    - ``serve_raw`` (mode "plain" only): programs take RAW
      ``raw_dtype`` batches in the TRANSPOSED (b, w, h, 1) layout a
      NIfTI F-order buffer exposes for free, run the reference
      percentile-window + minmax normalize ON DEVICE, and return
      (b, 2w, 2h, 1) outputs that write back F-order byte-for-byte —
      the host never touches a float voxel. One raw input dtype per
      artifact (re-export for another).

    Row-sharded (spatial) artifacts (VERDICT r4 item 6):
    ``spatial_shards`` > 1 bakes the shard_map forward over a
    (data, space) mesh — halo ppermutes, psum GroupNorm stats and all —
    into the exported StableHLO, so a multi-chip serving host runs
    slices too large per chip with NO model code. ``jax.export``
    records the device count (``spatial_devices``; 0 = all visible at
    export); the loader reconstructs the mesh over the first N devices
    of the serving host. The toolchain cannot combine a SYMBOLIC batch
    with a multi-device program (measured: the export segfaults), so
    spatial programs carry a CONCRETE batch (``spatial_batch``, default
    the data-axis width); the loader zero-pads the batch axis up to it
    (exact — every per-sample computation is independent of pad rows)
    and chunks larger batches. Composes with ``out_dtype`` and modes
    "plain"/"tta"/"int8" (int8 folds the frozen scales into the
    row-sharded forward; the routed fallback pair is row-sharded too);
    ``serve_raw`` is refused (the device-side percentile normalize
    would need whole-slice psums the raw program does not carry —
    normalize on the host and serve fp32).
    """
    from jax import export as jexport

    from mri_superresolution_tpu.models import build_model

    if mode not in ("plain", "tta", "int8"):
        raise ValueError(f"unknown artifact mode {mode!r}")
    out_dt = np.dtype(out_dtype)
    if out_dt not in (np.dtype(np.float32), np.dtype(np.int16),
                      np.dtype(np.uint8)):
        raise ValueError(f"out_dtype must be float32/int16/uint8, "
                         f"got {out_dtype}")
    if mode == "int8" and out_dt != np.dtype(np.float32):
        raise ValueError("out_dtype packing does not compose with "
                         "mode='int8' artifacts (the routed int8+fallback "
                         "pair stays float32); use a checkpoint engine "
                         "for packed int8 serving")
    if serve_raw and mode != "plain":
        raise ValueError("serve_raw composes with mode='plain' only "
                         "(the tta ensemble's transform table and the "
                         "int8 host-side routing both read the standard "
                         "normalized layout)")
    in_dt = np.dtype(raw_dtype)
    if serve_raw and in_dt not in (np.dtype(np.uint8), np.dtype(np.uint16),
                                   np.dtype(np.int16),
                                   np.dtype(np.float32)):
        raise ValueError(f"raw_dtype must be uint8/uint16/int16/float32, "
                         f"got {raw_dtype}")

    spatial = int(spatial_shards) > 1
    if spatial and serve_raw:
        raise ValueError(
            "serve_raw does not compose with spatial artifacts (the "
            "device-side percentile normalize needs whole-slice "
            "statistics a row-sharded program would have to psum; "
            "normalize on the host and serve fp32)")
    if spatial:
        ndev = spatial_devices or len(jax.devices())
        if ndev % spatial_shards:
            raise ValueError(f"spatial_shards={spatial_shards} must "
                             f"divide the {ndev} export devices")
        n_data = ndev // spatial_shards
        sp_batch = spatial_batch or n_data
        if sp_batch % n_data:
            raise ValueError(f"spatial_batch={sp_batch} must be a "
                             f"multiple of the data-axis width {n_data}")
        from mri_superresolution_tpu.parallel.spatial import (
            build_spatial_forward_raw, build_spatial_int8_forward_raw,
            make_spatial_mesh, spatial_input_sharding)
        sp_mesh = make_spatial_mesh(n_data, spatial_shards)
        x_sh = spatial_input_sharding(sp_mesh)

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    model = build_model(model_cfg, dtype=dtype)
    plain = lambda x: jnp.clip(
        model.apply({"params": params}, x), 0.0, 1.0)
    if mode == "int8":
        from mri_superresolution_tpu.models import quant_forward
        if quant_scales is None:
            raise ValueError("mode='int8' requires quant_scales (load a "
                             "QAT sidecar with quant_forward.load_scales)")
        int8_fn = quant_forward.build_int8_forward(
            jax.device_get(params), quant_scales, model_cfg.model_type,
            dtype=dtype)
        raw = lambda x: jnp.clip(int8_fn(params, x), 0.0, 1.0)
    else:
        raw = plain

    from mri_superresolution_tpu.ops.functional import pack_unit

    def pack(y):
        """Device-side output packing (the engine's single source,
        ops/functional.pack_unit)."""
        return pack_unit(y, out_dt)

    blobs = []
    for h, w in shapes:
        if spatial:
            if h % (8 * spatial_shards) or w % 8:
                raise ValueError(
                    f"spatial artifact shapes need H % "
                    f"{8 * spatial_shards} == 0 and W % 8 == 0 "
                    f"(got {h}x{w})")
            sp_raw = build_spatial_forward_raw(
                sp_mesh, (h, w), dtype=dtype,
                model_type=model_cfg.model_type)
            sp_plain = (lambda x, _f=sp_raw:
                        jnp.clip(_f(params, x), 0.0, 1.0))
            if mode == "int8":
                sp_i8 = build_spatial_int8_forward_raw(
                    sp_mesh, (h, w), jax.device_get(params), quant_scales,
                    model_cfg.model_type, dtype=dtype)
                core = (lambda x, _f=sp_i8:
                        jnp.clip(_f(params, x), 0.0, 1.0))
            elif mode == "tta":
                from mri_superresolution_tpu.ops.tta import (
                    build_tta_ensemble)
                # conforming shapes only, so every dihedral member keeps
                # its exact exported geometry (bucket_fn identity)
                core = (lambda x, _p=sp_plain, _sq=(h == w):
                        build_tta_ensemble(
                            lambda _u, a: _p(a), square=_sq,
                            bucket_fn=lambda th, tw: (th, tw))(None, x))
            else:
                core = sp_plain
            fn = jax.jit(lambda x, _c=core: pack(_c(x)),
                         in_shardings=x_sh, out_shardings=x_sh)
            spec = jax.ShapeDtypeStruct((sp_batch, h, w, 1), jnp.float32)
            exp = jexport.export(fn, platforms=tuple(platforms))(spec)
            blobs.append(exp.serialize())
            if mode == "int8":
                fb = jax.jit(sp_plain, in_shardings=x_sh,
                             out_shardings=x_sh)
                exp = jexport.export(fb, platforms=tuple(platforms))(spec)
                blobs.append(exp.serialize())
            continue
        if mode == "tta":
            # the ensemble zero-pads each member to %8 AFTER its dihedral
            # transform inside the traced body (the engine's exact order,
            # ops/tta.py), so tta artifacts accept any content shape;
            # packing applies to the fp32 ensemble MEAN (engine order)
            from mri_superresolution_tpu.ops.tta import build_tta_ensemble
            pad8 = lambda n: -(-n // 8) * 8
            fn = jax.jit(lambda x, _h=h, _w=w: pack(build_tta_ensemble(
                lambda _p, a: raw(a), square=(_h == _w),
                bucket_fn=lambda th, tw: (pad8(th), pad8(tw)))(None, x)))
        else:
            if h % 8 or w % 8:
                raise ValueError(
                    f"artifact shapes must be %8 (got {h}x{w}); the "
                    "engine's bucket padding is a host-side concern the "
                    "artifact does not carry (the loader's pad=True "
                    "applies it; tta-mode artifacts pad internally)")
            if serve_raw:
                from mri_superresolution_tpu.ops.normalize import (
                    minmax_normalize, percentile_window)

                def fn_raw(x):
                    # (b, w, h, 1) raw -> device swap -> per-slice
                    # normalize -> forward -> pack -> swap back
                    xs = x[..., 0].swapaxes(1, 2)
                    xn = jax.vmap(lambda s: minmax_normalize(
                        percentile_window(s)))(xs)[..., None]
                    return pack(raw(xn)).swapaxes(1, 2)

                fn = jax.jit(fn_raw)
            else:
                fn = jax.jit(lambda x: pack(raw(x)))
        b, = jexport.symbolic_shape("b")
        if serve_raw:
            spec = jax.ShapeDtypeStruct((b, w, h, 1),
                                        jnp.dtype(in_dt.name))
        else:
            spec = jax.ShapeDtypeStruct((b, h, w, 1), jnp.float32)
        exp = jexport.export(fn, platforms=tuple(platforms))(spec)
        blobs.append(exp.serialize())
        if mode == "int8":
            # the routing fallback program (same shape, plain forward)
            exp = jexport.export(jax.jit(plain),
                                 platforms=tuple(platforms))(spec)
            blobs.append(exp.serialize())

    transfer = serve_raw or out_dt != np.dtype(np.float32) or spatial
    header = {
        # v2 = two blobs per shape (int8 + routing fallback); v3 = raw
        # inputs / packed outputs / row-sharded programs (the I/O or
        # device contract changed — pre-r5 loaders must reject loudly
        # instead of feeding fp32 [0,1] single-device batches)
        "format": ("mri-sr-serving-artifact-v3" if transfer
                   else "mri-sr-serving-artifact-v2" if mode == "int8"
                   else "mri-sr-serving-artifact-v1"),
        "model_type": model_cfg.model_type,
        "base_filters": model_cfg.base_filters,
        "bf16": bool(bf16),
        "scale": 2,
        "mode": mode,
        "platforms": list(platforms),
        "shapes": [[int(h), int(w)] for h, w in shapes],
        "jax_version": jax.__version__,
    }
    if mode == "int8":
        # per shape: int8 program then its bf16 routing fallback
        header["routed"] = True
        header["min_foreground"] = float(min_foreground)
    if transfer:
        header["serve_raw"] = bool(serve_raw)
        header["raw_dtype"] = in_dt.name if serve_raw else None
        header["out_dtype"] = out_dt.name
    if spatial:
        header["spatial"] = {"n_data": int(n_data),
                             "n_space": int(spatial_shards),
                             "batch": int(sp_batch)}
    hdr = json.dumps(header, sort_keys=True).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        for blob in blobs:
            f.write(struct.pack("<Q", len(blob)))
            f.write(blob)
    os.replace(tmp, path)


class ServingArtifact:
    """A loaded artifact: shape-keyed AOT programs with a symbolic batch.

    ``upscale_batch`` mirrors the engine's contract ((N, h, w) float [0,1]
    -> (N, 2h, 2w)) for the shapes the artifact was exported at.
    """

    def __init__(self, header: Dict, programs: Dict[Tuple[int, int], object],
                 fallbacks: Optional[Dict[Tuple[int, int], object]] = None):
        self.header = header
        self.model_type = header["model_type"]
        self.mode = header.get("mode", "plain")
        self._programs = programs
        # int8 artifacts ship a plain-forward fallback per shape and the
        # engine's near-empty routing threshold (engine.py:345 parity)
        self._fallbacks = fallbacks or {}
        self.routed = bool(self._fallbacks)
        self.min_foreground = float(header.get("min_foreground", 0.05))
        # v3 transfer controls: raw transposed inputs / packed outputs.
        # Attribute names mirror InferenceEngine's so the serving daemon's
        # batcher + volume endpoint treat a raw artifact like a raw engine.
        self.normalize_inputs = bool(header.get("serve_raw", False))
        self.transpose_io = self.normalize_inputs
        self.raw_dtype = (np.dtype(header["raw_dtype"])
                          if self.normalize_inputs else None)
        self.out_dtype = np.dtype(header.get("out_dtype", "float32"))
        # row-sharded artifacts: {"n_data", "n_space", "batch"} — the
        # mesh is reconstructed lazily over the serving host's devices
        self.spatial = header.get("spatial")
        self._sp_sharding = None

    @property
    def shapes(self):
        return sorted(self._programs)

    def upscale_batch(self, batch: np.ndarray,
                      pad: bool = False) -> np.ndarray:
        """(N, h, w) float [0,1] -> (N, 2h, 2w).

        With ``pad=True`` a shape with no exact program is zero-padded to
        the smallest exported shape that fits and the output cropped —
        the engine's bucket-padding semantics, applied host-side (the
        GroupNorm-statistics caveat in engine.upscale_batch applies
        identically). Refused for 'tta'-mode artifacts: their baked
        ensemble transforms the PADDED array, so each member would see
        the zero margin in a different corner — pad-after-transform
        (what the engine traces) cannot be recovered outside the
        program; re-export at the exact shape instead.
        """
        y, (oh, ow) = self._dispatch(batch, pad)
        return np.asarray(y)[:, :oh, :ow, 0]

    def _dispatch(self, batch: np.ndarray, pad: bool):
        """Dispatch one batch to its program WITHOUT fetching: returns
        (device output, (crop_h, crop_w)). The output is an
        asynchronously-dispatched jax array; ``np.asarray`` on it is the
        synchronization point (upscale_batches exploits this to overlap
        batch i+1's compute with batch i's fetch)."""
        if self.spatial:
            return self._dispatch_spatial(batch, pad)
        if self.normalize_inputs:
            # raw transposed contract (engine transpose_io parity):
            # (n, w, h) stored-dtype in, (n, 2w, 2h) packed out
            n, wt, ht = batch.shape
            if pad and (ht, wt) not in self._programs:
                raise ValueError(
                    "serve_raw artifacts cannot serve unexported shapes "
                    "by padding (zero pads would dilute the baked "
                    "device-side percentile normalize); re-export with "
                    f"shape {ht}x{wt} included")
            if batch.dtype == np.float64 and \
                    self.raw_dtype == np.dtype(np.float32):
                batch = batch.astype(np.float32)
            if batch.dtype != self.raw_dtype:
                raise ValueError(
                    f"this raw artifact was exported for {self.raw_dtype} "
                    f"inputs, got {batch.dtype} (re-export with "
                    "--raw_dtype or convert on the host)")
            if (ht, wt) not in self._programs:
                raise ValueError(
                    f"artifact has no program for {ht}x{wt}; exported "
                    f"shapes: {self.shapes}")
            return (self._programs[(ht, wt)].call(
                np.ascontiguousarray(batch)[..., None]),
                (2 * wt, 2 * ht))
        n, h, w = batch.shape
        if (h, w) in self._programs:
            return (self._pick((h, w), batch).call(
                np.ascontiguousarray(batch, np.float32)[..., None]),
                (2 * h, 2 * w))
        if not pad:
            raise ValueError(
                f"artifact has no program for {h}x{w}; exported shapes: "
                f"{self.shapes} (re-export with this shape included)")
        if self.mode == "tta":
            raise ValueError(
                f"tta-mode artifact cannot serve {h}x{w} by padding (the "
                "baked ensemble would transform the zero margin); "
                "re-export with this exact shape included")
        fits = [s for s in self._programs if s[0] >= h and s[1] >= w]
        if not fits:
            raise ValueError(
                f"no exported shape fits {h}x{w}; exported shapes: "
                f"{self.shapes} (re-export with a larger shape)")
        ph, pw = min(fits, key=lambda s: s[0] * s[1])
        # routing decides on the REAL pixels, before padding (engine
        # parity: foreground_frac is measured pre-pad)
        prog = self._pick((ph, pw), batch)
        padded = np.zeros((n, ph, pw), np.float32)
        padded[:, :h, :w] = batch
        return prog.call(padded[..., None]), (2 * h, 2 * w)

    def _spatial_sharding(self):
        """Lazily reconstruct the (data, space) mesh + input sharding the
        programs were exported over, on the serving host's first
        n_data*n_space devices."""
        if self._sp_sharding is None:
            import jax as _jax
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            nd, ns = self.spatial["n_data"], self.spatial["n_space"]
            devs = _jax.devices()
            if len(devs) < nd * ns:
                raise RuntimeError(
                    f"this spatial artifact needs {nd * ns} devices "
                    f"({nd} data x {ns} space); host has {len(devs)}")
            mesh = Mesh(np.asarray(devs[:nd * ns]).reshape(nd, ns),
                        ("data", "space"))
            self._sp_sharding = NamedSharding(
                mesh, PartitionSpec("data", "space", None, None))
        return self._sp_sharding

    def _dispatch_spatial(self, batch: np.ndarray, pad: bool):
        """Row-sharded programs: concrete batch B (symbolic batch does
        not export with multi-device programs); arbitrary N serves as
        ceil(N/B) calls with the last chunk zero-padded on the batch
        axis — exact, since every per-sample computation (convs, whole-
        image GroupNorm, dihedral members) is independent of pad rows."""
        import jax as _jax

        n, h, w = batch.shape
        if (h, w) not in self._programs:
            raise ValueError(
                f"spatial artifact has no program for {h}x{w} and cannot "
                f"serve it by padding (H must stay % "
                f"{8 * self.spatial['n_space']}); exported shapes: "
                f"{self.shapes}")
        sh = self._spatial_sharding()
        prog = self._pick((h, w), batch)
        B = self.spatial["batch"]
        outs = []
        for s in range(0, n, B):
            chunk = batch[s:s + B]
            if len(chunk) < B:
                chunk = np.concatenate(
                    [chunk, np.zeros((B - len(chunk), h, w),
                                     batch.dtype)])
            x = _jax.device_put(
                np.ascontiguousarray(chunk, np.float32)[..., None], sh)
            outs.append(np.asarray(prog.call(x))[:min(B, n - s)])
        return np.concatenate(outs), (2 * h, 2 * w)

    def _pick(self, key: Tuple[int, int], batch: np.ndarray):
        """int8 artifacts route near-empty batches (< min_foreground
        fraction of foreground pixels) to their baked plain-forward
        fallback — int8's noise floor is ~26 dB PSNR on near-blank
        slices (the serving engine's guardrail, infer/engine.py:345)."""
        if self._fallbacks:
            from mri_superresolution_tpu.ops.quant import (
                FOREGROUND_INTENSITY)
            if (np.abs(batch) > FOREGROUND_INTENSITY).mean() \
                    < self.min_foreground:
                return self._fallbacks[key]
        return self._programs[key]

    def upscale_batches(self, batches, pad: bool = False, depth: int = 2):
        """Pipelined serving: yields each batch's output, dispatching up
        to ``depth`` batches ahead of the fetch (the engine's
        ``upscale_batches`` window) so device compute AND the next upload
        overlap the device→host transfer."""
        from collections import deque
        depth = max(1, int(depth))
        window = deque()
        for batch in batches:
            window.append(self._dispatch(batch, pad))
            if len(window) > depth:
                y, (oh, ow) = window.popleft()
                yield np.asarray(y)[:, :oh, :ow, 0]
        while window:
            y, (oh, ow) = window.popleft()
            yield np.asarray(y)[:, :oh, :ow, 0]

    def upscale_image(self, image01: np.ndarray) -> np.ndarray:
        return self.upscale_batch(image01[None])[0]

    def process_single_image(self, *args, **kwargs):
        """The engine's full single-image pipeline (preprocess, histogram
        matching, metrics, figures) driven by the artifact's AOT forward.
        The engine class is imported LAZILY here — plain artifact
        loading/serving never touches the model zoo (pinned by
        tests/test_export.py)."""
        if self.normalize_inputs:
            raise ValueError(
                "serve_raw artifacts bake the raw transposed volume "
                "contract; the PNG single-image pipeline needs a standard "
                "artifact (export without --serve_raw)")
        if self.out_dtype != np.dtype(np.float32):
            raise ValueError(
                f"this artifact packs outputs as {self.out_dtype} "
                "(integer codes, not [0,1] floats); the PNG single-image "
                "pipeline (histogram matching, metrics, *255 write) needs "
                "a float32 artifact — export without --out_dtype, or "
                "serve volumes (infer_volume.py/daemon decode the codes "
                "via scl_slope)")
        from mri_superresolution_tpu.infer.engine import InferenceEngine
        cls = type(self)
        if not hasattr(cls, "calculate_metrics"):
            # re-wrap: class-attribute assignment of a bare function would
            # create an instance method (self would leak into the call)
            cls.calculate_metrics = staticmethod(
                InferenceEngine.calculate_metrics)
            cls._save_figures = staticmethod(InferenceEngine._save_figures)
        return InferenceEngine.process_single_image(self, *args, **kwargs)


def load_artifact(path: str) -> ServingArtifact:
    """Parse + deserialize an artifact. Never imports the model zoo."""
    from jax import export as jexport

    with open(path, "rb") as f:
        if f.read(len(MAGIC)) != MAGIC:
            raise ValueError(f"{path} is not a serving artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode())
        if header.get("format") not in ("mri-sr-serving-artifact-v1",
                                        "mri-sr-serving-artifact-v2",
                                        "mri-sr-serving-artifact-v3"):
            raise ValueError(f"unknown artifact format in {path}")
        programs, fallbacks = {}, {}
        routed = header.get("routed", False)
        for h, w in header["shapes"]:
            (blen,) = struct.unpack("<Q", f.read(8))
            programs[(h, w)] = jexport.deserialize(f.read(blen))
            if routed:
                (blen,) = struct.unpack("<Q", f.read(8))
                fallbacks[(h, w)] = jexport.deserialize(f.read(blen))
    return ServingArtifact(header, programs, fallbacks)
