"""Production serving daemon: dynamic batching over the engine/artifact.

The reference serves one image per process invocation
(/root/reference/scripts/infer.py:398-450). For deployment, per-request
process spawns waste the accelerator: TPU throughput comes from BATCHED
forwards (bench.py: one 256² slice costs the same dispatch as 128 at
<2x the wall time). This module is the serving runtime the reference
lacks:

- ``DynamicBatcher``: requests arriving within a short window are
  coalesced into one batched forward per (H, W) shape group — the
  standard accelerator-serving pattern (continuous batching for convs:
  group-by-shape instead of length). One worker thread owns the
  device; callers block on per-request futures.
- ``serve_http``: a stdlib ThreadingHTTPServer front end. POST /upscale
  with an ``.npy`` payload (shape (H, W) or (N, H, W) float [0,1], or
  uint8/uint16 which are normalized like the CLI) returns the 2x
  output as ``.npy``. GET /healthz reports model/mode/stats.

Backends: an ``InferenceEngine`` (checkpoint) or a ``ServingArtifact``
(portable AOT file — a serving host needs NO model code). Both expose
``upscale_batch``; the artifact path passes ``pad=True`` so unexported
shapes serve via host-side pad+crop.

No new dependencies: stdlib threading/http only.
"""

from __future__ import annotations

import logging
import threading
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["DynamicBatcher", "serve_http"]


class _Request:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None


class DynamicBatcher:
    """Coalesce concurrent single-image requests into batched forwards.

    One worker thread drains the queue: it waits up to
    ``batch_window_ms`` for more work after the first request arrives
    (amortizing the dispatch), groups pending requests by (H, W), and
    runs ONE ``upscale_batch`` per group of up to ``max_batch``. The
    device is owned by the worker thread alone, so engine state
    (int8 calibration counters, compiled-program caches) needs no
    locking.
    """

    def __init__(self, backend, max_batch: int = 64,
                 batch_window_ms: float = 5.0,
                 pad_batches: Optional[bool] = None):
        import inspect
        self._backend = backend
        # artifact backends need pad=True for unexported shapes; the
        # engine pads internally and takes no such kwarg
        self._kwargs = (
            {"pad": True} if "pad" in inspect.signature(
                backend.upscale_batch).parameters else {})
        # Engines compile one program per (batch, H, W) — a stream of
        # arbitrary coalesced sizes would recompile per size (minutes
        # each on the TPU tunnel). Pad each group to the next power of
        # two (outputs for the zero rows are dropped), bounding compiles
        # to log2(max_batch) programs per shape. Artifacts have a
        # SYMBOLIC batch (no recompiles) and their compute scales with
        # the padded size, so they default to exact sizes.
        # NB: zero pad rows lower the engine's int8 foreground fraction,
        # which can only route a batch to bf16 — the quality-safe side.
        if pad_batches is None:
            pad_batches = not self._kwargs
        self.pad_batches = bool(pad_batches)
        if int(max_batch) < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.max_batch = int(max_batch)
        self.batch_window_s = float(batch_window_ms) / 1e3
        self._queue: List[_Request] = []
        self._cv = threading.Condition()
        self._closed = False
        self.stats: Dict[str, float] = {
            "requests": 0, "batches": 0, "batched_requests": 0,
            "max_batch_seen": 0, "errors": 0}
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="mri-sr-batcher")
        self._worker.start()

    # ---- client side ----------------------------------------------------

    def submit(self, image01: np.ndarray) -> _Request:
        """Enqueue one (H, W) image without blocking; pair with
        :meth:`wait`. Lets a caller holding N slices enqueue all of
        them so they coalesce into one device batch."""
        if image01.ndim != 2:
            raise ValueError(f"expected a 2-D image, got {image01.shape}")
        req = _Request(np.asarray(image01, np.float32))
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._queue.append(req)
            self._cv.notify()
        return req

    @staticmethod
    def wait(req: _Request, timeout: Optional[float] = None) -> np.ndarray:
        if not req.event.wait(timeout):
            raise TimeoutError("upscale request timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def upscale(self, image01: np.ndarray,
                timeout: Optional[float] = None) -> np.ndarray:
        """(H, W) float [0,1] -> (2H, 2W). Blocks until served; raises
        whatever the backend raised for this request's group."""
        return self.wait(self.submit(image01), timeout)

    def close(self, timeout: float = 10.0) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._worker.join(timeout)

    # ---- worker side ----------------------------------------------------

    def _take(self) -> List[_Request]:
        """Block for the first request, then linger ``batch_window_s``
        for stragglers (bounded by max_batch)."""
        with self._cv:
            while not self._queue and not self._closed:
                self._cv.wait()
            if not self._queue:
                return []
            deadline = time.monotonic() + self.batch_window_s
            while (len(self._queue) < self.max_batch
                   and not self._closed):
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cv.wait(remaining):
                    break
            batch, self._queue = (self._queue[:self.max_batch],
                                  self._queue[self.max_batch:])
            return batch

    def _run(self) -> None:
        while True:
            reqs = self._take()
            if not reqs:
                if self._closed:
                    return
                continue
            groups: Dict[Tuple[int, int], List[_Request]] = defaultdict(list)
            for r in reqs:
                groups[r.image.shape].append(r)
            for shape, group in groups.items():
                try:
                    batch = np.stack([r.image for r in group])
                    # no padding while the engine's int8 streaming
                    # calibration is counting slices: zero rows would be
                    # counted as calibration data (engine._calib_seen)
                    if self.pad_batches and not getattr(
                            self._backend, "quant_calibrating", False):
                        # clamp: pow2 must not exceed the operator's
                        # device-batch cap (max_batch may not be pow2)
                        target = min(1 << (len(group) - 1).bit_length(),
                                     self.max_batch)
                        if target > len(group):
                            batch = np.concatenate(
                                [batch, np.zeros((target - len(group),)
                                                 + shape, np.float32)])
                    out = self._backend.upscale_batch(batch, **self._kwargs)
                    for r, y in zip(group, out):
                        r.result = np.asarray(y)
                except BaseException as e:  # delivered to the callers
                    self.stats["errors"] += len(group)
                    for r in group:
                        r.error = e
                finally:
                    self.stats["requests"] += len(group)
                    self.stats["batches"] += 1
                    if len(group) > 1:
                        self.stats["batched_requests"] += len(group)
                    self.stats["max_batch_seen"] = max(
                        self.stats["max_batch_seen"], len(group))
                    for r in group:
                        r.event.set()


def _load_npy(data: bytes) -> np.ndarray:
    import io
    arr = np.load(io.BytesIO(data), allow_pickle=False)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    elif arr.dtype == np.uint16:
        arr = arr.astype(np.float32) / 65535.0
    return np.asarray(arr, np.float32)


def _dump_npy(arr: np.ndarray) -> bytes:
    import io
    buf = io.BytesIO()
    np.save(buf, np.ascontiguousarray(arr), allow_pickle=False)
    return buf.getvalue()


def _serve_volume(batcher: DynamicBatcher, body: bytes) -> bytes:
    """NIfTI bytes in -> 2x-in-plane NIfTI bytes out, through the
    batcher (scripts/infer_volume.py's simple path as a service: same
    per-slice percentile normalize, halved in-plane zooms)."""
    from mri_superresolution_tpu import nifti

    gz = body[:2] == b"\x1f\x8b"
    data, hdr = nifti.load_bytes(body)
    if data.ndim == 4:
        data = data[:, :, :, 0]
    if data.ndim != 3:
        raise ValueError(f"expected a 3D volume, got {data.ndim}D")
    # per-slice percentile window + minmax (preprocess_image_array
    # semantics), vectorized over the whole stack in ONE numpy call —
    # a per-slice Python loop holds the GIL ~5 ms/slice against the
    # other handler threads
    stack = np.ascontiguousarray(
        np.transpose(data, (2, 0, 1))).astype(np.float32)
    lo, hi = np.percentile(stack, (0.5, 99.5), axis=(1, 2), keepdims=True)
    stack = np.clip(stack, lo, hi)
    span = hi - lo
    stack = np.where(span > 0, (stack - lo) / np.where(span > 0, span, 1),
                     stack)
    # submit EVERY slice before waiting — one volume becomes a few
    # max_batch-sized device batches, interleaving with other clients
    reqs = [batcher.submit(s) for s in stack]
    sr = np.stack([batcher.wait(r) for r in reqs], axis=2)
    zooms = list(hdr.zooms) + [1.0] * 3
    return nifti.save_bytes(
        np.asfortranarray(sr.astype(np.float32)),
        zooms=(zooms[0] / 2.0, zooms[1] / 2.0, zooms[2]),
        compress=gz)


def serve_http(backend, host: str = "127.0.0.1", port: int = 8476,
               max_batch: int = 64, batch_window_ms: float = 5.0,
               describe: str = ""):
    """Build the HTTP server (never blocks): returns a
    ``ThreadingHTTPServer`` with a started ``DynamicBatcher`` attached
    as ``.batcher``. The caller owns the loop and shutdown order:
    ``serve_forever()``, then ``server_close()`` (joins in-flight
    handler threads — the drain), then ``batcher.close()``
    (scripts/serve.py and tests/test_server.py both follow it).

    Endpoints:
    - ``POST /upscale``  body: ``.npy`` (H, W) or (N, H, W), float [0,1]
      (uint8/uint16 normalized); response: ``.npy`` of 2x outputs.
    - ``POST /upscale_volume``  body: ``.nii``/``.nii.gz`` bytes;
      each axial slice is percentile-normalized (the CLI's preprocess),
      all slices enqueue at once (coalescing with other clients), and
      the response is the 2x-in-plane NIfTI (halved in-plane spacing,
      gzipped iff the upload was) — a complete MRI service in one POST.
    - ``GET /healthz``   JSON: backend description + batcher stats.
    """
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = DynamicBatcher(backend, max_batch=max_batch,
                             batch_window_ms=batch_window_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("http: " + fmt % args)

        def _reply(self, code: int, body: bytes,
                   ctype: str = "application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, b'{"error": "not found"}',
                                   "application/json")
            payload = {"status": "ok", "backend": describe,
                       "stats": dict(batcher.stats)}
            self._reply(200, json.dumps(payload).encode(),
                        "application/json")

        def do_POST(self):
            if self.path not in ("/upscale", "/upscale_volume"):
                return self._reply(404, b'{"error": "not found"}',
                                   "application/json")
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if self.path == "/upscale_volume":
                    return self._reply(200, _serve_volume(batcher, body))
                arr = _load_npy(body)
                if arr.ndim == 2:
                    out = batcher.upscale(arr)
                elif arr.ndim == 3:
                    # submit every slice BEFORE waiting: they coalesce
                    # into one device batch (alongside other clients)
                    reqs = [batcher.submit(a) for a in arr]
                    out = np.stack([batcher.wait(r) for r in reqs])
                else:
                    raise ValueError(f"expected 2-D or 3-D, got {arr.shape}")
                self._reply(200, _dump_npy(out))
            except Exception as e:  # client gets the reason, server lives
                logger.warning(f"{self.path} failed: {e}")
                self._reply(400, json.dumps({"error": str(e)}).encode(),
                            "application/json")

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # callers close this after server_close()
    logger.info(f"Serving on http://{host}:{server.server_address[1]} "
                f"(max_batch={max_batch}, window={batch_window_ms}ms)")
    return server
