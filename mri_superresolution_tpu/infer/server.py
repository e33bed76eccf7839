"""Production serving daemon: dynamic batching over the engine/artifact.

The reference serves one image per process invocation
(/root/reference/scripts/infer.py:398-450). For deployment, per-request
process spawns waste the accelerator: TPU throughput comes from BATCHED
forwards (bench.py: one 256² slice costs the same dispatch as 128 at
<2x the wall time). This module is the serving runtime the reference
lacks:

- ``DynamicBatcher``: requests arriving within a short window are
  coalesced into one batched forward per (H, W, dtype) shape group — the
  standard accelerator-serving pattern (continuous batching for convs:
  group-by-shape instead of length). One worker thread owns the
  device; callers block on per-request futures. The pending queue is
  BOUNDED (``max_pending``): when full, ``submit`` raises
  :class:`QueueFullError` and the HTTP front end answers 503 +
  Retry-After instead of buffering without limit.
- ``serve_http``: a stdlib ThreadingHTTPServer front end. POST /upscale
  with an ``.npy`` payload (shape (H, W) or (N, H, W)) returns the 2x
  output as ``.npy``; POST /upscale_volume streams a NIfTI volume
  through the batcher in z-chunks (bounded memory); GET /healthz and
  GET /metrics report state. Request bodies are capped
  (``max_body_bytes`` → 413) and waits are bounded
  (``request_timeout_s`` → 504, with the timed-out request ABANDONED so
  the worker never wastes a forward on it).

Zero-copy transfer path (measured 2.6x e2e on the tunnel link,
RESULTS §6c): when the backend engine was built with
``normalize_inputs`` (scripts/serve.py --serve_raw), /upscale_volume
submits the volume's RAW stored-dtype voxels — the F-order buffer's
natural (n, w, h) C-order slices feed the engine's ``transpose_io``
device-side swap, the percentile normalize runs ON DEVICE, and packed
``out_dtype`` responses (int16/uint8 + NIfTI scl_slope) quarter the
response bytes. The host never touches a float voxel.

Backends: an ``InferenceEngine`` (checkpoint) or a ``ServingArtifact``
(portable AOT file — a serving host needs NO model code). Both expose
``upscale_batch``; the artifact path passes ``pad=True`` so unexported
shapes serve via host-side pad+crop.

No new dependencies: stdlib threading/http/zlib only.
"""

from __future__ import annotations

import logging
import threading
import time
import zlib
from collections import defaultdict, deque
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["DynamicBatcher", "QueueFullError", "serve_http"]


class QueueFullError(RuntimeError):
    """The batcher's bounded pending queue is full (backpressure)."""


class _Request:
    __slots__ = ("image", "event", "result", "error", "abandoned")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None
        self.abandoned = False     # set when a waiter times out: the worker
        #                            drops the request instead of serving it


class DynamicBatcher:
    """Coalesce concurrent single-image requests into batched forwards.

    One worker thread drains the queue: it waits up to
    ``batch_window_ms`` for more work after the first request arrives
    (amortizing the dispatch), groups pending requests by (H, W, dtype),
    and runs ONE ``upscale_batch`` per group of up to ``max_batch``. The
    device is owned by the worker thread alone, so engine state
    (int8 calibration counters, compiled-program caches) needs no
    locking.

    ``max_pending`` bounds the queue (0 = unbounded): ``submit`` on a
    full queue raises :class:`QueueFullError` immediately — load-shedding
    belongs at the entry point, not in an unbounded buffer whose requests
    would all eventually time out anyway.
    """

    def __init__(self, backend, max_batch: int = 64,
                 batch_window_ms: float = 5.0,
                 pad_batches: Optional[bool] = None,
                 max_pending: int = 0):
        import inspect
        self._backend = backend
        # artifact backends need pad=True for unexported shapes; the
        # engine pads internally and takes no such kwarg
        self._kwargs = (
            {"pad": True} if "pad" in inspect.signature(
                backend.upscale_batch).parameters else {})
        # raw-input engines (normalize_inputs) normalize ON DEVICE and
        # accept any integer/float dtype; everything else gets the
        # historical float32 coercion at submit
        self._raw_input = bool(getattr(backend, "normalize_inputs", False))
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
        self.max_pending = max(0, int(max_pending))
        self.batch_window_s = float(batch_window_ms) / 1e3
        self._queue: List[_Request] = []
        self._cv = threading.Condition()
        self._closed = False
        self.stats: Dict[str, float] = {
            "requests": 0, "batches": 0, "batched_requests": 0,
            "max_batch_seen": 0, "errors": 0, "rejected": 0,
            "abandoned": 0, "peak_pending": 0}
        # batch-size histogram: device-group size -> count (/metrics)
        self.batch_size_hist: Dict[int, int] = defaultdict(int)
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="mri-sr-batcher")
        self._worker.start()

    # ---- client side ----------------------------------------------------

    @property
    def queue_depth(self) -> int:
        with self._cv:
            return len(self._queue)

    def snapshot(self):
        """(stats copy, batch-size-histogram copy, queue depth) under the
        lock — the worker mutates these dicts, so /healthz and /metrics must
        not iterate them live."""
        with self._cv:
            return dict(self.stats), dict(self.batch_size_hist), \
                len(self._queue)

    def submit_blocking(self, image01: np.ndarray,
                        deadline: Optional[float] = None) -> _Request:
        """:meth:`submit`, but on a full queue WAIT for capacity instead
        of raising — for cooperating internal producers (the volume
        endpoint) that have already committed to a response and must
        apply backpressure, not shed. Raises TimeoutError past
        ``deadline`` (a time.monotonic() timestamp)."""
        first = True
        while True:
            try:
                return self.submit(image01, _count_reject=first)
            except QueueFullError:
                first = False
                if deadline is not None and time.monotonic() > deadline:
                    raise TimeoutError(
                        "queue stayed full past the request deadline")
                time.sleep(0.02)

    def submit(self, image01: np.ndarray,
               _count_reject: bool = True) -> _Request:
        """Enqueue one (H, W) image without blocking; pair with
        :meth:`wait`. Lets a caller holding N slices enqueue all of
        them so they coalesce into one device batch. Raises
        :class:`QueueFullError` when the bounded queue is full
        (``_count_reject=False`` suppresses the rejected-counter bump —
        submit_blocking's retry loop is backpressure, not shedding)."""
        if image01.ndim != 2:
            raise ValueError(f"expected a 2-D image, got {image01.shape}")
        if self._raw_input:
            img = np.asarray(image01)
            if img.dtype == np.float64:     # device normalize is fp32 math
                img = img.astype(np.float32)
        else:
            img = np.asarray(image01, np.float32)
        req = _Request(img)
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            if self.max_pending and len(self._queue) >= self.max_pending:
                if _count_reject:
                    self.stats["rejected"] += 1
                raise QueueFullError(
                    f"pending queue full ({self.max_pending} requests)")
            self._queue.append(req)
            self.stats["peak_pending"] = max(self.stats["peak_pending"],
                                             len(self._queue))
            self._cv.notify()
        return req

    def wait(self, req: _Request, timeout: Optional[float] = None
             ) -> np.ndarray:
        if not req.event.wait(timeout):
            # mark abandoned so the worker drops it instead of spending a
            # device forward on a client that already gave up
            req.abandoned = True
            self.stats["abandoned"] += 1
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
            groups: Dict[Tuple, List[_Request]] = defaultdict(list)
            for r in reqs:
                if r.abandoned:          # waiter timed out: drop silently
                    continue
                groups[(r.image.shape, r.image.dtype.str)].append(r)
            for (shape, _dt), group in groups.items():
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
                                                 + shape, batch.dtype)])
                    out = self._backend.upscale_batch(batch, **self._kwargs)
                    for r, y in zip(group, out):
                        r.result = np.asarray(y)
                except BaseException as e:  # delivered to the callers
                    self.stats["errors"] += len(group)
                    for r in group:
                        r.error = e
                finally:
                    with self._cv:     # /metrics snapshots under this lock
                        self.stats["requests"] += len(group)
                        self.stats["batches"] += 1
                        self.batch_size_hist[len(group)] += 1
                        if len(group) > 1:
                            self.stats["batched_requests"] += len(group)
                        self.stats["max_batch_seen"] = max(
                            self.stats["max_batch_seen"], len(group))
                    for r in group:
                        r.event.set()


def _load_npy(data: bytes, raw_input: bool) -> np.ndarray:
    import io
    arr = np.load(io.BytesIO(data), allow_pickle=False)
    if raw_input:
        # raw-input engines normalize on device; ship the native dtype
        return np.asarray(arr)
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


# ------------------------------------------------- streaming volume serving

class _ByteCursor:
    """Incremental reader over in-memory ``.nii`` / ``.nii.gz`` bytes.

    Plain bodies are sliced (zero-copy views); gzip bodies decompress
    through ``zlib.decompressobj`` one chunk at a time, so a request's
    transient memory stays O(z-chunk) instead of O(whole volume)."""

    _FEED = 1 << 20

    def __init__(self, body: bytes):
        self._body = body
        self._pos = 0
        self._gz = body[:2] == b"\x1f\x8b"
        self._z = zlib.decompressobj(31) if self._gz else None
        self._buf = bytearray()
        self._pending = b""

    @property
    def gz(self) -> bool:
        return self._gz

    def read(self, n: int) -> bytes:
        if self._z is None:
            b = self._body[self._pos:self._pos + n]
            self._pos += len(b)
            return bytes(b)
        while len(self._buf) < n:
            if self._pending:
                data, self._pending = self._pending, b""
            else:
                data = self._body[self._pos:self._pos + self._FEED]
                self._pos += len(data)
            if not data:
                self._buf += self._z.flush()
                break
            self._buf += self._z.decompress(data, max(n - len(self._buf),
                                                      self._FEED))
            self._pending = self._z.unconsumed_tail
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def _serve_volume_streaming(batcher: DynamicBatcher, body: bytes, handler,
                            timeout: Optional[float]) -> None:
    """NIfTI bytes in -> 2x-in-plane NIfTI bytes out, decoded, served and
    WRITTEN in z-chunks so peak memory is O(body + chunk), never
    O(3 volume copies) (VERDICT r4 item 8). Two input paths:

    - raw (engine built with ``normalize_inputs``): the F-order buffer's
      natural C-order (n, w, h) slices are submitted in the STORED dtype
      (float64 volumes drop to fp32) — the percentile normalize runs on
      device, and with ``transpose_io`` the (2w, 2h) outputs are already
      the output file's F-order slice bytes (zero host transposes).
      Negative scl_slope flips intensity order and is refused
      (nifti.load raw=True contract).
    - legacy (fp32 engine): scl scaling + per-slice percentile window +
      minmax on the host (scripts/infer_volume.py's exact math), fp32 in.

    The response streams with an exact Content-Length (output geometry is
    known from the header) — or, for gzip uploads, compresses each chunk
    into an in-memory gzip stream and sends it at the end (compressed
    int16/uint8 output is the one buffer this path still holds whole).
    The z-chunk pipeline keeps a 2-chunk window in flight so device
    compute overlaps the host encode of the previous chunk.
    """
    from mri_superresolution_tpu import nifti

    cur = _ByteCursor(body)
    head = cur.read(nifti.HDR_SIZE)
    hdr, order = nifti.read_header(head)
    if hdr.datatype not in nifti._DTYPES:
        raise ValueError(f"Unsupported NIfTI datatype code {hdr.datatype}")
    shape = hdr.shape
    if len(shape) == 4:
        shape = shape[:3]          # stream stops after timepoint 0
    if len(shape) != 3:
        raise ValueError(f"expected a 3D volume, got {len(shape)}D")
    h, w, n = shape
    if min(h, w, n) < 1:
        raise ValueError(f"degenerate volume shape {shape}")
    off = int(hdr.vox_offset)
    if off < nifti.HDR_SIZE:
        raise ValueError(f"bad vox_offset {off}")
    cur.read(off - nifti.HDR_SIZE)

    in_dtype = np.dtype(nifti._DTYPES[hdr.datatype]).newbyteorder(order)
    raw = batcher._raw_input
    slope, inter = hdr.scl_slope, hdr.scl_inter
    if raw and np.isfinite(slope) and slope < 0:
        raise ValueError("raw serving requires a non-negative scl_slope "
                         "(a negative slope flips intensity order, which "
                         "the device-side normalize does not absorb)")
    transpose = bool(getattr(batcher._backend, "transpose_io", False))
    from mri_superresolution_tpu.ops.functional import unit_slope
    out_dtype = np.dtype(getattr(batcher._backend, "out_dtype", np.float32))
    out_slope = unit_slope(out_dtype)

    if not cur.gz:
        # plain bodies: the voxel byte count is known up front — reject
        # truncated uploads with a clean 400 BEFORE committing the 200
        # (gzip bodies can only discover truncation while decoding; the
        # gz response path buffers, so those still fail clean)
        need = off + h * w * n * in_dtype.itemsize
        if len(body) < need:
            raise ValueError(
                f"truncated NIfTI body: {len(body)} bytes < {need} "
                f"needed for {h}x{w}x{n} {in_dtype.name}")

    zooms = list(hdr.zooms) + [1.0] * 3
    out_head = nifti.encode_header(
        (2 * h, 2 * w, n), out_dtype,
        zooms=(zooms[0] / 2.0, zooms[1] / 2.0, zooms[2]),
        scl_slope=out_slope)
    total = len(out_head) + 2 * h * 2 * w * n * out_dtype.itemsize

    if cur.gz:
        zc = zlib.compressobj(1, zlib.DEFLATED, 31)
        pieces = [zc.compress(out_head)]
        emit = lambda b: pieces.append(zc.compress(b))
    else:
        handler._responded = True   # past this point errors can only
        #                             truncate the stream (the client
        #                             detects it by Content-Length)
        handler.send_response(200)
        handler.send_header("Content-Type", "application/octet-stream")
        handler.send_header("Content-Length", str(total))
        handler.end_headers()
        handler.wfile.write(out_head)
        emit = handler.wfile.write

    slice_bytes = h * w * in_dtype.itemsize
    chunk_slices = max(1, batcher.max_batch)

    def read_chunk():
        """Next (c, w, h) array view of the F-order byte stream (a NIfTI
        volume's F-order (h, w, n) buffer IS a C-order (n, w, h) array)."""
        want = min(chunk_slices, read_chunk.left)
        if want <= 0:
            return None
        raw_b = cur.read(want * slice_bytes)
        if len(raw_b) < want * slice_bytes:
            raise ValueError("truncated NIfTI voxel data")
        read_chunk.left -= want
        arr = np.frombuffer(raw_b, dtype=in_dtype).reshape(want, w, h)
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        return arr

    read_chunk.left = n

    deadline = (time.monotonic() + timeout) if timeout else None

    def submit_chunk(arr):
        # the response is already committed: block for queue capacity
        # (bounded by the request deadline) instead of shedding mid-stream
        if raw:
            if not transpose:      # device normalize, host (h, w) layout
                arr = np.ascontiguousarray(arr.transpose(0, 2, 1))
            return [batcher.submit_blocking(s, deadline) for s in arr]
        # legacy host path: scl scaling + per-slice percentile + minmax
        # (byte-for-byte scripts/infer_volume.py semantics)
        data = arr.astype(np.float64)
        if np.isfinite(slope) and slope != 0 and (slope, inter) != (1.0, 0.0):
            data = data * slope + inter
        stack = np.ascontiguousarray(data.transpose(0, 2, 1)).astype(
            np.float32)
        lo, hi = np.percentile(stack, (0.5, 99.5), axis=(1, 2),
                               keepdims=True)
        stack = np.clip(stack, lo, hi)
        span = hi - lo
        stack = np.where(span > 0,
                         (stack - lo) / np.where(span > 0, span, 1), stack)
        return [batcher.submit_blocking(s, deadline) for s in stack]

    def emit_chunk(reqs):
        ys = [batcher.wait(r, timeout) for r in reqs]
        if raw and transpose:
            # (2w, 2h) C-order outputs ARE the output file's F-order
            # slice bytes: concatenate and write, no transpose copy
            emit(np.ascontiguousarray(np.stack(ys)).tobytes())
        else:
            # (2h, 2w) outputs: per-slice transpose into file order
            emit(np.ascontiguousarray(
                np.stack(ys).transpose(0, 2, 1)).tobytes())

    # 2-chunk window: chunk k+1's device work overlaps chunk k's encode
    window: deque = deque()
    while True:
        arr = read_chunk()
        if arr is None:
            break
        window.append(submit_chunk(arr))
        if len(window) > 2:
            emit_chunk(window.popleft())
    while window:
        emit_chunk(window.popleft())

    if cur.gz:
        pieces.append(zc.flush())
        blob = b"".join(pieces)
        handler._responded = True
        handler.send_response(200)
        handler.send_header("Content-Type", "application/octet-stream")
        handler.send_header("Content-Length", str(len(blob)))
        handler.end_headers()
        handler.wfile.write(blob)


def serve_http(backend, host: str = "127.0.0.1", port: int = 8476,
               max_batch: int = 64, batch_window_ms: float = 5.0,
               describe: str = "", max_pending: int = 2048,
               max_body_bytes: int = 512 << 20,
               request_timeout_s: float = 300.0):
    """Build the HTTP server (never blocks): returns a
    ``ThreadingHTTPServer`` with a started ``DynamicBatcher`` attached
    as ``.batcher``. The caller owns the loop and shutdown order:
    ``serve_forever()``, then ``server_close()`` (joins in-flight
    handler threads — the drain), then ``batcher.close()``
    (scripts/serve.py and tests/test_server.py both follow it).

    Endpoints:
    - ``POST /upscale``  body: ``.npy`` (H, W) or (N, H, W), float [0,1]
      (uint8/uint16 normalized — or native-dtype raw when the engine
      normalizes on device); response: ``.npy`` of 2x outputs.
    - ``POST /upscale_volume``  body: ``.nii``/``.nii.gz`` bytes;
      decoded, served and re-encoded in z-chunks (bounded memory),
      2x-in-plane NIfTI out (halved in-plane spacing, gzipped iff the
      upload was; packed int16/uint8 + scl_slope when the engine packs
      on device) — a complete MRI service in one POST.
    - ``GET /healthz``   JSON: backend description + batcher stats.
    - ``GET /metrics``   JSON: stats + queue depth + batch-size
      histogram + engine int8 routing counters + the server's limits.

    Load-safety: bodies over ``max_body_bytes`` get 413 before any read;
    a full pending queue (``max_pending``) gets 503 + Retry-After;
    requests unserved after ``request_timeout_s`` get 504 and are
    abandoned (the device never runs them).
    """
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    batcher = DynamicBatcher(backend, max_batch=max_batch,
                             batch_window_ms=batch_window_ms,
                             max_pending=max_pending)
    limits = {"max_pending": max_pending, "max_body_bytes": max_body_bytes,
              "request_timeout_s": request_timeout_s,
              "max_batch": max_batch, "batch_window_ms": batch_window_ms}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("http: " + fmt % args)

        def _reply(self, code: int, body: bytes,
                   ctype: str = "application/octet-stream",
                   headers: Optional[Dict[str, str]] = None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, payload: dict,
                  headers: Optional[Dict[str, str]] = None):
            self._reply(code, json.dumps(payload).encode(),
                        "application/json", headers)

        def do_GET(self):
            if self.path == "/healthz":
                stats, _, _ = batcher.snapshot()
                return self._json(200, {"status": "ok", "backend": describe,
                                        "stats": stats})
            if self.path == "/metrics":
                stats, hist, depth = batcher.snapshot()
                payload = {
                    "stats": stats,
                    "queue_depth": depth,
                    "batch_size_hist": {str(k): v
                                        for k, v in sorted(hist.items())},
                    "limits": limits,
                }
                q = getattr(backend, "_quant_batches", None)
                if q is not None:
                    payload["quant_batches"] = dict(q)
                return self._json(200, payload)
            return self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/upscale", "/upscale_volume"):
                return self._json(404, {"error": "not found"})
            cl = self.headers.get("Content-Length")
            if cl is None:
                return self._json(411, {"error": "Content-Length required"})
            try:
                n = int(cl)
            except ValueError:
                return self._json(400, {"error": "bad Content-Length"})
            if n > max_body_bytes:
                return self._json(
                    413, {"error": f"body {n} bytes exceeds the "
                                   f"{max_body_bytes}-byte limit"})
            try:
                body = self.rfile.read(n)
                if self.path == "/upscale_volume":
                    return _serve_volume_streaming(batcher, body, self,
                                                   request_timeout_s)
                arr = _load_npy(body, batcher._raw_input)
                if arr.ndim == 2:
                    out = batcher.upscale(arr, timeout=request_timeout_s)
                elif arr.ndim == 3:
                    # submit every slice BEFORE waiting: they coalesce
                    # into one device batch (alongside other clients)
                    reqs = [batcher.submit(a) for a in arr]
                    out = np.stack([batcher.wait(r, request_timeout_s)
                                    for r in reqs])
                else:
                    raise ValueError(f"expected 2-D or 3-D, got {arr.shape}")
                self._reply(200, _dump_npy(out))
            except QueueFullError as e:
                if getattr(self, "_responded", False):
                    logger.warning(f"{self.path} overloaded mid-stream")
                    return
                self._json(503, {"error": str(e)},
                           headers={"Retry-After": "1"})
            except TimeoutError as e:
                logger.warning(f"{self.path} timed out: {e}")
                if not getattr(self, "_responded", False):
                    self._json(504, {"error": str(e)})
            except Exception as e:  # client gets the reason, server lives
                logger.warning(f"{self.path} failed: {e}")
                if not getattr(self, "_responded", False):
                    self._json(400, {"error": str(e)})

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # callers close this after server_close()
    logger.info(f"Serving on http://{host}:{server.server_address[1]} "
                f"(max_batch={max_batch}, window={batch_window_ms}ms, "
                f"max_pending={max_pending}, "
                f"raw_input={batcher._raw_input})")
    return server
