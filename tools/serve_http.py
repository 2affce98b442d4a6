#!/usr/bin/env python
"""Minimal HTTP serving host over an exported artifact (stdlib-only).

The reference's only inference path is rerunning eval inside the
training codebase (reference: src/mamba_clip/eval.py:104-150); this is
the deployment-shaped complement: load a ``tools/export_serving.py``
artifact dir and serve it over HTTP with zero dependencies beyond the
framework itself.

Endpoints (per the artifact's entry points):

- ``GET  /healthz``      → ``{"status": "ok", "manifest": {...}}``
- ``POST /embed_image``  → body = JPEG bytes → ``{"embedding": [512]}``
- ``POST /embed_text``   → body = ``{"texts": [...]}`` →
  ``{"embeddings": [[512], ...]}`` (tokenized with the artifact's
  shipped tokenizer)
- ``POST /classify``     → body = JPEG bytes → ``{"probs": [C]}``

JPEG decode runs the same native libjpeg fast path as training
(data/fastimage.py, PIL fallback) into the staging square the
artifact's fused on-device eval preprocess expects — the wire format is
identical to the training data path.

Concurrent requests are coalesced into one device call per entry point
(``MicroBatcher``): the dispatcher collects up to ``--max-batch`` rows
or waits ``--max-delay-ms`` after the first arrival, pads the stacked
batch to the next power of two (so the artifact's symbolic batch dim
compiles a bounded set of shapes), runs once, and fans results back out
through per-request futures. ``--max-batch 1`` restores blocking
single-request dispatch. Data-sharded artifacts (``--data-shards N`` at
export) are hosted too when the host has ≥ N devices: every dispatch is
rounded up to a shard-divisible bucket so the batch dim always divides
the mesh. A production fleet hands the same StableHLO to a PjRT runtime
behind a real frontend; the batching policy here is the same shape that
frontend would implement.

Usage:
    python tools/serve_http.py --artifact DIR [--port 8000] \
        [--max-batch 16] [--max-delay-ms 5]
    curl -s -X POST --data-binary @lesion.jpg :8000/embed_image
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _bucket(n: int, pad_multiple: int = 1) -> int:
    """Next power-of-two ≥ n, rounded up to a multiple of pad_multiple
    (bounded compile-shape set; shard-divisible for DP artifacts)."""
    m = 1 << (max(n, 1) - 1).bit_length()
    if m % pad_multiple:
        m = -(-m // pad_multiple) * pad_multiple
    return m


class MicroBatcher:
    """Coalesce concurrent row-batches into one device call.

    Items are arrays with a leading batch dim (k >= 1 rows). The
    dispatcher thread concatenates queued items (up to ``max_batch``
    total rows, waiting at most ``max_delay_ms`` after the first), pads
    to the next power-of-two row count (rounded up to ``pad_multiple``
    for data-sharded artifacts, whose batch dim must divide the mesh),
    runs ``fn`` once and splits the output back per request. Exceptions
    propagate to every coalesced caller.

    ``in_flight`` > 1 pipelines dispatch: JAX dispatch is asynchronous,
    so the dispatcher enqueues the device call (including its
    host→device input transfer) and moves on to forming the next batch
    while a completion thread materializes results in order — batch
    N+1's transfer overlaps batch N's compute+fetch. The win scales
    with transfer latency (tunneled TPU here; any PCIe/DMA host still
    overlaps H2D with compute). ``in_flight=1`` restores fully
    synchronous dispatch."""

    def __init__(self, fn, max_batch: int = 16, max_delay_ms: float = 5.0,
                 pad_multiple: int = 1, in_flight: int = 2):
        self.fn = fn
        self.max_batch = max(int(max_batch), 1)
        self.pad_multiple = max(int(pad_multiple), 1)
        self.max_delay = max(float(max_delay_ms), 0.0) / 1e3
        self.q: "queue.Queue" = queue.Queue()
        self.requests = 0
        self.batches = 0
        self._sem = threading.BoundedSemaphore(max(int(in_flight), 1))
        self._done_q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True)
        self._completer.start()

    def __call__(self, item: np.ndarray) -> np.ndarray:
        fut: Future = Future()
        self.q.put((np.asarray(item), fut))
        return fut.result(timeout=120.0)

    def _loop(self):
        while True:
            batch = [self.q.get()]
            rows = batch[0][0].shape[0]
            deadline = time.monotonic() + self.max_delay
            while rows < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    nxt = self.q.get(timeout=left)
                except queue.Empty:
                    break
                batch.append(nxt)
                rows += nxt[0].shape[0]
            items = np.concatenate([b[0] for b in batch], axis=0)
            n = items.shape[0]
            m = _bucket(n, self.pad_multiple)  # pad: bounded compile shapes
            if m != n:
                items = np.concatenate(
                    [items, np.repeat(items[-1:], m - n, axis=0)], axis=0)
            self._sem.acquire()  # bound outstanding device calls
            try:
                out = self.fn(items)  # async dispatch (not materialized)
            except Exception as e:
                self._sem.release()
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            self._done_q.put((out, batch))

    def _complete_loop(self):
        while True:
            out, batch = self._done_q.get()
            try:
                out = np.asarray(out)  # blocks until the call finishes
                self.batches += 1
                self.requests += len(batch)
                off = 0
                for arr, fut in batch:
                    k = arr.shape[0]
                    fut.set_result(out[off:off + k])
                    off += k
            except Exception as e:  # fan the failure out to every caller
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
            finally:
                self._sem.release()

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "src"))


def make_server(artifact: str, port: int = 0, host: str = "127.0.0.1",
                max_batch: int = 16, max_delay_ms: float = 5.0,
                in_flight: int = 2):
    """Build (not start) a ThreadingHTTPServer over the artifact dir.

    ``max_batch``/``max_delay_ms``/``in_flight`` tune the cross-request
    MicroBatcher; ``max_batch=1`` dispatches each request directly."""

    from mamba_clip_tpu.data import fastimage
    from mamba_clip_tpu.data.dataset import _decode_to_square
    from mamba_clip_tpu.serving import load_serving

    # check the manifest BEFORE load_serving: a sharded artifact would
    # fail mesh construction inside the loader with an obscure error on
    # hosts with fewer devices than shards
    with open(os.path.join(artifact, "manifest.json")) as f:
        shards = int(json.load(f).get("data_shards", 1))
    if shards > 1:
        import jax

        if jax.local_device_count() < shards:
            raise ValueError(
                f"artifact exported with data_shards={shards} but this "
                f"host has {jax.local_device_count()} device(s); export "
                f"with --data-shards 1 for this host (or serve on a "
                f"{shards}-device host)"
            )
    served = load_serving(artifact)
    manifest = served["manifest"]
    staging = int(manifest["staging_size"])

    if max_batch > 1 or shards > 1:
        # sharded artifacts always go through the batcher: its padding
        # rounds every dispatch up to a shard-divisible row count
        batchers = {
            name: MicroBatcher(served[name], max_batch, max_delay_ms,
                               pad_multiple=shards, in_flight=in_flight)
            for name in ("image_embed", "text_embed", "classify")
            if name in served
        }
    else:
        batchers = {name: served[name]
                    for name in ("image_embed", "text_embed", "classify")
                    if name in served}

    def decode(blob: bytes) -> np.ndarray:
        out = fastimage.decode_resize(blob, staging)
        if out is None:
            from PIL import Image

            out = _decode_to_square(Image.open(io.BytesIO(blob)), staging)
        return out

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                stats = {
                    name: {"requests": b.requests, "batches": b.batches}
                    for name, b in batchers.items()
                    if isinstance(b, MicroBatcher)
                }
                self._json(200, {"status": "ok", "manifest": manifest,
                                 "batching": stats})
            else:
                self._json(404, {"error": f"no handler for GET {self.path}"})

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                if self.path == "/embed_image" and "image_embed" in served:
                    out = np.asarray(
                        batchers["image_embed"](decode(body)[None]))[0]
                    self._json(200, {"embedding": out.tolist()})
                elif self.path == "/embed_text" and "text_embed" in served:
                    texts = json.loads(body)["texts"]
                    ids = np.asarray(served["tokenize"](texts))
                    out = np.asarray(batchers["text_embed"](ids))
                    self._json(200, {"embeddings": out.tolist()})
                elif self.path == "/classify" and "classify" in served:
                    probs = np.asarray(
                        batchers["classify"](decode(body)[None]))[0]
                    self._json(200, {"probs": probs.tolist()})
                else:
                    self._json(
                        404, {"error": f"no handler for POST {self.path} "
                                       f"(entry points: "
                                       f"{sorted(manifest['entry_points'])})"})
            except Exception as e:  # surface as a client-visible error
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):  # quiet server; health is /healthz
            pass

    class Server(ThreadingHTTPServer):
        # stdlib default backlog is 5: a burst of N concurrent connects
        # (load tests, fleet frontends) gets connection-reset instead of
        # queued. Raise it well past any sane client fan-in.
        request_queue_size = 256

    srv = Server((host, port), Handler)
    # expose internals for warm-up / measurement harnesses
    # (tools/bench_serving.py pre-compiles every power-of-two bucket
    # shape so remote first-compiles never land inside a timed window)
    srv.batchers = batchers
    srv.served = served
    srv.decode = decode
    srv.staging = staging
    return srv


def warm_buckets(server, endpoint: str, payload, max_batch: int) -> int:
    """Pre-compile every power-of-two batch shape the MicroBatcher can
    dispatch for ``endpoint`` (1, 2, 4, ... up to the bucket covering
    ``max_batch``), bypassing the queue so the warm calls are
    synchronous. ``payload`` is JPEG bytes for image endpoints or a
    list[str] for text. Returns the number of shapes warmed."""
    if endpoint == "text_embed":
        row = np.asarray(server.served["tokenize"](list(payload)))[:1]
    else:
        row = server.decode(payload)[None]
    b = server.batchers[endpoint]
    if isinstance(b, MicroBatcher):
        fn, padm = b.fn, b.pad_multiple
    else:
        fn, padm = b, 1
    top = 1 << (max(int(max_batch), 1) - 1).bit_length()
    shapes, m = set(), 1
    while m <= top:
        shapes.add(_bucket(m, padm))
        m <<= 1
    for s in sorted(shapes):
        np.asarray(fn(np.repeat(row, s, axis=0)))
    return len(shapes)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True,
                   help="exported serving dir (tools/export_serving.py)")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--max-batch", type=int, default=16,
                   help="max rows coalesced into one device call "
                        "(1 = dispatch each request directly)")
    p.add_argument("--max-delay-ms", type=float, default=5.0,
                   help="max wait after the first queued request before "
                        "dispatching a partial batch")
    p.add_argument("--in-flight", type=int, default=2,
                   help="outstanding device calls the batcher pipelines "
                        "(1 = synchronous dispatch)")
    a = p.parse_args()
    srv = make_server(a.artifact, port=a.port, host=a.host,
                      max_batch=a.max_batch, max_delay_ms=a.max_delay_ms,
                      in_flight=a.in_flight)
    print(f"serving {a.artifact} on http://{a.host}:{srv.server_address[1]}",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
