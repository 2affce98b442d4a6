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
single-request dispatch. A production fleet hands the same StableHLO to
a PjRT runtime behind a real frontend; the batching policy here is the
same shape that frontend would implement.

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


class MicroBatcher:
    """Coalesce concurrent row-batches into one device call.

    Items are arrays with a leading batch dim (k >= 1 rows). The
    dispatcher thread concatenates queued items (up to ``max_batch``
    total rows, waiting at most ``max_delay_ms`` after the first), pads
    to the next power-of-two row count, runs ``fn`` once and splits the
    output back per request. Exceptions propagate to every coalesced
    caller."""

    def __init__(self, fn, max_batch: int = 16, max_delay_ms: float = 5.0):
        self.fn = fn
        self.max_batch = max(int(max_batch), 1)
        self.max_delay = max(float(max_delay_ms), 0.0) / 1e3
        self.q: "queue.Queue" = queue.Queue()
        self.requests = 0
        self.batches = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

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
            m = 1 << (n - 1).bit_length()  # pad: bounded compile shapes
            if m != n:
                items = np.concatenate(
                    [items, np.repeat(items[-1:], m - n, axis=0)], axis=0)
            try:
                out = np.asarray(self.fn(items))
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

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "src"))


def make_server(artifact: str, port: int = 0, host: str = "127.0.0.1",
                max_batch: int = 16, max_delay_ms: float = 5.0):
    """Build (not start) a ThreadingHTTPServer over the artifact dir.

    ``max_batch``/``max_delay_ms`` tune the cross-request MicroBatcher;
    ``max_batch=1`` dispatches each request directly."""

    from mamba_clip_tpu.data import fastimage
    from mamba_clip_tpu.data.dataset import _decode_to_square
    from mamba_clip_tpu.serving import load_serving

    # check the manifest BEFORE load_serving: a sharded artifact would
    # fail mesh construction inside the loader with an obscure error on
    # hosts with fewer devices than shards
    with open(os.path.join(artifact, "manifest.json")) as f:
        if int(json.load(f).get("data_shards", 1)) > 1:
            raise ValueError(
                "serve_http serves single-shard artifacts (request batches "
                "are tiny); export with --data-shards 1 for this host"
            )
    served = load_serving(artifact)
    manifest = served["manifest"]
    staging = int(manifest["staging_size"])

    if max_batch > 1:
        batchers = {
            name: MicroBatcher(served[name], max_batch, max_delay_ms)
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

    return ThreadingHTTPServer((host, port), Handler)


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
    a = p.parse_args()
    srv = make_server(a.artifact, port=a.port, host=a.host,
                      max_batch=a.max_batch, max_delay_ms=a.max_delay_ms)
    print(f"serving {a.artifact} on http://{a.host}:{srv.server_address[1]}",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
