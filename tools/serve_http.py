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

This is the demo host: single-request batches, blocking dispatch. A
production fleet hands the same StableHLO to a PjRT runtime behind a
real frontend (and would batch across requests); the artifact's
symbolic batch dimension supports that without re-export.

Usage:
    python tools/serve_http.py --artifact DIR [--port 8000]
    curl -s -X POST --data-binary @lesion.jpg :8000/embed_image
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "src"))


def make_server(artifact: str, port: int = 0, host: str = "127.0.0.1"):
    """Build (not start) a ThreadingHTTPServer over the artifact dir."""
    import jax.numpy as jnp

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
                self._json(200, {"status": "ok", "manifest": manifest})
            else:
                self._json(404, {"error": f"no handler for GET {self.path}"})

        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                if self.path == "/embed_image" and "image_embed" in served:
                    img = jnp.asarray(decode(body)[None])
                    out = np.asarray(served["image_embed"](img))[0]
                    self._json(200, {"embedding": out.tolist()})
                elif self.path == "/embed_text" and "text_embed" in served:
                    texts = json.loads(body)["texts"]
                    ids = served["tokenize"](texts)
                    out = np.asarray(served["text_embed"](jnp.asarray(ids)))
                    self._json(200, {"embeddings": out.tolist()})
                elif self.path == "/classify" and "classify" in served:
                    img = jnp.asarray(decode(body)[None])
                    probs = np.asarray(served["classify"](img))[0]
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
    a = p.parse_args()
    srv = make_server(a.artifact, port=a.port, host=a.host)
    print(f"serving {a.artifact} on http://{a.host}:{srv.server_address[1]}",
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
