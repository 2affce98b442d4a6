#!/usr/bin/env python
"""End-to-end real-data training benchmark (host decode → device train).

bench.py measures the jitted step on device-resident batches; this tool
measures the whole system the way the reference runs it (reference:
README.md:63 — HDF5 of JPEG bytes, DataLoader workers, per-epoch decode):
it writes an ISIC-shaped HDF5 of real JPEGs + metadata CSV, then drives
the actual CLI for two epochs and reports per-epoch throughput parsed
from the train logs.

Epoch 1 exercises native libjpeg decode → staging cache fill; epoch 2
reads the memmap staging cache (the steady state of a multi-epoch run —
the reference re-decodes every epoch instead, see BASELINE.md §3).

Usage: python tools/benchmark_e2e.py [--n 3072] [--src-px 256] [--batch 64]
Prints one JSON line: {"epoch1_img_s": ..., "epoch2_img_s": ..., ...}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))


def make_jpeg(size: int, rng) -> bytes:
    from PIL import Image

    # skin-like low-frequency content so JPEG entropy is realistic
    base = rng.normal(180, 30, (size // 8, size // 8, 3))
    img = np.clip(
        np.kron(base, np.ones((8, 8, 1))) + rng.normal(0, 8, (size, size, 3)),
        0, 255,
    ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return buf.getvalue()


def build_dataset(root: str, n: int, src_px: int, seed: int = 0) -> None:
    import h5py

    from mamba_clip_tpu.data import synthetic_metadata

    os.makedirs(root, exist_ok=True)
    meta = synthetic_metadata(n, seed=seed)
    meta.to_csv(os.path.join(root, "train-metadata.csv"), index=False)
    rng = np.random.default_rng(seed)
    with h5py.File(os.path.join(root, "train-image.hdf5"), "w") as f:
        for isic_id in meta["isic_id"]:
            f[isic_id] = np.void(make_jpeg(src_px, rng))


def run(n: int, src_px: int, batch: int, workers: int, fresh: bool):
    root = f"/tmp/e2e_bench_data_{n}_{src_px}"
    logs = "/tmp/e2e_bench_logs"
    if fresh and os.path.exists(root):
        shutil.rmtree(root)
    if not os.path.exists(os.path.join(root, "train-image.hdf5")):
        build_dataset(root, n, src_px)
    # fresh staging cache: epoch 1 must pay the decode
    staging = os.path.join(root, "staging")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    shutil.rmtree(logs, ignore_errors=True)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.join(REPO, "src") + ":" + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, "-m", "mamba_clip_tpu.cli.main",
        "--data-path", root, "--cache-staging", staging,
        "--batch-size", str(batch), "--epochs", "2", "--warmup", "2",
        "--lr", "1e-4", "--precision", "amp", "--stage", "1",
        "--logs", logs, "--workers", str(workers),
        "--log-every-n-steps", "4", "--grad-clip-norm", "1.0",
    ]
    proc = subprocess.run(cmd, env=env, cwd=REPO, text=True,
                          capture_output=True, timeout=3600)
    out = proc.stdout + proc.stderr
    if proc.returncode != 0:
        sys.stderr.write(out[-4000:])
        raise SystemExit(f"CLI failed rc={proc.returncode}")

    # per-step "samples/s: X" lines, grouped by epoch
    rates = {0: [], 1: []}
    for m in re.finditer(
        r"Train Epoch: (\d+) \[\s*\d+/\d+.*?samples/s: ([0-9.]+)", out
    ):
        ep, r = int(m.group(1)), float(m.group(2))
        if ep in rates:
            rates[ep].append(r)

    def steady(v):  # drop the first (compile/fill-in) points
        v = v[2:] if len(v) > 4 else v
        return float(np.median(v)) if v else float("nan")

    return {
        "n_images": n, "src_px": src_px, "batch": batch, "workers": workers,
        "epoch1_img_s": round(steady(rates[0]), 1),
        "epoch2_img_s": round(steady(rates[1]), 1),
        "steps_per_epoch": len(rates[0]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=3072)
    p.add_argument("--src-px", type=int, default=256)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--fresh", action="store_true")
    a = p.parse_args()
    print(json.dumps(run(a.n, a.src_px, a.batch, a.workers, a.fresh)))


if __name__ == "__main__":
    main()
