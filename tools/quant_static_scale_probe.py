#!/usr/bin/env python
"""Feasibility probe: what would delayed scaling buy `--quant int8_fast`?

Delayed scaling (the FP8-training trick: quantize with the PREVIOUS
step's scale, compute this step's absmax as a fused by-product) removes
the amax→quantize serialization, letting XLA fuse the quantize pass into
each tensor's producer instead of running a separate read+write pass.
Upper bound on the win = the step time with scales replaced by a
compile-time CONSTANT (numerics are garbage — timing only): that is
exactly the dependency structure delayed scaling produces, minus the
(fused, ~free) amax by-product and scale-state plumbing.

Run on the real TPU:  python tools/quant_static_scale_probe.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))
sys.path.insert(0, REPO)


def time_step(steps):
    from bench import build_train_step

    step_fn, state, batch, rng = build_train_step(
        batch_size=64, model_name="biomedclip", precision="amp",
        quant="int8_fast")
    for _ in range(3):
        state, metrics = step_fn(state, batch, rng)
    loss = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch, rng)
    loss = float(metrics["loss"])
    return (time.perf_counter() - t0) / steps * 1e3, loss


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    a = p.parse_args()

    import jax.numpy as jnp

    from mamba_clip_tpu.ops import qdot
    from mamba_clip_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    ms, loss = time_step(a.steps)
    print(f"dynamic absmax scales:  {ms:7.1f} ms/step  loss={loss:.4f}",
          flush=True)

    orig = qdot._absmax_scale
    # A plausible per-tensor activation scale; numerics are wrong on
    # purpose (every tensor shares it) — only the dependency structure
    # matters for the timing question.
    qdot._absmax_scale = lambda x: jnp.float32(0.05)
    try:
        ms2, loss2 = time_step(a.steps)
    finally:
        qdot._absmax_scale = orig
    print(f"constant scales (probe): {ms2:6.1f} ms/step  loss={loss2:.4f}")
    print(f"delayed-scaling ceiling: {ms - ms2:+.1f} ms/step")


if __name__ == "__main__":
    main()
