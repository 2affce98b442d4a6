#!/usr/bin/env python
"""Measure SS2D's depthwise 3x3 conv against a shift-and-add lowering.

XLA:TPU lowers feature_group_count=C convs through its general conv
path, which at small spatial tiles can be far from the VPU's
elementwise peak. A depthwise 3x3 is just 9 shifted multiply-adds, so
an unrolled shift formulation is the natural alternative. This tool
profiles both (fwd + bwd through a sum loss) at the medmamba stage
shapes so PERF.md's verdict is measured, not guessed.

Usage: python tools/depthwise_conv_experiment.py [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamba_clip_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()

    # medmamba SS2D stage shapes (bs 32): (B, H, W, d_inner)
    shapes = [
        (32, 56, 56, 64),
        (32, 28, 28, 128),
        (32, 14, 14, 256),
        (32, 7, 7, 512),
    ]

    def conv_xla(x, w, b):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", feature_group_count=x.shape[-1],
            dimension_numbers=dn)
        return y + b

    def conv_shift(x, w, b):
        # w: (3, 3, 1, C) depthwise taps; pad then 9 shifted FMAs
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        H, W = x.shape[1], x.shape[2]
        y = b * jnp.ones_like(x)
        for di in range(3):
            for dj in range(3):
                y = y + xp[:, di:di + H, dj:dj + W, :] * w[di, dj, 0]
        return y

    rng = np.random.default_rng(0)
    for B, H, W, C in shapes:
        x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.bfloat16)

        for name, fn in (("xla_dw", conv_xla), ("shift9", conv_shift)):
            def loss(x, w, b, fn=fn):
                return jnp.sum(fn(x, w, b).astype(jnp.float32) ** 2)

            g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
            v, grads = g(x, w, b)  # compile + warmup
            float(v)
            t0 = time.perf_counter()
            for _ in range(a.steps):
                v, grads = g(x, w, b)
            float(v)
            dt = (time.perf_counter() - t0) / a.steps
            print(f"({B},{H},{W},{C}) {name}: {dt * 1e6:.0f} us/fwd+bwd")

        # parity
        y1 = conv_xla(x, w, b).astype(jnp.float32)
        y2 = conv_shift(x, w, b).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(y1 - y2)))
        print(f"({B},{H},{W},{C}) max|xla-shift| = {err:.3e}")


if __name__ == "__main__":
    main()
