#!/usr/bin/env python
"""Measure the attention interior's cost vs the softmax compute dtype.

Round-3 state: with tanh GELU landed, attention is the step's top class
(32.8 ms of 146.7 under --quant int8_fast's 131 ms). Hand kernels and
forced probs-remat are recorded negatives (PERF.md). Remaining hypothesis:
the [B,h,T,T] score/prob tensors are materialized in fp32 around the
softmax (scores are upcast for masking+softmax, probs cast back), and the
chain is HBM-bound on that fp32 traffic — note the q·k einsum already
emits bf16, so the fp32 softmax operates on bf16-rounded logits anyway.

This measures dependent chains of the full attention interior
(scores einsum → softmax → probs·v einsum), fwd+bwd, at the text tower's
shape, with the softmax computed in:
  fp32      — current model code (upcast, fp32 softmax, cast back)
  bf16_f32sum — bf16 max-sub/exp, fp32 sum accumulation, bf16 probs
  bf16      — plain jax.nn.softmax on bf16

Run: python tools/softmax_cost_experiment.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8
B, H, T, HD = 64, 12, 256, 64


def softmax_fp32(s):
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return p.astype(jnp.bfloat16)


def softmax_bf16_f32sum(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)  # bf16 exp
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    return (e.astype(jnp.float32) / denom).astype(jnp.bfloat16)


def softmax_bf16(s):
    return jax.nn.softmax(s, axis=-1)


VARIANTS = {
    "fp32": softmax_fp32,
    "bf16_f32sum": softmax_bf16_f32sum,
    "bf16": softmax_bf16,
}


def attn_chain(variant):
    sm = VARIANTS[variant]

    def interior(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (HD ** -0.5)
        p = sm(s)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def f(q, k, v):
        # dependent chain: each iteration's output feeds the next q —
        # nothing constant-folds, everything executes
        acc = jnp.float32(0.0)
        for _ in range(ITERS):
            o = interior(q, k, v)
            acc = acc + o.astype(jnp.float32).sum()
            q = o
        return acc

    return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, T, H, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, T, H, HD)), jnp.bfloat16)

    from mamba_clip_tpu.utils.profiling import load_device_op_times

    # numerics first (vs fp32 probs of the SAME bf16-rounded logits)
    s = (jnp.einsum("bqhd,bkhd->bhqk", q, k) * (HD ** -0.5))
    p_ref = np.asarray(softmax_fp32(s), np.float32)
    for name in ("bf16_f32sum", "bf16"):
        p = np.asarray(VARIANTS[name](s), np.float32)
        print(f"{name:12s} max|Δprob| vs fp32-softmax = "
              f"{np.abs(p - p_ref).max():.2e}")

    lines = []
    for name in VARIANTS:
        f = attn_chain(name)
        out = f(q, k, v)
        float(out[0])
        d = f"/tmp/softmax_exp/{name}"
        os.makedirs(d, exist_ok=True)
        jax.profiler.start_trace(d)
        for _ in range(3):
            val, grads = f(q, k, v)
            float(val)
        jax.profiler.stop_trace()
        ops = load_device_op_times(d)
        total_ms = sum(ops.values()) / 1e3 / 3
        lines.append(f"{name:12s}: {total_ms:7.2f} ms/call  "
                     f"({total_ms/ITERS*1e3:6.0f} us/attn fwd+bwd)")
    out = "\n".join(lines)
    print(out)
    with open("/tmp/softmax_cost_experiment.txt", "w") as fh:
        fh.write(out + "\n")


if __name__ == "__main__":
    main()
