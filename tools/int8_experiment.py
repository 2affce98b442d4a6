#!/usr/bin/env python
"""int8-vs-bf16 MXU rate experiment (VERDICT r2 next-step 1c).

Question: can int8 matmuls beat the measured ~94-96 TF/s bf16 rate at this
model's GEMM shapes on v5e (whose int8 peak is ~2x bf16), enough to lift
the d=768 shape-limited step past the bf16 ceiling?

Method (memory: tpu-tunnel-measurement-traps — no scan micro-bench, no
partial reads): jit a DEPENDENT CHAIN of k dot_generals per dtype at each
model shape class, profile with jax.profiler, and attribute per-op device
time from the trace (utils/profiling.load_device_op_times). The chain
serializes execution; the profiler gives per-fusion times so chain glue
(requantization casts) is visible separately from the dots.

Run on the TPU:  python tools/int8_experiment.py
Writes a human-readable table to stdout and /tmp/int8_experiment.txt.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np

K = 16  # chained dots per measurement (kept small: the tunnel's
        # remote-compile endpoint rejects oversized HLO bodies)

# (M, K, N): the step's dominant GEMM classes (PERF.md round-2 profile)
SHAPES = {
    "vision 768x768 (M=12608)": (12608, 768, 768),
    "text 768x768 (M=16384)": (16384, 768, 768),
    "mlp fc1 768->3072 (M=16384)": (16384, 768, 3072),
    "mlp fc2 3072->768 (M=16384)": (16384, 3072, 768),
}


def chain_fn(in_dtype, acc_dtype):
    """(x, ws) -> dot(x, W_0) -> cast -> dot(., W_1) ... dependent chain.
    Weights are ARGUMENTS (constants would bloat the serialized HLO past
    the remote-compile endpoint's body limit)."""

    def f(x, ws):
        for w in ws:
            y = jax.lax.dot_general(
                x.astype(in_dtype), w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            # feed forward in the narrow dtype; the cast is part of any
            # real quantized pipeline (requantization)
            x = jnp.clip(y, -127, 127).astype(in_dtype) if in_dtype == jnp.int8 \
                else y.astype(in_dtype)
        return jnp.float32(x.astype(jnp.float32).sum())

    return jax.jit(f)


def measure(m, k, n, dtype_name):
    rng = np.random.default_rng(0)
    # alternate (k,n)/(n,k) when rectangular so the chain type-checks
    shapes = [(k, n) if i % 2 == 0 else (n, k) for i in range(K)] \
        if k != n else [(k, n)] * K
    if dtype_name == "int8":
        in_dtype, acc = jnp.int8, jnp.int32
        ws = [jnp.asarray(rng.integers(-4, 5, s), jnp.int8) for s in shapes]
        x = jnp.asarray(rng.integers(-4, 5, (m, k)), jnp.int8)
    else:
        in_dtype, acc = jnp.bfloat16, jnp.float32
        ws = [jnp.asarray(rng.normal(0, 0.02, s), jnp.bfloat16)
              for s in shapes]
        x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)

    f = chain_fn(in_dtype, acc)
    float(f(x, ws))  # compile + warm

    trace_dir = f"/tmp/int8_exp/{dtype_name}_{m}_{k}_{n}"
    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir)
    s = 0.0
    for _ in range(3):
        s += float(f(x, ws))
    jax.profiler.stop_trace()

    from mamba_clip_tpu.utils.profiling import load_device_op_times

    ops = load_device_op_times(trace_dir)
    total_us = sum(ops.values())
    dot_us = sum(v for kk, v in ops.items()
                 if "dot" in kk or "fusion" in kk or "convert" in kk)
    flops = 2.0 * m * k * n * K * 3  # 3 timed calls
    return {
        "total_ms_per_call": total_us / 1e3 / 3,
        "tf_s_total": flops / (total_us * 1e-6) / 1e12,
        "dot_share": dot_us / max(total_us, 1),
        "top_ops": sorted(ops.items(), key=lambda kv: -kv[1])[:4],
    }


def main():
    lines = []
    dev = jax.devices()[0]
    lines.append(f"device: {dev.device_kind} ({dev.platform})")
    for name, (m, k, n) in SHAPES.items():
        row = {d: measure(m, k, n, d) for d in ("bf16", "int8")}
        speedup = row["bf16"]["total_ms_per_call"] / row["int8"]["total_ms_per_call"]
        lines.append(
            f"{name}: bf16 {row['bf16']['tf_s_total']:.1f} TF/s "
            f"({row['bf16']['total_ms_per_call']:.2f} ms) | "
            f"int8 {row['int8']['tf_s_total']:.1f} TOPS "
            f"({row['int8']['total_ms_per_call']:.2f} ms) | "
            f"int8 speedup x{speedup:.2f}"
        )
        for d in ("bf16", "int8"):
            for op, us in row[d]["top_ops"]:
                lines.append(f"    [{d}] {op}: {us/1e3/3:.2f} ms/call")
    out = "\n".join(lines)
    print(out)
    with open("/tmp/int8_experiment.txt", "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
