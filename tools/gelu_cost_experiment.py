#!/usr/bin/env python
"""Measure the cost of the GELU epilogue fused into the fc1 matmul.

Round-3 finding: the step's fc1+GELU fusion runs 0.92 ms while the same
dot with a cast-only epilogue runs 0.41 ms (tools/int8_experiment.py).
Hypothesis: exact GELU's erf is VPU-transcendental-bound and costs as much
as the matmul. This measures dependent chains of the fc1-shaped dot with
different activation epilogues on the real chip.

Run: python tools/gelu_cost_experiment.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np

K = 12
M, Kdim, N = 16384, 768, 3072

ACTS = {
    "none": lambda y: y,
    "gelu_exact": lambda y: jax.nn.gelu(y, approximate=False),
    "gelu_tanh": lambda y: jax.nn.gelu(y, approximate=True),
    "quick_gelu": lambda y: y * jax.nn.sigmoid(1.702 * y),
}


def chain(act):
    def f(x, ws):
        for w in ws:
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = ACTS[act](y).astype(jnp.bfloat16)
            # fold back to (M, Kdim) USING EVERY OUTPUT ELEMENT — a plain
            # slice would let XLA compute only 1/4 of the dot
            # (memory: tpu-tunnel-measurement-traps, slice-through-dot)
            x = y.reshape(M, N // Kdim, Kdim).sum(axis=1).astype(jnp.bfloat16)
        return jnp.float32(x.astype(jnp.float32).sum())

    return jax.jit(f)


def main():
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(0, 0.02, (Kdim, N)), jnp.bfloat16)
          for _ in range(K)]
    x = jnp.asarray(rng.normal(0, 1, (M, Kdim)), jnp.bfloat16)

    from mamba_clip_tpu.utils.profiling import load_device_op_times

    lines = []
    for act in ACTS:
        f = chain(act)
        float(f(x, ws))
        d = f"/tmp/gelu_exp/{act}"
        os.makedirs(d, exist_ok=True)
        jax.profiler.start_trace(d)
        for _ in range(3):
            float(f(x, ws))
        jax.profiler.stop_trace()
        ops = load_device_op_times(d)
        total_ms = sum(ops.values()) / 1e3 / 3
        per_dot = total_ms / K
        lines.append(f"{act:12s}: {total_ms:7.2f} ms/call  "
                     f"({per_dot*1e3:6.0f} us/dot)")
        for op, us in sorted(ops.items(), key=lambda kv: -kv[1])[:2]:
            lines.append(f"    {op}: {us/1e3/3:.2f} ms/call")
    out = "\n".join(lines)
    print(out)
    with open("/tmp/gelu_cost_experiment.txt", "w") as fh:
        fh.write(out + "\n")


if __name__ == "__main__":
    main()
