#!/usr/bin/env python
"""Profile the stage-1 train step and print an op-level attribution.

Captures a ``jax.profiler`` trace of exactly the step bench.py measures
(shared builder), parses the Chrome trace the profiler writes, joins op
names with the compiled HLO for shape classification, and prints the
table PERF.md's "op-level profile" section is built from.

Usage:
  python tools/profile_step.py [--batch 64] [--model biomedclip]
                               [--precision amp] [--steps 5] [--top 15]

Works on the TPU (primary) and on CPU (coarse host-op attribution).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--model", default="biomedclip")
    p.add_argument("--precision", default="amp")
    p.add_argument("--quant", default=None)
    p.add_argument("--attn-remat", action="store_true")
    p.add_argument("--attn-impl", default="einsum",
                   help="einsum|flash (ops/flash_attn)")
    p.add_argument("--text-ctx", type=int, default=None,
                   help="padded text length (default: bench.TEXT_CTX, the "
                        "--text-context auto bucket)")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--trace-dir", default=None,
                   help="keep the raw trace here (default: temp dir)")
    p.add_argument("--grep", default=None,
                   help="also list the hottest ops whose name matches this "
                        "regex, with their HLO definition lines")
    a = p.parse_args()

    import jax

    from bench import build_train_step
    from mamba_clip_tpu.parallel.mesh import enable_compilation_cache
    from mamba_clip_tpu.utils.profiling import (
        attribute, format_attribution, load_device_op_times)

    enable_compilation_cache()
    import bench

    step_fn, state, batch, rng = build_train_step(
        batch_size=a.batch, model_name=a.model, precision=a.precision,
        quant=a.quant, attn_remat=a.attn_remat, attn_impl=a.attn_impl,
        text_ctx=a.text_ctx if a.text_ctx else bench.TEXT_CTX,
    )

    # HLO text for shape classification (cheap: reuses the cached compile)
    hlo = step_fn.lower(state, batch, rng).compile().as_text()

    trace_dir = a.trace_dir or tempfile.mkdtemp(prefix="mamba_clip_prof_")
    for _ in range(3):  # warmup/compile outside the trace
        state, metrics = step_fn(state, batch, rng)
    float(metrics["loss"])

    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for _ in range(a.steps):
        state, metrics = step_fn(state, batch, rng)
    loss = float(metrics["loss"])
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / a.steps

    times = load_device_op_times(trace_dir)
    rows = attribute(times, hlo, steps=a.steps)
    top = sorted(times.items(), key=lambda kv: -kv[1])[: a.top]
    print(f"model={a.model} batch={a.batch} precision={a.precision} "
          f"steps={a.steps} loss={loss:.4f} wall={wall * 1e3:.1f} ms/step\n")
    print(format_attribution(
        rows, [(n, us / a.steps / 1e3) for n, us in top], hlo_text=hlo
    ))
    if a.grep:
        import re

        from mamba_clip_tpu.utils.profiling import _hlo_defs
        defs = _hlo_defs(hlo)
        pat = re.compile(a.grep)
        matched = [(n, us) for n, us in times.items() if pat.search(n)]
        matched.sort(key=lambda kv: -kv[1])
        print(f"\nhottest ops matching /{a.grep}/ "
              f"(total {sum(us for _, us in matched) / a.steps / 1e3:.2f} "
              f"ms/step over {len(matched)} ops):")
        for n, us in matched[: a.top]:
            print(f"{us / a.steps / 1e3:9.3f}  {n}")
            d = defs.get(n, "")
            if d:
                print(f"           = {d[:160]}")
    if a.trace_dir is None:
        shutil.rmtree(trace_dir, ignore_errors=True)
    else:
        print(f"\nraw trace kept at {trace_dir}")


if __name__ == "__main__":
    main()
