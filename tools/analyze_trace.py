#!/usr/bin/env python
"""Aggregate a captured jax.profiler trace by op base-name.

Complements tools/profile_step.py (which classifies by HLO shape class):
this groups the per-op device times by the op's base name (the fusion
family — ``convert_reduce_fusion.12`` → ``convert_reduce_fusion``), which
is how XLA names repeated instances of the same lowering across layers.
Useful for finding diffuse cost classes (N small identical ops) that no
single-op toplist surfaces.

Usage:
  python tools/profile_step.py --trace-dir /tmp/trace ...   # capture
  python tools/analyze_trace.py /tmp/trace --steps 5 [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))

_SUFFIX = re.compile(r"[.\-]\d+$")


def base_name(op: str) -> str:
    """Strip trailing instance counters: fusion.123 -> fusion,
    copy-done.2 -> copy-done, loop_add_fusion.4.remat2 -> keep remat tag."""
    prev = None
    while prev != op:
        prev = op
        op = _SUFFIX.sub("", op)
    return op


def main():
    p = argparse.ArgumentParser()
    p.add_argument("trace_dir")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--grep", default=None,
                   help="only groups whose base name matches this regex")
    a = p.parse_args()

    from mamba_clip_tpu.utils.profiling import load_device_op_times

    times = load_device_op_times(a.trace_dir)
    groups = collections.defaultdict(lambda: [0.0, 0])
    for name, us in times.items():
        g = groups[base_name(name)]
        g[0] += us
        g[1] += 1
    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])
    if a.grep:
        pat = re.compile(a.grep)
        rows = [r for r in rows if pat.search(r[0])]
    total = sum(us for us, _ in groups.values()) / a.steps / 1e3
    print(f"{'ms/step':>9s}  {'%':>5s}  {'ops':>5s}  base name")
    for name, (us, n) in rows[: a.top]:
        ms = us / a.steps / 1e3
        print(f"{ms:9.3f}  {100 * ms / total:5.1f}  {n:5d}  {name}")
    print(f"{total:9.3f}  100.0         TOTAL on-device")


if __name__ == "__main__":
    main()
