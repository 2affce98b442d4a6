"""Train-step profiling: capture a ``jax.profiler`` trace and attribute
device time by HLO shape class.

The reference's only tracing hook is TorchScript ``trace_model``
(reference: src/mamba_clip/pipeline.py:237-238); the TPU-native
observability story is a real profiler capture. ``--trace`` wires the
epoch loop to ``jax.profiler`` (train.py); this module turns the captured
xplane/Chrome-trace into the op-level attribution used for PERF.md —
without TensorBoard (the tensorboard_plugin_profile converter is not
protobuf-compatible everywhere, but the ``*.trace.json.gz`` Chrome trace
the profiler always writes carries per-op device times).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple

__all__ = [
    "load_device_op_times",
    "classify_op",
    "attribute",
    "format_attribution",
]

# order matters: first match wins
_SHAPE_CLASSES: List[Tuple[str, str]] = [
    (r"\[\d+,\d+,3072\]", "mlp-3072 stream (fc1/act, fwd+dx)"),
    (r"\[\d+,12,\d+,\d+\]", "attention scores/softmax"),
    (r"\[\d+,\d+,768\]", "width-768 stream (qkv/proj/fc2/LN)"),
    (r"30522,768", "embedding table"),
    (r"\[(768,768|768,2304|2304,768|768,3072|3072,768|512,768|768,512)[,\]]",
     "dW / param-sized"),
    (r"\[\d+,(224|256),(224|256),3\]", "image preprocess"),
    (r"f32\[\]", "scalars / norms"),
]


def load_device_op_times(trace_dir: str) -> Dict[str, float]:
    """Per-op device time in microseconds, summed over all traced steps.

    Reads the newest ``*.trace.json.gz`` under ``trace_dir`` and returns
    ``{op_name: total_us}`` for ONE device process's 'XLA Ops' thread —
    the busiest pid when a multi-chip trace holds several — so values read
    as per-chip milliseconds (falls back to the busiest thread when names
    are absent). Single-chip attribution tool by design.
    """
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        events = json.load(f)["traceEvents"]

    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"]["name"]

    device_pids = [p for p, n in pid_names.items()
                   if "TPU" in n or "GPU" in n or "device" in n.lower()]
    complete = [e for e in events if e.get("ph") == "X"]
    if device_pids:
        # ONE device pid only (the busiest): per-op times here mean
        # "ms on a chip". Summing across all device pids of a multi-chip
        # (replicated/sharded) trace would inflate per-step ms by the
        # device count (ADVICE r2); profile_step is a single-chip tool.
        if len(device_pids) > 1:
            per_pid = collections.Counter()
            for e in complete:
                if e["pid"] in device_pids:
                    per_pid[e["pid"]] += e.get("dur", 0)
            device_pids = [per_pid.most_common(1)[0][0]]
        complete = [e for e in complete if e["pid"] in device_pids]
    op_tids = {k for k, n in tid_names.items() if n == "XLA Ops"}
    if op_tids:
        complete = [e for e in complete
                    if (e["pid"], e["tid"]) in op_tids]
    else:  # fall back to the busiest (pid, tid)
        busy = collections.Counter()
        for e in complete:
            busy[(e["pid"], e["tid"])] += e.get("dur", 0)
        if busy:
            top = busy.most_common(1)[0][0]
            complete = [e for e in complete if (e["pid"], e["tid"]) == top]

    agg: Dict[str, float] = collections.defaultdict(float)
    for e in complete:
        agg[e["name"]] += e.get("dur", 0)
    return dict(agg)


def classify_op(name: str, hlo_line: str = "") -> str:
    """Bucket an op by name and (when available) its HLO output shapes."""
    head = name.split(".")[0].split("-")[0]
    if "self_attention" in name:
        # VSSM's SS2D lives under a scope named self_attention (mirroring
        # the reference's SS_Conv_SSM attribute, model.py:686) — these are
        # the selective-scan stack's fusions, not transformer attention
        return "SS2D / selective-scan stack"
    if head in ("copy", "slice", "bitcast", "reshape", "tuple", "pad",
                "transpose"):
        return f"{head} / layout"
    if head == "custom":
        # Pallas kernels lower to tpu_custom_call — the selective scan is
        # the dominant op of the VSSM/medmamba models, not plumbing
        if "tpu_custom_call" in hlo_line or "mosaic" in hlo_line.lower():
            return "pallas kernel (custom-call)"
        return "plumbing"
    if head in ("get", "infeed", "outfeed"):
        return "plumbing"
    for pat, label in _SHAPE_CLASSES:
        if re.search(pat, hlo_line):
            return label
    return "other compute"


def _hlo_defs(hlo_text: str) -> Dict[str, str]:
    defs: Dict[str, str] = {}
    for m in re.finditer(r"^\s*(?:ROOT )?%?([\w.\-]+) = ([^\n]{0,200})",
                         hlo_text, re.M):
        defs.setdefault(m.group(1), m.group(2))
    return defs


def attribute(
    op_times_us: Dict[str, float],
    hlo_text: str = "",
    steps: int = 1,
) -> List[Tuple[str, float, int]]:
    """[(class, ms_per_step, num_ops)] sorted by time, descending.

    Durations are summed over all traced steps so ms divides by ``steps``;
    op NAMES are already unique per step (load_device_op_times collapses
    the per-step repetitions of each name), so the count does not.
    """
    defs = _hlo_defs(hlo_text) if hlo_text else {}
    agg = collections.Counter()
    cnt = collections.Counter()
    for name, us in op_times_us.items():
        c = classify_op(name, defs.get(name, ""))
        agg[c] += us
        cnt[c] += 1
    return [(c, us / steps / 1e3, cnt[c]) for c, us in agg.most_common()]


def format_attribution(
    rows: List[Tuple[str, float, int]],
    top_ops: Optional[List[Tuple[str, float]]] = None,
    hlo_text: str = "",
) -> str:
    total = sum(r[1] for r in rows)
    out = [f"{'ms/step':>9s}  {'%':>5s}  {'ops':>5s}  class"]
    for c, ms, n in rows:
        out.append(f"{ms:9.3f}  {100 * ms / max(total, 1e-9):5.1f}  "
                   f"{n:5d}  {c}")
    out.append(f"{total:9.3f}  100.0  {'':5s}  TOTAL on-device")
    if top_ops:
        defs = _hlo_defs(hlo_text) if hlo_text else {}
        out.append("\nhottest individual ops:")
        for name, ms in top_ops:
            cls = classify_op(name, defs.get(name, ""))
            out.append(f"{ms:9.3f}  {name[:48]:48s} [{cls}]")
    return "\n".join(out)
