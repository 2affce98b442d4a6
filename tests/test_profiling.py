"""utils/profiling: trace parsing + HLO shape-class attribution
(tools/profile_step.py's core, exercised on a fabricated Chrome trace)."""

import gzip
import json
import os

from mamba_clip_tpu.utils.profiling import (
    attribute,
    classify_op,
    format_attribution,
    load_device_op_times,
)

HLO = """
ENTRY %main () -> f32[] {
  %fusion.1 = bf16[64,197,3072]{2,1,0} fusion(%p0), kind=kOutput
  %fusion.2 = bf16[64,12,197,197]{3,2,1,0} fusion(%p1), kind=kLoop
  %fusion.3 = bf16[64,197,768]{2,1,0} fusion(%p2), kind=kOutput
  %fusion.4 = bf16[3072,768]{1,0} fusion(%p3), kind=kOutput
  %weird.5 = f32[7,9]{1,0} fusion(%p4)
}
"""


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_load_device_op_times_filters_device_thread(tmp_path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # device op events (counted)
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 100},
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.1", "dur": 50},
        {"ph": "X", "pid": 3, "tid": 3, "name": "copy.7", "dur": 10},
        # step-level + host events (must be excluded)
        {"ph": "X", "pid": 3, "tid": 1, "name": "step 0", "dur": 99999},
        {"ph": "X", "pid": 9, "tid": 0, "name": "python", "dur": 12345},
    ]
    times = load_device_op_times(_write_trace(tmp_path, events))
    assert times == {"fusion.1": 150, "copy.7": 10}


def test_classify_and_attribute():
    times = {
        "fusion.1": 4000.0,  # mlp-3072
        "fusion.2": 3000.0,  # attention
        "fusion.3": 2000.0,  # width-768
        "fusion.4": 1000.0,  # dW
        "weird.5": 500.0,    # other compute
        "copy.7": 250.0,     # layout
    }
    rows = attribute(times, HLO, steps=2)
    by = {c: ms for c, ms, _ in rows}
    assert by["mlp-3072 stream (fc1/act, fwd+dx)"] == 2.0
    assert by["attention scores/softmax"] == 1.5
    assert by["width-768 stream (qkv/proj/fc2/LN)"] == 1.0
    assert by["dW / param-sized"] == 0.5
    assert by["other compute"] == 0.25
    assert by["copy / layout"] == 0.125
    # ordered by time desc
    assert [c for c, _, _ in rows][0] == "mlp-3072 stream (fc1/act, fwd+dx)"
    txt = format_attribution(rows, top_ops=[("fusion.1", 2.0)])
    assert "TOTAL on-device" in txt and "fusion.1" in txt


def test_classify_without_hlo_falls_back_to_name():
    assert classify_op("copy-done.12") == "copy / layout"
    assert classify_op("slice-start.3") == "slice / layout"
    assert classify_op("custom-call.4") == "plumbing"
    assert classify_op("fusion.9") == "other compute"


def test_missing_trace_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        load_device_op_times(str(tmp_path))
