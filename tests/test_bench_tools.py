"""Unit tests for the scaling/serving benchmark tooling (tools/).

The full measurements run on real hardware (bench_scaling.py on a pod,
bench_serving.py against a TPU artifact); these tests pin the pure
logic: HLO collective parsing, the mesh ladder, and the serving load
loop end-to-end against a tiny CPU artifact.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_collective_stats_parses_hlo():
    from bench_scaling import collective_stats

    hlo = """
  %ar = f32[128,64]{1,0} all-reduce(f32[128,64]{1,0} %g), replica_groups={}
  %ag.1 = bf16[8,256]{1,0} all-gather(bf16[1,256]{1,0} %p), dimensions={0}
  ROOT %rs = f32[16]{0} reduce-scatter(f32[128]{0} %x), dimensions={0}
  %cp = f32[4,4]{1,0} collective-permute(f32[4,4]{1,0} %y)
  %notacoll = f32[2]{0} add(f32[2]{0} %a, f32[2]{0} %b)
"""
    s = collective_stats(hlo)
    assert s["all-reduce"]["count"] == 1
    assert s["all-reduce"]["bytes"] == 128 * 64 * 4
    assert s["all-gather"]["count"] == 1
    assert s["all-gather"]["bytes"] == 8 * 256 * 2
    assert s["reduce-scatter"]["bytes"] == 16 * 4
    assert s["collective-permute"]["count"] == 1
    assert "add" not in s


def test_collective_stats_tuple_shapes():
    from bench_scaling import collective_stats

    hlo = ("  %t = (f32[4,4]{1,0}, f32[4,4]{1,0}) all-reduce("
           "f32[4,4]{1,0} %a, f32[4,4]{1,0} %b)\n")
    s = collective_stats(hlo)
    assert s["all-reduce"]["count"] == 1
    assert s["all-reduce"]["bytes"] == 2 * 4 * 4 * 4


def test_mesh_ladder_shapes():
    from bench_scaling import mesh_ladder

    l8 = mesh_ladder(8)
    assert l8[0] == (1, 1, 1)
    assert (8, 1, 1) in l8
    assert (2, 2, 2) in l8
    assert all(d * f * m <= 8 for d, f, m in l8)
    assert len(set(l8)) == len(l8)  # no dups
    l1 = mesh_ladder(1)
    assert l1 == [(1, 1, 1)]


def test_bench_serving_tiny_end_to_end(tmp_path):
    """Full load loop against a tiny CPU artifact: all requests succeed,
    stats are sane, and concurrency drives batch formation > 1."""
    from bench_serving import export_tiny, main

    artifact = export_tiny(str(tmp_path))
    out = main([
        "--artifact", artifact, "--clients", "1,4", "--duration", "1.5",
        "--max-batch", "8", "--max-delay-ms", "10", "--jpeg-size", "48",
        "--json", str(tmp_path / "out.json"),
    ])
    rows = out["rows"]
    assert [r["clients"] for r in rows] == [1, 4]
    for r in rows:
        assert r["requests"] > 0
        assert r["req_per_s"] > 0
        assert r["p50_ms"] <= r["p95_ms"] <= r["p99_ms"]
    # 4 closed-loop clients against a CPU-speed model must coalesce
    assert rows[1]["mean_batch_fill"] > 1.0
    assert os.path.exists(tmp_path / "out.json")


def test_microbatcher_pipelined_dispatch():
    """in_flight=2: results stay correct per-request while up to two
    device calls are outstanding; dispatch-time AND completion-time
    failures fan out to exactly the coalesced callers."""
    import threading
    import time

    import numpy as np

    import serve_http as tool

    calls = {"n": 0, "concurrent": 0, "max_concurrent": 0}
    lock = threading.Lock()

    def fn(x):
        with lock:
            calls["n"] += 1
            calls["concurrent"] += 1
            calls["max_concurrent"] = max(calls["max_concurrent"],
                                          calls["concurrent"])
        # the batcher materializes via np.asarray AFTER dispatch; emulate
        # async completion with a tiny sleep inside the "device call"
        time.sleep(0.02)
        with lock:
            calls["concurrent"] -= 1
        return x * 2.0

    b = tool.MicroBatcher(fn, max_batch=4, max_delay_ms=1.0, in_flight=2)
    results = [None] * 12

    def post(i):
        results[i] = b(np.full((1, 3), float(i)))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, r in enumerate(results):
        np.testing.assert_allclose(r, np.full((1, 3), 2.0 * i))
    assert b.requests == 12
    assert b.batches == calls["n"]

    # failures propagate to every coalesced caller, batcher survives
    def bad(x):
        raise RuntimeError("boom")

    bb = tool.MicroBatcher(bad, max_batch=4, max_delay_ms=1.0, in_flight=2)
    errs = []

    def post_bad():
        try:
            bb(np.zeros((1, 2)))
        except RuntimeError as e:
            errs.append(str(e))

    threads = [threading.Thread(target=post_bad) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == ["boom"] * 3
    # and a later good call still works (semaphore not leaked)
    bb.fn = lambda x: x + 1.0
    np.testing.assert_allclose(bb(np.zeros((1, 2))), np.ones((1, 2)))


def test_http_server_backlog_raised():
    """The stdlib's listen-backlog default of 5 resets bursty connects;
    make_server's subclass must raise it."""
    import serve_http as tool

    # the subclass is created inside make_server; assert via a tiny
    # artifact server
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench_serving import export_tiny
    import tempfile

    art = export_tiny(tempfile.mkdtemp(prefix="backlog_"))
    srv = tool.make_server(art, port=0, max_batch=1)
    try:
        assert srv.request_queue_size >= 128
    finally:
        srv.server_close()
