#!/usr/bin/env python
"""Roofline for the Pallas selective-scan kernel (medmamba's hot op).

Closes the medmamba perf story the way the flagship's is closed: instead
of "the scan is VPU-bound" prose, this measures — in ONE process on the
same chip —

  1. the chip's VPU ceiling: a pure-FMA Pallas kernel on VMEM-resident
     fp32 tiles (throughput-, not latency-bound: the chain runs across
     a full tile per round);
  2. the exp surcharge: the same kernel with one exp per round, giving
     the transcendental's cost in FMA-slots;
  3. the HBM ceiling: a big contiguous read+write fusion;
  4. the scan kernel's fwd and bwd device time at medmamba's hot shapes
     (stage-1 L=3136/DG=64 and stage-3 L=196/DG=256, bf16 inputs, the
     amp recipe), via profiler op times (tunnel-latency-free);

and reports achieved padded-element throughput against the arithmetic
floor those ceilings imply, plus achieved HBM GB/s against the memory
ceiling (to pin which wall the kernel actually sits at).

The kernel's per-padded-element arithmetic (ops/selective_scan.py
_fwd_kernel, counted on the (T, N, DT) arrays): ~14 VPU ops + 1 exp.

Run:  python tools/scan_roofline.py [--json]
Writes perf/scan_roofline_r5.json when run from the repo root.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 3


def _trace_ms(fn, args, tag, reps=REPS):
    """Mean device ms/call of fn via profiler op times (the tunnel makes
    wall clocks lie; op durations are measured on-device). Execution is
    forced by fetching ONE element of one output — a 4-byte transfer that
    waits for the whole executable — never a full array (tunnel gotcha).
    Returns (total_ms_per_call, {op: ms_per_call})."""
    from mamba_clip_tpu.utils.profiling import load_device_op_times

    def _sync(out):
        float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])

    _sync(fn(*args))  # compile + warm
    d = f"/tmp/scan_roofline/{tag}"
    os.makedirs(d, exist_ok=True)
    jax.profiler.start_trace(d)
    for _ in range(reps):
        _sync(fn(*args))
    jax.profiler.stop_trace()
    ops = load_device_op_times(d)
    per_op = {k: v / 1e3 / reps for k, v in ops.items()}
    return sum(per_op.values()), per_op


# -- 1/2: VPU ceiling + exp surcharge ---------------------------------------

_VS, _VL, _VG = 2048, 128, 8  # block sublanes, lanes, grid blocks
_UNROLL = 16  # chained ops per VMEM round-trip: amortizes the load/store
# (1 op/round-trip measures VMEM bandwidth, not the ALUs — observed
# 0.87 "Tops" before unrolling vs 441 G element-round-trips/s, i.e. the
# un-unrolled kernel was store-bound)


def _vpu_kernel(x_ref, o_ref, *, rounds, use_exp):
    y = x_ref[...]
    c = jnp.float32(0.9999991)
    d = jnp.float32(1e-7)

    def body(_, y):
        for _ in range(_UNROLL):
            if use_exp:
                # exp(-y*c) of y in (0,1] stays in [exp(-1),1]: bounded
                y = jnp.exp(y * -c) + d
            else:
                y = y * c + d
        return y

    o_ref[...] = jax.lax.fori_loop(0, rounds, body, y)


def _vpu_rate(rounds=64, use_exp=False):
    """FMA/s (use_exp=False) or exp-units/s (use_exp=True; one unit =
    one exp + one FMA) on VMEM-resident fp32 tiles."""
    x = jnp.asarray(
        np.random.default_rng(0).random((_VG * _VS, _VL), np.float32))
    kern = functools.partial(_vpu_kernel, rounds=rounds, use_exp=use_exp)
    f = jax.jit(
        pl.pallas_call(
            kern,
            grid=(_VG,),
            in_specs=[pl.BlockSpec((_VS, _VL), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_VS, _VL), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((_VG * _VS, _VL), jnp.float32),
        )
    )
    _, per_op = _trace_ms(f, (x,), f"vpu_{'exp' if use_exp else 'fma'}")
    # the kernel is the dominant op; sync slices/copies are ~us noise
    ms = max(per_op.values())
    units = _VG * _VS * _VL * rounds * _UNROLL
    return units / (ms * 1e-3)


# -- 3: HBM ceiling ---------------------------------------------------------


def _hbm_rate(mb=256):
    """Best contiguous stream rate: read+write of an (N, 128) fp32 add
    fusion, taken from THAT op's device time alone (the surrounding
    copies would double-count)."""
    n = mb * 1024 * 1024 // (4 * 128)
    x = jnp.zeros((n, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    _, per_op = _trace_ms(f, (x,), "hbm")
    add_ops = [v for k, v in per_op.items() if "add" in k or "fusion" in k]
    ms = max(add_ops) if add_ops else max(per_op.values())
    return (2 * n * 128 * 4) / (ms * 1e-3)  # bytes/s (read + write)


# -- 4: the scan kernel at medmamba shapes ----------------------------------


def _scan_shapes():
    # (label, Bsz, G, L, DG, N) — medmamba bs 32 stages (VSSM depths
    # (2,2,8,2), dims (64,128,256,512), 224px -> 56x56 stage-1 grid)
    return [
        ("stage1_L3136_DG64", 32, 4, 3136, 64, 16),
        ("stage2_L784_DG128", 32, 4, 784, 128, 16),
        ("stage3_L196_DG256", 32, 4, 196, 256, 16),
        ("stage4_L49_DG512", 32, 4, 49, 512, 16),
    ]


def _measure_scan(Bsz, G, L, DG, N, tag):
    import importlib

    # the ops package re-exports `selective_scan` (the function); fetch
    # the MODULE explicitly
    ss = importlib.import_module("mamba_clip_tpu.ops.selective_scan")

    r = np.random.default_rng(0)
    bf = jnp.bfloat16
    u = jnp.asarray(r.normal(0, 1, (Bsz, G, L, DG)), bf)
    delta = jnp.asarray(r.normal(0, 0.1, (Bsz, G, L, DG)), bf)
    A = jnp.asarray(-np.exp(r.normal(0, 0.5, (G * DG, N))), jnp.float32)
    Bm = jnp.asarray(r.normal(0, 1, (Bsz, G, L, N)), bf)
    Cm = jnp.asarray(r.normal(0, 1, (Bsz, G, L, N)), bf)
    D = jnp.asarray(r.normal(0, 1, (G * DG,)), jnp.float32)
    bias = jnp.asarray(r.normal(0, 0.1, (G * DG,)), jnp.float32)

    def fwd(u, delta, A, Bm, Cm, D, bias):
        y = ss.selective_scan_tm(u, delta, A, Bm, Cm, D, bias,
                                 delta_softplus=True, impl="pallas")
        return y.sum()

    def fwdbwd(u, delta, A, Bm, Cm, D, bias):
        return jax.grad(fwd, argnums=(0, 1, 2, 3, 4))(
            u, delta, A, Bm, Cm, D, bias)

    args = (u, delta, A, Bm, Cm, D, bias)
    t_f, ops_f = _trace_ms(jax.jit(fwd), args, f"scan_fwd_{tag}")
    t_b, ops_b = _trace_ms(jax.jit(fwdbwd), args, f"scan_fwdbwd_{tag}")

    def pallas_ms(per_op):
        # the Pallas calls keep the kernel names: "fwd.N" when jitted
        # directly, "jvp__*" / "transpose_jvp__*" under jax.grad
        return sum(
            v for k, v in per_op.items()
            if any(s in k for s in ("fwd", "bwd", "jvp", "custom_call"))
        )

    # padded-element count the kernel actually computes over
    P = ss._pack_factor(G, DG)
    Gp = G // P
    DGP = ss._LANE // P if P > 1 else ss._round_up(DG, ss._LANE)
    DP = P * DGP
    T, LP = ss._grid_chunks(L)  # minimal-padding chunking (r5 lever)
    NPA = ss._round_up(N, 8)
    elems = (Bsz * Gp) * LP * NPA * DP
    # fwd HBM bytes: u/delta/B/C in (bf16), y + chunk checkpoints out (f32)
    NC = LP // T
    bytes_f = (2 * (Bsz * Gp) * LP * DP * 2          # delta, u
               + 2 * (Bsz * Gp) * LP * P * NPA * 2   # B, C (packed rows)
               + (Bsz * Gp) * LP * DP * 4            # y
               + (Bsz * Gp) * NC * NPA * DP * 4)     # h checkpoints
    return {
        "shape": dict(B=Bsz, G=G, L=L, DG=DG, N=N, pack=P, DP=DP, LP=LP),
        "fwd_ms": round(t_f, 3),
        "fwd_pallas_ms": round(pallas_ms(ops_f), 3),
        "fwd_pack_plumbing_ms": round(t_f - pallas_ms(ops_f), 3),
        "fwdbwd_ms": round(t_b, 3),
        "fwdbwd_pallas_ms": round(pallas_ms(ops_b), 3),
        "padded_elems": elems,
        "fwd_hbm_bytes": bytes_f,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    a = ap.parse_args()

    dev = jax.devices()[0]
    out = {"device": str(dev.device_kind), "reps": REPS}

    fma_rate = _vpu_rate(use_exp=False)   # FMA/s
    exp_rate = _vpu_rate(use_exp=True)    # exp-units/s (1 exp + 1 FMA)
    hbm_bps = _hbm_rate()
    out["vpu_fma_ceiling_Tops"] = round(fma_rate * 2 / 1e12, 2)  # 2 flops/FMA
    out["vpu_fma_per_s"] = fma_rate
    out["exp_units_per_s"] = exp_rate
    # the exp unit also carries one FMA (mul+add); net it out
    out["exp_cost_in_fma_slots"] = round(fma_rate / exp_rate - 1.0, 2)
    out["hbm_ceiling_GBps"] = round(hbm_bps / 1e9, 1)

    out["scan"] = {}
    for label, Bsz, G, L, DG, N in _scan_shapes():
        m = _measure_scan(Bsz, G, L, DG, N, label)
        elems, t_ms = m["padded_elems"], m["fwd_pallas_ms"] or m["fwd_ms"]
        # arithmetic floor: 14 VPU ops + 1 exp per padded element, at the
        # measured ceilings (both issue on the VPU, so costs add);
        # 14 ops ≈ 7 FMA-equivalent slots (an FMA retires 2 ops/slot —
        # the kernel's mul+add pairs do fuse, its lone muls/selects don't,
        # so 7 is the OPTIMISTIC floor)
        exp_only = max(1.0 / exp_rate - 1.0 / fma_rate, 0.0)
        floor_ms = (elems * 7 / fma_rate + elems * exp_only) * 1e3
        hbm_ms = m["fwd_hbm_bytes"] / hbm_bps * 1e3
        m["fwd_arith_floor_ms"] = round(floor_ms, 3)
        m["fwd_hbm_floor_ms"] = round(hbm_ms, 3)
        m["fwd_pct_of_arith_floor"] = round(100 * floor_ms / t_ms, 1)
        m["achieved_elem_ops_Tops"] = round(
            elems * 15 / (t_ms * 1e-3) / 1e12, 2)
        m["achieved_hbm_GBps"] = round(
            m["fwd_hbm_bytes"] / (t_ms * 1e-3) / 1e9, 1)
        m["bwd_over_fwd"] = round(
            (m["fwdbwd_pallas_ms"] - m["fwd_pallas_ms"]) / m["fwd_pallas_ms"],
            2) if m["fwd_pallas_ms"] else None
        out["scan"][label] = m

    txt = json.dumps(out, indent=1)
    print(txt)
    if not a.json and os.path.isdir("perf"):
        with open("perf/scan_roofline_r5.json", "w") as fh:
            fh.write(txt + "\n")


if __name__ == "__main__":
    main()
