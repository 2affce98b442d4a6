"""Selective-scan (Mamba S6 recurrence) for TPU.

TPU-native replacement for the reference's external CUDA kernel
``mamba_ssm.ops.selective_scan_interface.selective_scan_fn``
(reference: src/mamba_clip/model.py:26-31 import, :504,539-550 call sites).
Semantics (documented by ``flops_selective_scan_ref``, model.py:54-66):

    dt      = softplus(delta + delta_bias)          [if delta_softplus]
    h_t     = exp(dt_t * A) * h_{t-1} + dt_t * B_t * u_t
    y_t     = sum_n C_t[n] * h_t[n]  (+ D * u_t)

per channel d with state size N, over sequence length L. The CUDA kernel is
a sequential fp32 recurrence; on TPU the first-order linear recurrence is
associative — ``(a1,b1)∘(a2,b2) = (a1*a2, a2*b1 + b2)`` — so we run a
**chunked Kogge-Stone doubling scan** inside a Pallas kernel:

- grid = (batch*groups, channel-tiles, seq-chunks), sequence innermost;
  the fp32 hidden state (N, DT) lives in VMEM scratch across chunks;
- within a chunk of T steps everything is vectorized on (T, N, DT) arrays:
  log2(T) doubling passes replace T serial steps (VPU-bound, not
  latency-bound);
- channels ride the 128-wide lane dimension, the N=16 state rides sublanes;
- inputs may be bf16; the carry and output are fp32, matching the CUDA
  kernel's fp32 contract (reference asserts fp32 output, model.py:551,639);
- backward is a custom VJP: a second Pallas kernel walks chunks in reverse,
  recomputing the forward within each chunk from per-chunk state
  checkpoints saved by the forward (O(L/T) extra memory instead of O(L)).

Layouts are **time-major** ``(batch*groups, L, channels)`` so the hot loop
slices rows, not strided columns. ``selective_scan`` accepts the CUDA
kernel's channel-major layout and transposes; SS2D calls the time-major
entry point directly and never pays for transposes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "selective_scan",
    "selective_scan_tm",
    "selective_scan_flops",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Doubling (Kogge-Stone) scans on (T, N, DT) VMEM arrays.
# Shifts along the leading axis are tile-granular on TPU (each t is a full
# (N, DT) tile set), so concatenate/slice is cheap.
# ---------------------------------------------------------------------------


def _doubling_prefix(alpha, beta, T: int, axis: int = 0):
    """Inclusive prefix scan of pairs under (a1,b1)∘(a2,b2)=(a1a2, a2b1+b2)."""

    def take(x, sl):
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        return x[tuple(idx)]

    s = 1
    while s < T:
        sa = jnp.concatenate(
            [jnp.ones_like(take(alpha, slice(0, s))), take(alpha, slice(0, T - s))],
            axis=axis,
        )
        sb = jnp.concatenate(
            [jnp.zeros_like(take(beta, slice(0, s))), take(beta, slice(0, T - s))],
            axis=axis,
        )
        beta = beta + alpha * sb
        alpha = alpha * sa
        s *= 2
    return alpha, beta


def _doubling_suffix(alpha, beta, T: int, axis: int = 0):
    """Inclusive suffix scan: beta_t = sum_{r>=t} (prod_{t<=q<r} a_q) b_r."""

    def take(x, sl):
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        return x[tuple(idx)]

    s = 1
    while s < T:
        sa = jnp.concatenate(
            [take(alpha, slice(s, T)), jnp.ones_like(take(alpha, slice(0, s)))],
            axis=axis,
        )
        sb = jnp.concatenate(
            [take(beta, slice(s, T)), jnp.zeros_like(take(beta, slice(0, s)))],
            axis=axis,
        )
        beta = beta + alpha * sb
        alpha = alpha * sa
        s *= 2
    return alpha, beta


_SUB = 8  # subchunk length for the two-level scan


def _chunk_prefix_h(a, b, h_in, T: int):
    """h_t for t in [0, T): the prefix combination of (a, b) seeded with
    h_in. Two-level work-efficient form: h_in folds into b[0] (so no
    global-alpha pass is needed), subchunks of length _SUB are scanned by
    doubling, subchunk totals are scanned, and the exclusive totals are
    broadcast back."""
    b = jnp.concatenate([(b[0] + a[0] * h_in)[None], b[1:]], axis=0)
    if T < 2 * _SUB or T % _SUB:
        _, beta = _doubling_prefix(a, b, T)
        return beta
    S, T2 = T // _SUB, _SUB
    rest = a.shape[1:]
    ar = a.reshape(S, T2, *rest)
    br = b.reshape(S, T2, *rest)
    alpha, beta = _doubling_prefix(ar, br, T2, axis=1)
    # exclusive prefix over subchunk totals
    a2, b2 = _doubling_prefix(alpha[:, T2 - 1], beta[:, T2 - 1], S)
    b_prev = jnp.concatenate([jnp.zeros_like(b2[:1]), b2[:-1]], axis=0)
    h = beta + alpha * b_prev[:, None]
    return h.reshape(T, *rest)


def _chunk_suffix_g(a_next, c, m, T: int):
    """g_t = c_t + ã_t (c_{t+1} + ã_{t+1} (... + ã_{T-1} m)), the reverse
    (gradient) recurrence; m folds into c[T-1] (ã_{T-1} == 1)."""
    c = jnp.concatenate([c[: T - 1], (c[T - 1] + m)[None]], axis=0)
    if T < 2 * _SUB or T % _SUB:
        _, beta = _doubling_suffix(a_next, c, T)
        return beta
    S, T2 = T // _SUB, _SUB
    rest = c.shape[1:]
    ar = a_next.reshape(S, T2, *rest)
    cr = c.reshape(S, T2, *rest)
    alpha, beta = _doubling_suffix(ar, cr, T2, axis=1)
    a2, b2 = _doubling_suffix(alpha[:, 0], beta[:, 0], S)
    b_next = jnp.concatenate([b2[1:], jnp.zeros_like(b2[:1])], axis=0)
    g = beta + alpha * b_next[:, None]
    return g.reshape(T, *rest)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _lane_select(Mm, npack: int, np_each: int, DT: int):
    """Expand a packed (T, npack*np_each) B/C row to (T, np_each, DT) where
    lane d reads slot p = d // (DT // npack). With npack == 1 this is the
    plain broadcast Mm[:, :, None]."""
    if npack == 1:
        return Mm[:, :, None]
    dgp = DT // npack
    lane_slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, DT), 2) // dgp

    def slot(p):  # (T, np_each, 1); explicit slice (gather doesn't lower)
        return jax.lax.slice_in_dim(Mm, p * np_each, (p + 1) * np_each, axis=1)[
            :, :, None
        ]

    sel = slot(0)
    for p in range(1, npack):
        sel = jnp.where(lane_slot == p, slot(p), sel)
    return sel  # (T, np_each, DT)


def _lane_reduce(X, npack: int, DT: int):
    """Reduce (T, np_each, DT) over lanes per slot -> (T, npack*np_each),
    the adjoint of _lane_select. With npack == 1 this is a plain sum."""
    if npack == 1:
        return jnp.sum(X, axis=2)
    dgp = DT // npack
    lane_slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, DT), 2) // dgp
    parts = [
        jnp.sum(jnp.where(lane_slot == p, X, 0.0), axis=2)
        for p in range(npack)
    ]
    return jnp.concatenate(parts, axis=1)  # (T, npack*np_each)


def _fwd_kernel(
    delta_ref, u_ref, B_ref, C_ref, A_ref, D_ref, bias_ref,
    y_ref, hck_ref,
    h_carry,
    *, T: int, softplus: bool, l_valid: int, npack: int, np_each: int,
):
    lc = pl.program_id(2)

    @pl.when(lc == 0)
    def _():
        h_carry[...] = jnp.zeros_like(h_carry)

    h_in = h_carry[...]  # (N, DT) fp32
    hck_ref[0, 0] = h_in

    delta = delta_ref[0].astype(jnp.float32)  # (T, DT)
    u = u_ref[0].astype(jnp.float32)          # (T, DT)
    Bm = B_ref[0].astype(jnp.float32)         # (T, npack*N)
    Cm = C_ref[0].astype(jnp.float32)         # (T, npack*N)
    Arow = A_ref[0]                           # (N, DT) fp32
    bias = bias_ref[0]                        # (1, DT) fp32
    DT = u.shape[-1]

    dt = delta + bias
    if softplus:
        dt = jax.nn.softplus(dt)
    # Zero dt at padded positions: a=exp(0)=1, b=0 -> identity element.
    t_ids = lc * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    dt = jnp.where(t_ids < l_valid, dt, 0.0)

    du = dt * u                                        # (T, DT)
    a = jnp.exp(dt[:, None, :] * Arow[None])           # (T, N, DT)
    Bsel = _lane_select(Bm, npack, np_each, DT)
    b = Bsel * du[:, None, :]                          # (T, N, DT)

    h = _chunk_prefix_h(a, b, h_in, T)                 # (T, N, DT)

    Csel = _lane_select(Cm, npack, np_each, DT)
    y = jnp.sum(h * Csel, axis=1)                      # (T, DT)
    y_ref[0] = y + u * D_ref[0]
    h_carry[...] = h[T - 1]


# ---------------------------------------------------------------------------
# Backward kernel (chunks walked in reverse; forward recomputed per chunk
# from the saved chunk-entry state h_in).
# ---------------------------------------------------------------------------


def _bwd_kernel(
    delta_ref, u_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, dy_ref, hck_ref,
    ddelta_ref, du_ref, dB_ref, dC_ref, dA_ref, dD_ref, dbias_ref,
    g_carry,
    *, T: int, softplus: bool, l_valid: int, nchunks: int,
    npack: int, np_each: int,
):
    lc_rev = pl.program_id(2)           # 0..NC-1, maps to chunk NC-1-lc_rev
    lc = nchunks - 1 - lc_rev

    @pl.when(lc_rev == 0)
    def _():
        g_carry[...] = jnp.zeros_like(g_carry)
        dA_ref[0] = jnp.zeros_like(dA_ref[0])
        dD_ref[0] = jnp.zeros_like(dD_ref[0])
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    delta = delta_ref[0].astype(jnp.float32)
    u = u_ref[0].astype(jnp.float32)
    Bm = B_ref[0].astype(jnp.float32)
    Cm = C_ref[0].astype(jnp.float32)
    Arow = A_ref[0]
    bias = bias_ref[0]
    dy = dy_ref[0].astype(jnp.float32)       # (T, DT)
    h_in = hck_ref[0, 0]                     # (N, DT)

    raw = delta + bias
    dt = jax.nn.softplus(raw) if softplus else raw
    t_ids = lc * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    mask = t_ids < l_valid
    dt = jnp.where(mask, dt, 0.0)

    DT = u.shape[-1]
    Bsel = _lane_select(Bm, npack, np_each, DT)
    Csel = _lane_select(Cm, npack, np_each, DT)

    du_ = dt * u
    a = jnp.exp(dt[:, None, :] * Arow[None])
    b = Bsel * du_[:, None, :]
    h = _chunk_prefix_h(a, b, h_in, T)
    h_prev = jnp.concatenate([h_in[None], h[: T - 1]], axis=0)

    # Reverse recurrence: g_t = C_t dy_t + a_{t+1} g_{t+1}.
    c = Csel * dy[:, None, :]                             # (T, N, DT)
    a_next = jnp.concatenate([a[1:], jnp.ones_like(a[:1])], axis=0)
    g = _chunk_suffix_g(a_next, c, g_carry[...], T)       # (T, N, DT)
    g_carry[...] = a[0] * g[0]

    dC = _lane_reduce(dy[:, None, :] * h, npack, DT)      # (T, npack*N)
    dB = _lane_reduce(g * du_[:, None, :], npack, DT)     # (T, npack*N)
    ddu = jnp.sum(g * Bsel, axis=1)                       # (T, DT)
    da = g * h_prev                                       # (T, N, DT)
    ddt = jnp.sum(da * a * Arow[None], axis=1) + ddu * u  # (T, DT)
    if softplus:
        ddt = ddt * jax.nn.sigmoid(raw)
    ddt = jnp.where(mask, ddt, 0.0)

    ddelta_ref[0] = ddt
    du_ref[0] = ddu * dt + dy * D_ref[0]
    dB_ref[0, 0] = dB
    dC_ref[0, 0] = dC
    dA_ref[0] += jnp.sum(da * a * dt[:, None, :], axis=0)
    dD_ref[0] += jnp.sum(dy * u, axis=0, keepdims=True)
    dbias_ref[0] += jnp.sum(ddt, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# Pallas call wrappers over canonical padded time-major arrays:
#   delta,u : (BG, LP, DP)   B,C : (BG, LP, NP)
#   A_t     : (G, NP, DP)    D,bias : (G, 1, DP)
# ---------------------------------------------------------------------------

_CHUNK = 128  # max chunk length; VMEM ~6MB of scan state
_LANE = 128


def _grid_chunks(L: int) -> Tuple[int, int]:
    """(T, LP): chunk length and padded sequence length with MINIMAL
    padding. The kernel computes over every padded element (masked
    positions carry the identity pair, but the arithmetic still runs and
    the roofline shows the kernel sits at the VPU ceiling —
    perf/scan_roofline_r5.json), so a fixed T=128 wastes real time on
    lengths like medmamba's stage-3 L=196 (padded 256, +31%) and stage-2
    L=784 (padded 896, +14%). Instead spread L over ceil(L/128) chunks of
    equal sublane-aligned length: T ≤ 128, T a multiple of _SUB (the
    two-level scan's subchunk), LP = NC*T, padding < 8 elements per
    chunk. NC is recoverable from LP alone (NC = ceil(LP/128), proven by
    nc*T ≥ L > (nc-1)*128), which keeps the fwd/bwd pallas wrappers'
    signatures unchanged."""
    align = max(_SUB, 8)  # Mosaic block sublane constraint: T % 8 == 0
    if L <= _CHUNK:
        T = _round_up(L, align)
        return T, T
    nc = -(-L // _CHUNK)
    T = _round_up(-(-L // nc), align)
    return T, nc * T


def _specs(BG, LP, DP, NPB, NPA, G, T, DT):
    """NPB = packed B/C row width (npack*N slots); NPA = per-slot state
    width (the A/scratch sublane dim)."""
    nd = DP // DT
    row = lambda bg, dtile, lc: (bg, lc, dtile)
    grp = lambda bg, dtile, lc: (bg % G, 0, dtile)
    bc = lambda bg, dtile, lc: (bg, lc, 0)
    in_specs = [
        pl.BlockSpec((1, T, DT), row, memory_space=pltpu.VMEM),  # delta
        pl.BlockSpec((1, T, DT), row, memory_space=pltpu.VMEM),  # u
        pl.BlockSpec((1, T, NPB), bc, memory_space=pltpu.VMEM),   # B
        pl.BlockSpec((1, T, NPB), bc, memory_space=pltpu.VMEM),   # C
        pl.BlockSpec((1, NPA, DT), grp, memory_space=pltpu.VMEM),  # A_t
        pl.BlockSpec((1, 1, DT), grp, memory_space=pltpu.VMEM),   # D
        pl.BlockSpec((1, 1, DT), grp, memory_space=pltpu.VMEM),   # bias
    ]
    return in_specs, nd


def _out_sds(shape, *operands):
    """ShapeDtypeStruct whose vma (varying-manual-axes type, JAX>=0.8) is
    the union of the operands' — required for pallas_call under shard_map
    (ops/sharded_scan.py); a no-op (empty set) outside one."""
    try:
        vma = frozenset().union(*(jax.typeof(x).vma for x in operands))
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
    except (AttributeError, TypeError):  # pragma: no cover - older jax
        return jax.ShapeDtypeStruct(shape, jnp.float32)


def _fwd_pallas(delta, u, Bmat, Cmat, A_t, Dvec, bias, *, softplus, l_valid,
                interpret, npack=1):
    BG, LP, DP = u.shape
    NP = Bmat.shape[-1]
    G = A_t.shape[0]
    NC = -(-LP // _CHUNK)  # _grid_chunks invariant: NC*T == LP
    T = LP // NC
    DT = min(_LANE, DP)
    NPA = NP // npack  # per-slot state width = A/scratch sublane dim
    in_specs, nd = _specs(BG, LP, DP, NP, NPA, G, T, DT)
    grid = (BG, nd, NC)
    kernel = functools.partial(
        _fwd_kernel, T=T, softplus=softplus, l_valid=l_valid,
        npack=npack, np_each=NPA,
    )
    flops_per = T * NPA * DT * 14
    # CostEstimate requires concrete ints: under shape-polymorphic export
    # (jax.export symbolic batch, serving.py) BG is a _DimExpr — drop the
    # estimate there (it only tunes XLA's scheduling heuristics).
    cost = None
    if all(isinstance(v, int) for v in (BG, nd, NC)):
        cost = pl.CostEstimate(
            flops=flops_per * BG * nd * NC,
            bytes_accessed=(delta.size + u.size) * delta.dtype.itemsize * 2,
            transcendentals=BG * nd * NC * T * NPA * DT,
        )
    y, hck = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, T, DT), lambda bg, d, lc: (bg, lc, d), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPA, DT), lambda bg, d, lc: (bg, lc, 0, d), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_sds((BG, LP, DP), delta, u, Bmat, Cmat),
            _out_sds((BG, NC, NPA, DP), delta, u, Bmat, Cmat),
        ],
        scratch_shapes=[pltpu.VMEM((NPA, DT), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(delta, u, Bmat, Cmat, A_t, Dvec, bias)
    return y, hck


def _bwd_pallas(delta, u, Bmat, Cmat, A_t, Dvec, bias, dy, hck, *, softplus,
                l_valid, interpret, npack=1):
    BG, LP, DP = u.shape
    NP = Bmat.shape[-1]
    G = A_t.shape[0]
    NC = -(-LP // _CHUNK)  # _grid_chunks invariant: NC*T == LP
    T = LP // NC
    DT = min(_LANE, DP)
    NPA = NP // npack  # per-slot state width = A/scratch sublane dim
    # reversed chunk visit order for the seq-major inputs
    rrow = lambda bg, d, lc: (bg, NC - 1 - lc, d)
    rbc = lambda bg, d, lc: (bg, NC - 1 - lc, 0)
    grp = lambda bg, d, lc: (bg % G, 0, d)
    nd = DP // DT
    in_specs = [
        pl.BlockSpec((1, T, DT), rrow, memory_space=pltpu.VMEM),   # delta
        pl.BlockSpec((1, T, DT), rrow, memory_space=pltpu.VMEM),   # u
        pl.BlockSpec((1, T, NP), rbc, memory_space=pltpu.VMEM),    # B
        pl.BlockSpec((1, T, NP), rbc, memory_space=pltpu.VMEM),    # C
        pl.BlockSpec((1, NPA, DT), grp, memory_space=pltpu.VMEM),  # A_t
        pl.BlockSpec((1, 1, DT), grp, memory_space=pltpu.VMEM),    # D
        pl.BlockSpec((1, 1, DT), grp, memory_space=pltpu.VMEM),    # bias
        pl.BlockSpec((1, T, DT), rrow, memory_space=pltpu.VMEM),   # dy
        pl.BlockSpec((1, 1, NPA, DT), lambda bg, d, lc: (bg, NC - 1 - lc, 0, d),
                     memory_space=pltpu.VMEM),                      # hck
    ]
    kernel = functools.partial(
        _bwd_kernel, T=T, softplus=softplus, l_valid=l_valid, nchunks=NC,
        npack=npack, np_each=NPA,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(BG, nd, NC),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, T, DT), rrow, memory_space=pltpu.VMEM),   # ddelta
            pl.BlockSpec((1, T, DT), rrow, memory_space=pltpu.VMEM),   # du
            pl.BlockSpec((1, 1, T, NP), lambda bg, d, lc: (d, bg, NC - 1 - lc, 0),
                         memory_space=pltpu.VMEM),                      # dB (per dtile)
            pl.BlockSpec((1, 1, T, NP), lambda bg, d, lc: (d, bg, NC - 1 - lc, 0),
                         memory_space=pltpu.VMEM),                      # dC
            pl.BlockSpec((1, NPA, DT), lambda bg, d, lc: (bg, 0, d),
                         memory_space=pltpu.VMEM),                      # dA (acc over lc)
            pl.BlockSpec((1, 1, DT), lambda bg, d, lc: (bg, 0, d),
                         memory_space=pltpu.VMEM),                      # dD
            pl.BlockSpec((1, 1, DT), lambda bg, d, lc: (bg, 0, d),
                         memory_space=pltpu.VMEM),                      # dbias
        ],
        out_shape=[
            _out_sds((BG, LP, DP), delta, u, Bmat, Cmat, dy),
            _out_sds((BG, LP, DP), delta, u, Bmat, Cmat, dy),
            _out_sds((nd, BG, LP, NP), delta, u, Bmat, Cmat, dy),
            _out_sds((nd, BG, LP, NP), delta, u, Bmat, Cmat, dy),
            _out_sds((BG, NPA, DP), delta, u, Bmat, Cmat, dy),
            _out_sds((BG, 1, DP), delta, u, Bmat, Cmat, dy),
            _out_sds((BG, 1, DP), delta, u, Bmat, Cmat, dy),
        ],
        scratch_shapes=[pltpu.VMEM((NPA, DT), jnp.float32)],
        interpret=interpret,
    )(delta, u, Bmat, Cmat, A_t, Dvec, bias, dy, hck)
    ddelta, du, dB, dC, dA, dD, dbias = outs
    return ddelta, du, dB.sum(0), dC.sum(0), dA, dD, dbias


# ---------------------------------------------------------------------------
# Canonical time-major core with custom VJP.
# Unpadded canonical shapes:
#   u, delta: (B, G, L, DG); Bmat, Cmat: (B, G, L, N)
#   A: (G*DG, N) [row-major by (g, dg)]; D, delta_bias: (G*DG,)
# ---------------------------------------------------------------------------


def _pack_factor(G: int, DG: int) -> int:
    """How many groups to pack side by side into one 128-lane row.

    Groups are fully independent per lane, so when DG is below the lane
    width the padded lanes are pure waste (e.g. medmamba stage 1 has
    d_inner=64: half the VPU). Pack P groups per row, P = the largest
    power of two dividing G that fits whole sublane-aligned slots."""
    slot = _round_up(DG, 8)
    P = 1
    while (
        P * 2 <= G and G % (P * 2) == 0 and (P * 2) * slot <= _LANE
        and _LANE % (P * 2) == 0
    ):
        P *= 2
    return P


def _pack_rows(x, Bsz, Gp, P, L, C, LP, CP):
    """(Bsz, Gp*P, L, C) -> (Bsz*Gp, LP, P*CP): adjacent groups side by
    side along the lane axis, each padded to a CP-wide slot."""
    x = x.reshape(Bsz, Gp, P, L, C).transpose(0, 1, 3, 2, 4)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, LP - L), (0, 0), (0, CP - C)))
    return x.reshape(Bsz * Gp, LP, P * CP)


def _canon(u, delta, A, Bmat, Cmat, D, bias):
    """Flatten groups and pad to kernel-friendly sizes.

    When DG is narrower than the 128-lane tile, P groups are packed side
    by side per row (see _pack_factor); B/C rows carry the P slots'
    coefficients concatenated (width P*NP) and the kernel expands them
    per lane slot (_lane_select)."""
    Bsz, G, L, DG = u.shape
    N = A.shape[1]
    # Mosaic has no f16 type; f16→f32 is exact and the kernel computes in
    # fp32 regardless (grads are cast back to the primal dtypes by the VJP)
    if u.dtype == jnp.float16:
        u, delta = u.astype(jnp.float32), delta.astype(jnp.float32)
        Bmat, Cmat = Bmat.astype(jnp.float32), Cmat.astype(jnp.float32)
    _, LP = _grid_chunks(L)  # minimal-padding chunking (roofline lever)
    NP = _round_up(N, 8)
    P = _pack_factor(G, DG)
    Gp = G // P
    DGP = _LANE // P if P > 1 else _round_up(DG, _LANE)
    DP = P * DGP
    BG = Bsz * Gp

    u_p = _pack_rows(u, Bsz, Gp, P, L, DG, LP, DGP)
    d_p = _pack_rows(delta, Bsz, Gp, P, L, DG, LP, DGP)
    B_p = _pack_rows(Bmat, Bsz, Gp, P, L, N, LP, NP)
    C_p = _pack_rows(Cmat, Bsz, Gp, P, L, N, LP, NP)
    # A (G*DG, N) -> (Gp, NP, DP): slot p of row gp holds group gp*P+p
    A_g = A.reshape(Gp, P, DG, N).astype(jnp.float32)
    A_t = (
        jnp.pad(A_g, ((0, 0), (0, 0), (0, DGP - DG), (0, NP - N)))
        .transpose(0, 3, 1, 2)
        .reshape(Gp, NP, DP)
    )
    D_g = jnp.pad(
        D.reshape(Gp, P, DG).astype(jnp.float32), ((0, 0), (0, 0), (0, DGP - DG))
    ).reshape(Gp, 1, DP)
    b_g = jnp.pad(
        bias.reshape(Gp, P, DG).astype(jnp.float32),
        ((0, 0), (0, 0), (0, DGP - DG)),
    ).reshape(Gp, 1, DP)
    return u_p, d_p, B_p, C_p, A_t, D_g, b_g, (
        Bsz, G, L, DG, N, LP, DP, NP, P, DGP,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _scan_tm_pallas(u, delta, A, Bmat, Cmat, D, bias, softplus, interpret):
    y, _ = _scan_tm_pallas_fwd(u, delta, A, Bmat, Cmat, D, bias, softplus, interpret)
    return y


def _unpack_rows(x, Bsz, Gp, P, L, C, CP):
    """(Bsz*Gp, LP, P*CP) -> (Bsz, Gp*P, L, C): inverse of _pack_rows."""
    BGp, LP, _ = x.shape
    x = x.reshape(Bsz, Gp, LP, P, CP)[:, :, :L, :, :C]
    return x.transpose(0, 1, 3, 2, 4).reshape(Bsz, Gp * P, L, C)


def _scan_tm_pallas_fwd(u, delta, A, Bmat, Cmat, D, bias, softplus, interpret):
    u_p, d_p, B_p, C_p, A_t, D_g, b_g, dims = _canon(u, delta, A, Bmat, Cmat, D, bias)
    Bsz, G, L, DG, N, LP, DP, NP, P, DGP = dims
    y_p, hck = _fwd_pallas(
        d_p, u_p, B_p, C_p, A_t, D_g, b_g,
        softplus=softplus, l_valid=L, interpret=interpret, npack=P,
    )
    y = _unpack_rows(y_p, Bsz, G // P, P, L, DG, DGP)
    return y, (u, delta, A, Bmat, Cmat, D, bias, hck)


def _scan_tm_pallas_bwd(softplus, interpret, res, dy):
    u, delta, A, Bmat, Cmat, D, bias, hck = res
    u_p, d_p, B_p, C_p, A_t, D_g, b_g, dims = _canon(u, delta, A, Bmat, Cmat, D, bias)
    Bsz, G, L, DG, N, LP, DP, NP, P, DGP = dims
    Gp = G // P
    dy_p = _pack_rows(
        dy.reshape(Bsz, G, L, DG).astype(jnp.float32), Bsz, Gp, P, L, DG, LP, DGP
    )
    dd_p, du_p, dB_p, dC_p, dA_p, dD_p, dbias_p = _bwd_pallas(
        d_p, u_p, B_p, C_p, A_t, D_g, b_g, dy_p, hck,
        softplus=softplus, l_valid=L, interpret=interpret, npack=P,
    )
    ddelta = _unpack_rows(dd_p, Bsz, Gp, P, L, DG, DGP).astype(delta.dtype)
    du = _unpack_rows(du_p, Bsz, Gp, P, L, DG, DGP).astype(u.dtype)
    dB = _unpack_rows(dB_p, Bsz, Gp, P, L, N, NP).astype(Bmat.dtype)
    dC = _unpack_rows(dC_p, Bsz, Gp, P, L, N, NP).astype(Cmat.dtype)
    # dA: (BGp, NP, DP) -> sum over batch -> per-slot (Gp, NP, P, DGP)
    # -> (G, DG, N) -> (G*DG, N)
    dA = (
        dA_p.reshape(Bsz, Gp, NP, P, DGP)
        .sum(0)[:, :N, :, :DG]
        .transpose(0, 2, 3, 1)
        .reshape(G * DG, N)
        .astype(A.dtype)
    )
    dD = (
        dD_p.reshape(Bsz, Gp, P, DGP).sum(0)[..., :DG].reshape(G * DG)
        .astype(D.dtype)
    )
    dbias = (
        dbias_p.reshape(Bsz, Gp, P, DGP).sum(0)[..., :DG].reshape(G * DG)
        .astype(bias.dtype)
    )
    return du, ddelta, dA, dB, dC, dD, dbias


_scan_tm_pallas.defvjp(_scan_tm_pallas_fwd, _scan_tm_pallas_bwd)


# ---------------------------------------------------------------------------
# Pure-JAX reference implementations (validation + CPU fallback)
# ---------------------------------------------------------------------------


def _scan_tm_xla(u, delta, A, Bmat, Cmat, D, bias, softplus):
    """lax.scan reference; same time-major canonical signature."""
    Bsz, G, L, DG = u.shape
    N = A.shape[1]
    f32 = jnp.float32
    dt = delta.astype(f32) + bias.reshape(1, G, 1, DG)
    if softplus:
        dt = jax.nn.softplus(dt)
    u32 = u.astype(f32)
    A_g = A.reshape(G, DG, N).astype(f32)  # (G, DG, N)

    def step(h, xs):
        dt_t, u_t, B_t, C_t = xs  # (B,G,DG), (B,G,DG), (B,G,N), (B,G,N)
        a = jnp.exp(dt_t[..., None] * A_g[None])          # (B,G,DG,N)
        b = (dt_t * u_t)[..., None] * B_t[:, :, None, :]  # (B,G,DG,N)
        h = a * h + b
        y_t = jnp.sum(h * C_t[:, :, None, :], axis=-1)    # (B,G,DG)
        return h, y_t

    xs = (
        dt.transpose(2, 0, 1, 3),
        u32.transpose(2, 0, 1, 3),
        Bmat.astype(f32).transpose(2, 0, 1, 3),
        Cmat.astype(f32).transpose(2, 0, 1, 3),
    )
    # derive h0 from dt (it constant-folds to zeros) so its vma type is
    # varying when this runs inside shard_map (sharded_scan.py): a literal
    # jnp.zeros carry trips JAX 0.8's varying-manual-axes scan check
    h0 = jnp.zeros((Bsz, G, DG, N), f32) + 0.0 * dt[:, :, 0, :, None]
    _, ys = jax.lax.scan(step, h0, xs)
    y = ys.transpose(1, 2, 0, 3)  # (B,G,L,DG)
    return y + u32 * D.reshape(1, G, 1, DG)


def _scan_tm_assoc(u, delta, A, Bmat, Cmat, D, bias, softplus):
    """jax.lax.associative_scan variant (vectorized; memory O(B*D*L*N))."""
    Bsz, G, L, DG = u.shape
    N = A.shape[1]
    f32 = jnp.float32
    dt = delta.astype(f32) + bias.reshape(1, G, 1, DG)
    if softplus:
        dt = jax.nn.softplus(dt)
    u32 = u.astype(f32)
    A_g = A.reshape(1, G, 1, DG, N).astype(f32)
    a = jnp.exp(dt[..., None] * A_g)                        # (B,G,L,DG,N)
    b = (dt * u32)[..., None] * Bmat.astype(f32)[:, :, :, None, :]

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, b), axis=2)
    y = jnp.sum(h * Cmat.astype(f32)[:, :, :, None, :], axis=-1)
    return y + u32 * D.reshape(1, G, 1, DG)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _default_impl() -> str:
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        plat = "cpu"
    return "pallas" if plat in ("tpu", "axon") else "xla"


def selective_scan_tm(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    impl: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Time-major selective scan.

    Args:
      u, delta: (batch, groups, L, dg) — dg channels per group.
      A: (groups*dg, N) real decay matrix (typically ``-exp(A_log)``).
      B, C: (batch, groups, L, N) input/output projections (shared per group).
      D: (groups*dg,) skip, optional. delta_bias: (groups*dg,), optional.
    Returns:
      y: (batch, groups, L, dg) float32.
    """
    impl = impl or _default_impl()
    d_total = A.shape[0]
    if D is None:
        D = jnp.zeros((d_total,), jnp.float32)
    if delta_bias is None:
        delta_bias = jnp.zeros((d_total,), jnp.float32)
    if impl == "pallas":
        return _scan_tm_pallas(
            u, delta, A, B, C, D, delta_bias, delta_softplus, interpret
        )
    if impl == "pallas_interpret":
        return _scan_tm_pallas(
            u, delta, A, B, C, D, delta_bias, delta_softplus, True
        )
    if impl == "assoc":
        return _scan_tm_assoc(u, delta, A, B, C, D, delta_bias, delta_softplus)
    if impl == "xla":
        return _scan_tm_xla(u, delta, A, B, C, D, delta_bias, delta_softplus)
    raise ValueError(f"unknown selective-scan impl '{impl}'")


def selective_scan(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    impl: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Channel-major selective scan — drop-in for the CUDA
    ``selective_scan_fn`` layout (reference: model.py:539-550):

      u, delta: (batch, d, L); A: (d, N); B, C: (batch, N, L) or
      (batch, groups, N, L); D: (d,); delta_bias: (d,).

    Returns y: (batch, d, L) float32.
    """
    bsz, d, L = u.shape
    if B.ndim == 3:
        B = B[:, None]
        C = C[:, None]
    G = B.shape[1]
    DG = d // G
    u_tm = u.reshape(bsz, G, DG, L).transpose(0, 1, 3, 2)
    delta_tm = delta.reshape(bsz, G, DG, L).transpose(0, 1, 3, 2)
    B_tm = B.transpose(0, 1, 3, 2)
    C_tm = C.transpose(0, 1, 3, 2)
    y_tm = selective_scan_tm(
        u_tm, delta_tm, A, B_tm, C_tm, D, delta_bias, delta_softplus,
        impl=impl, interpret=interpret,
    )
    return y_tm.transpose(0, 1, 3, 2).reshape(bsz, d, L)


def selective_scan_flops(
    batch: int, d: int, L: int, N: int, with_D: bool = True, with_backward: bool = False
) -> int:
    """Analytic FLOPs model (reference: model.py:44-171 documents
    9*B*L*D*N for the fused scan with group B/C, +2*B*D*L for the D skip)."""
    f = 9 * batch * L * d * N
    if with_D:
        f += 2 * batch * d * L
    if with_backward:
        f *= 3
    return f
