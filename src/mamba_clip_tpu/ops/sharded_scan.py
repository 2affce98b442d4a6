"""Sequence-parallel (cross-chip) selective scan.

The reference never shards the scan sequence — its CUDA kernel is
single-GPU and DP-only (reference: src/mamba_clip/model.py:503-565;
SURVEY §5 "Long-context"). This module is the TPU-first headroom item
sketched there: shard L over a mesh axis and stitch the per-shard scans
together with a cross-chip carry pass, so VSSM sequence lengths (L=H·W,
e.g. 3136 at stage 1) can scale past one chip's VMEM/HBM.

Math. The scan is the linear recurrence h_t = a_t h_{t-1} + b_t with
a_t = exp(dt_t A) and b_t = (dt_t u_t) B_t, read out as y_t = <C_t, h_t>
(+ u_t D). Over a shard s holding L_s consecutive steps, the whole shard
is an affine transfer function of the incoming state:

    h_out = A_s h_in + h_s,   A_s = prod_t a_t = exp((sum_t dt_t) A)

and every local output needs only the decayed incoming state:

    y_t = y_t^0 + <C_t, exp(csum(dt)_t A) * h_in>

where y^0 / h_s are the zero-carry local scan results. So:

1. run the UNMODIFIED single-chip kernel (Pallas on TPU) per shard with
   zero carry — the kernel itself needs no changes;
2. exchange only the tiny (B, G, DG, N) transfer pairs (A_s, h_s) across
   chips with a log-depth Kogge-Stone `ppermute` pass (inclusive scan of
   transfer-function composition, then shift-by-one for the exclusive
   carry) — 2·ceil(log2 S) ppermutes of B·G·DG·N floats ride the ICI;
3. add the analytic correction term to the local outputs.

Everything outside the kernel is plain differentiable JAX (`ppermute`
has an exact transpose), so `jax.grad` through `shard_map` works without
a bespoke VJP. Exactness: the stitched result equals the single-device
scan in exact arithmetic (associativity of the affine composition); in
fp32 the difference is rounding-level (tested vs the single-device
kernel on a CPU mesh, tests/test_sharded_scan.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .selective_scan import selective_scan_tm


def _transfer_compose(own, recv):
    """Compose affine transfers: apply ``recv`` (earlier steps) first,
    then ``own``: (A_o, h_o) ∘ (A_r, h_r) = (A_o·A_r, A_o·h_r + h_o)."""
    A_o, h_o = own
    A_r, h_r = recv
    return A_o * A_r, A_o * h_r + h_o


def _exclusive_carry(A_s, h_s, axis_name: str):
    """Exclusive prefix combine of per-shard transfers along ``axis_name``.

    Kogge-Stone doubling: round d sends each chip's inclusive transfer to
    the chip ``d`` to its right; chips with no source at distance d
    receive the identity transfer (A=1, h=0). After ceil(log2 S) rounds
    every chip holds the inclusive prefix; one final shift-by-one yields
    the exclusive carry h_in (identity for chip 0)."""
    size = lax.axis_size(axis_name)
    ident = (jnp.ones_like(A_s), jnp.zeros_like(h_s))
    acc = (A_s, h_s)
    d = 1
    while d < size:
        perm = [(i, i + d) for i in range(size - d)]
        recv = tuple(
            lax.ppermute(x, axis_name, perm) for x in acc
        )  # chips < d receive zeros in BOTH slots -> make it the identity
        idx = lax.axis_index(axis_name)
        recv = tuple(
            jnp.where(idx >= d, r, i) for r, i in zip(recv, ident)
        )
        acc = _transfer_compose(acc, recv)
        d *= 2
    # shift right by one for the exclusive scan
    perm = [(i, i + 1) for i in range(size - 1)]
    shifted = tuple(lax.ppermute(x, axis_name, perm) for x in acc)
    idx = lax.axis_index(axis_name)
    return tuple(
        jnp.where(idx >= 1, s, i) for s, i in zip(shifted, ident)
    )


def sharded_selective_scan_tm(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    axis_name: str = "sp",
    impl: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Time-major selective scan with L sharded over mesh axis ``axis_name``.

    Call inside ``shard_map`` with ``u/delta/B/C`` sharded on their L axis
    (dim 2) over ``axis_name`` and ``A/D/delta_bias`` replicated; the
    result carries the same sharding as ``u``. Semantics and shapes match
    :func:`selective_scan_tm` run on the unsharded sequence.
    """
    Bsz, G, L, DG = u.shape
    N = A.shape[1]
    f32 = jnp.float32
    d_total = A.shape[0]
    if D is None:
        D = jnp.zeros((d_total,), f32)
    if delta_bias is None:
        delta_bias = jnp.zeros((d_total,), f32)

    # local zero-carry scan through the single-chip kernel (D skip included)
    y0 = selective_scan_tm(
        u, delta, A, B, C, D, delta_bias, delta_softplus,
        impl=impl, interpret=interpret,
    )

    # effective dt, as the kernel computes it
    dt = delta.astype(f32) + delta_bias.reshape(1, G, 1, DG)
    if delta_softplus:
        dt = jax.nn.softplus(dt)

    A_g = A.reshape(1, G, 1, DG, N).astype(f32)
    csum = jnp.cumsum(dt, axis=2)                      # (B,G,L,DG)
    total = csum[:, :, -1, :]                          # (B,G,DG)

    # decay from each step to the shard end / start
    decay_in = jnp.exp(csum[..., None] * A_g)          # prefix decay, (B,G,L,DG,N)
    decay_out = jnp.exp((total[:, :, None, :] - csum)[..., None] * A_g)

    b_t = (dt * u.astype(f32))[..., None] * B.astype(f32)[:, :, :, None, :]
    h_end = jnp.sum(decay_out * b_t, axis=2)           # (B,G,DG,N)
    A_shard = jnp.exp(total[..., None] * A_g[:, :, 0])  # (B,G,DG,N)

    _, h_in = _exclusive_carry(A_shard, h_end, axis_name)

    # correction: y_t += <C_t, prefix_decay_t * h_in>
    corr = jnp.sum(
        decay_in * h_in[:, :, None] * C.astype(f32)[:, :, :, None, :],
        axis=-1,
    )
    return y0 + corr
