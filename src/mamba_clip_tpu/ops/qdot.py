"""Native int8 dot_general with shared calibration (``--quant int8_fast``).

Why this exists: the AQT path (ops/quant.py, ``--quant int8``) reaches the
v5e MXU's ~1.83x int8 rate per dot, but recalibrates **per dot operand per
use** — each Dense costs 6 full-tensor absmax reductions + 6 quantize
passes per step (fwd lhs/rhs, then both backward dots requantize both
operands). Profiling (PERF.md "Round-3 perf campaign") attributes ~20 ms
of the int8 step to those calibration reads, which erases most of the MXU
win at this model's GEMM shares.

This module is the TPU-native alternative: one ``jax.custom_vjp`` dot that
  * quantizes each tensor ONCE per step (3 calibrations/quantizations per
    Dense: lhs, rhs in forward; the cotangent in backward),
  * saves the **int8** quantized operands as residuals (half the bytes of
    bf16 residuals — also lowers the activation pressure that drives XLA's
    auto-remat),
  * reuses those residuals for both backward dots, which is only sound
    with per-tensor scales: every axis of lhs/rhs is contracted in one of
    the three dots, so any finer (per-channel) scale could not be factored
    out of all of them. Per-tensor is the price of single-quantization.

Gradients are straight-through (quantization treated as identity), the
same estimator AQT uses. int32 accumulation; max contraction here is
M=B*L≈16k at |q|<=127, far inside int32 range.

Like the AQT path this is opt-in: int8 numerics differ from the
reference's AMP recipe (reference: src/mamba_clip/model.py bnb-linear
swap is the analogous CUDA opt-in).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_EPS = 1e-6


def _absmax_scale(x: jax.Array) -> jax.Array:
    """Per-tensor symmetric scale mapping absmax -> 127."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    return jnp.maximum(amax, _EPS) / 127.0


def _quantize(x: jax.Array, scale: jax.Array) -> jax.Array:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


@jax.custom_vjp
def int8_dense_dot(lhs: jax.Array, rhs: jax.Array) -> jax.Array:
    """int8 MXU dot for the flax Dense pattern: lhs[..., K] @ rhs[K, N]."""
    out, _ = _fwd(lhs, rhs)
    return out


def _fwd(lhs, rhs):
    sl, sr = _absmax_scale(lhs), _absmax_scale(rhs)
    ql, qr = _quantize(lhs, sl), _quantize(rhs, sr)
    acc = lax.dot_general(
        ql, qr, (((lhs.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    out = (acc.astype(jnp.float32) * (sl * sr)).astype(out_dtype)
    # Zero-size sentinels carry the operand dtypes to the backward pass
    # (residual pytrees hold arrays, not dtype objects).
    res = (ql, sl, qr, sr,
           jnp.zeros((0,), lhs.dtype), jnp.zeros((0,), rhs.dtype))
    return out, res


def _bwd(res, g):
    ql, sl, qr, sr, lhs_proto, rhs_proto = res
    sg = _absmax_scale(g)
    qg = _quantize(g, sg)
    # dlhs[..., k] = sum_n g[..., n] rhs[k, n]  — reuse q(rhs)
    dl = lax.dot_general(
        qg, qr, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dlhs = (dl.astype(jnp.float32) * (sg * sr)).astype(lhs_proto.dtype)
    # drhs[k, n] = sum_{leading} lhs[..., k] g[..., n]  — reuse q(lhs)
    batch_axes = tuple(range(g.ndim - 1))
    dr = lax.dot_general(
        ql, qg, ((batch_axes, batch_axes), ((), ())),
        preferred_element_type=jnp.int32,
    )
    drhs = (dr.astype(jnp.float32) * (sl * sg)).astype(rhs_proto.dtype)
    return dlhs, drhs


int8_dense_dot.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Attention-interior int8 dots (``--quant int8_fast_attn``)
# ---------------------------------------------------------------------------
#
# int8_fast covers the Dense GEMMs; the attention interior (QK^T and
# P·V, plus their four backward dots) is the one remaining MXU stream
# still running bf16 — ~32 ms of the flagship step, measured at its bf16
# floor by three independent levers (kernels/remat/softmax-dtype,
# PERF.md round-3). int8 is the only lever class that can pass a bf16
# floor on v5e (int8 MXU ≈2× bf16 peak). Same shared-calibration scheme
# as int8_dense_dot: each tensor quantized once, int8 residuals reused
# by both backward dots, straight-through gradients, int32 accumulation
# (max contraction T=257 « int32 range). Probabilities quantize with
# absmax ≈1 → absolute error ≤ 1/254 per weight, the experiment the
# quant-parity harness judges at trajectory level.


def _q8_bh(x, h_axis: int):
    """Quantize with per-(batch, head) scales. Batch and head are batch
    dims in EVERY attention einsum (never contracted), so scales this
    fine factor out of all six dots — strictly lower error than
    per-tensor at zero cost. Returns (int8, scale) with the scale in
    x's own layout (size-1 on the reduced dims)."""
    axes = tuple(i for i in range(x.ndim) if i not in (0, h_axis))
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    s = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0)
    return q.astype(jnp.int8), s


def _flip_bh(s):
    """Swap a 4-D scale between the (b,*,h,*) and (b,h,*,*) layouts —
    dims 1 and 2 are both size-1 on the non-head axis, so a transpose
    relabels them."""
    return jnp.transpose(s, (0, 2, 1, 3))


def _ei32(pattern, a8, b8):
    return jnp.einsum(pattern, a8, b8, preferred_element_type=jnp.int32)


@jax.custom_vjp
def int8_qk_dot(q: jax.Array, k: jax.Array) -> jax.Array:
    """scores[b,h,q,k] = Σ_d q[b,q,h,d] k[b,k,h,d] on the int8 MXU."""
    out, _ = _qk_fwd(q, k)
    return out


def _qk_fwd(q, k):
    q8, sq = _q8_bh(q, h_axis=2)   # scales (B,1,h,1)
    k8, sk = _q8_bh(k, h_axis=2)
    acc = _ei32("bqhd,bkhd->bhqk", q8, k8)
    out_dtype = jnp.promote_types(q.dtype, k.dtype)
    out = (acc.astype(jnp.float32)
           * (_flip_bh(sq) * _flip_bh(sk))).astype(out_dtype)
    res = (q8, sq, k8, sk,
           jnp.zeros((0,), q.dtype), jnp.zeros((0,), k.dtype))
    return out, res


def _qk_bwd(res, g):
    q8, sq, k8, sk, q_proto, k_proto = res
    g8, sg = _q8_bh(g, h_axis=1)   # g layout (B,h,T,T), scales (B,h,1,1)
    dq = (_ei32("bhqk,bkhd->bqhd", g8, k8).astype(jnp.float32)
          * (_flip_bh(sg) * sk)).astype(q_proto.dtype)
    dk = (_ei32("bhqk,bqhd->bkhd", g8, q8).astype(jnp.float32)
          * (_flip_bh(sg) * sq)).astype(k_proto.dtype)
    return dq, dk


int8_qk_dot.defvjp(_qk_fwd, _qk_bwd)


@jax.custom_vjp
def int8_pv_dot(p: jax.Array, v: jax.Array) -> jax.Array:
    """out[b,q,h,d] = Σ_k p[b,h,q,k] v[b,k,h,d] on the int8 MXU."""
    out, _ = _pv_fwd(p, v)
    return out


def _pv_fwd(p, v):
    p8, sp = _q8_bh(p, h_axis=1)   # scales (B,h,1,1)
    v8, sv = _q8_bh(v, h_axis=2)   # scales (B,1,h,1)
    acc = _ei32("bhqk,bkhd->bqhd", p8, v8)
    out_dtype = jnp.promote_types(p.dtype, v.dtype)
    out = (acc.astype(jnp.float32)
           * (_flip_bh(sp) * sv)).astype(out_dtype)
    res = (p8, sp, v8, sv,
           jnp.zeros((0,), p.dtype), jnp.zeros((0,), v.dtype))
    return out, res


def _pv_bwd(res, g):
    p8, sp, v8, sv, p_proto, v_proto = res
    g8, sg = _q8_bh(g, h_axis=2)   # g layout (B,T,h,hd), scales (B,1,h,1)
    dp = (_ei32("bqhd,bkhd->bhqk", g8, v8).astype(jnp.float32)
          * (_flip_bh(sg) * _flip_bh(sv))).astype(p_proto.dtype)
    dv = (_ei32("bhqk,bqhd->bkhd", p8, g8).astype(jnp.float32)
          * (_flip_bh(sp) * sg)).astype(v_proto.dtype)
    return dp, dv


int8_pv_dot.defvjp(_pv_fwd, _pv_bwd)


# ---------------------------------------------------------------------------
# Delayed-scale attention interior (``--quant int8_delayed_attn``)
# ---------------------------------------------------------------------------
#
# int8_fast_attn measured NEGATIVE end-to-end (PERF.md "int8 attention
# interior"): the einsums' MXU win was erased by ~18 ms of *dynamic*
# calibration — per-(batch, head) absmax reductions serializing before
# each quantize, the largest over the [B,h,T,T] probabilities. Delayed
# scaling removes exactly that cost:
#   * q/k/v quantize with the PREVIOUS step's per-head scales (h is a
#     batch dim of every attention einsum, so per-head factors out of
#     all six dots; state lives in the same ``quant`` collection as the
#     Dense delayed scales — see models/vit.py FusedAttention),
#   * the softmax probabilities are in [0, 1] by construction, so their
#     scale is the COMPILE-TIME constant 1/127 — no amax at all; the
#     quantize fuses straight into the softmax epilogue,
#   * cotangents keep dynamic per-(batch, head) calibration (their
#     quantize lives in the backward, where it fuses for free — measured
#     for the Dense path by tools/quant_static_scale_probe.py).
# int8 residuals also halve the attention activation bytes vs bf16 —
# the residual class XLA's auto-remat decisions are driven by.

_P_SCALE = 1.0 / 127.0  # static softmax-probability scale (p ∈ [0, 1])


@jax.custom_vjp
def int8_qk_dot_delayed(q, k, sq, sk):
    """scores[b,h,q,k] = Σ_d q[b,q,h,d] k[b,k,h,d] on the int8 MXU with
    caller-provided (delayed) per-head scales in (1,1,h,1) layout.
    Scales get zero cotangents (straight-through)."""
    out, _ = _qkd_fwd(q, k, sq, sk)
    return out


def _qkd_fwd(q, k, sq, sk):
    q8, k8 = _quantize(q, sq), _quantize(k, sk)
    acc = _ei32("bqhd,bkhd->bhqk", q8, k8)
    out_dtype = jnp.promote_types(q.dtype, k.dtype)
    out = (acc.astype(jnp.float32)
           * (_flip_bh(sq) * _flip_bh(sk))).astype(out_dtype)
    res = (q8, sq, k8, sk,
           jnp.zeros((0,), q.dtype), jnp.zeros((0,), k.dtype))
    return out, res


def _qkd_bwd(res, g):
    q8, sq, k8, sk, q_proto, k_proto = res
    g8, sg = _q8_bh(g, h_axis=1)   # dynamic; scales (B,h,1,1)
    dq = (_ei32("bhqk,bkhd->bqhd", g8, k8).astype(jnp.float32)
          * (_flip_bh(sg) * sk)).astype(q_proto.dtype)
    dk = (_ei32("bhqk,bqhd->bkhd", g8, q8).astype(jnp.float32)
          * (_flip_bh(sg) * sq)).astype(k_proto.dtype)
    return dq, dk, jnp.zeros_like(sq), jnp.zeros_like(sk)


int8_qk_dot_delayed.defvjp(_qkd_fwd, _qkd_bwd)


@jax.custom_vjp
def int8_pv_dot_delayed(p, v, sv):
    """out[b,q,h,d] = Σ_k p[b,h,q,k] v[b,k,h,d] on the int8 MXU; probs
    quantize with the static 1/127 scale, v with the caller's (delayed)
    per-head scale in (1,1,h,1) layout."""
    out, _ = _pvd_fwd(p, v, sv)
    return out


def _pvd_fwd(p, v, sv):
    p8 = jnp.clip(jnp.round(p.astype(jnp.float32) * 127.0),
                  0.0, 127.0).astype(jnp.int8)
    v8 = _quantize(v, sv)
    acc = _ei32("bhqk,bkhd->bqhd", p8, v8)
    out_dtype = jnp.promote_types(p.dtype, v.dtype)
    out = (acc.astype(jnp.float32) * (_P_SCALE * sv)).astype(out_dtype)
    res = (p8, v8, sv,
           jnp.zeros((0,), p.dtype), jnp.zeros((0,), v.dtype))
    return out, res


def _pvd_bwd(res, g):
    p8, v8, sv, p_proto, v_proto = res
    g8, sg = _q8_bh(g, h_axis=2)   # dynamic; scales (B,1,h,1)
    dp = (_ei32("bqhd,bkhd->bhqk", g8, v8).astype(jnp.float32)
          * (_flip_bh(sg) * _flip_bh(sv))).astype(p_proto.dtype)
    dv = (_ei32("bhqk,bqhd->bkhd", p8, g8).astype(jnp.float32)
          * (_P_SCALE * sg)).astype(v_proto.dtype)
    return dp, dv, jnp.zeros_like(sv)


int8_pv_dot_delayed.defvjp(_pvd_fwd, _pvd_bwd)


# ---------------------------------------------------------------------------
# Serving variant: per-output-channel weight scales (``--quant int8_serve``)
# ---------------------------------------------------------------------------
#
# int8_fast's per-tensor weight scale is forced by training: every axis of
# the weight is contracted in one of the three dots, so a finer scale could
# not be factored out of all of them. Forward-only serving has no such
# constraint — the weight's output axis N is never contracted in the
# forward dot, so a per-column scale s_r[n] factors cleanly:
#     out[..., n] = (sum_k q_l q_r[k, n]) * s_l * s_r[n]
# Per-channel scales cut weight quantization error for columns with small
# dynamic range (the usual case after LayerNorm-scaled training), at zero
# runtime cost: the rescale fuses into the epilogue either way.
#
# Gradients (if anyone differentiates a serve model, e.g. for saliency)
# fall back to bf16 dots over the dequantized operands — exact
# straight-through semantics, no per-channel factorization needed.


def _absmax_scale_cols(x: jax.Array) -> jax.Array:
    """Per-output-channel symmetric scales for a [K, N] weight -> [N]."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=0)
    return jnp.maximum(amax, _EPS) / 127.0


@jax.custom_vjp
def int8_serve_dot(lhs: jax.Array, rhs: jax.Array) -> jax.Array:
    """Forward-optimized int8 dot: per-tensor lhs, per-channel rhs scales."""
    out, _ = _serve_fwd(lhs, rhs)
    return out


def _serve_fwd(lhs, rhs):
    sl = _absmax_scale(lhs)
    sr = _absmax_scale_cols(rhs)
    ql = _quantize(lhs, sl)
    qr = jnp.clip(jnp.round(rhs.astype(jnp.float32) / sr), -127.0, 127.0
                  ).astype(jnp.int8)
    acc = lax.dot_general(
        ql, qr, (((lhs.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    out = (acc.astype(jnp.float32) * (sl * sr)).astype(out_dtype)
    res = (ql, sl, qr, sr,
           jnp.zeros((0,), lhs.dtype), jnp.zeros((0,), rhs.dtype))
    return out, res


def _serve_bwd(res, g):
    ql, sl, qr, sr, lhs_proto, rhs_proto = res
    # Dequantize once; backward runs as ordinary bf16/fp32 dots. Serving
    # never takes this path — it exists so the op is a total function.
    lhs_deq = ql.astype(jnp.float32) * sl
    rhs_deq = qr.astype(jnp.float32) * sr
    gf = g.astype(jnp.float32)
    dlhs = lax.dot_general(
        gf, rhs_deq, (((g.ndim - 1,), (1,)), ((), ())),
    ).astype(lhs_proto.dtype)
    batch_axes = tuple(range(g.ndim - 1))
    drhs = lax.dot_general(
        lhs_deq, gf, ((batch_axes, batch_axes), ((), ())),
    ).astype(rhs_proto.dtype)
    return dlhs, drhs


int8_serve_dot.defvjp(_serve_fwd, _serve_bwd)

# ---------------------------------------------------------------------------
# Delayed scaling (``--quant int8_delayed``)
# ---------------------------------------------------------------------------
#
# int8_fast still pays a structural tax: each tensor's absmax must finish
# before its quantize can start, so XLA runs quantization as a separate
# full-tensor read+write pass after the producer (measured ~11.7 ms/step
# of s8-materialization fusions plus the absmax reads, PERF.md "int8_fast
# step profile"). Delayed scaling — the standard FP8-training recipe,
# applied here to int8 — breaks that dependency: quantize with the
# PREVIOUS step's scale (carried as model state in a ``quant`` variable
# collection), and record this step's absmax as a write-only by-product
# for the next step. With no amax→quantize edge, XLA fuses the quantize
# into each tensor's producer and the separate pass disappears
# (feasibility ceiling measured at +9.5 ms/step,
# tools/quant_static_scale_probe.py).
#
# Semantics: scales lag one step. Values that outgrow the previous
# step's absmax clip at ±127 for one step; absmax moves slowly during
# training, and the cotangent (whose magnitude swings with the loss)
# keeps DYNAMIC calibration — its quantize lives in the backward pass
# where it fuses differently. Scale state initializes from the
# ``model.init`` batch and can be refreshed on real data with
# ``train.calibrate_quant_state`` (the pipeline does this automatically
# on the first batch of a fresh run).


def _fresh_amax(x: jax.Array) -> jax.Array:
    return jnp.maximum(
        jnp.max(jnp.abs(lax.stop_gradient(x).astype(jnp.float32))), _EPS
    )


@jax.custom_vjp
def int8_delayed_dot(lhs, rhs, sl, sr):
    """int8 Dense dot with caller-provided (delayed) scales.

    Forward quantizes with ``sl``/``sr`` as-is; backward reuses the int8
    residuals with DYNAMIC cotangent calibration (like int8_fast) and
    returns zero cotangents for the scales (straight-through treats
    quantization as identity, so scales carry no gradient).
    """
    out, _ = _delayed_fwd(lhs, rhs, sl, sr)
    return out


def _delayed_fwd(lhs, rhs, sl, sr):
    ql, qr = _quantize(lhs, sl), _quantize(rhs, sr)
    acc = lax.dot_general(
        ql, qr, (((lhs.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    out = (acc.astype(jnp.float32) * (sl * sr)).astype(out_dtype)
    res = (ql, sl, qr, sr,
           jnp.zeros((0,), lhs.dtype), jnp.zeros((0,), rhs.dtype))
    return out, res


def _delayed_bwd(res, g):
    ql, sl, qr, sr, lhs_proto, rhs_proto = res
    sg = _absmax_scale(g)
    qg = _quantize(g, sg)
    dl = lax.dot_general(
        qg, qr, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dlhs = (dl.astype(jnp.float32) * (sg * sr)).astype(lhs_proto.dtype)
    batch_axes = tuple(range(g.ndim - 1))
    dr = lax.dot_general(
        ql, qg, ((batch_axes, batch_axes), ((), ())),
        preferred_element_type=jnp.int32,
    )
    drhs = (dr.astype(jnp.float32) * (sl * sg)).astype(rhs_proto.dtype)
    return dlhs, drhs, jnp.zeros_like(sl), jnp.zeros_like(sr)


int8_delayed_dot.defvjp(_delayed_fwd, _delayed_bwd)

_DENSE_PATTERN = "flax Dense contraction (((lhs.ndim-1,), (0,)), ((), ()))"


class _DenseDotGeneral:
    """Drop-in ``dot_general_cls`` for flax Dense (see module docstring).

    Only the Dense contraction pattern is supported — that is the only
    pattern flax Dense emits, and the only injection point we use
    (models/vit.py, models/text_bert.py, models/vssm.py).
    """

    _dot = None  # staticmethod(lhs, rhs) -> out; set by subclasses

    def __call__(self, lhs, rhs, dimension_numbers, precision=None,
                 preferred_element_type=None):
        (lc, rc), (lb, rb) = dimension_numbers
        if (tuple(lc), tuple(rc), tuple(lb), tuple(rb)) != \
                ((lhs.ndim - 1,), (0,), (), ()):
            raise NotImplementedError(
                f"{type(self).__name__} supports only the {_DENSE_PATTERN}; "
                f"got {dimension_numbers}"
            )
        out = type(self)._dot(lhs, rhs)
        if preferred_element_type is not None:
            out = out.astype(preferred_element_type)
        return out


class Int8FastDotGeneral(_DenseDotGeneral):
    """Shared-calibration int8 training dot (``--quant int8_fast``)."""

    _dot = staticmethod(int8_dense_dot)


class Int8DelayedDotGeneral(nn.Module):
    """Delayed-scaling int8 training dot (``--quant int8_delayed``).

    A *stateful* flax ``dot_general_cls`` injection (the same mechanism
    AQT uses): each Dense instantiates one as a submodule, which carries
    per-tensor absmax state in the ``quant`` variable collection. The
    forward quantizes with the stored (previous-step) scales — no
    amax→quantize dependency, so XLA fuses the quantize into each
    tensor's producer — and records this step's absmax for the next
    step when the collection is mutable (training); eval/serving applies
    read the stored scales without writing.

    State initializes from whatever batch ``model.init`` sees; refresh
    on real data with ``train.calibrate_quant_state``.
    """

    @nn.compact
    def __call__(self, lhs, rhs, dimension_numbers, precision=None,
                 preferred_element_type=None):
        (lc, rc), (lb, rb) = dimension_numbers
        if (tuple(lc), tuple(rc), tuple(lb), tuple(rb)) != \
                ((lhs.ndim - 1,), (0,), (), ()):
            raise NotImplementedError(
                f"Int8DelayedDotGeneral supports only the {_DENSE_PATTERN}; "
                f"got {dimension_numbers}"
            )
        fresh_l, fresh_r = _fresh_amax(lhs), _fresh_amax(rhs)
        amax_l = self.variable("quant", "amax_lhs", lambda: fresh_l)
        amax_r = self.variable("quant", "amax_rhs", lambda: fresh_r)
        sl = amax_l.value / 127.0
        sr = amax_r.value / 127.0
        out = int8_delayed_dot(lhs, rhs, sl, sr)
        if not self.is_initializing() and self.is_mutable_collection("quant"):
            amax_l.value = fresh_l
            amax_r.value = fresh_r
        if preferred_element_type is not None:
            out = out.astype(preferred_element_type)
        return out


class Int8ServeDotGeneral(_DenseDotGeneral):
    """Per-channel-weight int8 serving dot (``--quant int8_serve``)."""

    _dot = staticmethod(int8_serve_dot)
