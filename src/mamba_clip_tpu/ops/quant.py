"""int8 quantized-training injection (AQT) for the transformer GEMMs.

TPU-native replacement for the reference's ``--use-bnb-linear`` CUDA
bitsandbytes path (reference: src/mamba_clip/model.py — bnb linear swap).
On v5e the MXU's int8 path sustains ~352 TOPS vs ~193 TF/s bf16 at this
model's exact GEMM shapes (measured, tools/int8_experiment.py — x1.83 per
dot including requantization), so quantized training is the one lever that
beats the bf16 ceiling.

Mechanism: AQT (Accurate Quantized Training, the public ``aqt`` JAX
library) swaps each ``lax.dot_general`` inside the towers' Dense layers
for a fake-quantized int8 dot with straight-through-estimator gradients
and dynamic absmax calibration. ``--quant int8`` quantizes forward AND
both backward dots; ``--quant int8_fwd`` only the forward (conservative:
exact bf16 gradients).

Opt-in by design — int8 changes numerics relative to the reference's AMP
recipe, so the flagship bench/default stays bf16 and int8 is a flag.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

_VALID = ("int8", "int8_fwd", "int8_fast", "int8_fast_attn", "int8_delayed",
          "int8_delayed_attn", "int8_serve")


def attn_int8(quant) -> bool:
    """True when --quant also moves the attention-interior dots (QK^T,
    P.V and their backward dots) to the int8 MXU (ops/qdot.py
    int8_qk_dot/int8_pv_dot). Only int8_fast_attn opts in: the interior
    touches softmax inputs/outputs, so it is a separate, more aggressive
    step than quantizing the Dense GEMMs."""
    return quant == "int8_fast_attn"


def attn_int8_delayed(quant) -> bool:
    """True when --quant moves the attention interior to int8 with
    DELAYED q/k/v scales and the static 1/127 probability scale
    (ops/qdot.py int8_qk_dot_delayed/int8_pv_dot_delayed) — the variant
    that removes the dynamic-calibration cost which made int8_fast_attn
    a measured end-to-end negative (PERF.md "int8 attention interior")."""
    return quant == "int8_delayed_attn"


def make_dot_general_cls(quant: Optional[str]) -> Any:
    """Map a --quant flag value to a flax ``dot_general_cls`` injection
    (None = unquantized). Raises on unknown values so a typo can't
    silently run unquantized."""
    if not quant or quant == "none":
        return None
    if quant in ("int8_fast", "int8_fast_attn"):
        # Native shared-calibration int8 dot (ops/qdot.py) — one
        # calibration per tensor per step instead of AQT's per-use six.
        # int8_fast_attn additionally routes the attention interior
        # through int8 (see attn_int8 / models FusedAttention).
        from .qdot import Int8FastDotGeneral
        return Int8FastDotGeneral
    if quant in ("int8_delayed", "int8_delayed_attn"):
        # Stateful delayed-scaling dot (ops/qdot.py): quantizes with the
        # previous step's scales carried in the "quant" variable
        # collection, so the quantize pass fuses into each tensor's
        # producer (FP8-style delayed scaling, applied to int8).
        # int8_delayed_attn additionally routes the attention interior
        # through delayed-scale int8 (see attn_int8_delayed above).
        from .qdot import Int8DelayedDotGeneral
        return Int8DelayedDotGeneral
    if quant == "int8_serve":
        # Forward-optimized serving dot: per-output-channel weight scales
        # (finer than training can afford — see ops/qdot.py), bf16
        # dequantized backward. For inference paths (eval, bench_infer).
        from .qdot import Int8ServeDotGeneral
        return Int8ServeDotGeneral
    try:
        from aqt.jax.v2 import config as aqt_config
        from aqt.jax.v2.flax import aqt_flax
    except ImportError as e:  # pragma: no cover - aqt ships in this image
        raise RuntimeError(
            f"--quant {quant} requires the 'aqt' package: {e}"
        ) from None
    if quant == "int8":
        # int8 forward AND both backward dots, int32 accumulation.
        # Stochastic rounding is OFF: it would demand an rng stream on
        # every apply (including deterministic eval, which has none by
        # design); deterministic rounding costs a little gradient-noise
        # quality for a much simpler contract.
        cfg = aqt_config.fully_quantized(
            fwd_bits=8, bwd_bits=8, use_stochastic_rounding=False,
        )
    elif quant == "int8_fwd":
        cfg = aqt_config.config_v4(fwd_bits=8, dlhs_bits=None, drhs_bits=None)
    else:
        raise ValueError(f"unknown --quant '{quant}'; one of {_VALID} or none")
    # prng_name=None: no rng stream (SR is off); the default 'params'
    # would break deterministic eval applies that carry no rngs
    return functools.partial(aqt_flax.AqtDotGeneral, cfg, prng_name=None)
