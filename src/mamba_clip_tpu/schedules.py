"""Learning-rate schedules.

Pure ``step -> lr`` functions (jit-traceable, usable as optax schedules)
re-implementing the reference's optimizer-mutating closures
(reference: src/mamba_clip/scheduler.py):

- linear warmup helper (scheduler.py:14-15),
- ``const_lr`` (scheduler.py:18-32),
- ``const_lr_cooldown`` — constant then polynomial cooldown to
  ``lr_cooldown_end`` (scheduler.py:35-70),
- ``cosine_lr`` (scheduler.py:73-93),

all with optional **warm restarts**: when ``restart_interval`` is set the
effective step is ``step % restart_interval`` (the reference applies this
inside each closure).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup_lr(base_lr, warmup_length, step):
    """Linear warmup (reference: scheduler.py:14-15)."""
    return base_lr * (step + 1) / jnp.maximum(warmup_length, 1)


def _restart(step, restart_interval: Optional[int]):
    if restart_interval is not None and restart_interval > 0:
        return step % restart_interval
    return step


def const_lr(
    base_lr: float,
    warmup_length: int,
    restart_interval: Optional[int] = None,
) -> Schedule:
    """Constant LR with warmup (reference: scheduler.py:18-32)."""

    def schedule(step):
        step = _restart(jnp.asarray(step), restart_interval)
        return jnp.where(
            step < warmup_length,
            _warmup_lr(base_lr, warmup_length, step),
            base_lr,
        )

    return schedule


def const_lr_cooldown(
    base_lr: float,
    warmup_length: int,
    steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
    restart_interval: Optional[int] = None,
) -> Schedule:
    """Constant then polynomial cooldown (reference: scheduler.py:35-70)."""

    def schedule(step):
        step = _restart(jnp.asarray(step), restart_interval)
        # With restarts the cooldown anchors inside EVERY cycle
        # (reference: scheduler.py:46-49 — restart_interval - cooldown_steps),
        # not at the end of the whole run.
        cycle = restart_interval if (restart_interval or 0) > 0 else steps
        start_cooldown = cycle - cooldown_steps
        e = step - start_cooldown
        decay = (1 - (e / jnp.maximum(cooldown_steps, 1))) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        lr = jnp.where(step < start_cooldown, base_lr, cooled)
        return jnp.where(
            step < warmup_length,
            _warmup_lr(base_lr, warmup_length, step),
            lr,
        )

    return schedule


def cosine_lr(
    base_lr: float,
    warmup_length: int,
    steps: int,
    restart_interval: Optional[int] = None,
) -> Schedule:
    """Cosine decay with warmup and warm restarts (reference: scheduler.py:73-93)."""

    def schedule(step):
        step = _restart(jnp.asarray(step), restart_interval)
        total = restart_interval if (restart_interval or 0) > 0 else steps
        e = step - warmup_length
        es = jnp.maximum(total - warmup_length, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(
            step < warmup_length,
            _warmup_lr(base_lr, warmup_length, step),
            cos,
        )

    return schedule


def resolve_warmup(warmup, total_steps: int) -> int:
    """Warmup flag → step count.

    Values ≥ 1 are literal step counts (the reference CLI semantics,
    cli/main.py:190-210). A float in [0, 1) is a FRACTION of total steps —
    the intent fix for the reference HPO space's
    ``trial.suggest_float("warmup", 0, 1)``
    (integrations/optuna.py:145), which the reference consumes as a step
    count and thereby degenerates into a first-step lr spike of
    base/warmup (scheduler.py:14-15).
    """
    if 0 <= warmup < 1:
        return int(round(warmup * total_steps))
    return int(warmup)


def create_schedule(args, total_steps: int) -> Optional[Schedule]:
    """Dispatch on --lr-scheduler (reference: pipeline.py:341-373)."""
    if args.skip_scheduler:
        return None
    name = args.lr_scheduler
    warmup = resolve_warmup(args.warmup, total_steps)
    if name == "cosine":
        return cosine_lr(args.lr, warmup, total_steps, args.lr_restart_interval)
    if name == "const":
        return const_lr(args.lr, warmup, args.lr_restart_interval)
    if name == "const-cooldown":
        if args.epochs_cooldown is None:
            raise ValueError("const-cooldown requires --epochs-cooldown")
        cooldown_steps = total_steps * args.epochs_cooldown // max(args.epochs, 1)
        return const_lr_cooldown(
            args.lr,
            warmup,
            total_steps,
            cooldown_steps,
            args.lr_cooldown_power,
            args.lr_cooldown_end,
            args.lr_restart_interval,
        )
    raise ValueError(f"unknown lr scheduler '{name}'")
