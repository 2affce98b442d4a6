"""LR schedule golden tests (reference semantics: scheduler.py)."""

import numpy as np

from mamba_clip_tpu.schedules import const_lr, const_lr_cooldown, cosine_lr


def test_warmup_linear():
    s = const_lr(1.0, warmup_length=10)
    # reference _warmup_lr: base * (step+1) / warmup
    assert np.isclose(float(s(0)), 0.1)
    assert np.isclose(float(s(4)), 0.5)
    assert np.isclose(float(s(9)), 1.0)
    assert np.isclose(float(s(50)), 1.0)


def test_cosine_endpoints():
    s = cosine_lr(2.0, warmup_length=0, steps=100)
    assert np.isclose(float(s(0)), 2.0)
    assert np.isclose(float(s(50)), 1.0, atol=1e-3)
    assert float(s(99)) < 0.01


def test_cosine_restarts():
    s = cosine_lr(1.0, warmup_length=2, steps=1000, restart_interval=10)
    # step 12 ≡ step 2 of a fresh cycle
    assert np.isclose(float(s(12)), float(s(2)))
    # warmup replays after each restart
    assert np.isclose(float(s(10)), float(s(0)))


def test_const_cooldown():
    s = const_lr_cooldown(
        1.0, warmup_length=0, steps=100, cooldown_steps=50,
        cooldown_power=1.0, cooldown_end_lr=0.1,
    )
    assert np.isclose(float(s(10)), 1.0)
    assert np.isclose(float(s(50)), 1.0)  # cooldown starts at 50
    assert np.isclose(float(s(75)), 0.55, atol=1e-6)  # halfway: 0.5*(1-0.1)+0.1
    assert np.isclose(float(s(100)), 0.1, atol=1e-6)


def _ref_const_lr_cooldown_series(
    base_lr, warmup_length, total_steps, cooldown_steps,
    restart_interval=None, cooldown_power=1.0, cooldown_end_lr=0.0,
    n_steps=None,
):
    """Hand-computed reference series (reference: scheduler.py:35-70)."""
    out = []
    for step in range(n_steps or total_steps):
        if restart_interval:
            step_in_cycle = step % restart_interval
            start_cooldown_step = restart_interval - cooldown_steps
        else:
            step_in_cycle = step
            start_cooldown_step = total_steps - cooldown_steps
        if step_in_cycle < warmup_length:
            lr = base_lr * (step_in_cycle + 1) / warmup_length
        elif step_in_cycle < start_cooldown_step:
            lr = base_lr
        else:
            e = step_in_cycle - start_cooldown_step
            es = (
                restart_interval - start_cooldown_step
                if restart_interval
                else total_steps - start_cooldown_step
            )
            decay = (1 - (e / es)) ** cooldown_power
            lr = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        out.append(lr)
    return np.array(out)


def test_const_cooldown_with_restarts_golden():
    """(cooldown x restart) cross-product: the cooldown must anchor INSIDE
    every restart cycle (reference: scheduler.py:46-49), so with
    restart_interval < total_steps the LR cools down at the END of each
    cycle, then warms up again."""
    kw = dict(
        base_lr=1.0, warmup_length=3, total_steps=100,
        cooldown_steps=8, restart_interval=20,
        cooldown_power=1.0, cooldown_end_lr=0.05,
    )
    ref = _ref_const_lr_cooldown_series(**kw, n_steps=60)
    s = const_lr_cooldown(
        kw["base_lr"], kw["warmup_length"], kw["total_steps"],
        kw["cooldown_steps"], kw["cooldown_power"], kw["cooldown_end_lr"],
        kw["restart_interval"],
    )
    got = np.array([float(s(i)) for i in range(60)])
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # the defining property: cooldown actually fires inside a cycle
    assert got[12] == 1.0          # before cycle cooldown (20-8=12 is the anchor step? check e=0)
    assert got[16] < 1.0           # mid-cooldown of cycle 0
    assert np.isclose(got[19], ref[19])
    assert got[23] == 1.0          # const plateau of cycle 1 (post-warmup)


def test_const_cooldown_power_with_restarts():
    """Non-linear cooldown power under restarts stays golden."""
    kw = dict(
        base_lr=2.0, warmup_length=0, total_steps=50,
        cooldown_steps=5, restart_interval=10,
        cooldown_power=2.0, cooldown_end_lr=0.2,
    )
    ref = _ref_const_lr_cooldown_series(**kw, n_steps=30)
    s = const_lr_cooldown(
        kw["base_lr"], kw["warmup_length"], kw["total_steps"],
        kw["cooldown_steps"], kw["cooldown_power"], kw["cooldown_end_lr"],
        kw["restart_interval"],
    )
    got = np.array([float(s(i)) for i in range(30)])
    np.testing.assert_allclose(got, ref, atol=1e-6)
