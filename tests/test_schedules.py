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
