"""HPO integration tests with a stubbed optuna (the real package is
optional; the driver logic — search space, NaN pruning, direction — is
ours and must work)."""

import math
import sys
import types

import numpy as np
import pytest

from mamba_clip_tpu.config import Args


class FakeTrial:
    def __init__(self, number=0, seed=0):
        self.number = number
        self.rng = np.random.default_rng(seed)
        self.suggested = {}

    def suggest_float(self, name, lo, hi, log=False):
        v = float(self.rng.uniform(lo, hi))
        self.suggested[name] = v
        return v

    def suggest_int(self, name, lo, hi, log=False):
        v = int(self.rng.integers(lo, hi + 1))
        self.suggested[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = choices[int(self.rng.integers(len(choices)))]
        self.suggested[name] = v
        return v


def test_suggest_args_ranges():
    from mamba_clip_tpu.integrations.optuna import suggest_args

    base = Args(undersample=50_000)
    t = FakeTrial(seed=1)
    out = suggest_args(t, base)
    assert 1e-6 <= out.lr <= 1e-3
    assert 0.85 <= out.beta1 <= 0.95
    assert out.batch_size in (32, 64, 128)
    assert out.lr_restart_interval in (None, 500, 2000)
    assert 10_000 <= out.undersample <= 100_000


def test_objective_nan_guard(monkeypatch):
    """NaN/exploding trials must return inf, not crash the study
    (reference: integrations/optuna.py:217-228)."""
    import mamba_clip_tpu.integrations.optuna as O

    base = Args(hopt_direction="minimize", eval_loss="val_loss")

    def boom(args):
        raise ValueError("loss is NaN")

    monkeypatch.setattr("mamba_clip_tpu.pipeline.pipeline", boom)
    obj = O.make_objective(base)
    assert obj(FakeTrial()) == math.inf


def test_objective_reads_metric(monkeypatch):
    import mamba_clip_tpu.integrations.optuna as O

    base = Args(hopt_direction="minimize", eval_loss="val_loss")
    monkeypatch.setattr(
        "mamba_clip_tpu.pipeline.pipeline", lambda a: {"val_loss": 0.42}
    )
    obj = O.make_objective(base)
    assert obj(FakeTrial()) == pytest.approx(0.42)


def test_ray_search_space_shape():
    """suggest_config uses only tune primitives (works with a stub)."""
    from mamba_clip_tpu.integrations.ray import suggest_config

    calls = []

    class T:
        def __getattr__(self, name):
            def f(*a, **k):
                calls.append(name)
                return (name, a)

            return f

    cfg = suggest_config(T())
    assert set(cfg) >= {"lr", "wd", "batch_size", "warmup"}
    assert "loguniform" in calls and "choice" in calls
