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
    def __init__(self, number=0, seed=0, prune_after=None):
        self.number = number
        self.rng = np.random.default_rng(seed)
        self.suggested = {}
        self.reported = []
        self.prune_after = prune_after

    def suggest_float(self, name, lo, hi, log=False):
        v = float(self.rng.uniform(lo, hi))
        self.suggested[name] = v
        return v

    def suggest_int(self, name, lo, hi, log=False, step=1):
        v = int(self.rng.integers(lo, hi + 1))
        if step > 1:
            v = lo + ((v - lo) // step) * step
        self.suggested[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = choices[int(self.rng.integers(len(choices)))]
        self.suggested[name] = v
        return v

    def report(self, value, step):
        self.reported.append((value, step))

    def should_prune(self):
        return (
            self.prune_after is not None
            and len(self.reported) > self.prune_after
        )


def test_suggest_args_ranges():
    """Search space matches the reference's exactly
    (reference: integrations/optuna.py:126-154), except warmup which is
    the documented fraction-of-total-steps intent fix."""
    from mamba_clip_tpu.integrations.optuna import suggest_args

    base = Args(undersample=50_000)
    for seed in range(8):
        t = FakeTrial(seed=seed)
        out = suggest_args(t, base)
        assert 1e-6 <= out.lr <= 1e-3
        assert 0.9 <= out.beta1 <= 0.999
        assert 0.9 <= out.beta2 <= 0.999
        assert 1e-9 <= out.eps <= 1e-7
        assert 1e-4 <= out.wd <= 1e-1
        assert 0.0 <= out.warmup <= 1.0
        assert out.lr_scheduler == "cosine"
        assert out.accum_freq == 1
        assert out.batch_size in (8, 16, 32, 64, 128, 256)
        assert out.lr_restart_interval in (1, None)
        assert 1e-2 <= out.grad_clip_norm <= 1e2
        assert 0.0 <= out.balanced_mixup <= 1.0
        assert 10_000 <= out.undersample <= 100_000
        assert out.undersample % 10_000 == 0


def test_resolve_warmup_fraction_intent_fix():
    """warmup < 1 is a fraction of total steps; >= 1 is a literal count
    (reference consumes the HPO float as a count — scheduler.py:14-15 —
    which is the bug the fraction interpretation fixes)."""
    from mamba_clip_tpu.schedules import resolve_warmup

    assert resolve_warmup(0.25, 1000) == 250
    assert resolve_warmup(0.0, 1000) == 0
    assert resolve_warmup(1, 1000) == 1
    assert resolve_warmup(10_000, 1000) == 10_000


class FakeRunner:
    """Stands in for integrations.runner.TrialRunner."""

    vals = [0.5, 0.42]

    def __init__(self, args, trial_id=0, model_factory=None):
        self.i = 0

    def step(self):
        v = self.vals[self.i]
        self.i += 1
        return {"val_loss": v}


def test_objective_nan_guard(monkeypatch):
    """NaN/exploding trials must return inf, not crash the study
    (reference: integrations/optuna.py:217-228)."""
    import mamba_clip_tpu.integrations.runner as R
    import mamba_clip_tpu.integrations.optuna as O

    base = Args(hopt_direction="minimize", eval_loss="val_loss", epochs=2)

    class Boom:
        def __init__(self, *a, **k):
            raise ValueError("loss is NaN")

    monkeypatch.setattr(R, "TrialRunner", Boom)
    obj = O.make_objective(base)
    assert obj(FakeTrial()) == math.inf


def test_objective_reports_per_epoch_and_reads_metric(monkeypatch):
    """The objective must report the metric EVERY epoch (so pruners can
    act mid-trial) and return the best value seen."""
    import mamba_clip_tpu.integrations.runner as R
    import mamba_clip_tpu.integrations.optuna as O

    base = Args(hopt_direction="minimize", eval_loss="val_loss", epochs=2)
    monkeypatch.setattr(R, "TrialRunner", FakeRunner)
    obj = O.make_objective(base)
    trial = FakeTrial()
    assert obj(trial) == pytest.approx(0.42)
    assert trial.reported == [(0.5, 0), (0.42, 1)]


def test_objective_prunes_mid_trial(monkeypatch):
    """trial.should_prune() must abort via optuna.TrialPruned after the
    first report (the reference reports only at trial end, so its pruners
    never fire — VERDICT Missing #6 analog for optuna)."""
    import mamba_clip_tpu.integrations.runner as R
    import mamba_clip_tpu.integrations.optuna as O

    fake_optuna = types.ModuleType("optuna")

    class TrialPruned(Exception):
        pass

    fake_optuna.TrialPruned = TrialPruned
    monkeypatch.setitem(sys.modules, "optuna", fake_optuna)
    monkeypatch.setattr(R, "TrialRunner", FakeRunner)
    base = Args(hopt_direction="minimize", eval_loss="val_loss", epochs=2)
    obj = O.make_objective(base)
    with pytest.raises(TrialPruned):
        obj(FakeTrial(prune_after=0))


def test_native_asha_two_trials_one_pruned():
    """Real 2-trial × 2-epoch run on synthetic data through the shared
    TrialRunner lifecycle: ASHA must stop the worse trial at the first rung
    and train the winner to completion (the per-epoch step/checkpoint
    lifecycle the reference's ray Trainable provides, ray.py:67-191)."""
    import jax.numpy as jnp
    from flax import linen as nn

    from mamba_clip_tpu.integrations.runner import asha_search

    class TinyCls(nn.Module):
        num_classes: int = 2

        @nn.compact
        def __call__(self, image, deterministic: bool = True):
            x = image.reshape(image.shape[0], -1).astype(jnp.float32)
            x = nn.relu(nn.Dense(8)(x))
            return nn.Dense(self.num_classes)(x)

    def make_args(t):
        # trial 1 gets an absurd LR so its val_loss is reliably worse
        return Args(
            synthetic_data=True, batch_size=8, epochs=2,
            train_num_samples=32, val_num_samples=16,
            lr=1e-3 if t == 0 else 30.0, warmup=0, precision="fp32",
            workers=1, force_image_size=[32], num_classes=2,
            log_every_n_steps=100, seed=0, eval_loss="val_loss",
        )

    result = asha_search(
        make_args, n_trials=2, metric="val_loss", mode="min", max_t=2,
        grace_period=1, reduction_factor=2,
        model_factory=lambda a: TinyCls(),
    )
    assert len(result["pruned"]) == 1
    best, pruned = result["best_trial"], result["pruned"][0]
    assert best != pruned
    assert len(result["history"][best]) == 2     # trained to max_t
    assert len(result["history"][pruned]) == 1   # stopped at the rung
    assert "val_loss" in result["best_metrics"]


def test_trial_runner_save_restore(tmp_path):
    """The Trainable checkpoint hooks round-trip state + epoch."""
    import jax.numpy as jnp
    from flax import linen as nn

    from mamba_clip_tpu.integrations.runner import TrialRunner

    class TinyCls(nn.Module):
        num_classes: int = 2

        @nn.compact
        def __call__(self, image, deterministic: bool = True):
            x = image.reshape(image.shape[0], -1).astype(jnp.float32)
            return nn.Dense(self.num_classes)(x)

    args = Args(
        synthetic_data=True, batch_size=8, epochs=2, train_num_samples=16,
        val_num_samples=8, lr=1e-3, warmup=0, precision="fp32", workers=1,
        force_image_size=[32], num_classes=2, log_every_n_steps=100,
    )
    r1 = TrialRunner(args, model_factory=lambda a: TinyCls())
    r1.step()
    path = r1.save(str(tmp_path))
    r2 = TrialRunner(args, model_factory=lambda a: TinyCls())
    r2.restore(path)
    assert r2.epoch == 1
    import jax

    a = jax.tree_util.tree_leaves(r1.params["state"].params)
    b = jax.tree_util.tree_leaves(r2.params["state"].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


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
