"""Ray Tune HPO driver.

Re-design of the reference integration (reference:
src/mamba_clip/integrations/ray.py): an ASHA scheduler over an Optuna
search space, one accelerator per trial, SLURM cluster attach via the
``ip_head``/``redis_password`` env convention (ray.py:217-232). The
Trainable rebuilds the full stage setup in ``setup`` and steps one epoch
per ``step`` (ray.py:67-183), with checkpoint save/restore hooks.

ray is an optional dependency — a clear error is raised only on use.
"""

from __future__ import annotations

import copy
import os

from ..config import Args
from ..utils.logging import get_logger

logger = get_logger(__name__)


def _require_ray():
    try:
        import ray
        from ray import tune

        return ray, tune
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "ray[tune] is not installed; install it to use "
            "--hyperparameter-tuning with the ray strategy"
        ) from e


def suggest_config(tune):
    """Search space mirroring the optuna one (reference: ray.py:243-263)."""
    return {
        "lr": tune.loguniform(1e-6, 1e-3),
        "beta1": tune.uniform(0.85, 0.95),
        "beta2": tune.uniform(0.95, 0.999),
        "eps": tune.loguniform(1e-9, 1e-6),
        "wd": tune.uniform(0.0, 0.4),
        "warmup": tune.randint(0, 10_000),
        "batch_size": tune.choice([32, 64, 128]),
        "grad_clip_norm": tune.loguniform(0.1, 10.0),
        "balanced_mixup": tune.uniform(0.0, 0.4),
    }


def make_trainable(base_args: Args):
    """A ``tune.Trainable`` with real per-epoch ``step`` +
    ``save_checkpoint``/``load_checkpoint`` hooks, so the ASHA scheduler can
    observe intermediate metrics and prune mid-trial (reference:
    ray.py:67-191). The lifecycle itself lives in
    :class:`integrations.runner.TrialRunner`."""
    _, tune = _require_ray()
    from .runner import TrialRunner

    class MambaClipTrainable(tune.Trainable):
        def setup(self, config):
            trial_args = base_args.replace(
                **{k: v for k, v in config.items() if hasattr(base_args, k)}
            )
            self.runner = TrialRunner(
                trial_args, trial_id=abs(hash(self.trial_id)) % (2 ** 31)
            )

        def step(self):
            return self.runner.step()

        def save_checkpoint(self, checkpoint_dir):
            return self.runner.save(checkpoint_dir)

        def load_checkpoint(self, path):
            self.runner.restore(path)

    return MambaClipTrainable


def ray_tune_pipeline(args: Args):
    ray, tune = _require_ray()
    from ray.tune.schedulers import ASHAScheduler

    # SLURM cluster attach (reference: ray.py:217-232)
    ip_head = os.environ.get("ip_head")
    if ip_head:
        ray.init(
            address=ip_head,
            _redis_password=os.environ.get("redis_password"),
        )
    else:
        ray.init(ignore_reinit_error=True)

    base = copy.deepcopy(args)
    scheduler = ASHAScheduler(
        time_attr="training_iteration",
        metric=args.eval_loss or "val_loss",
        mode="min" if "min" in args.hopt_direction else "max",
        max_t=args.epochs,
        grace_period=1,
        reduction_factor=2,
    )
    tuner = tune.Tuner(
        tune.with_resources(make_trainable(base), {"cpu": 1}),
        param_space=suggest_config(tune),
        tune_config=tune.TuneConfig(
            scheduler=scheduler, num_samples=args.training_iterations
        ),
    )
    results = tuner.fit()
    best = results.get_best_result()
    logger.info(f"Best config: {best.config}")
    return best.config


def native_asha_pipeline(args: Args):
    """Ray-free fallback: the same search space + ASHA decision rule over
    :class:`TrialRunner` (used when ray isn't installed; also what the
    integration tests exercise)."""
    import numpy as np

    from .runner import asha_search

    rng = np.random.default_rng(args.seed)

    def sample_config():
        return dict(
            lr=float(10 ** rng.uniform(-6, -3)),
            beta1=float(rng.uniform(0.85, 0.95)),
            beta2=float(rng.uniform(0.95, 0.999)),
            wd=float(rng.uniform(0.0, 0.4)),
            grad_clip_norm=float(10 ** rng.uniform(-1, 1)),
        )

    def make_args(t):
        return args.replace(**sample_config())

    mode = "min" if "min" in args.hopt_direction else "max"
    result = asha_search(
        make_args, n_trials=args.training_iterations,
        metric=args.eval_loss or "val_loss", mode=mode, max_t=args.epochs,
    )
    logger.info(
        f"ASHA best trial {result['best_trial']}: {result['best_metrics']} "
        f"({len(result['pruned'])} pruned)"
    )
    return result
