"""Optuna HPO driver.

Re-design of the reference integration (reference:
src/mamba_clip/integrations/optuna.py): every process runs an independent
worker against a shared study (each rank "is master",
reference: dist_utils.py:112-114); the TPE multivariate sampler is seeded
per worker (optuna.py:252-253); trials deep-copy the base args, suggest
hyperparameters (undersample size, lr, betas, eps, wd, warmup, restart
interval, batch size, grad clip, balanced-mixup alpha — optuna.py:126-154),
run the normal pipeline, and report the eval loss; NaN losses prune the
trial instead of crashing the study (optuna.py:217-228); the study is
persisted via joblib (optuna.py:311-314).

optuna is an optional dependency — importing this module without it raises
a clear error only when the driver is invoked.
"""

from __future__ import annotations

import copy
import math
from typing import Optional

from ..config import Args
from ..utils.logging import get_logger

logger = get_logger(__name__)


def _require_optuna():
    try:
        import optuna  # noqa: F401

        return optuna
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "optuna is not installed; install it to use "
            "--hyperparameter-tuning with the optuna strategy"
        ) from e


def suggest_args(trial, base: Args) -> Args:
    """Search space (reference: integrations/optuna.py:126-154).

    Ranges match the reference exactly — undersample 10k..100k step 10k,
    lr log [1e-6, 1e-3], beta1/beta2 [0.9, 0.999], eps log [1e-9, 1e-7],
    wd log [1e-4, 1e-1], cosine scheduler, restart ∈ {1, None}, batch size
    {8..256}, grad clip log [1e-2, 1e2], balanced-mixup [0, 1] — with ONE
    intent fix: the reference suggests ``warmup`` as a float in [0, 1]
    but consumes it as a step COUNT (scheduler.py:14-15), which at any
    value < 1 degenerates to a first-step lr spike of base/warmup. Here
    the same float is interpreted as the evident intent — a FRACTION of
    total training steps — converted where total_steps is known
    (schedules.create_schedule). Documented in PARITY.md row 22.
    """
    kw = dict(
        undersample=trial.suggest_int("undersample", 10_000, 100_000, step=10_000),
        lr=trial.suggest_float("lr", 1e-6, 1e-3, log=True),
        beta1=trial.suggest_float("beta1", 0.9, 0.999),
        beta2=trial.suggest_float("beta2", 0.9, 0.999),
        eps=trial.suggest_float("eps", 1e-9, 1e-7, log=True),
        wd=trial.suggest_float("wd", 1e-4, 1e-1, log=True),
        warmup=trial.suggest_float("warmup", 0.0, 1.0),
        lr_scheduler="cosine",
        batch_size=trial.suggest_categorical(
            "batch_size", [8, 16, 32, 64, 128, 256]
        ),
        accum_freq=1,
        grad_clip_norm=trial.suggest_float("grad_clip_norm", 1e-2, 1e2, log=True),
        balanced_mixup=trial.suggest_float("balanced_mixup", 0.0, 1.0),
        lr_restart_interval=trial.suggest_categorical(
            "lr_restart_interval", [1, None]
        ),
    )
    return base.replace(**kw)


def make_objective(base_args: Args):
    """Trial objective over the classifier model zoo with PER-EPOCH
    reporting, so optuna's pruners can stop a bad trial mid-run (the
    reference reports only the final metric; the zoo itself is
    optuna.py:85-114, realised by models.build_classifier via
    integrations.runner.TrialRunner)."""
    from .runner import TrialRunner

    def objective(trial):
        args = suggest_args(trial, copy.deepcopy(base_args))
        args = args.replace(
            name=f"{base_args.name or 'optuna'}-trial_{trial.number}",
            eval_loss=base_args.eval_loss or "val_loss",
        )
        key = args.eval_loss
        minimize = "min" in base_args.hopt_direction
        bad = math.inf if minimize else 0.0
        try:
            runner = TrialRunner(args, trial_id=trial.number)
            best = None
            for epoch in range(args.epochs):
                metrics = runner.step()
                val = float(metrics.get(key, bad))
                if math.isnan(val):
                    # NaN-loss guard (reference: optuna.py:217-228)
                    return bad
                if hasattr(trial, "report"):
                    trial.report(val, epoch)
                if getattr(trial, "should_prune", lambda: False)():
                    raise _require_optuna().TrialPruned()
                best = val if best is None else (
                    min(best, val) if minimize else max(best, val)
                )
            return bad if best is None else best
        except (FloatingPointError, ValueError) as e:
            logger.warning(f"trial {trial.number} failed ({e}); scoring {bad}")
            return bad

    return objective


def _storage(args: Args, optuna):
    """Shared storage: Redis journal or RDB URL
    (reference: optuna.py:38-59, 264-272)."""
    url: Optional[str] = args.optuna_storage
    if not url:
        return None
    if url.startswith("redis"):
        from optuna.storages import JournalStorage

        try:
            from optuna.storages.journal import JournalRedisBackend
        except ImportError:
            from optuna.storages import JournalRedisStorage as JournalRedisBackend
        return JournalStorage(JournalRedisBackend(url))
    return url


def optuna_pipeline(args: Args):
    """Entry point (reference: optuna.py:237-314)."""
    optuna = _require_optuna()
    import jax

    rank = jax.process_index()
    sampler = optuna.samplers.TPESampler(
        multivariate=True, seed=args.seed + rank
    )  # seed offset per worker (reference: optuna.py:252-253)
    direction = "minimize" if "min" in args.hopt_direction else "maximize"
    study = optuna.create_study(
        study_name=args.optuna_study_name or args.study_name,
        storage=_storage(args, optuna),
        sampler=sampler,
        direction=direction,
        load_if_exists=True,
    )
    objective = make_objective(args)
    if args.report_to and "wandb" in args.report_to:
        # per-trial wandb tracking (reference: optuna.py:273-294)
        try:
            try:
                from optuna_integration.wandb import WeightsAndBiasesCallback
            except ImportError:
                from optuna.integration.wandb import WeightsAndBiasesCallback
            import dataclasses

            wandb_kwargs = dict(
                project=args.wandb_project_name or "mamba-clip",
                name=f"{args.name or 'AutoTrain'}_{rank}",
                id=f"{args.name or 'AutoTrain'}_{rank}",
                notes=args.wandb_notes,
                resume="auto" if args.resume == "latest" else None,
                config=dataclasses.asdict(args),
            )
            wandbcb = WeightsAndBiasesCallback(wandb_kwargs=wandb_kwargs)
            objective = wandbcb.track_in_wandb()(objective)
        except ImportError:
            logger.warning(
                "--report-to wandb requested but the optuna wandb "
                "integration is not installed; trials run untracked"
            )
    study.optimize(objective, n_trials=args.training_iterations)
    try:
        import joblib

        joblib.dump(study, f"{args.logs}/{study.study_name}.pkl")
    except Exception:
        pass
    logger.info(f"Best trial: {study.best_trial.number} value {study.best_value}")
    return study.best_params
