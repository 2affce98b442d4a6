"""Per-epoch trial lifecycle shared by every HPO driver.

The reference's Ray integration defines a ``tune.Trainable`` whose
``setup``/``step``/``save_checkpoint``/``load_checkpoint`` hooks let the
ASHA scheduler observe per-epoch metrics and prune mid-trial (reference:
src/mamba_clip/integrations/ray.py:67-191); its Optuna integration builds
the trial model from a small zoo (optuna.py:85-114). This module factors
that lifecycle out once, TPU-style:

- :class:`TrialRunner` — builds data + the zoo model + the jitted train
  step for one hyperparameter configuration, then exposes ``step()`` (one
  epoch of training followed by evaluation → metrics dict), ``save()`` and
  ``restore()``.
- :func:`asha_search` — a native Asynchronous-Successive-Halving loop over
  TrialRunners, used directly when ray isn't installed (ray/optuna wrap
  the same runner when they are). On a single host trials run
  sequentially rung by rung; promotion keeps the top 1/reduction of each
  rung, exactly ASHA's decision rule.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional

from ..config import Args, RunState
from ..utils.logging import get_logger

logger = get_logger(__name__)


class TrialRunner:
    """One hyperparameter trial with a per-epoch ``step()``.

    Trains the classifier zoo model (reference: optuna.py:85-114 chooses
    VSSM / MambaVision per trial) on the args' data (synthetic or ISIC).
    """

    def __init__(self, args: Args, trial_id: int = 0, model_factory=None):
        import jax

        from ..data.preprocess_cfg import get_transform_config
        from ..data.tokenizer import get_tokenizer
        from ..eval import make_eval_step
        from ..models import build_classifier
        from ..parallel.mesh import create_mesh, data_sharding
        from ..pipeline import _build_data, parse_aug_cfg, prepare_params
        from ..utils.precision import get_policy

        self.args = args
        self.trial_id = trial_id
        self.run = RunState(rank=0, world_size=1)
        self.mesh = create_mesh()
        policy = get_policy(args.precision)
        image_size = (args.force_image_size or [224])[0]
        tcfg_train = get_transform_config(
            parse_aug_cfg(args.aug_cfg), image_size, is_train=True,
            mean=args.image_mean, std=args.image_std,
            interpolation=args.image_interpolation,
        )
        tcfg_val = get_transform_config(
            None, image_size, is_train=False, mean=args.image_mean,
            std=args.image_std, interpolation=args.image_interpolation,
        )
        if model_factory is not None:
            self.model = model_factory(args)
        else:
            self.model = build_classifier(
                args.model, num_classes=args.num_classes or 2,
                dtype=policy.compute_dtype,
                grad_checkpointing=args.grad_checkpointing,
                quant=args.quant,
            )
        tokenizer = get_tokenizer(args.tokenizer or "hash")
        self.data = _build_data(args, self.run, tokenizer, tcfg_train, tcfg_val)
        self.rng = jax.random.PRNGKey(args.seed + trial_id)
        cw = self.data["train"].class_weights if "train" in self.data else None
        self.class_weights = cw if args.class_weighted_loss else None
        self.params = prepare_params(
            args, self.model, self.data, self.mesh, self.run, stage=2,
            rng=self.rng, takes_text=False, class_weights=cw,
        )
        self.policy = self.params["policy"]
        self.tcfg_val = tcfg_val
        self.eval_step = make_eval_step(
            self.model, self.policy, tcfg_val, stage=2,
            class_weights=self.class_weights, takes_text=False,
        )
        self._sharding = data_sharding(self.mesh)
        self.epoch = 0

    def step(self) -> Dict[str, float]:
        """Train one epoch, evaluate, return metrics (≥ val_loss)."""
        from ..data.loader import device_prefetch
        from ..eval import evaluate
        from ..train import train_one_epoch

        def put(it):
            return device_prefetch(it, sharding=self._sharding)

        self.params["state"] = train_one_epoch(
            self.params["step_fn"], self.params["state"], self.data,
            self.epoch, self.args, self.rng, run_state=self.run,
            device_put_fn=put,
        )
        self.epoch += 1
        metrics = evaluate(
            self.model, self.params["state"], self.data, self.epoch,
            self.args, self.policy, self.tcfg_val, run_state=self.run,
            stage=2, takes_text=False, eval_step=self.eval_step,
            class_weights=self.class_weights,
        )
        metrics["training_iteration"] = self.epoch
        return metrics

    def save(self, ckpt_dir: str) -> str:
        from ..checkpoint import save_checkpoint

        return save_checkpoint(
            ckpt_dir, self.params["state"], self.epoch, self.args,
            name=f"trial_{self.trial_id}_epoch_{self.epoch}", block=True,
        )

    def restore(self, path: str) -> None:
        from ..checkpoint import load_checkpoint

        self.params["state"], self.epoch = load_checkpoint(
            path, self.params["state"]
        )


def asha_search(
    make_args: Callable[[int], Args],
    n_trials: int,
    metric: str = "val_loss",
    mode: str = "min",
    max_t: Optional[int] = None,
    grace_period: int = 1,
    reduction_factor: int = 2,
    model_factory=None,
) -> Dict[str, Any]:
    """Native ASHA over TrialRunners (no ray dependency).

    Rungs at grace_period * reduction_factor^k epochs; at each rung the
    bottom (1 - 1/reduction_factor) of surviving trials stop. Returns
    {"best_trial", "best_metrics", "pruned", "history"}.
    """
    sign = 1.0 if mode == "min" else -1.0
    runners: List[Optional[TrialRunner]] = []
    scores: List[float] = []
    history: List[List[Dict[str, float]]] = []
    for t in range(n_trials):
        runners.append(
            TrialRunner(make_args(t), trial_id=t, model_factory=model_factory)
        )
        scores.append(math.inf)
        history.append([])
    max_t = max_t or runners[0].args.epochs
    pruned: List[int] = []

    rungs = []
    r = grace_period
    while r < max_t:
        rungs.append(r)
        r *= reduction_factor
    rungs.append(max_t)

    prev_rung = 0
    for rung in rungs:
        for t, runner in enumerate(runners):
            if runner is None:
                continue
            for _ in range(prev_rung, rung):
                m = runner.step()
                history[t].append(m)
            scores[t] = sign * float(history[t][-1][metric])
        if rung < max_t:
            alive = [t for t, r_ in enumerate(runners) if r_ is not None]
            keep = max(1, len(alive) // reduction_factor)
            ranked = sorted(alive, key=lambda t: scores[t])
            for t in ranked[keep:]:
                logger.info(
                    f"ASHA: pruning trial {t} at epoch {rung} "
                    f"({metric}={sign * scores[t]:.4f})"
                )
                runners[t] = None
                pruned.append(t)
        prev_rung = rung

    alive = [t for t, r_ in enumerate(runners) if r_ is not None]
    best = min(alive, key=lambda t: scores[t])
    return {
        "best_trial": best,
        "best_metrics": history[best][-1],
        "pruned": pruned,
        "history": history,
    }
