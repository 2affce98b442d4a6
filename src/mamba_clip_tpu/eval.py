"""Eval engine: contrastive val loss, CE + pAUC (ISIC-2024 metric).

Re-design of the reference evaluator (reference: src/mamba_clip/eval.py):
- master-only validation, gated by --val-frequency (eval.py:49-58);
- stage 1: per-batch in-batch contrastive loss, sample-weighted mean
  (eval.py:104-116);
- stage 2: CE + softmax probs, then **pAUC above 80% TPR** via the
  complement-flip trick (eval.py:21-44) — the ISIC-2024 competition
  metric;
- metrics appended to results.jsonl (eval.py:163-165).

The per-batch compute is one jitted eval step; probabilities/targets
accumulate on host as numpy (the sklearn ROC runs on host).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .losses import clip_loss, cross_entropy_loss
from .ops.preprocess import eval_preprocess
from .utils.logging import get_logger

logger = get_logger(__name__)


def partial_auc(y_true, y_pred, min_tpr: float = 0.8) -> float:
    """pAUC above a TPR floor (reference: eval.py:21-44). Flips labels and
    negates scores so sklearn's max_fpr machinery computes the
    above-min_tpr area."""
    from sklearn.metrics import auc, roc_curve

    max_fpr = abs(1 - min_tpr)
    if not (0 < max_fpr <= 1):
        raise ValueError(f"Expected min_tpr in [0, 1), got: {min_tpr!r}")
    v_gt = np.abs(np.asarray(y_true) - 1)
    v_pred = -1.0 * np.asarray(y_pred)
    fpr, tpr, _ = roc_curve(v_gt, v_pred)
    if max_fpr == 1:
        return float(auc(fpr, tpr))
    stop = np.searchsorted(fpr, max_fpr, "right")
    x_interp = [fpr[stop - 1], fpr[stop]]
    y_interp = [tpr[stop - 1], tpr[stop]]
    tpr = np.append(tpr[:stop], np.interp(max_fpr, x_interp, y_interp))
    fpr = np.append(fpr[:stop], max_fpr)
    return float(auc(fpr, tpr))


def make_eval_step(model, policy, tcfg, stage: int = 1, class_weights=None,
                   takes_text: bool = True):
    weights = (
        jnp.asarray(class_weights, jnp.float32) if class_weights is not None else None
    )

    @jax.jit
    def stage1_step(variables, batch):
        images = eval_preprocess(
            batch["image"], out_size=tcfg.image_size, mean=tcfg.mean,
            std=tcfg.std, out_dtype=policy.compute_dtype,
            interpolation=getattr(tcfg, "interpolation", "bilinear"),
        )
        out = model.apply(variables, image=images, text=batch["tokens"],
                          deterministic=True)
        loss = clip_loss(
            out["image_features"], out["text_features"], out["logit_scale"]
        )
        return loss

    def _stage2_logits(variables, batch):
        images = eval_preprocess(
            batch["image"], out_size=tcfg.image_size, mean=tcfg.mean,
            std=tcfg.std, out_dtype=policy.compute_dtype,
            interpolation=getattr(tcfg, "interpolation", "bilinear"),
        )
        if takes_text:
            return model.apply(
                variables, images, batch.get("tokens"), deterministic=True
            )
        return model.apply(variables, images, deterministic=True)

    @jax.jit
    def stage2_step(variables, batch):
        logits = _stage2_logits(variables, batch)
        loss = cross_entropy_loss(logits, batch["target"], weight=weights)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return loss, probs

    @jax.jit
    def stage2_step_unlabeled(variables, batch):
        # challenge test split: no target column (reference data.py:279-282
        # sets targets=None) — predictions only, no CE/pAUC
        logits = _stage2_logits(variables, batch)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.float32(0.0), probs

    def stage2_dispatch(variables, batch):
        if "target" in batch:
            return stage2_step(variables, batch)
        return stage2_step_unlabeled(variables, batch)

    return stage1_step if stage == 1 else stage2_dispatch


def evaluate(
    model,
    state,
    data: Dict[str, Any],
    epoch: int,
    args,
    policy,
    tcfg,
    run_state=None,
    stage: Optional[int] = None,
    results_writer=None,
    tb_writer=None,
    class_weights=None,
    takes_text: bool = True,
    eval_step=None,
) -> Dict[str, float]:
    """Validation over the full split (reference: eval.py:47-178).

    Unlike the reference (master-only eval over process-local tensors),
    every process participates: the eval split is sharded over hosts by the
    loader (full coverage via array_split) and per-host results are
    combined with ``process_allgather`` — a master-only jitted eval over
    globally-sharded arrays would deadlock real multi-host SPMD. Metric
    logging and file writes stay master-only.

    Pass ``eval_step`` (from :func:`make_eval_step`) when calling in a
    loop — otherwise a fresh jit cache entry is created per call."""
    metrics: Dict[str, float] = {}
    rank = getattr(run_state, "rank", 0) if run_state else 0
    world = getattr(run_state, "world_size", 1) if run_state else 1
    master = rank == 0
    if "val" not in data and "test" not in data:
        return metrics
    if args.val_frequency and not (
        (epoch % args.val_frequency) == 0 or epoch == args.epochs
    ):
        return metrics

    stage = stage or args.stage
    step = eval_step or make_eval_step(
        model, policy, tcfg, stage=stage, class_weights=class_weights,
        takes_text=takes_text,
    )
    variables = state.variables() if hasattr(state, "variables") else state

    split = "val" if "val" in data else "test"
    loader = data[split].loader
    loader.set_epoch(0)
    cumulative_loss = 0.0
    num_samples = 0
    all_probs, all_targets = [], []
    labeled = True
    for i, batch in enumerate(loader):
        bs = batch["image"].shape[0]
        if stage == 1:
            loss = step(variables, batch)
        else:
            loss, probs = step(variables, batch)
            all_probs.append(np.asarray(probs))
            if "target" in batch:
                all_targets.append(np.asarray(batch["target"]))
            else:
                labeled = False
        cumulative_loss += float(loss) * bs
        num_samples += bs
        if master and i % args.log_every_n_steps == 0:
            logger.info(
                f"Eval Epoch: {epoch} [{num_samples} / {loader.num_samples}]\t"
                f"Loss: {cumulative_loss / num_samples:.6f}"
            )

    probs = np.concatenate(all_probs, axis=0) if all_probs else None
    targets = (np.concatenate(all_targets, axis=0)
               if labeled and all_targets else None)
    if world > 1:
        # combine per-host shards: scalar sums + padded allgather (hosts
        # may differ by one sample under array_split sharding)
        from jax.experimental import multihost_utils as mhu

        sums = np.asarray(mhu.process_allgather(
            np.array([cumulative_loss, num_samples], np.float64)))
        cumulative_loss = float(sums[..., 0].sum())
        num_samples = int(sums[..., 1].sum())
        # agree on labeledness BEFORE any targets collective: if hosts ever
        # disagreed (inconsistent metadata), only the labeled ones would
        # enter the targets allgather — a mismatched collective that hangs
        # the job (ADVICE r2). Degrade to globally-unlabeled instead.
        lab_all = np.asarray(mhu.process_allgather(
            np.array(int(labeled and targets is not None), np.int64)))
        if probs is not None and not np.atleast_1d(lab_all).all():
            if targets is not None:
                logger.warning(
                    "eval: some hosts saw no labels; dropping targets "
                    "globally (loss/pAUC unavailable)"
                )
            targets = None
            labeled = False
        if probs is not None:
            counts = np.asarray(
                mhu.process_allgather(np.array(probs.shape[0], np.int64)))
            counts = np.atleast_1d(counts)
            n_max = int(counts.max())
            pad = n_max - probs.shape[0]
            p_all = np.asarray(mhu.process_allgather(
                np.pad(probs, ((0, pad), (0, 0)))))
            probs = np.concatenate(
                [p_all[i, : counts[i]] for i in range(len(counts))])
            if targets is not None:
                t_all = np.asarray(
                    mhu.process_allgather(np.pad(targets, (0, pad))))
                targets = np.concatenate(
                    [t_all[i, : counts[i]] for i in range(len(counts))])

    if labeled:
        metrics["val_loss"] = cumulative_loss / max(num_samples, 1)
    if probs is not None:
        if probs.shape[1] == 1:
            probs = np.concatenate([1 - probs, probs], axis=1)
        if targets is not None:  # label-free test split has no pAUC
            metrics["partial_auc"] = partial_auc(targets, probs[:, 1])
        if master and split == "test" and getattr(run_state, "checkpoint_path", None):
            # per-sample malignancy probabilities for challenge submission
            # (the reference's --is-test mode stops at metrics; eval order
            # is sequential, so ids align with the probability rows)
            ids = list(getattr(loader.dataset, "ids", range(len(probs))))
            import pandas as pd

            sub = pd.DataFrame(
                {"isic_id": ids[: len(probs)], "target": probs[:, 1]}
            )
            sub_path = os.path.join(run_state.checkpoint_path, "submission.csv")
            sub.to_csv(sub_path, index=False)
            logger.info(f"wrote {len(sub)} predictions to {sub_path}")
    metrics.update({"epoch": epoch, "num_samples": num_samples})

    if not master:
        return metrics
    logger.info(
        f"Eval Epoch: {epoch} "
        + "\t".join(f"{k}: {round(v, 4):.4f}" for k, v in metrics.items())
    )
    if tb_writer is not None:
        for k, v in metrics.items():
            tb_writer.add_scalar(f"val/{k}", float(v), epoch)
    if results_writer is not None:
        results_writer.write(metrics)
    return metrics
