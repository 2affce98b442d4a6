#!/usr/bin/env python
"""Numerics parity harness: our training math vs PyTorch, step by step.

BASELINE.md requires a measurement harness establishing parity with the
PyTorch reference before perf comparisons. Two modes:

- default: trains the same tiny MLP (the stage-2 head shape, reference:
  model.py:1167-1171) on identical data with identical initialization in
  BOTH stacks — optax AdamW + cosine-warmup schedule + (weighted) CE here,
  torch.optim.AdamW + LambdaLR + F.cross_entropy there — and reports the
  maximum per-step loss deviation and final parameter deviation.
- --stage2: end-to-end stage-2 parity on a fixed imbalanced synthetic
  subset (ISIC-shaped: ~3% positives, CLIP-like 1024-dim concat features,
  reference feature_dim at pipeline.py:607-616): trains the full
  Linear(1024->512)->ReLU->Linear(512->2) head in both stacks for several
  epochs and compares loss curves AND the resulting pAUC>80%TPR on a held-
  out split (metric: the reference's complement-flip computation,
  reference eval.py:21-44, golden-tested in tests/test_eval_metrics).

Exact agreement is expected to ~1e-5 in fp32: the update rules are
mathematically identical; differences are accumulation order only.

Usage:  python tools/parity_harness.py [--steps 50] [--stage2] [--json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))


def _train_both(w1, b1, w2, b2, xs, ys, *, lr, wd, warmup, cw):
    """Train the 2-layer MLP on the same (steps, B, ...) batch stream in
    both stacks from identical init. Returns (ours_losses, torch_losses,
    jax_params, torch_model)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from mamba_clip_tpu.losses import cross_entropy_loss
    from mamba_clip_tpu.schedules import cosine_lr

    steps = xs.shape[0]

    params = {
        "w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
        "w2": jnp.asarray(w2), "b2": jnp.asarray(b2),
    }
    sched = cosine_lr(lr, warmup, steps)
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(
            wd, mask={"w1": True, "b1": False, "w2": True, "b2": False}
        ),
        optax.scale_by_learning_rate(sched),
    )
    opt_state = tx.init(params)
    weight = jnp.asarray(cw) if cw is not None else None

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            h = jnp.maximum(x @ p["w1"] + p["b1"], 0.0)
            logits = h @ p["w2"] + p["b2"]
            return cross_entropy_loss(logits, y, weight=weight)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    ours_losses = []
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(xs[i]), jnp.asarray(ys[i])
        )
        ours_losses.append(float(loss))

    d_in, hid = w1.shape
    ncls = w2.shape[1]
    tmodel = torch.nn.Sequential(
        torch.nn.Linear(d_in, hid), torch.nn.ReLU(), torch.nn.Linear(hid, ncls)
    )
    with torch.no_grad():
        tmodel[0].weight.copy_(torch.tensor(w1.T))
        tmodel[0].bias.copy_(torch.tensor(b1))
        tmodel[2].weight.copy_(torch.tensor(w2.T))
        tmodel[2].bias.copy_(torch.tensor(b2))
    decay = [tmodel[0].weight, tmodel[2].weight]
    nodecay = [tmodel[0].bias, tmodel[2].bias]
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": wd},
         {"params": nodecay, "weight_decay": 0.0}],
        lr=1.0, betas=(0.9, 0.999), eps=1e-8,
    )
    lam = lambda s: float(sched(s))  # same absolute lr via lr=1.0 base
    sch = torch.optim.lr_scheduler.LambdaLR(opt, lam)
    tw = torch.tensor(cw) if cw is not None else None

    torch_losses = []
    for i in range(steps):
        opt.zero_grad()
        logits = tmodel(torch.tensor(xs[i]))
        loss = torch.nn.functional.cross_entropy(
            logits, torch.tensor(ys[i]), weight=tw
        )
        loss.backward()
        opt.step()
        sch.step()
        torch_losses.append(float(loss))

    return np.array(ours_losses), np.array(torch_losses), params, tmodel


def run(steps: int = 50, lr: float = 1e-3, wd: float = 0.05, warmup: int = 5,
        weighted: bool = True, seed: int = 0):
    import jax

    jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(seed)
    D_IN, HID, NCLS, B = 64, 32, 2, 16
    w1 = rng.normal(0, 0.05, (D_IN, HID)).astype(np.float32)
    b1 = np.zeros(HID, np.float32)
    w2 = rng.normal(0, 0.05, (HID, NCLS)).astype(np.float32)
    b2 = np.zeros(NCLS, np.float32)
    xs = rng.normal(0, 1, (steps, B, D_IN)).astype(np.float32)
    ys = rng.integers(0, NCLS, (steps, B))
    cw = np.array([0.6, 3.2], np.float32) if weighted else None

    ours, theirs, params, tmodel = _train_both(
        w1, b1, w2, b2, xs, ys, lr=lr, wd=wd, warmup=warmup, cw=cw
    )
    dev = np.abs(ours - theirs)
    final_w = np.abs(
        np.asarray(params["w1"]) - tmodel[0].weight.detach().numpy().T
    ).max()
    return {
        "steps": steps,
        "max_loss_dev": float(dev.max()),
        "mean_loss_dev": float(dev.mean()),
        "final_w1_dev": float(final_w),
        "ours_final_loss": float(ours[-1]),
        "torch_final_loss": float(theirs[-1]),
    }


def run_stage2(epochs: int = 3, lr: float = 1e-3, wd: float = 0.05,
               warmup: int = 10, seed: int = 0):
    """End-to-end stage-2 parity: identical init + identical batch stream
    in both stacks; compare loss curves and held-out pAUC."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from mamba_clip_tpu.eval import partial_auc

    rng = np.random.default_rng(seed)
    N, D_IN, HID, NCLS, B = 2048, 1024, 512, 2, 64
    # ISIC-shaped: ~3% positives; positives shifted along a random
    # direction so the task has signal but is not separable.
    y = (rng.random(N) < 0.03).astype(np.int64)
    direction = rng.normal(0, 1, (D_IN,)).astype(np.float32)
    direction /= np.linalg.norm(direction)
    feats = rng.normal(0, 1, (N, D_IN)).astype(np.float32)
    feats += np.outer(y * 1.5 + rng.normal(0, 0.3, N), direction).astype(np.float32)

    n_train = 1536
    idx = rng.permutation(N)
    tr, va = idx[:n_train], idx[n_train:]

    steps_per_epoch = n_train // B
    order = np.concatenate(
        [rng.permutation(n_train) for _ in range(epochs)]
    )[: epochs * steps_per_epoch * B].reshape(-1, B)
    xs = feats[tr][order]
    ys = y[tr][order]

    # class-weighted CE as the reference's --class-weighted-loss computes
    # (sklearn balanced weights, data.py:559-562)
    counts = np.bincount(y[tr], minlength=2)
    cw = (n_train / (2.0 * counts)).astype(np.float32)

    w1 = (rng.normal(0, 1, (D_IN, HID)) * (1.0 / math.sqrt(D_IN))).astype(np.float32)
    b1 = np.zeros(HID, np.float32)
    w2 = (rng.normal(0, 1, (HID, NCLS)) * (1.0 / math.sqrt(HID))).astype(np.float32)
    b2 = np.zeros(NCLS, np.float32)

    ours, theirs, params, tmodel = _train_both(
        w1, b1, w2, b2, xs, ys, lr=lr, wd=wd, warmup=warmup, cw=cw
    )

    import jax.numpy as jnp

    h = np.maximum(feats[va] @ np.asarray(params["w1"]) + np.asarray(params["b1"]), 0)
    logits_ours = h @ np.asarray(params["w2"]) + np.asarray(params["b2"])
    probs_ours = np.asarray(jax.nn.softmax(jnp.asarray(logits_ours), axis=-1))[:, 1]
    with torch.no_grad():
        probs_torch = torch.softmax(
            tmodel(torch.tensor(feats[va])), dim=-1
        )[:, 1].numpy()

    pauc_ours = partial_auc(y[va], probs_ours, min_tpr=0.8)
    pauc_torch = partial_auc(y[va], probs_torch, min_tpr=0.8)
    dev = np.abs(ours - theirs)
    return {
        "epochs": epochs,
        "steps": int(xs.shape[0]),
        "val_samples": int(len(va)),
        "val_positives": int(y[va].sum()),
        "max_loss_dev": float(dev.max()),
        "mean_loss_dev": float(dev.mean()),
        "pauc_ours": float(pauc_ours),
        "pauc_torch": float(pauc_torch),
        "pauc_dev": float(abs(pauc_ours - pauc_torch)),
        "ours_final_loss": float(ours[-1]),
        "torch_final_loss": float(theirs[-1]),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--stage2", action="store_true")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--json", action="store_true")
    a = p.parse_args()
    if a.stage2:
        r = run_stage2(epochs=a.epochs)
        ok = r["max_loss_dev"] < 1e-3 and r["pauc_dev"] < 1e-4
    else:
        r = run(steps=a.steps)
        ok = r["max_loss_dev"] < 1e-4 and r["final_w1_dev"] < 1e-3
    if a.json:
        print(json.dumps(r))
    else:
        for k, v in r.items():
            print(f"{k}: {v}")
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
