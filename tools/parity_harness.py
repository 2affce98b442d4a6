#!/usr/bin/env python
"""Numerics parity harness: our training math vs PyTorch, step by step.

BASELINE.md requires a measurement harness establishing parity with the
PyTorch reference before perf comparisons. This script trains the same
tiny model (the stage-2 MLP head shape, reference: model.py:1167-1171)
on identical data with identical initialization in BOTH stacks —
optax AdamW + cosine-warmup schedule + (weighted) CE here,
torch.optim.AdamW + LambdaLR + F.cross_entropy there — and reports the
maximum per-step loss deviation and final parameter deviation.

Exact agreement is expected to ~1e-5 in fp32: the update rules are
mathematically identical; differences are accumulation order only.

Usage:  python tools/parity_harness.py [--steps 50] [--json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))


def run(steps: int = 50, lr: float = 1e-3, wd: float = 0.05, warmup: int = 5,
        weighted: bool = True, seed: int = 0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import torch

    from mamba_clip_tpu.losses import cross_entropy_loss
    from mamba_clip_tpu.schedules import cosine_lr

    rng = np.random.default_rng(seed)
    D_IN, HID, NCLS, B = 64, 32, 2, 16
    w1 = rng.normal(0, 0.05, (D_IN, HID)).astype(np.float32)
    b1 = np.zeros(HID, np.float32)
    w2 = rng.normal(0, 0.05, (HID, NCLS)).astype(np.float32)
    b2 = np.zeros(NCLS, np.float32)
    xs = rng.normal(0, 1, (steps, B, D_IN)).astype(np.float32)
    ys = rng.integers(0, NCLS, (steps, B))
    cw = np.array([0.6, 3.2], np.float32) if weighted else None

    # ---- ours -------------------------------------------------------------
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

    # ---- torch ------------------------------------------------------------
    tmodel = torch.nn.Sequential(
        torch.nn.Linear(D_IN, HID), torch.nn.ReLU(), torch.nn.Linear(HID, NCLS)
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

    ours = np.array(ours_losses)
    theirs = np.array(torch_losses)
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--json", action="store_true")
    a = p.parse_args()
    r = run(steps=a.steps)
    if a.json:
        print(json.dumps(r))
    else:
        for k, v in r.items():
            print(f"{k}: {v}")
    ok = r["max_loss_dev"] < 1e-4 and r["final_w1_dev"] < 1e-3
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
