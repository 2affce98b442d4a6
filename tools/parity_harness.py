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


# ---------------------------------------------------------------------------
# --quant-stage1: does TRAINING stage-1 under int8_delayed reach the same
# downstream pAUC as bf16-amp / fp32? (VERDICT r4 item 2: the flagship-recipe
# decision must rest on the end metric the north star names, not a 40-step
# loss trace.)
# ---------------------------------------------------------------------------


def _tiny_clip(quant, dtype):
    """Tiny two-tower CLIP (same module classes as the flagship, scaled
    down so a few hundred CPU steps are feasible)."""
    import jax.numpy as jnp  # noqa: F401

    from mamba_clip_tpu.models.clip import ClipModel
    from mamba_clip_tpu.models.text_bert import TextBert
    from mamba_clip_tpu.models.vit import VisionTransformer
    from mamba_clip_tpu.ops.quant import make_dot_general_cls

    dg = make_dot_general_cls(quant)
    visual = VisionTransformer(
        image_size=32, patch_size=8, width=64, depth=3, num_heads=4,
        embed_dim=64, dtype=dtype, dot_general_cls=dg, name="visual",
    )
    text = TextBert(
        vocab_size=64, context_length=16, width=64, depth=3, num_heads=4,
        embed_dim=64, dtype=dtype, dot_general_cls=dg, name="text",
    )
    return ClipModel(visual=visual, text=text)


def _synth_isic(rng, n):
    """Synthetic ISIC-shaped paired data with shared latent structure.

    Latents: lesion type z∈{0..3} (blob color / type word) and severity
    s∈[0,1] (blob size / severity word). Both towers can recover (z, s)
    — images render them visually, reports tokenize them — so contrastive
    alignment is learnable, and the downstream malignancy label depends on
    BOTH latents, so held-out pAUC measures how much latent structure the
    trained towers actually captured (the reference's two-stage premise:
    pipeline.py stage-2 trains a head on frozen stage-1 features)."""
    z = rng.integers(0, 4, n)
    s = rng.random(n).astype(np.float32)
    logit = 3.0 * (s - 0.55) + 1.1 * (z - 1.5)
    p = 1.0 / (1.0 + np.exp(-(logit - 2.2)))
    y = (rng.random(n) < p).astype(np.int64)

    # images: 40px staged (train RRC / eval center-crop to 32), noisy
    # background + center-jittered blob; color from z, size from s
    imgs = rng.integers(90, 150, (n, 40, 40, 3), dtype=np.uint8)
    colors = np.array(
        [[230, 80, 80], [80, 230, 80], [80, 80, 230], [230, 200, 60]],
        np.float32,
    )
    yy, xx = np.mgrid[0:40, 0:40].astype(np.float32)
    cy = 20 + rng.integers(-3, 4, n)
    cx = 20 + rng.integers(-3, 4, n)
    rad = 4.0 + 10.0 * s
    for i in range(n):
        mask = (yy - cy[i]) ** 2 + (xx - cx[i]) ** 2 <= rad[i] ** 2
        shade = colors[z[i]] * (0.65 + 0.35 * s[i])
        imgs[i][mask] = np.clip(
            shade + rng.normal(0, 12, (int(mask.sum()), 3)), 0, 255
        ).astype(np.uint8)

    # reports: ctx 16, vocab 64 — [CLS] TYPE_WORD SEV_WORD filler... [SEP] pad
    toks = np.zeros((n, 16), np.int32)
    toks[:, 0] = 1
    toks[:, 1] = 3 + z
    toks[:, 2] = 10 + np.clip((s * 8).astype(np.int64), 0, 7)
    for i in range(n):
        nf = int(rng.integers(2, 6))
        toks[i, 3:3 + nf] = rng.integers(30, 64, nf)
        toks[i, 3 + nf] = 2
    return imgs, toks, y, z, s


def _train_stage1_mode(mode, params0, quant0, imgs, toks, order, steps,
                       batch, lr, seed):
    """Train the tiny CLIP from identical init under one numerics mode.
    Returns (losses, trained_params_fp32)."""
    import jax
    import jax.numpy as jnp

    from mamba_clip_tpu.config import Args
    from mamba_clip_tpu.data.preprocess_cfg import get_transform_config
    from mamba_clip_tpu.optim import build_optimizer
    from mamba_clip_tpu.schedules import create_schedule
    from mamba_clip_tpu.train import create_train_state, make_clip_train_step
    from mamba_clip_tpu.utils.precision import get_policy

    precision = "fp32" if mode == "fp32" else "amp"
    quant = "int8_delayed" if mode == "int8_delayed" else None
    policy = get_policy(precision)
    model = _tiny_clip(quant, policy.compute_dtype)

    args = Args(batch_size=batch, epochs=1, lr=lr, warmup=20,
                precision=precision, quant=quant or "none")
    # gentler RRC than the ISIC default so the 40px synthetic blob stays
    # in frame; identical across modes, so it cancels in the comparison
    tcfg = get_transform_config({"scale": (0.6, 1.0)}, 32, is_train=True)
    schedule = create_schedule(args, steps)
    tx = build_optimizer(args, schedule)
    state = create_train_state(params0, tx, {}, policy=policy,
                               quant_stats=quant0 if quant else None)
    fn = make_clip_train_step(model, tx, policy, args, tcfg, schedule)
    jfn = jax.jit(fn)

    first = {
        "image": jnp.asarray(imgs[order[0]]),
        "tokens": jnp.asarray(toks[order[0]]),
    }
    if quant:
        state = fn.calibrate_quant(state, first, jax.random.PRNGKey(seed))

    losses = []
    for i in range(steps):
        b = {"image": jnp.asarray(imgs[order[i]]),
             "tokens": jnp.asarray(toks[order[i]])}
        # same per-step key across modes: identical augmentation stream
        state, metrics = jfn(state, b, jax.random.PRNGKey(seed))
        losses.append(float(metrics["loss"]))
    fp32_params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        state.params,
    )
    return np.array(losses), fp32_params


def _embed_pairs(params, imgs, toks, batch=256):
    """Deterministic fp32 embeddings (concat image+text features — the
    stage-2 feature the pipeline feeds the classifier head)."""
    import jax
    import jax.numpy as jnp

    from mamba_clip_tpu.ops.preprocess import eval_preprocess

    model = _tiny_clip(None, jnp.float32)

    @jax.jit
    def emb(im, tk):
        x = eval_preprocess(im, out_size=32, out_dtype=jnp.float32)
        out = model.apply({"params": params}, image=x, text=tk,
                          deterministic=True)
        return jnp.concatenate(
            [out["image_features"], out["text_features"]], axis=-1
        )

    feats = []
    for i in range(0, len(imgs), batch):
        feats.append(np.asarray(
            emb(jnp.asarray(imgs[i:i + batch]), jnp.asarray(toks[i:i + batch]))
        ))
    return np.concatenate(feats)


def _train_head(feats_tr, y_tr, feats_va, order, w1, b1, w2, b2, *,
                lr=1e-3, wd=0.05, warmup=10, cw=None):
    """Stage-2 head on frozen features (jax stack only — cross-stack
    optimizer parity is pinned separately by run()/run_stage2()).
    Identical init + batch order across callers. Returns (losses, val
    probabilities)."""
    import jax
    import jax.numpy as jnp
    import optax

    from mamba_clip_tpu.losses import cross_entropy_loss
    from mamba_clip_tpu.schedules import cosine_lr

    steps = order.shape[0]
    params = {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
              "w2": jnp.asarray(w2), "b2": jnp.asarray(b2)}
    sched = cosine_lr(lr, warmup, steps)
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(
            wd, mask={"w1": True, "b1": False, "w2": True, "b2": False}),
        optax.scale_by_learning_rate(sched),
    )
    opt_state = tx.init(params)
    weight = jnp.asarray(cw) if cw is not None else None
    xs = jnp.asarray(feats_tr)
    ys = jnp.asarray(y_tr)

    @jax.jit
    def step(params, opt_state, idx):
        x, t = xs[idx], ys[idx]

        def loss_fn(p):
            h = jnp.maximum(x @ p["w1"] + p["b1"], 0.0)
            return cross_entropy_loss(h @ p["w2"] + p["b2"], t, weight=weight)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(order[i]))
        losses.append(float(loss))

    h = np.maximum(feats_va @ np.asarray(params["w1"]) + np.asarray(params["b1"]), 0)
    logits = h @ np.asarray(params["w2"]) + np.asarray(params["b2"])
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = (e / e.sum(-1, keepdims=True))[:, 1]
    return np.array(losses), probs


def run_quant_stage1(steps: int = 600, batch: int = 32, n_train: int = 4096,
                     n_s2: int = 3072, lr: float = 5e-4, seed: int = 0,
                     head_epochs: int = 4, seed_jitter: bool = True):
    """Two-stage quality experiment: train stage-1 contrastive from
    IDENTICAL init under fp32 / bf16-amp / int8_delayed (the flagship
    recipe), graft each trained tower into the same stage-2 head training
    (identical head init + batch stream), and compare held-out pAUC>80%TPR.

    Yardsticks for "is int8_delayed's deviation acceptable": (a) the
    bf16-amp recipe's own deviation from fp32 (the reference itself trains
    in mixed precision, reference train.py autocast), and (b) fp32-vs-fp32
    at a different init seed (pure seed jitter). int8_delayed passes if its
    pAUC deviation sits within the band those two define."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mamba_clip_tpu.eval import partial_auc

    rng = np.random.default_rng(seed)
    imgs1, toks1, _, _, _ = _synth_isic(rng, n_train)
    # stage-2 pool: fresh draws, fixed split
    rng2 = np.random.default_rng(seed + 1000)
    imgs2, toks2, y2, _, _ = _synth_isic(rng2, n_s2)
    n_tr2 = (2 * n_s2) // 3
    idx2 = rng2.permutation(n_s2)
    tr2, va2 = idx2[:n_tr2], idx2[n_tr2:]

    order = np.stack([
        np.random.default_rng((seed, 7, i)).permutation(n_train)[:batch]
        for i in range(steps)
    ])

    def init_params(init_seed):
        m_fp32 = _tiny_clip(None, jnp.float32)
        v = m_fp32.init({"params": jax.random.PRNGKey(init_seed)},
                        image=jnp.zeros((2, 32, 32, 3)),
                        text=jnp.ones((2, 16), jnp.int32))
        mq = _tiny_clip("int8_delayed", jnp.float32)
        vq = mq.init({"params": jax.random.PRNGKey(init_seed)},
                     image=jnp.zeros((2, 32, 32, 3)),
                     text=jnp.ones((2, 16), jnp.int32))
        return v["params"], vq["quant"]

    params0, quant0 = init_params(seed)
    runs = [("fp32", params0), ("amp", params0), ("int8_delayed", params0)]
    if seed_jitter:
        params1, _ = init_params(seed + 1)
        runs.append(("fp32_seed1", params1))

    # shared stage-2 head init + batch stream
    hrng = np.random.default_rng(seed + 2000)
    D, HID = 128, 64
    w1 = (hrng.normal(0, 1, (D, HID)) / math.sqrt(D)).astype(np.float32)
    b1 = np.zeros(HID, np.float32)
    w2 = (hrng.normal(0, 1, (HID, 2)) / math.sqrt(HID)).astype(np.float32)
    b2 = np.zeros(2, np.float32)
    spe = n_tr2 // 64
    horder = np.concatenate(
        [hrng.permutation(n_tr2) for _ in range(head_epochs)]
    )[: head_epochs * spe * 64].reshape(-1, 64)
    counts = np.bincount(y2[tr2], minlength=2)
    cw = (n_tr2 / (2.0 * counts)).astype(np.float32)

    out = {"steps": steps, "batch": batch, "n_train": n_train,
           "n_stage2": n_s2, "val_samples": int(len(va2)),
           "val_positives": int(y2[va2].sum()),
           "train2_positives": int(y2[tr2].sum()), "modes": {}}
    for mode, p0 in runs:
        m = mode.split("_seed")[0]
        losses, trained = _train_stage1_mode(
            m, p0, quant0 if m == "int8_delayed" else None,
            imgs1, toks1, order, steps, batch, lr, seed)
        feats = _embed_pairs(trained, imgs2, toks2)
        hlosses, probs = _train_head(
            feats[tr2], y2[tr2], feats[va2],
            np.ascontiguousarray(horder), w1, b1, w2, b2, cw=cw)
        pauc = float(partial_auc(y2[va2], probs, min_tpr=0.8))
        out["modes"][mode] = {
            "stage1_final_loss": float(np.mean(losses[-20:])),
            "stage1_first_loss": float(losses[0]),
            "head_final_loss": float(np.mean(hlosses[-10:])),
            "pauc": pauc,
        }

    p_fp32 = out["modes"]["fp32"]["pauc"]
    out["pauc_fp32"] = p_fp32
    out["dev_amp"] = abs(out["modes"]["amp"]["pauc"] - p_fp32)
    out["dev_int8_delayed"] = abs(
        out["modes"]["int8_delayed"]["pauc"] - p_fp32)
    if seed_jitter:
        out["dev_seed"] = abs(out["modes"]["fp32_seed1"]["pauc"] - p_fp32)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--stage2", action="store_true")
    p.add_argument("--quant-stage1", action="store_true")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--json", action="store_true")
    a = p.parse_args()
    if a.quant_stage1:
        r = run_quant_stage1(steps=max(a.steps, 200) if a.steps != 50 else 600)
        yard = max(r["dev_amp"], r.get("dev_seed", 0.0))
        ok = r["dev_int8_delayed"] <= 1.5 * yard + 0.002
    elif a.stage2:
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
