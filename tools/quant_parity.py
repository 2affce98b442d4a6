#!/usr/bin/env python
"""Loss-trajectory parity of the int8 quantized-training modes vs fp32.

Evidence harness for the --quant recipes (ops/quant.py, ops/qdot.py): train
the same tiny CLIP from identical init on an identical synthetic batch
stream under fp32, --quant int8 (AQT), and --quant int8_fast (native
shared-calibration dot), and report per-step contrastive losses and the
max/final divergence vs the fp32 run. int8 quantized training is NOT
bit-exact with fp32 by construction; the claim this tool checks is that
the loss *trajectory* tracks (no divergence/instability), which is the
basis for offering int8 as a production recipe.

Runs on CPU in ~2 minutes. Usage:
    python tools/quant_parity.py [--steps 40] [--json]

``--full-tpu`` instead runs the FLAGSHIP-scale comparison on the real
chip: the exact bench.py stage-1 step (ViT-B/16 + PubMedBERT, bs 64,
amp) under bf16 vs --quant int8_fast, fresh synthetic batches per step.
This pins the absmax/rounding dynamics at d=768 that the tiny CPU model
cannot exercise; baseline is the bf16-amp recipe (the production
default), not fp32.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "src"))


def run(quant, steps, seed=0):
    import jax
    import jax.numpy as jnp

    from mamba_clip_tpu.config import Args
    from mamba_clip_tpu.data.preprocess_cfg import get_transform_config
    from mamba_clip_tpu.models import build_clip
    from mamba_clip_tpu.optim import build_optimizer
    from mamba_clip_tpu.schedules import create_schedule
    from mamba_clip_tpu.train import create_train_state, make_clip_train_step
    from mamba_clip_tpu.utils.precision import get_policy

    model = build_clip("biomedclip", image_size=32, context_length=16,
                       vocab_size=64, quant=quant)
    rng = jax.random.PRNGKey(seed)
    variables = model.init({"params": rng},
                           image=jnp.zeros((2, 32, 32, 3)),
                           text=jnp.ones((2, 16), jnp.int32))
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=2,
                precision="fp32", quant=quant)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, steps)
    tx = build_optimizer(args, schedule)
    state = create_train_state(variables["params"], tx, {},
                               quant_stats=variables.get("quant", {}))
    raw_fn = make_clip_train_step(model, tx, policy, args, tcfg, schedule)
    fn = jax.jit(raw_fn)

    r = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        batch = {
            "image": jnp.asarray(
                r.integers(0, 256, (8, 40, 40, 3), dtype=np.uint8)),
            "tokens": jnp.asarray(
                r.integers(4, 64, (8, 16), dtype=np.int32)),
        }
        if i == 0 and state.quant_stats:
            # int8_delayed: re-anchor the init-batch scales on real data,
            # exactly as train_one_epoch does on the first batch
            state = raw_fn.calibrate_quant(
                state, batch, jax.random.fold_in(rng, 0))
        state, metrics = fn(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    return losses


def run_full_tpu(quant, steps, seed=0, data_seed=0, tag=None):
    """Flagship bench.py step (bs 64, amp) with fresh on-device batches.

    Batches are generated per step from a jitted jax.random stream (same
    seed across the compared runs) rather than transferred from host —
    the tunnel to the remote chip makes 12 MB/step host transfers the
    bottleneck, and the parity question is about the step math, not IO.

    ``data_seed`` perturbs only the batch stream; a bf16 run with
    data_seed=1 serves as the *benign-perturbation yardstick*: if
    int8_fast's per-step deviation from the bf16 run is no larger than
    the deviation a different data draw produces, the quantization is
    indistinguishable from ordinary trajectory noise at this scale.
    """
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".."))
    from bench import build_train_step
    from mamba_clip_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    step_fn, state, _, rng = build_train_step(
        batch_size=64, model_name="biomedclip", precision="amp", quant=quant)

    @jax.jit
    def make_batch(key):
        ki, kt = jax.random.split(key)
        return {
            "image": jax.random.randint(
                ki, (64, 256, 256, 3), 0, 256, jnp.uint8),
            "tokens": jax.random.randint(
                kt, (64, 256), 4, 30522, jnp.int32),
        }

    data_key = jax.random.PRNGKey(seed + 1000 + data_seed)
    losses = []
    name = tag or (quant or "bf16_amp")
    for i in range(steps):
        batch = make_batch(jax.random.fold_in(data_key, i))
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        losses.append(metrics["loss"])  # device scalar; fetch once at end
        print(f"  [{name}] step {i}", file=sys.stderr)
    return [float(x) for x in jax.device_get(jnp.stack(losses))]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--json", action="store_true")
    p.add_argument("--full-tpu", action="store_true",
                   help="flagship-scale bf16-amp vs int8_fast on the chip")
    a = p.parse_args()

    if a.full_tpu:
        curves = {
            "bf16_amp": run_full_tpu(None, a.steps),
            "int8_fast": run_full_tpu("int8_fast", a.steps),
            "int8_fast_attn": run_full_tpu("int8_fast_attn", a.steps),
            # benign-perturbation yardstick: same recipe, different data
            # draw — calibrates how much trajectory divergence a harmless
            # change produces at this scale
            "bf16_amp_dataseed1": run_full_tpu(
                None, a.steps, data_seed=1, tag="bf16_amp_dataseed1"),
        }
        base = np.asarray(curves["bf16_amp"])
        out = {"steps": a.steps,
               "bf16_amp": {"first": round(float(base[0]), 4),
                            "final": round(float(base[-1]), 4)}}
        for name in ("int8_fast", "int8_fast_attn", "bf16_amp_dataseed1"):
            c = np.asarray(curves[name])
            out[name] = {
                "first": round(float(c[0]), 4),
                "final": round(float(c[-1]), 4),
                "max_dev_vs_bf16": round(float(np.abs(c - base).max()), 4),
                "final_dev_vs_bf16": round(float(abs(c[-1] - base[-1])), 4),
            }
        print(json.dumps(out))
        return

    import jax
    jax.config.update("jax_platforms", "cpu")

    curves = {}
    for quant in (None, "int8", "int8_fast", "int8_fast_attn",
                  "int8_delayed", "int8_delayed_attn"):
        curves[quant or "fp32"] = run(quant, a.steps)

    base = np.asarray(curves["fp32"])
    out = {"steps": a.steps}
    for name, c in curves.items():
        c = np.asarray(c)
        out[name] = {
            "first": round(float(c[0]), 4),
            "final": round(float(c[-1]), 4),
            "max_dev_vs_fp32": round(float(np.abs(c - base).max()), 4),
            "final_dev_vs_fp32": round(float(abs(c[-1] - base[-1])), 4),
        }
    if a.json:
        print(json.dumps(out))
    else:
        for name, c in curves.items():
            print(f"{name:14s} first={c[0]:.4f} final={c[-1]:.4f}")
        for name in ("int8", "int8_fast", "int8_fast_attn", "int8_delayed",
                     "int8_delayed_attn"):
            print(f"{name:14s} max|Δloss| vs fp32 = "
                  f"{out[name]['max_dev_vs_fp32']:.4f}, "
                  f"final Δ = {out[name]['final_dev_vs_fp32']:.4f}")


if __name__ == "__main__":
    main()
