#!/usr/bin/env python
"""Inference / serving throughput on one chip (forward-only, no grads).

The training benchmark (bench.py) covers the reference's headline; this
tool covers the deployment side the framework is also built for: batched
serving of (a) the flagship CLIP tower pair (stage-1 embeddings — the
retrieval/zero-shot path), (b) the image tower alone (embedding service),
and (c) the medmamba classifier (the stage-2/challenge submission path,
reference: src/mamba_clip/eval.py:104-150 runs the same forward under
torch.no_grad()).

Serving realism: batches arrive as uint8 (host JPEG decode), and the
eval preprocess (keep-ratio resize → center crop → normalize,
ops/preprocess.py:eval_preprocess) runs on device inside the same jitted
call as the forward — exactly the eval engine's step (eval.py:55-78).

Timing: calls are enqueued back-to-back and a single in-graph-reduced
scalar is fetched from the last call (the only reliable barrier on this
backend — see .claude/skills/verify/SKILL.md). Each jitted call executes
in full; nothing constant-folds across dispatches.

Env knobs: BENCH_INFER_BATCH (64), BENCH_INFER_STEPS (30), BENCH_QUANT
(unset|int8_serve|int8_fast|int8_fwd|int8 — applied to both towers / the
VSSM GEMMs, ops/quant.py + ops/qdot.py; int8_serve is the serving mode:
per-output-channel weight scales, forward-only optimized).

``--artifact DIR`` instead benchmarks an EXPORTED serving artifact
(tools/export_serving.py): every entry point in its manifest is loaded
via serving.load_serving and timed with the same discipline — the
closed loop export → reload → measure, on whatever backend runs this
process.

Output: one JSON line per scenario.
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

BATCH = int(os.environ.get("BENCH_INFER_BATCH", 64))
STEPS = int(os.environ.get("BENCH_INFER_STEPS", 30))
WARMUP = int(os.environ.get("BENCH_INFER_WARMUP", 3))
QUANT = os.environ.get("BENCH_QUANT") or None


def _scenarios():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamba_clip_tpu.data.preprocess_cfg import get_transform_config
    from mamba_clip_tpu.models import build_classifier, build_clip
    from mamba_clip_tpu.ops.preprocess import eval_preprocess
    from mamba_clip_tpu.utils.precision import get_policy

    policy = get_policy("amp")
    tcfg = get_transform_config(None, 224, is_train=False)
    rng = jax.random.PRNGKey(0)
    np_rng = np.random.default_rng(0)
    raw = jnp.asarray(
        np_rng.integers(0, 256, (BATCH, 256, 256, 3), dtype=np.uint8))
    tokens = jnp.asarray(
        np_rng.integers(4, 30522, (BATCH, 256), dtype=np.int32))

    def prep(image):
        return eval_preprocess(
            image, out_size=tcfg.image_size, mean=tcfg.mean, std=tcfg.std,
            out_dtype=policy.compute_dtype, interpolation="bilinear")

    clip = build_clip(model_name="biomedclip", image_size=224,
                      dtype=policy.compute_dtype, quant=QUANT)
    img0 = jnp.zeros((2, 224, 224, 3), policy.compute_dtype)
    tok0 = jnp.zeros((2, 256), jnp.int32)
    cvars = clip.init({"params": rng, "dropout": rng}, image=img0, text=tok0)

    @jax.jit
    def clip_pair(variables, image, text):
        out = clip.apply(variables, image=prep(image), text=text,
                         deterministic=True)
        return (out["image_features"].astype(jnp.float32).sum()
                + out["text_features"].astype(jnp.float32).sum())

    @jax.jit
    def image_embed(variables, image):
        feats = clip.apply(variables, image=prep(image), method=clip.encode_image,
                           deterministic=True)
        return feats.astype(jnp.float32).sum()

    cls = build_classifier("medmamba", num_classes=2,
                           dtype=policy.compute_dtype, quant=QUANT)
    clvars = cls.init({"params": rng}, jnp.zeros((2, 224, 224, 3),
                                                 policy.compute_dtype))

    @jax.jit
    def classify(variables, image):
        logits = cls.apply(variables, prep(image), deterministic=True)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return probs.sum()

    yield ("clip_pair", lambda: clip_pair(cvars, raw, tokens), QUANT or "bf16")
    yield ("image_embed", lambda: image_embed(cvars, raw), QUANT or "bf16")
    yield ("medmamba_classify", lambda: classify(clvars, raw), QUANT or "bf16")


def _artifact_scenarios(art_dir):
    import jax.numpy as jnp
    import numpy as np

    from mamba_clip_tpu.serving import load_serving

    served = load_serving(art_dir)
    m = served["manifest"]
    np_rng = np.random.default_rng(0)
    staging = int(m["staging_size"])
    raw = jnp.asarray(
        np_rng.integers(0, 256, (BATCH, staging, staging, 3), dtype=np.uint8))
    tokens = jnp.asarray(
        np_rng.integers(4, int(m["vocab_size"]),
                        (BATCH, int(m["context_length"])), dtype=np.int32))
    art_quant = m.get("quant") or "bf16"
    for name in sorted(m["entry_points"]):
        fn = served[name]
        x = tokens if name == "text_embed" else raw

        def call(fn=fn, x=x):
            # the artifact call returns the full output on device; the
            # tiny follow-up reduction is what gets fetched (barrier)
            return fn(x).astype(jnp.float32).sum()

        yield (f"artifact_{name}", call, art_quant)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", default=None,
                   help="benchmark an exported serving dir's entry points "
                        "instead of the in-process scenarios")
    a = p.parse_args()

    scenarios = (_artifact_scenarios(a.artifact) if a.artifact
                 else _scenarios())
    for name, call, quant_label in scenarios:
        for _ in range(WARMUP):
            out = call()
        float(out)  # barrier
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = call()
        val = float(out)  # barrier: serialized on-device queue drains here
        dt = time.perf_counter() - t0
        assert math.isfinite(val), f"non-finite output in {name}"
        print(json.dumps({
            "metric": f"infer_{name}_images_per_sec_per_chip",
            "value": round(BATCH * STEPS / dt, 2),
            "unit": "images/sec/chip",
            "batch": BATCH,
            "quant": quant_label,
        }))


if __name__ == "__main__":
    main()
