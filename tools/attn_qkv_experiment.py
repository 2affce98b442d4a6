#!/usr/bin/env python
"""Measure qkv-split formulations against the attn/split copy class.

The round-3 trace shows ~2.7 ms/step of sync layout copies on the three
``jnp.split(qkv, 3, -1)`` outputs (one per q/k/v per block: XLA picks a
T-minor {1,2,0} layout for the attention dots' operands and materializes
each split slice into it), plus ~1.7 ms of backward attn/reshape copies.
This tool times the full flagship train step under alternative qkv
formulations that keep the identical parameter structure (same fused
(d,3d) kernel), so the ONLY change is how the slices reach the dots:

  split     baseline: jnp.split(qkv, 3, axis=-1), reshape each to
            (B,T,h,hd) inside the interior
  reshape5  qkv.reshape(B,T,3,h,hd) then static index [:, :, i] — skips
            the (B,T,d) intermediates entirely
  headsfirst reshape5 + explicit transpose to (B,h,T,hd) and bhqd/bhkd
            einsums — hands XLA the operand order the dots want

Run on the real TPU:  python tools/attn_qkv_experiment.py [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))
sys.path.insert(0, REPO)


def patched_class(mode):
    """Subclass FusedAttention with a variant @nn.compact __call__.

    (flax registers compact methods at class creation, so assigning a
    wrapped function onto the existing class does not work; the subclass
    keeps the identical parameter structure — same "qkv"/"out" Dense
    names — so only the slicing formulation differs.)
    """
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from mamba_clip_tpu.models import vit

    def __call__(self, x, pad_mask=None):
        B, T, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = self._dense(3 * d, "qkv")(x)
        if mode == "split":
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            qkv5 = qkv.reshape(B, T, 3, h, hd)
            q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]

        def interior(q, k, v, pad_mask):
            if mode == "split":
                q = q.reshape(B, T, h, hd)
                k = k.reshape(B, T, h, hd)
                v = v.reshape(B, T, h, hd)
            if mode == "headsfirst":
                q = q.transpose(0, 2, 1, 3)
                k = k.transpose(0, 2, 1, 3)
                v = v.transpose(0, 2, 1, 3)
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
            else:
                s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
            s = s.astype(jnp.float32)
            if pad_mask is not None:
                s = jnp.where(pad_mask, s, jnp.float32(-1e9))
            p = jax.nn.softmax(s, axis=-1).astype(self.dtype)
            if mode == "headsfirst":
                o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3)
                return o.reshape(B, T, d)
            return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, d)

        if self.remat_probs:
            interior = jax.checkpoint(interior)
        return self._dense(d, "out")(interior(q, k, v, pad_mask))

    return type("PatchedFusedAttention", (vit.FusedAttention,),
                {"__call__": nn.compact(__call__)})


def time_step(steps):
    from bench import build_train_step

    step_fn, state, batch, rng = build_train_step(
        batch_size=64, model_name="biomedclip", precision="amp")
    for _ in range(3):
        state, metrics = step_fn(state, batch, rng)
    loss = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch, rng)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    return dt * 1e3, loss


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--modes", default="split,reshape5,headsfirst")
    a = p.parse_args()

    from mamba_clip_tpu.models import text_bert, vit
    from mamba_clip_tpu.parallel.mesh import enable_compilation_cache

    enable_compilation_cache()
    orig = vit.FusedAttention
    for mode in a.modes.split(","):
        cls = orig if mode == "split" else patched_class(mode)
        # text_bert binds the name at import time; patch both globals
        vit.FusedAttention = cls
        text_bert.FusedAttention = cls
        ms, loss = time_step(a.steps)
        print(f"{mode:11s}  {ms:7.1f} ms/step  loss={loss:.4f}", flush=True)
    vit.FusedAttention = orig
    text_bert.FusedAttention = orig


if __name__ == "__main__":
    main()
