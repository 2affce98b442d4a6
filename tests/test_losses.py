"""Loss tests: InfoNCE vs manual computation; distributed (shard_map)
variants vs single-device global on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mamba_clip_tpu.losses import clip_loss, cross_entropy_loss, siglip_loss


def _feats(key, n=16, d=8):
    k1, k2 = jax.random.split(key)
    f1 = jax.random.normal(k1, (n, d))
    f2 = jax.random.normal(k2, (n, d))
    f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)
    return f1, f2


def test_clip_loss_manual(rng):
    img, txt = _feats(rng, 4, 8)
    scale = jnp.float32(10.0)
    loss = float(clip_loss(img, txt, scale))
    logits = 10.0 * np.asarray(img) @ np.asarray(txt).T
    def xent(lg):
        lg = lg - lg.max(-1, keepdims=True)
        p = np.exp(lg) / np.exp(lg).sum(-1, keepdims=True)
        return -np.mean(np.log(p[np.arange(4), np.arange(4)]))
    expect = 0.5 * (xent(logits) + xent(logits.T))
    assert np.isclose(loss, expect, atol=1e-5)


def test_cross_entropy_hard_soft_weighted(rng):
    logits = jax.random.normal(rng, (6, 3))
    targets = jnp.array([0, 1, 2, 0, 1, 2])
    hard = float(cross_entropy_loss(logits, targets))
    soft = float(cross_entropy_loss(logits, jax.nn.one_hot(targets, 3)))
    assert np.isclose(hard, soft, atol=1e-6)
    w = jnp.array([1.0, 2.0, 3.0])
    lw = float(cross_entropy_loss(logits, targets, weight=w))
    logp = np.asarray(jax.nn.log_softmax(logits))
    nll = -logp[np.arange(6), np.asarray(targets)]
    wv = np.asarray(w)[np.asarray(targets)]
    assert np.isclose(lw, (wv * nll).sum() / wv.sum(), atol=1e-6)


def test_sharded_global_matches_single(rng):
    """all_gather-based loss inside shard_map == single-device global loss
    (the reference's world_size>1 non-local path, loss.py:105-108)."""
    devices = jax.devices()
    assert len(devices) == 8, "conftest must force 8 CPU devices"
    mesh = Mesh(np.asarray(devices), ("data",))
    img, txt = _feats(rng, 16, 8)
    scale = jnp.float32(7.0)
    expect = float(clip_loss(img, txt, scale))

    fn = shard_map(
        lambda i, t: clip_loss(i, t, scale, axis_name="data", local_loss=False),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),  # identical loss on every shard
        check_vma=False,
    )
    got = float(fn(img, txt))
    assert np.isclose(got, expect, atol=1e-5)


def test_sharded_local_loss_matches_global(rng):
    """local_loss computes per-shard rows of the same global logits matrix;
    the mean over shards equals the global loss (loss.py:101-103)."""
    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("data",))
    img, txt = _feats(rng, 16, 8)
    scale = jnp.float32(7.0)
    expect = float(clip_loss(img, txt, scale))

    def local(i, t):
        l = clip_loss(i, t, scale, axis_name="data", local_loss=True)
        return jax.lax.pmean(l, "data")

    fn = shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        check_vma=False,
    )
    got = float(fn(img, txt))
    assert np.isclose(got, expect, atol=1e-5)


def test_siglip_loss_finite(rng):
    img, txt = _feats(rng, 8, 4)
    l = siglip_loss(img, txt, jnp.float32(10.0), jnp.float32(-10.0))
    assert np.isfinite(float(l))
