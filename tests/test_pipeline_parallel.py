"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a
'pipe' mesh axis must match the sequential block stack exactly — forward
and gradients — on a virtual CPU mesh. The reference has no PP at all
(SURVEY §2.17: DP-only), so these tests pin the TPU-first headroom item,
like tests/test_sharded_scan.py does for the sequence axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mamba_clip_tpu.parallel.pipeline import (
    pipeline_apply,
    split_into_stages,
    stack_stages,
)


def _mesh(n, name="pipe"):
    devs = jax.devices()[:n]
    return Mesh(np.asarray(devs), (name,))


def _toy_stage(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _toy_params(key, n_stages, d):
    ks = jax.random.split(key, n_stages)
    return [
        {
            "w": jax.random.normal(k, (d, d)) * 0.3,
            "b": jax.random.normal(jax.random.fold_in(k, 1), (d,)) * 0.1,
        }
        for k in ks
    ]


@pytest.mark.parametrize("S,M", [(2, 4), (4, 4), (4, 1)])
def test_pipeline_matches_sequential_fwd(S, M):
    d = 8
    B = 8
    stages = _toy_params(jax.random.PRNGKey(0), S, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, d))

    ref = x
    for p in stages:
        ref = _toy_stage(p, ref)

    mesh = _mesh(S)
    out = pipeline_apply(
        _toy_stage, stack_stages(stages), x, mesh=mesh, microbatches=M
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_gradients_match_sequential():
    """jax.grad through the shard_map/ppermute/scan program IS the
    backward pipeline; params and input grads must match sequential."""
    S, M, d, B = 4, 4, 6, 8
    stages = _toy_params(jax.random.PRNGKey(2), S, d)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, d))
    w = jnp.sin(jnp.arange(B * d, dtype=jnp.float32)).reshape(B, d)

    def seq_loss(stages, x):
        h = x
        for p in stages:
            h = _toy_stage(p, h)
        return jnp.sum(h * w)

    mesh = _mesh(S)

    def pipe_loss(stacked, x):
        out = pipeline_apply(
            _toy_stage, stacked, x, mesh=mesh, microbatches=M
        )
        return jnp.sum(out * w)

    g_seq = jax.grad(seq_loss, argnums=(0, 1))(stages, x)
    g_pipe = jax.grad(pipe_loss, argnums=(0, 1))(stack_stages(stages), x)

    # stage grads come back stacked; compare slice by slice
    for i, gs in enumerate(g_seq[0]):
        for k in gs:
            np.testing.assert_allclose(
                np.asarray(g_pipe[0][k][i]), np.asarray(gs[k]),
                atol=1e-5, rtol=1e-5, err_msg=f"stage{i}.{k}",
            )
    np.testing.assert_allclose(np.asarray(g_pipe[1]), np.asarray(g_seq[1]),
                               atol=1e-5, rtol=1e-5, err_msg="dx")


def test_pipeline_real_encoder_blocks():
    """Pipeline a real transformer block stack (the flagship's
    EncoderBlock) split 8 blocks -> 4 stages of 2, vs sequential apply."""
    from mamba_clip_tpu.models.vit import EncoderBlock

    depth, S, M = 8, 4, 2
    B, T, D = 4, 10, 16
    block = EncoderBlock(num_heads=2, mlp_ratio=2.0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, D))

    keys = jax.random.split(jax.random.PRNGKey(5), depth)
    block_params = [
        block.init(k, jnp.zeros((1, T, D)), True)["params"] for k in keys
    ]

    ref = x
    for p in block_params:
        ref = block.apply({"params": p}, ref, True)

    def stage_fn(stage_p, h):
        for j in range(depth // S):
            h = block.apply({"params": stage_p[f"sub{j}"]}, h, True)
        return h

    mesh = _mesh(S)
    out = pipeline_apply(
        stage_fn, split_into_stages(block_params, S), x,
        mesh=mesh, microbatches=M,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_split_into_stages_validates():
    with pytest.raises(ValueError, match="split"):
        split_into_stages([{"w": jnp.zeros(2)}] * 6, 4)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(
            _toy_stage,
            stack_stages(_toy_params(jax.random.PRNGKey(0), 2, 4)),
            jnp.zeros((8, 4)), mesh=_mesh(2), microbatches=3,
        )
