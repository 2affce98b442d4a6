"""Cross-chip sequence-parallel selective scan (ops/sharded_scan.py).

The stitched per-shard scans + ppermute carry pass must match the
single-device scan exactly up to fp32 rounding — forward and gradients —
on a CPU mesh (SURVEY §5 long-context headroom item; the reference has
no sequence sharding at all, reference: src/mamba_clip/model.py:503-565).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mamba_clip_tpu.ops.selective_scan import selective_scan_tm
from mamba_clip_tpu.ops.sharded_scan import sharded_selective_scan_tm

BSZ, G, L, DG, N = 2, 2, 64, 8, 4


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(0, 1, (BSZ, G, L, DG)), jnp.float32)
    delta = jnp.asarray(rng.normal(0, 0.5, (BSZ, G, L, DG)), jnp.float32)
    A = jnp.asarray(-np.exp(rng.normal(0, 0.5, (G * DG, N))), jnp.float32)
    B = jnp.asarray(rng.normal(0, 1, (BSZ, G, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(0, 1, (BSZ, G, L, N)), jnp.float32)
    D = jnp.asarray(rng.normal(0, 1, (G * DG,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.2, (G * DG,)), jnp.float32)
    return u, delta, A, B, C, D, bias


def _sharded_fn(mesh, n_shards):
    seq = P(None, None, "sp", None)
    rep = P()

    def fn(u, delta, A, B, C, D, bias):
        return sharded_selective_scan_tm(
            u, delta, A, B, C, D, bias, delta_softplus=True,
            axis_name="sp", impl="xla",
        )

    return shard_map(
        fn, mesh=mesh,
        in_specs=(seq, seq, rep, seq, seq, rep, rep),
        out_specs=seq,
    )


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_forward_matches_single_device(n_shards):
    devs = jax.devices()[:n_shards]
    mesh = Mesh(np.array(devs), ("sp",))
    u, delta, A, B, C, D, bias = _inputs()
    ref = selective_scan_tm(u, delta, A, B, C, D, bias,
                            delta_softplus=True, impl="xla")
    out = jax.jit(_sharded_fn(mesh, n_shards))(u, delta, A, B, C, D, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_single_device():
    n_shards = 4
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))
    u, delta, A, B, C, D, bias = _inputs(seed=1)
    w = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (BSZ, G, L, DG)), jnp.float32
    )

    def loss_ref(u, delta, A, B, C):
        y = selective_scan_tm(u, delta, A, B, C, D, bias,
                              delta_softplus=True, impl="xla")
        return jnp.sum(y * w)

    sharded = _sharded_fn(mesh, n_shards)

    def loss_sp(u, delta, A, B, C):
        return jnp.sum(sharded(u, delta, A, B, C, D, bias) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2, 3, 4)))(
        u, delta, A, B, C
    )
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_single_shard_degenerates_to_local():
    """S=1: the carry pass must be the identity."""
    mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))
    u, delta, A, B, C, D, bias = _inputs(seed=3)
    ref = selective_scan_tm(u, delta, A, B, C, D, bias,
                            delta_softplus=True, impl="xla")
    out = jax.jit(_sharded_fn(mesh, 1))(u, delta, A, B, C, D, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pallas_interpret_inner_impl():
    """The sharded wrapper runs the real kernel (interpret mode on CPU)."""
    n_shards = 2
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))
    u, delta, A, B, C, D, bias = _inputs(seed=4)
    seq = P(None, None, "sp", None)
    rep = P()

    def fn(u, delta, A, B, C, D, bias):
        return sharded_selective_scan_tm(
            u, delta, A, B, C, D, bias, delta_softplus=True,
            axis_name="sp", impl="pallas_interpret",
        )

    # check_vma=False: pallas interpret mode's HLO interpreter mixes
    # varying/unvarying values internally and trips the vma check (JAX
    # suggests this exact workaround in the error); the compiled TPU path
    # does not go through the interpreter.
    out = jax.jit(shard_map(
        fn, mesh=mesh,
        in_specs=(seq, seq, rep, seq, seq, rep, rep),
        out_specs=seq, check_vma=False,
    ))(u, delta, A, B, C, D, bias)
    ref = selective_scan_tm(u, delta, A, B, C, D, bias,
                            delta_softplus=True, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
