"""Selective-scan kernel tests: Pallas (interpret) vs lax.scan reference vs
associative-scan, forward and all gradients (SURVEY §4: kernel unit tests
against a naive-recurrence reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_clip_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_flops,
    selective_scan_tm,
)


def _inputs(key, Bsz=2, G=2, L=70, DG=12, N=8):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (Bsz, G, L, DG))
    delta = jax.random.normal(ks[1], (Bsz, G, L, DG)) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (G * DG, N)) * 0.5)
    B = jax.random.normal(ks[3], (Bsz, G, L, N))
    C = jax.random.normal(ks[4], (Bsz, G, L, N))
    D = jax.random.normal(ks[5], (G * DG,))
    bias = jax.random.normal(ks[6], (G * DG,)) * 0.1
    return u, delta, A, B, C, D, bias


def test_assoc_matches_scan(rng):
    args = _inputs(rng)
    y_ref = selective_scan_tm(*args, True, impl="xla")
    y_assoc = selective_scan_tm(*args, True, impl="assoc")
    np.testing.assert_allclose(y_assoc, y_ref, atol=2e-5, rtol=2e-5)


def test_pallas_forward_matches_scan(rng):
    args = _inputs(rng)
    y_ref = selective_scan_tm(*args, True, impl="xla")
    y_pal = selective_scan_tm(*args, True, impl="pallas_interpret")
    np.testing.assert_allclose(y_pal, y_ref, atol=2e-5, rtol=2e-5)


def test_pallas_gradients_match_scan(rng):
    args = _inputs(rng, Bsz=1, G=2, L=40, DG=8, N=4)

    def loss(impl):
        def f(*a):
            y = selective_scan_tm(*a, True, impl=impl)
            return jnp.sum(jnp.sin(y))

        return f

    g_ref = jax.grad(loss("xla"), argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(loss("pallas_interpret"), argnums=tuple(range(7)))(*args)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    for name, a, b in zip(names, g_ref, g_pal):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4,
            err_msg=name,
        )


def test_channel_major_wrapper(rng):
    """The CUDA-layout entry point (b, d, l) must agree with time-major."""
    u, delta, A, B, C, D, bias = _inputs(rng, Bsz=2, G=2, L=30, DG=6, N=4)
    Bsz, G, L, DG = u.shape
    u_cm = u.transpose(0, 1, 3, 2).reshape(Bsz, G * DG, L)
    d_cm = delta.transpose(0, 1, 3, 2).reshape(Bsz, G * DG, L)
    B_cm = B.transpose(0, 1, 3, 2)
    C_cm = C.transpose(0, 1, 3, 2)
    y_cm = selective_scan(u_cm, d_cm, A, B_cm, C_cm, D, bias, True, impl="xla")
    y_tm = selective_scan_tm(u, delta, A, B, C, D, bias, True, impl="xla")
    y_tm_cm = y_tm.transpose(0, 1, 3, 2).reshape(Bsz, G * DG, L)
    np.testing.assert_allclose(y_cm, y_tm_cm, atol=1e-6)


def test_no_delta_softplus_and_no_extras(rng):
    u, delta, A, B, C, D, bias = _inputs(rng, Bsz=1, G=1, L=20, DG=4, N=4)
    y1 = selective_scan_tm(u, delta, A, B, C, impl="xla")
    y2 = selective_scan_tm(u, delta, A, B, C, impl="pallas_interpret")
    np.testing.assert_allclose(y1, y2, atol=2e-5, rtol=2e-5)


def test_fp32_output_contract(rng):
    """Matches the CUDA kernel contract the reference asserts
    (model.py:551,639): output is fp32 even for bf16 inputs."""
    u, delta, A, B, C, D, bias = _inputs(rng, Bsz=1, G=1, L=16, DG=4, N=4)
    y = selective_scan_tm(
        u.astype(jnp.bfloat16), delta.astype(jnp.bfloat16), A,
        B.astype(jnp.bfloat16), C.astype(jnp.bfloat16), D, bias, True,
        impl="pallas_interpret",
    )
    assert y.dtype == jnp.float32


def test_multi_dtile_and_padding(rng):
    """DG > 128 exercises the multi-channel-tile grid path (nd > 1), and
    L=300 exercises chunk padding; backward dB/dC must sum correctly
    across channel tiles."""
    args = _inputs(rng, Bsz=1, G=1, L=300, DG=160, N=4)
    y_ref = selective_scan_tm(*args, True, impl="xla")
    y_pal = selective_scan_tm(*args, True, impl="pallas_interpret")
    np.testing.assert_allclose(y_pal, y_ref, atol=3e-5, rtol=3e-5)

    def loss(impl):
        def f(*a):
            return jnp.sum(jnp.sin(selective_scan_tm(*a, True, impl=impl)))
        return f

    g_ref = jax.grad(loss("xla"), argnums=(3, 4))(*args)   # dB, dC
    g_pal = jax.grad(loss("pallas_interpret"), argnums=(3, 4))(*args)
    for name, a, b in zip(["dB", "dC"], g_ref, g_pal):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=2e-4,
            err_msg=name,
        )


def test_no_softplus_gradients(rng):
    """Without delta_softplus the caller supplies dt >= 0 (raw negative dt
    makes exp(dt*A) > 1 and the recurrence ill-conditioned in any
    implementation); use that realistic regime."""
    u, delta, A, B, C, D, bias = _inputs(rng, Bsz=1, G=1, L=48, DG=8, N=4)
    args = (u, jnp.abs(delta), A, B, C, D, jnp.abs(bias))

    def loss(impl):
        def f(*a):
            return jnp.sum(jnp.cos(selective_scan_tm(*a, False, impl=impl)))
        return f

    g_ref = jax.grad(loss("xla"), argnums=(0, 1, 6))(*args)
    g_pal = jax.grad(loss("pallas_interpret"), argnums=(0, 1, 6))(*args)
    for name, a, b in zip(["du", "ddelta", "dbias"], g_ref, g_pal):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4,
            err_msg=name,
        )


def test_larger_state_n32(rng):
    args = _inputs(rng, Bsz=1, G=2, L=64, DG=16, N=32)
    y_ref = selective_scan_tm(*args, True, impl="xla")
    y_pal = selective_scan_tm(*args, True, impl="pallas_interpret")
    np.testing.assert_allclose(y_pal, y_ref, atol=3e-5, rtol=3e-5)


def test_flops_model():
    assert selective_scan_flops(2, 8, 16, 4) == 9 * 2 * 16 * 8 * 4 + 2 * 2 * 8 * 16


@pytest.mark.parametrize(
    "G,DG,expect_P",
    [(4, 64, 2), (4, 32, 4), (4, 24, 4), (4, 128, 1), (1, 64, 1)],
)
def test_group_lane_packing(rng, G, DG, expect_P):
    """Narrow-channel groups are packed side by side into the 128-lane
    tile (P groups/row); fwd and all 7 grads must match the unpacked
    xla reference. (4, 64) is the medmamba stage-1 shape whose padding
    previously wasted half the VPU."""
    from mamba_clip_tpu.ops.selective_scan import _pack_factor

    assert _pack_factor(G, DG) == expect_P
    args = _inputs(rng, Bsz=1, G=G, L=40, DG=DG, N=16)
    y_ref = selective_scan_tm(*args, True, impl="xla")
    y_pal = selective_scan_tm(*args, True, impl="pallas_interpret")
    np.testing.assert_allclose(y_pal, y_ref, atol=3e-5, rtol=3e-5)

    def loss(impl):
        def f(*a):
            y = selective_scan_tm(*a, True, impl=impl)
            return jnp.sum(jnp.sin(y))

        return f

    g_ref = jax.grad(loss("xla"), argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(loss("pallas_interpret"), argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"],
                          g_ref, g_pal):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-4,
            err_msg=name,
        )


def test_grid_chunks_invariants():
    """_grid_chunks (round-5 adaptive chunking): T ≤ 128, T a multiple of
    the _SUB subchunk, LP = NC*T with NC recoverable from LP alone
    (NC = ceil(LP/128) — the property the pallas wrappers rely on), and
    padding strictly less than one _SUB per chunk."""
    from mamba_clip_tpu.ops.selective_scan import _CHUNK, _SUB, _grid_chunks

    for L in [1, 7, 8, 16, 49, 70, 128, 129, 140, 196, 200, 260, 300, 513,
              784, 1000, 3136, 4096, 12608]:
        T, LP = _grid_chunks(L)
        assert T <= _CHUNK and T % _SUB == 0, (L, T)
        assert LP % T == 0 and LP >= L, (L, T, LP)
        nc = LP // T
        assert -(-LP // _CHUNK) == nc, (L, T, LP)  # wrapper recovery
        assert LP - L < nc * _SUB, (L, T, LP)      # minimal padding
        # the old fixed-T=128 padding is never beaten by the new scheme
        old = ((L + _CHUNK - 1) // _CHUNK) * _CHUNK if L > _CHUNK \
            else ((L + 7) // 8) * 8
        assert LP <= old, (L, LP, old)
