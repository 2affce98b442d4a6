"""On-device preprocessing tests vs numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_clip_tpu.ops.preprocess import (
    eval_preprocess,
    train_preprocess,
)


@pytest.fixture(autouse=True)
def _eager():
    """Run eagerly: the gather-based resampler compiles slowly on the
    single-core CI host; values are identical either way."""
    with jax.disable_jit():
        yield


def test_eval_preprocess_identity_resize():
    """Same size in/out + mean 0 / std 1 → just /255."""
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    out = eval_preprocess(
        jnp.asarray(u8), out_size=16, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), u8 / 255.0, atol=1e-5)


def test_eval_preprocess_normalization():
    u8 = np.full((1, 8, 8, 3), 255, np.uint8)
    out = eval_preprocess(
        jnp.asarray(u8), out_size=8, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5),
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_eval_center_crop_from_rect():
    """Non-square input: center square is sampled."""
    u8 = np.zeros((1, 8, 16, 3), np.uint8)
    u8[:, :, 4:12] = 200  # center band
    out = eval_preprocess(
        jnp.asarray(u8), out_size=8, mean=(0.0,) * 3, std=(1.0,) * 3,
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), 200 / 255.0, atol=1e-2)


def test_train_preprocess_shapes_and_range():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    out = train_preprocess(
        jnp.asarray(u8), jax.random.PRNGKey(0), out_size=16,
        mean=(0.5,) * 3, std=(0.5,) * 3, out_dtype=jnp.float32,
    )
    assert out.shape == (4, 16, 16, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert o.min() >= -1.001 and o.max() <= 1.001


def test_train_preprocess_deterministic_per_key():
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 24, 24, 3), dtype=np.uint8))
    a = train_preprocess(u8, jax.random.PRNGKey(7), out_size=16, out_dtype=jnp.float32)
    b = train_preprocess(u8, jax.random.PRNGKey(7), out_size=16, out_dtype=jnp.float32)
    c = train_preprocess(u8, jax.random.PRNGKey(8), out_size=16, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_random_erase_applies():
    u8 = jnp.asarray(np.full((4, 32, 32, 3), 128, np.uint8))
    out = train_preprocess(
        u8, jax.random.PRNGKey(0), out_size=16, re_prob=1.0,
        mean=(0.0,) * 3, std=(1.0,) * 3, out_dtype=jnp.float32,
    )
    o = np.asarray(out)
    # noise-filled rectangles escape the constant value
    assert (np.abs(o - 128 / 255.0) > 0.2).mean() > 0.01
