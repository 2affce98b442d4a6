"""Golden-value tests against PyTorch (CPU) — SURVEY §4: validate loss /
schedule semantics against tiny torch tensors, since the reference's
behavior is defined in torch terms."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from mamba_clip_tpu.losses import clip_loss, cross_entropy_loss  # noqa: E402


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(10, 4)).astype(np.float32)
    targets = rng.integers(0, 4, 10)
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = float(
        torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(targets)
        )
    )
    assert np.isclose(ours, theirs, atol=1e-6)


def test_weighted_cross_entropy_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(12, 3)).astype(np.float32)
    targets = rng.integers(0, 3, 12)
    w = np.array([0.2, 1.0, 3.0], np.float32)
    ours = float(
        cross_entropy_loss(
            jnp.asarray(logits), jnp.asarray(targets), weight=jnp.asarray(w)
        )
    )
    theirs = float(
        torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(targets), weight=torch.tensor(w)
        )
    )
    assert np.isclose(ours, theirs, atol=1e-6)


def test_soft_target_ce_matches_torch_formula():
    """Reference soft-target CE: -(logsoftmax * target).sum(-1).mean()
    (loss.py:50-52)."""
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(6, 5)).astype(np.float32)
    target = rng.dirichlet(np.ones(5), size=6).astype(np.float32)
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    lt = torch.tensor(logits)
    tt = torch.tensor(target)
    theirs = float((-(lt.log_softmax(-1) * tt).sum(-1)).mean())
    assert np.isclose(ours, theirs, atol=1e-6)


def test_clip_loss_matches_torch():
    """In-batch InfoNCE identical to the reference's single-GPU path
    (loss.py:109-145)."""
    rng = np.random.default_rng(3)
    img = rng.normal(size=(8, 16)).astype(np.float32)
    txt = rng.normal(size=(8, 16)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    scale = 20.0
    ours = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), jnp.float32(scale)))

    ti, tt = torch.tensor(img), torch.tensor(txt)
    lpi = scale * ti @ tt.T
    lpt = scale * tt @ ti.T
    labels = torch.arange(8)
    theirs = float(
        (torch.nn.functional.cross_entropy(lpi, labels)
         + torch.nn.functional.cross_entropy(lpt, labels)) / 2
    )
    assert np.isclose(ours, theirs, atol=1e-5)


def test_softplus_silu_semantics():
    """The scan kernel fuses softplus(delta + bias) and the SS2D gate uses
    silu — pin both to torch semantics."""
    import jax

    x = np.linspace(-6, 6, 25).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softplus(jnp.asarray(x))),
        torch.nn.functional.softplus(torch.tensor(x)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jax.nn.silu(jnp.asarray(x))),
        torch.nn.functional.silu(torch.tensor(x)).numpy(),
        atol=1e-6,
    )
