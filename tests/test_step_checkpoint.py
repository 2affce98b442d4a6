"""Mid-epoch step checkpointing (--checkpoint-steps): preemption-safe
training beyond the reference's epoch-granular checkpoints (SURVEY §5;
reference: pipeline.py:488-523 saves only at epoch boundaries).

The contract under test: a run preempted mid-epoch and resumed from its
step checkpoint produces EXACTLY the parameters of an uninterrupted run —
the loader fast-forwards through the epoch's deterministic index order
without loading skipped batches, and the restored global step keeps the
in-step RNG stream aligned.
"""

import os

import numpy as np
import pytest

from mamba_clip_tpu.config import Args
from mamba_clip_tpu.data.tokenizer import HashTokenizer


# ---------------------------------------------------------------------------
# discovery / naming
# ---------------------------------------------------------------------------


def test_parse_step_checkpoint():
    from mamba_clip_tpu.checkpoint import parse_step_checkpoint

    assert parse_step_checkpoint("/x/stage_1_epoch_3_step_40") == (3, 40)
    assert parse_step_checkpoint("stage_2_epoch_0_step_2/") == (0, 2)
    assert parse_step_checkpoint("/x/stage_1_epoch_3") is None
    assert parse_step_checkpoint("/x/stage_1_epoch_latest") is None


def test_latest_discovery_orders_step_checkpoints(tmp_path):
    """epoch_e < epoch_e_step_m < epoch_{e+1} under natural sort."""
    from mamba_clip_tpu.checkpoint import get_latest_checkpoint

    for name in ("stage_1_epoch_1", "stage_1_epoch_1_step_40",
                 "stage_1_epoch_latest"):
        os.makedirs(tmp_path / name)
    found = get_latest_checkpoint(str(tmp_path), prefix="stage_1_")
    assert os.path.basename(found) == "stage_1_epoch_1_step_40"

    os.makedirs(tmp_path / "stage_1_epoch_2")
    found = get_latest_checkpoint(str(tmp_path), prefix="stage_1_")
    assert os.path.basename(found) == "stage_1_epoch_2"


# ---------------------------------------------------------------------------
# loader fast-forward
# ---------------------------------------------------------------------------


class _IdxDataset:
    """Items carry their index so batch content identifies the draw."""

    def __init__(self, n):
        self.n = n
        self.targets = np.arange(n) % 2

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.full((4, 4, 3), i % 251, np.uint8),
                "idx": np.asarray(i, np.int64)}


def _collect(loader):
    return [
        {k: np.asarray(v) for k, v in b.items()} for b in loader
    ]


def test_loader_fast_forward_matches_tail():
    from mamba_clip_tpu.data.loader import BatchLoader

    ds = _IdxDataset(40)
    loader = BatchLoader(ds, batch_size=8, seed=3, workers=2)
    loader.set_epoch(1)
    full = _collect(loader)
    assert len(full) == 5

    loader.start_batch = 2
    tail = _collect(loader)
    assert len(tail) == 3
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a["idx"], b["idx"])
        np.testing.assert_array_equal(a["image"], b["image"])
    # a fresh epoch resets cleanly when the caller clears start_batch
    loader.start_batch = 0
    assert len(_collect(loader)) == 5


# ---------------------------------------------------------------------------
# rotating writer
# ---------------------------------------------------------------------------


def test_step_checkpointer_ring(tmp_path):
    """Keeps the two most recent saves (deletion lags one behind so a
    committed checkpoint always survives an async-save preemption);
    finalize() clears the leftovers."""
    import jax.numpy as jnp
    import optax

    from mamba_clip_tpu.checkpoint import StepCheckpointer
    from mamba_clip_tpu.train import create_train_state

    params = {"w": jnp.ones((2, 2))}
    state = create_train_state(params, optax.sgd(1e-2), {})
    from mamba_clip_tpu.checkpoint import wait_for_checkpoints

    ck = StepCheckpointer(str(tmp_path), prefix="stage_1_")
    for m in (2, 4, 6):
        ck(state, 0, m)
    wait_for_checkpoints()  # the newest save commits (tmp dir → final name)
    dirs = sorted(n for n in os.listdir(tmp_path)
                  if "step" in n and os.path.isdir(tmp_path / n))
    assert dirs == ["stage_1_epoch_0_step_4", "stage_1_epoch_0_step_6"]
    # each survivor carries its geometry sidecar; the deleted one's is gone
    assert os.path.exists(tmp_path / "stage_1_epoch_0_step_4.meta.json")
    assert not os.path.exists(tmp_path / "stage_1_epoch_0_step_2.meta.json")
    # finalize sweeps stale step checkpoints from a preempted predecessor
    # too (dirs AND sidecars), but only for its own stage prefix
    os.makedirs(tmp_path / "stage_1_epoch_0_step_1")
    os.makedirs(tmp_path / "stage_2_epoch_0_step_3")
    ck.finalize()
    left = [n for n in os.listdir(tmp_path) if "step" in n]
    assert left == ["stage_2_epoch_0_step_3"]


# ---------------------------------------------------------------------------
# end-to-end exact resume
# ---------------------------------------------------------------------------


@pytest.fixture()
def tiny_build(monkeypatch):
    import mamba_clip_tpu.pipeline as P

    def small(**kw):
        from mamba_clip_tpu.models.clip import ClipModel
        from mamba_clip_tpu.models.text_bert import TextBert
        from mamba_clip_tpu.models.vit import VisionTransformer

        visual = VisionTransformer(
            image_size=32, patch_size=16, width=32, depth=1, num_heads=2,
            embed_dim=16, name="visual",
        )
        text = TextBert(
            vocab_size=512, context_length=32, width=32, depth=1,
            num_heads=2, embed_dim=16, name="text",
        )
        return ClipModel(visual=visual, text=text)

    monkeypatch.setattr(P, "build_clip", small)
    monkeypatch.setattr(
        P, "get_tokenizer",
        lambda name, context_length=32, **kw: HashTokenizer(32, 512),
    )
    return P


def _args(tmp_path, **kw):
    base = dict(
        synthetic_data=True,
        model_stage_1="tiny",
        batch_size=8,
        epochs=1,
        train_num_samples=48,
        val_num_samples=16,
        lr=1e-3,
        warmup=1,
        precision="fp32",
        logs=str(tmp_path),
        workers=1,
        log_every_n_steps=10,
        force_image_size=[32],
        save_most_recent=True,
        num_classes=2,
    )
    base.update(kw)
    return Args(**base)


def test_midepoch_resume_is_exact(tiny_build, tmp_path, monkeypatch):
    """Uninterrupted run vs. preempt-at-step-4 + resume: identical final
    parameters (fp32, CPU — bitwise)."""
    from mamba_clip_tpu.checkpoint import StepCheckpointer, load_params_only

    P = tiny_build
    # keep the mid-epoch checkpoints around to "preempt" from
    monkeypatch.setattr(StepCheckpointer, "finalize", lambda self: None)

    args_full = _args(tmp_path, name="sc-full", stage=1, checkpoint_steps=2)
    m_full = P.pipeline(args_full)
    assert np.isfinite(m_full["val_loss"])

    ckdir = os.path.join(tmp_path, "sc-full", "checkpoints")
    step_ck = os.path.join(ckdir, "stage_1_epoch_0_step_4")
    assert os.path.isdir(step_ck), sorted(os.listdir(ckdir))

    args_res = _args(
        tmp_path, name="sc-resumed", stage=1, checkpoint_steps=0,
        resume=step_ck,
    )
    m_res = P.pipeline(args_res)
    assert np.isfinite(m_res["val_loss"])

    p_full, _ = load_params_only(
        os.path.join(ckdir, "stage_1_epoch_1"),
        _template_params(P, args_full),
    )
    p_res, _ = load_params_only(
        os.path.join(tmp_path, "sc-resumed", "checkpoints", "stage_1_epoch_1"),
        _template_params(P, args_res),
    )
    flat_full = _flatten(p_full)
    flat_res = _flatten(p_res)
    assert flat_full.keys() == flat_res.keys()
    for k in flat_full:
        np.testing.assert_array_equal(
            np.asarray(flat_full[k]), np.asarray(flat_res[k]), err_msg=k
        )
    # the resumed run's val metrics match the uninterrupted run's too
    assert m_res["val_loss"] == pytest.approx(m_full["val_loss"], abs=1e-6)


def _template_params(P, args):
    """Init the tiny model once to get a params template for restore."""
    import jax
    import jax.numpy as jnp

    model = P.build_clip()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        image=jnp.zeros((2, 32, 32, 3)),
        text=jnp.ones((2, 32), jnp.int32),
    )
    return variables["params"]


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}"))
    else:
        out[prefix] = tree
    return out


def test_batch_size_mismatch_rejected(tmp_path):
    """A step checkpoint's sidecar pins the loader geometry; resuming at
    a different --batch-size is a hard error, not a silent misalignment."""
    import types

    import jax.numpy as jnp
    import optax

    from mamba_clip_tpu.checkpoint import (
        StepCheckpointer, validate_step_resume, wait_for_checkpoints)
    from mamba_clip_tpu.train import create_train_state

    state = create_train_state({"w": jnp.ones((2,))}, optax.sgd(1e-2), {})
    ck = StepCheckpointer(str(tmp_path), types.SimpleNamespace(batch_size=8),
                          prefix="stage_1_")
    path = ck(state, 0, 4, num_batches=6)
    wait_for_checkpoints()
    assert os.path.exists(path + ".meta.json")

    validate_step_resume(path, 8)  # same geometry: fine
    validate_step_resume(path, 8, num_batches=6)
    with pytest.raises(ValueError, match="batch-size 8"):
        validate_step_resume(path, 16)
    # a changed dataset length (different epoch permutation) is also a
    # hard error: the stored offset points at different samples
    with pytest.raises(ValueError, match="6 batches"):
        validate_step_resume(path, 8, num_batches=9)
    # checkpoints without a sidecar (older runs) skip the check
    os.remove(path + ".meta.json")
    validate_step_resume(path, 16)


def test_remote_sync_skips_step_checkpoints(tmp_path):
    """remote_sync never mirrors rotating step checkpoints (their local
    deletion is never mirrored either, so syncing them would leave stale
    'newest' checkpoints for remote resume discovery)."""
    from mamba_clip_tpu.checkpoint import remote_sync

    local = tmp_path / "local"
    remote = tmp_path / "remote"
    (local / "stage_1_epoch_1").mkdir(parents=True)
    (local / "stage_1_epoch_1" / "data").write_text("keep")
    (local / "stage_1_epoch_0_step_4").mkdir()
    (local / "stage_1_epoch_0_step_4" / "data").write_text("skip")
    (local / "stage_1_epoch_0_step_4.meta.json").write_text("{}")
    (local / "stage_1_epoch_latest").mkdir()
    (local / "stage_1_epoch_latest" / "data").write_text("skip")

    assert remote_sync(str(local), str(remote))
    assert (remote / "stage_1_epoch_1" / "data").exists()
    assert not (remote / "stage_1_epoch_0_step_4").exists()
    assert not (remote / "stage_1_epoch_0_step_4.meta.json").exists()
    assert not (remote / "stage_1_epoch_latest").exists()
