"""Checkpoint tests: Orbax roundtrip, prefix-aware latest discovery,
resume continues training (reference §3.4 semantics)."""

import os

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mamba_clip_tpu.checkpoint import (
    get_latest_checkpoint,
    wait_for_checkpoints,
    load_checkpoint,
    load_params_only,
    natural_key,
    save_checkpoint,
)
from mamba_clip_tpu.train import TrainState, create_train_state


def _tiny_state():
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    tx = optax.adam(1e-3)
    return create_train_state(params, tx), tx


def test_roundtrip(tmp_path):
    state, tx = _tiny_state()
    state = state.replace(step=jnp.int32(7))
    path = save_checkpoint(str(tmp_path), state, epoch=3, name="stage_1_epoch_3")
    wait_for_checkpoints()  # saves are async by default
    assert os.path.isdir(path)

    fresh, _ = _tiny_state()
    restored, start_epoch = load_checkpoint(path, fresh)
    assert start_epoch == 3  # completed_epoch doubles as next 0-based index
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )


def test_params_only_load(tmp_path):
    state, _ = _tiny_state()
    path = save_checkpoint(str(tmp_path), state, epoch=1, name="stage_1_epoch_latest")
    params, stats = load_params_only(path, state.params)
    np.testing.assert_array_equal(np.asarray(params["w"]), np.asarray(state.params["w"]))


def test_latest_discovery_prefix(tmp_path):
    for name in [
        "stage_1_epoch_1", "stage_1_epoch_2", "stage_1_epoch_10",
        "stage_1_epoch_latest", "stage_2_epoch_4",
    ]:
        os.makedirs(tmp_path / name)
    got = get_latest_checkpoint(str(tmp_path), prefix="stage_1_")
    assert got.endswith("stage_1_epoch_10")  # natural sort: 10 > 2
    got2 = get_latest_checkpoint(str(tmp_path), prefix="stage_2_")
    assert got2.endswith("stage_2_epoch_4")
    assert get_latest_checkpoint(str(tmp_path / "missing")) is None


def test_natural_sort():
    names = ["epoch_9", "epoch_10", "epoch_1"]
    assert sorted(names, key=natural_key)[-1] == "epoch_10"


def test_resume_continues_training(tmp_path, monkeypatch):
    """Train 1 epoch → resume latest → start_epoch advances and params
    keep evolving (reference: pipeline.py:122-161 + file_utils.py:83-100)."""
    from mamba_clip_tpu.config import Args
    from mamba_clip_tpu.data.tokenizer import HashTokenizer
    import mamba_clip_tpu.pipeline as P

    def small(**kw):
        from mamba_clip_tpu.models.clip import ClipModel
        from mamba_clip_tpu.models.text_bert import TextBert
        from mamba_clip_tpu.models.vit import VisionTransformer

        visual = VisionTransformer(image_size=32, patch_size=16, width=32,
                                   depth=1, num_heads=2, embed_dim=16,
                                   name="visual")
        text = TextBert(vocab_size=256, context_length=16, width=32, depth=1,
                        num_heads=2, embed_dim=16, name="text")
        return ClipModel(visual=visual, text=text)

    monkeypatch.setattr(P, "build_clip", small)
    monkeypatch.setattr(
        P, "get_tokenizer", lambda n, context_length=16, **kw: HashTokenizer(16, 256)
    )

    base = dict(
        synthetic_data=True, model_stage_1="tiny", batch_size=8, epochs=1,
        train_num_samples=16, val_num_samples=8, lr=1e-3, warmup=1,
        precision="fp32", logs=str(tmp_path), name="resume-e2e", workers=1,
        log_every_n_steps=50, force_image_size=[32],
    )
    P.pipeline(Args(**base))
    ckpt = os.path.join(tmp_path, "resume-e2e", "checkpoints", "stage_1_epoch_1")
    assert os.path.isdir(ckpt)

    # second leg: epochs=2, resume latest → trains exactly epoch 1
    m = P.pipeline(Args(**{**base, "epochs": 2, "resume": "latest"}))
    assert m["epoch"] == 2
    ckpt2 = os.path.join(tmp_path, "resume-e2e", "checkpoints", "stage_1_epoch_2")
    assert os.path.isdir(ckpt2)


def _fp16_state():
    from mamba_clip_tpu.utils.precision import get_policy

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    tx = optax.adam(1e-3)
    return create_train_state(params, tx, {}, policy=get_policy("fp16")), tx


def test_scaler_state_roundtrips(tmp_path):
    """Dynamic fp16 loss-scale state survives save/resume (the reference
    checkpoints scaler.state_dict(), pipeline.py:494-496); without it a
    resume resets to 2^16 and skips steps until backoff re-converges."""
    from mamba_clip_tpu.utils.precision import LossScaleState

    state, _ = _fp16_state()
    state = state.replace(loss_scale=LossScaleState(
        scale=jnp.float32(2.0**10), growth_count=jnp.int32(37)))
    path = save_checkpoint(str(tmp_path), state, epoch=1,
                           name="stage_1_epoch_1")
    wait_for_checkpoints()

    fresh, _ = _fp16_state()
    assert float(fresh.loss_scale.scale) == 2.0**16
    restored, _ = load_checkpoint(path, fresh)
    assert float(restored.loss_scale.scale) == 2.0**10
    assert int(restored.loss_scale.growth_count) == 37


def test_scaler_resume_from_scalerless_checkpoint(tmp_path):
    """An fp16 run resuming a checkpoint written without scaler state
    (bf16 stage, or an older save) keeps a fresh scaler instead of
    failing the restore."""
    state, _ = _tiny_state()  # no policy -> no loss_scale in the payload
    path = save_checkpoint(str(tmp_path), state, epoch=2,
                           name="stage_1_epoch_2")
    wait_for_checkpoints()

    fresh, _ = _fp16_state()
    restored, start_epoch = load_checkpoint(path, fresh)
    assert start_epoch == 2
    assert float(restored.loss_scale.scale) == 2.0**16
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"]))
