"""Serving export (mamba_clip_tpu/serving.py): batch-polymorphic
StableHLO artifacts round-trip through jax.export.

The reference has no export story (deployment = rerun eval.py's forward
under no_grad, reference: src/mamba_clip/eval.py:104-150); these tests
pin the TPU-native one: export → serialized bytes on disk → deserialize
in a loader that has only the artifacts → same outputs as direct
model.apply, at batch sizes never seen at export time.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_clip_tpu.serving import export_serving, load_serving, make_serving_fns


def _tiny_clip_kw():
    return dict(image_size=32, context_length=16, precision="fp32")


def test_clip_export_roundtrip(tmp_path):
    out = str(tmp_path / "clip_serving")
    manifest = export_serving(out, "biomedclip", **_tiny_clip_kw())
    assert set(manifest["entry_points"]) == {"image_embed", "text_embed"}
    assert os.path.exists(os.path.join(out, "image_embed.stablehlo"))
    assert os.path.exists(os.path.join(out, "params.msgpack"))
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["image_size"] == 32

    served = load_serving(out)
    staging = manifest["staging_size"]
    r = np.random.default_rng(0)
    # batch sizes unseen at export: the symbolic dim must generalize
    for b in (1, 5):
        img = jnp.asarray(
            r.integers(0, 256, (b, staging, staging, 3), dtype=np.uint8))
        feats = np.asarray(served["image_embed"](img))
        assert feats.shape == (b, 512)
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=-1), 1.0, rtol=1e-3)
    tok = jnp.asarray(r.integers(4, 64, (3, 16), dtype=np.int32))
    tfeats = np.asarray(served["text_embed"](tok))
    assert tfeats.shape == (3, 512)


def test_export_matches_direct_apply(tmp_path):
    """The exported graph computes exactly what the in-process fns do,
    with the params that were serialized alongside it."""
    out = str(tmp_path / "clip_serving")
    model, variables, fns, meta = make_serving_fns(
        "biomedclip", **_tiny_clip_kw())
    export_serving(out, "biomedclip", variables=variables, **_tiny_clip_kw())
    served = load_serving(out)

    r = np.random.default_rng(1)
    img = jnp.asarray(
        r.integers(0, 256, (4, meta["staging_size"], meta["staging_size"], 3),
                   dtype=np.uint8))
    direct = np.asarray(fns["image_embed"](variables, img))
    loaded = np.asarray(served["image_embed"](img))
    np.testing.assert_allclose(loaded, direct, atol=1e-6)


def test_classifier_export_roundtrip(tmp_path):
    out = str(tmp_path / "cls_serving")
    manifest = export_serving(
        out, "medmamba", num_classes=3, image_size=32, precision="fp32")
    assert set(manifest["entry_points"]) == {"classify"}
    served = load_serving(out)
    r = np.random.default_rng(2)
    staging = manifest["staging_size"]
    img = jnp.asarray(
        r.integers(0, 256, (2, staging, staging, 3), dtype=np.uint8))
    probs = np.asarray(served["classify"](img))
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_quantized_export_carries_int8(tmp_path):
    """int8_serve survives export: the serialized module contains int8
    dots and the reloaded outputs differ from the unquantized export of
    the same params (quantization engaged), while staying close."""
    out_q = str(tmp_path / "q")
    out_f = str(tmp_path / "f")
    _, variables, _, meta = make_serving_fns("biomedclip", **_tiny_clip_kw())
    export_serving(out_q, "biomedclip", variables=variables,
                   quant="int8_serve", **_tiny_clip_kw())
    export_serving(out_f, "biomedclip", variables=variables,
                   **_tiny_clip_kw())

    from jax import export as jexport
    with open(os.path.join(out_q, "image_embed.stablehlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    assert "i8" in exp.mlir_module()

    r = np.random.default_rng(3)
    img = jnp.asarray(
        r.integers(0, 256, (2, meta["staging_size"], meta["staging_size"], 3),
                   dtype=np.uint8))
    q = np.asarray(load_serving(out_q)["image_embed"](img))
    f_ = np.asarray(load_serving(out_f)["image_embed"](img))
    assert not np.array_equal(q, f_)
    assert np.max(np.abs(q - f_)) < 0.2
