"""Pretrained-flagship composition test (VERDICT r2 item 5).

Drives the reference's main path end-to-end (reference: README.md:63,
pipeline.py:240-253): synthesize a BiomedCLIP-shaped open_clip torch state
dict (small towers; the full-size conversion numerics are golden-tested in
test_biomedclip_golden.py), convert it with tools/convert_weights.py, then
run the CLI pipeline with ``--pretrained <npz> --lock-image --lock-text
--tokenizer <local vocab>`` through stage 1 → stage 2 → resume, asserting
the pieces COMPOSE: the graft loads, the lock masks hold the converted
weights bit-identical through training, stage 2 consumes the stage-1
checkpoint, and resume finds the finished run.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_weights import convert_open_clip  # noqa: E402

from mamba_clip_tpu.config import Args  # noqa: E402

W, DEPTH, HEADS, EMBED = 64, 2, 2, 32
PATCH, IMG = 16, 32
VOCAB, CTX, MAX_POS = 16, 256, 384


def _small_state_dict(seed=0):
    """open_clip BiomedCLIP key layout at small shapes."""
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {}
    v = "visual.trunk."
    sd[v + "patch_embed.proj.weight"] = t(W, 3, PATCH, PATCH)
    sd[v + "patch_embed.proj.bias"] = t(W)
    sd[v + "cls_token"] = t(1, 1, W)
    sd[v + "pos_embed"] = t(1, (IMG // PATCH) ** 2 + 1, W)
    for n in range(DEPTH):
        b = f"{v}blocks.{n}."
        sd[b + "norm1.weight"] = 1 + t(W)
        sd[b + "norm1.bias"] = t(W)
        sd[b + "attn.qkv.weight"] = t(3 * W, W)
        sd[b + "attn.qkv.bias"] = t(3 * W)
        sd[b + "attn.proj.weight"] = t(W, W)
        sd[b + "attn.proj.bias"] = t(W)
        sd[b + "norm2.weight"] = 1 + t(W)
        sd[b + "norm2.bias"] = t(W)
        sd[b + "mlp.fc1.weight"] = t(4 * W, W)
        sd[b + "mlp.fc1.bias"] = t(4 * W)
        sd[b + "mlp.fc2.weight"] = t(W, 4 * W)
        sd[b + "mlp.fc2.bias"] = t(W)
    sd[v + "norm.weight"] = 1 + t(W)
    sd[v + "norm.bias"] = t(W)
    sd["visual.head.proj.weight"] = t(EMBED, W)

    e = "text.transformer.embeddings."
    sd[e + "word_embeddings.weight"] = t(VOCAB, W)
    sd[e + "position_embeddings.weight"] = t(MAX_POS, W)
    sd[e + "token_type_embeddings.weight"] = t(2, W)
    sd[e + "LayerNorm.weight"] = 1 + t(W)
    sd[e + "LayerNorm.bias"] = t(W)
    for n in range(DEPTH):
        b = f"text.transformer.encoder.layer.{n}."
        for nm in ("query", "key", "value"):
            sd[b + f"attention.self.{nm}.weight"] = t(W, W)
            sd[b + f"attention.self.{nm}.bias"] = t(W)
        sd[b + "attention.output.dense.weight"] = t(W, W)
        sd[b + "attention.output.dense.bias"] = t(W)
        sd[b + "attention.output.LayerNorm.weight"] = 1 + t(W)
        sd[b + "attention.output.LayerNorm.bias"] = t(W)
        sd[b + "intermediate.dense.weight"] = t(4 * W, W)
        sd[b + "intermediate.dense.bias"] = t(4 * W)
        sd[b + "output.dense.weight"] = t(W, 4 * W)
        sd[b + "output.dense.bias"] = t(W)
        sd[b + "output.LayerNorm.weight"] = 1 + t(W)
        sd[b + "output.LayerNorm.bias"] = t(W)
    h = (W + EMBED) // 2
    sd["text.proj.0.weight"] = t(h, W)
    sd["text.proj.0.bias"] = t(h)
    sd["text.proj.2.weight"] = t(EMBED, h)
    sd["logit_scale"] = torch.tensor(float(np.log(1 / 0.07)))
    return sd


@pytest.fixture(scope="module")
def converted_npz(tmp_path_factory):
    flat = convert_open_clip(_small_state_dict())
    path = str(tmp_path_factory.mktemp("conv") / "small_biomedclip.npz")
    np.savez(path, **flat)
    return path


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "lesion",
             "patient", "a", "is", "mm", "##s", "of", "on", "torso", "male"]
    assert len(words) == VOCAB
    (d / "vocab.txt").write_text("\n".join(words) + "\n")
    (d / "tokenizer_config.json").write_text(
        '{"tokenizer_class": "BertTokenizer", "do_lower_case": true}'
    )
    return str(d)


@pytest.fixture()
def flagship_build(monkeypatch):
    """Real pipeline with matching small towers (NOT the hash tokenizer —
    the --pretrained path requires the real WordPiece adapter)."""
    import mamba_clip_tpu.pipeline as P

    def small(**kw):
        from mamba_clip_tpu.models.clip import ClipModel
        from mamba_clip_tpu.models.text_bert import TextBert
        from mamba_clip_tpu.models.vit import VisionTransformer

        visual = VisionTransformer(
            image_size=IMG, patch_size=PATCH, width=W, depth=DEPTH,
            num_heads=HEADS, embed_dim=EMBED, name="visual",
        )
        text = TextBert(
            vocab_size=VOCAB, context_length=CTX, width=W, depth=DEPTH,
            num_heads=HEADS, embed_dim=EMBED, name="text",
        )
        return ClipModel(visual=visual, text=text)

    monkeypatch.setattr(P, "build_clip", small)
    return P


def _args(tmp_path, vocab_dir, **kw):
    base = dict(
        synthetic_data=True, model_stage_1="biomedclip", batch_size=8,
        epochs=1, train_num_samples=16, val_num_samples=8, lr=1e-3,
        warmup=0, precision="fp32", logs=str(tmp_path), workers=1,
        log_every_n_steps=10, force_image_size=[IMG], save_most_recent=True,
        num_classes=2, tokenizer=vocab_dir,
    )
    base.update(kw)
    return Args(**base)


def _npz(path):
    return dict(np.load(path).items())


def _final_params(tmp_path, name, stage):
    # template-free raw read of the saved pytree
    import orbax.checkpoint as ocp

    path = os.path.join(
        str(tmp_path), name, "checkpoints", f"stage_{stage}_epoch_latest"
    )
    with ocp.PyTreeCheckpointer() as ptc:
        restored = ptc.restore(path)
    return restored["params"]


def test_pretrained_two_stage_composition(flagship_build, converted_npz,
                                          vocab_dir, tmp_path):
    P = flagship_build
    flat = _npz(converted_npz)

    # ---- stage 1: graft + locks ----
    args1 = _args(tmp_path, vocab_dir, stage=1, name="flag-s1",
                  pretrained=converted_npz, lock_image=True, lock_text=True)
    m1 = P.pipeline(args1)
    assert m1 and np.isfinite(m1["val_loss"])

    p1 = _final_params(tmp_path, "flag-s1", 1)
    # locked trunks: bit-identical to the converted weights after training
    for key in ("visual/patch_embed/kernel", "visual/block1/attn/qkv/kernel",
                "visual/norm/scale", "text/tok_emb/embedding",
                "text/block0/fc1/kernel", "text/ln_emb/scale"):
        parts = key.split("/")
        leaf = p1
        for q in parts:
            leaf = leaf[q]
        np.testing.assert_array_equal(
            np.asarray(leaf), flat[key], err_msg=key)
    # unlocked projections + logit_scale actually trained
    assert not np.array_equal(
        np.asarray(p1["visual"]["proj"]["kernel"]), flat["visual/proj/kernel"])
    assert not np.array_equal(
        np.asarray(p1["text"]["proj_fc2"]["kernel"]),
        flat["text/proj_fc2/kernel"])
    assert float(p1["logit_scale"]) != pytest.approx(
        float(flat["logit_scale"]), abs=0)

    # ---- stage 2: consumes the stage-1 checkpoint ----
    import mamba_clip_tpu.pipeline as PP

    args2 = _args(tmp_path, vocab_dir, stage=2, name="flag-s2",
                  model="biomedclip")
    orig_clp = PP.create_log_path
    PP.create_log_path = (
        lambda a, latest=False, **kw: "flag-s1" if latest else orig_clp(a)
    )
    try:
        m2 = P.pipeline(args2)
    finally:
        PP.create_log_path = orig_clp
    assert m2 and np.isfinite(m2["val_loss"]) and "partial_auc" in m2

    # frozen CLIP inside the classifier == stage-1 final weights, exactly
    p2 = _final_params(tmp_path, "flag-s2", 2)
    for key in ("visual/patch_embed/kernel", "text/tok_emb/embedding"):
        parts = key.split("/")
        a, b = p2["clip"], p1
        for q in parts:
            a, b = a[q], b[q]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=key)
    # and the trunks are still the original converted weights
    np.testing.assert_array_equal(
        np.asarray(p2["clip"]["visual"]["norm"]["scale"]),
        flat["visual/norm/scale"])

    # ---- resume: the finished stage-1 run restores cleanly ----
    args1r = _args(tmp_path, vocab_dir, stage=1, name="flag-s1",
                   pretrained=converted_npz, lock_image=True, lock_text=True,
                   resume="latest")
    m1r = P.pipeline(args1r)  # start_epoch == epochs → eval-only pass
    assert m1r is not None
    p1r = _final_params(tmp_path, "flag-s1", 1)
    np.testing.assert_array_equal(
        np.asarray(p1r["visual"]["patch_embed"]["kernel"]),
        flat["visual/patch_embed/kernel"])


def test_pretrained_graft_at_forced_image_size(converted_npz, vocab_dir,
                                               tmp_path, monkeypatch):
    """--pretrained + --force-image-size at a NON-native resolution: the
    32px-native converted checkpoint grafts at 48px via bicubic pos-embed
    resampling (checkpoint.resample_pos_embed) instead of a strict shape
    error. Beyond-reference robustness: the torch reference parses
    --force-image-size but never wires it into model creation
    (reference: cli/main.py force_image_size, pipeline.py:207-211)."""
    import mamba_clip_tpu.pipeline as P
    from mamba_clip_tpu.checkpoint import resample_pos_embed

    def small(image_size=IMG, **kw):
        from mamba_clip_tpu.models.clip import ClipModel
        from mamba_clip_tpu.models.text_bert import TextBert
        from mamba_clip_tpu.models.vit import VisionTransformer

        visual = VisionTransformer(
            image_size=image_size, patch_size=PATCH, width=W, depth=DEPTH,
            num_heads=HEADS, embed_dim=EMBED, name="visual",
        )
        text = TextBert(
            vocab_size=VOCAB, context_length=CTX, width=W, depth=DEPTH,
            num_heads=HEADS, embed_dim=EMBED, name="text",
        )
        return ClipModel(visual=visual, text=text)

    monkeypatch.setattr(P, "build_clip", small)
    args = _args(tmp_path, vocab_dir, stage=1, name="flag-fis",
                 pretrained=converted_npz, lock_image=True, lock_text=True,
                 force_image_size=[48])  # 3x3 grid vs the checkpoint's 2x2
    m = P.pipeline(args)
    assert m and np.isfinite(m["val_loss"])

    # the locked pos table equals the bicubic resample of the converted one
    flat = _npz(converted_npz)
    p = _final_params(tmp_path, "flag-fis", 1)
    want = resample_pos_embed(flat["visual/pos_embed"], (48 // PATCH) ** 2 + 1)
    np.testing.assert_array_equal(
        np.asarray(p["visual"]["pos_embed"]), want.astype(np.float32))


def test_pretrained_missing_tensor_is_loud(flagship_build, converted_npz,
                                           vocab_dir, tmp_path):
    """--pretrained with an incomplete npz must hard-fail (strict graft),
    not train a half-random 'pretrained' model."""
    flat = _npz(converted_npz)
    flat.pop("visual/block0/attn/qkv/kernel")
    broken = str(tmp_path / "broken.npz")
    np.savez(broken, **flat)
    args = _args(tmp_path, vocab_dir, stage=1, name="flag-broken",
                 pretrained=broken)
    with pytest.raises(Exception, match="missing|qkv"):
        flagship_build.pipeline(args)
