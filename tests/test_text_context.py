"""--text-context: trimmed-context correctness.

The reference pads every report to the full 256-token context and computes
the text tower over the padding (reference: src/mamba_clip/model.py:1007;
data.py tokenizes to the tokenizer's fixed context). Trimming the padded
length is semantics-preserving because pad columns are attention-masked
(exp(-1e9) underflows to exactly 0 in the fp32 softmax) and the position
table is sliced to the input length (models/text_bert.py pos[:, :L]).
These tests pin that down:

1. the exact per-row upper bound dominates every randomized draw;
2. "auto" resolution picks a multiple-of-16 bucket >= the exact need,
   never above the model context, and arms the hard-error overflow policy;
3. identity: the same batch padded to 256 vs trimmed to the bucket gives
   (near-bitwise) equal text embeddings through a real TextBert;
4. the pipeline runs end-to-end with --text-context auto.
"""

import numpy as np
import pytest

from mamba_clip_tpu.data.dataset import synthetic_metadata
from mamba_clip_tpu.data.report_gen import (
    generate_report,
    report_token_upper_bound,
)
from mamba_clip_tpu.data.tokenizer import (
    HashTokenizer,
    measure_required_context,
    resolve_text_context,
)


def _rows(n=48, seed=3):
    df = synthetic_metadata(n, seed)
    cols = list(df.columns)
    arrays = {c: df[c].to_numpy() for c in cols}
    return [({c: arrays[c][i] for c in cols}) for i in range(n)], df


def test_upper_bound_dominates_every_draw():
    tok = HashTokenizer(context_length=4096)
    rows, _ = _rows()
    for i, row in enumerate(rows):
        for include_target in (False, True):
            bound = report_token_upper_bound(
                row, tok.count_tokens, include_target)
            rng = np.random.default_rng(i)
            draws = [generate_report(row, is_eval=True,
                                     include_target=include_target)]
            for _ in range(20):
                draws.append(generate_report(
                    row, is_eval=False, shuffle=True, dropout=0.1,
                    include_target=include_target, rng=rng))
            for t in draws:
                assert tok.count_tokens(t) <= bound


def test_auto_resolution_and_overflow_policy():
    tok = HashTokenizer(context_length=256)
    _, df = _rows(64)
    need = measure_required_context(tok, [(df, True)])
    ctx = resolve_text_context("auto", tok, [(df, True)], model_context=256)
    assert ctx % 16 == 0 and ctx >= need and ctx < 256
    assert tok.context_length == ctx and tok.on_overflow == "error"
    # every draw from the measured rows tokenizes without overflow
    rows, _ = _rows(16, seed=3)
    for i, row in enumerate(rows[:16]):
        rng = np.random.default_rng(i)
        t = generate_report(row, is_eval=False, shuffle=True, dropout=0.1,
                            include_target=True, rng=rng)
        ids = tok(t)
        assert ids.shape == (1, ctx)

    # explicit numeric: armed hard error on a too-small bucket
    tok2 = HashTokenizer(context_length=256)
    resolve_text_context("48", tok2, model_context=256)
    assert tok2.context_length == 48 and tok2.on_overflow == "error"
    long_text = " ".join(["melanoma"] * 100)
    with pytest.raises(ValueError, match="overflows"):
        tok2(long_text)

    # explicit 256 == reference semantics (silent truncation)
    tok3 = HashTokenizer(context_length=256)
    resolve_text_context("256", tok3, model_context=256)
    assert tok3.on_overflow == "truncate"
    assert tok3(" ".join(["melanoma"] * 300)).shape == (1, 256)

    # no headroom under a tiny model context -> reference padding kept
    tok4 = HashTokenizer(context_length=32)
    ctx4 = resolve_text_context("auto", tok4, [(df, True)], model_context=32)
    assert ctx4 == 32 and tok4.on_overflow == "truncate"

    # guards
    with pytest.raises(ValueError):
        resolve_text_context("512", HashTokenizer(256), model_context=256)
    with pytest.raises(ValueError):
        resolve_text_context("4", HashTokenizer(256), model_context=256)


def test_trimmed_vs_padded_embeddings_identical():
    """A batch padded to 256 and the same batch trimmed to the bucket must
    produce equal embeddings (VERDICT r4 next-round #1 'done' criterion a)."""
    import jax
    import jax.numpy as jnp

    from mamba_clip_tpu.models.text_bert import TextBert

    rows, df = _rows(8, seed=5)
    texts = [generate_report(r, is_eval=True, include_target=True)
             for r in rows]
    tok_full = HashTokenizer(context_length=256, vocab_size=512)
    tok_trim = HashTokenizer(context_length=256, vocab_size=512)
    ctx = resolve_text_context("auto", tok_trim, [(df, True)],
                               model_context=256)
    full = tok_full(texts)
    trim = tok_trim(texts)
    # trimming only removes trailing PAD columns
    np.testing.assert_array_equal(full[:, :ctx], trim)
    assert (full[:, ctx:] == 0).all()

    model = TextBert(vocab_size=512, context_length=256, width=64, depth=2,
                     num_heads=2, embed_dim=32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(full))
    e_full = np.asarray(model.apply(params, jnp.asarray(full)))
    e_trim = np.asarray(model.apply(params, jnp.asarray(trim)))
    # exp(-1e9) underflows to exactly 0 in the fp32 softmax, so the only
    # difference is summation grouping over appended zeros
    np.testing.assert_allclose(e_full, e_trim, rtol=1e-6, atol=1e-6)


def test_pipeline_runs_with_auto_context(tmp_path):
    """e2e: synthetic stage-1 with --text-context auto (tiny towers)."""
    import mamba_clip_tpu.pipeline as P
    from mamba_clip_tpu.config import Args
    from mamba_clip_tpu.models.clip import ClipModel
    from mamba_clip_tpu.models.text_bert import TextBert
    from mamba_clip_tpu.models.vit import VisionTransformer

    def small(**kw):
        visual = VisionTransformer(image_size=32, patch_size=16, width=32,
                                   depth=1, num_heads=2, embed_dim=16,
                                   name="visual")
        text = TextBert(vocab_size=512, context_length=256, width=32,
                        depth=1, num_heads=2, embed_dim=16, name="text")
        return ClipModel(visual=visual, text=text)

    orig_build, orig_tok = P.build_clip, P.get_tokenizer
    P.build_clip = small
    P.get_tokenizer = lambda name, **kw: HashTokenizer(256, 512)
    try:
        m = P.pipeline(Args(
            synthetic_data=True, model_stage_1="tiny", stage=1, batch_size=8,
            epochs=1, train_num_samples=16, val_num_samples=8, lr=1e-3,
            warmup=1, precision="fp32", logs=str(tmp_path), workers=1,
            force_image_size=[32], num_classes=2, text_context="auto",
            name="ctx-auto",
        ))
    finally:
        P.build_clip, P.get_tokenizer = orig_build, orig_tok
    assert m and np.isfinite(m["val_loss"])
