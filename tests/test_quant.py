"""int8 AQT quantized-training path (ops/quant.py, --quant int8).

The TPU analog of the reference's --use-bnb-linear CUDA path. Numerics:
fake-quantized dots with STE gradients — close to, but not equal to, the
bf16 recipe; these tests pin that the path trains (finite loss, moving
params) and that quantization actually engages (outputs differ from
unquantized, within a sane tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("aqt")

from mamba_clip_tpu.config import Args
from mamba_clip_tpu.data.preprocess_cfg import get_transform_config
from mamba_clip_tpu.models import build_clip
from mamba_clip_tpu.optim import build_optimizer
from mamba_clip_tpu.schedules import create_schedule
from mamba_clip_tpu.train import create_train_state, make_clip_train_step
from mamba_clip_tpu.utils.precision import get_policy


def _clip(quant):
    return build_clip(
        "biomedclip", image_size=32, context_length=16, vocab_size=64,
        quant=quant,
    )


def test_unknown_quant_raises():
    from mamba_clip_tpu.ops.quant import make_dot_general_cls

    with pytest.raises(ValueError, match="unknown --quant"):
        make_dot_general_cls("int4")
    assert make_dot_general_cls(None) is None
    assert make_dot_general_cls("none") is None


@pytest.mark.parametrize("quant", ["int8", "int8_fwd", "int8_fast",
                                   "int8_serve"])
def test_int8_forward_close_but_not_equal(quant):
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 32, 32, 3))
    tok = jnp.ones((2, 16), jnp.int32)

    base = _clip(None)
    vb = base.init({"params": rng}, image=img, text=tok)
    qm = _clip(quant)
    vq = qm.init({"params": rng}, image=img, text=tok)
    # same param tree (AQT only swaps the dot implementation)
    assert jax.tree_util.tree_structure(vb["params"]) == \
        jax.tree_util.tree_structure(vq["params"])

    ob = base.apply(vb, image=img, text=tok, deterministic=True)
    oq = qm.apply({"params": vb["params"]}, image=img, text=tok,
                  deterministic=True)
    a = np.asarray(ob["image_features"])
    b = np.asarray(oq["image_features"])
    assert not np.array_equal(a, b), "quantization did not engage"
    # int8 fake-quant error on unit-normalized features stays small
    assert np.max(np.abs(a - b)) < 0.2


def test_int8_fast_matches_fake_quant_ste():
    """ops/qdot.py == explicit fake-quant + STE, fwd and both grads.

    The custom VJP quantizes each tensor once (per-tensor scales) and
    reuses the int8 residuals for both backward dots; this pins its
    numerics to the dequantize-then-exact-dot reference it claims to
    implement.
    """
    import jax.numpy as jnp

    from mamba_clip_tpu.ops.qdot import (
        _absmax_scale, _quantize, int8_dense_dot)

    r = np.random.default_rng(0)
    lhs = jnp.asarray(r.normal(size=(4, 7, 16)), jnp.float32)
    rhs = jnp.asarray(r.normal(size=(16, 24)), jnp.float32)
    w = jnp.asarray(r.normal(size=(4, 7, 24)), jnp.float32)

    def fq(x):
        s = _absmax_scale(x)
        return _quantize(x, s).astype(jnp.float32) * s

    out = int8_dense_dot(lhs, rhs)
    ref = jnp.einsum("blk,kn->bln", fq(lhs), fq(rhs))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    gl, gr = jax.grad(
        lambda a, b: jnp.sum(int8_dense_dot(a, b) * w), argnums=(0, 1)
    )(lhs, rhs)
    # backward quantizes the cotangent too and reuses q(lhs)/q(rhs)
    ref_gl = jnp.einsum("bln,kn->blk", fq(w), fq(rhs))
    ref_gr = jnp.einsum("blk,bln->kn", fq(lhs), fq(w))
    np.testing.assert_allclose(np.asarray(gl), np.asarray(ref_gl), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(ref_gr), atol=1e-5)


def test_int8_serve_matches_per_channel_fake_quant():
    """int8_serve (ops/qdot.py) == fake-quant with per-channel rhs scales
    in the forward, and bf16-dequantized exact dots in the backward."""
    from mamba_clip_tpu.ops.qdot import (
        _absmax_scale, _absmax_scale_cols, _quantize, int8_serve_dot)

    r = np.random.default_rng(1)
    lhs = jnp.asarray(r.normal(size=(3, 5, 16)), jnp.float32)
    # uneven per-column dynamic range so per-channel scales matter
    rhs = jnp.asarray(r.normal(size=(16, 24)) *
                      np.geomspace(0.01, 10.0, 24), jnp.float32)
    w = jnp.asarray(r.normal(size=(3, 5, 24)), jnp.float32)

    sl = _absmax_scale(lhs)
    lhs_fq = _quantize(lhs, sl).astype(jnp.float32) * sl
    sr = _absmax_scale_cols(rhs)
    rhs_fq = jnp.clip(jnp.round(rhs / sr), -127, 127) * sr

    out = int8_serve_dot(lhs, rhs)
    ref = jnp.einsum("blk,kn->bln", lhs_fq, rhs_fq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    gl, gr = jax.grad(
        lambda a, b: jnp.sum(int8_serve_dot(a, b) * w), argnums=(0, 1)
    )(lhs, rhs)
    # backward = exact fp32 dots over the dequantized residuals (STE)
    ref_gl = jnp.einsum("bln,kn->blk", w, rhs_fq)
    ref_gr = jnp.einsum("blk,bln->kn", lhs_fq, w)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(ref_gl),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(ref_gr),
                               rtol=1e-4, atol=1e-5)


def test_int8_serve_per_channel_beats_per_tensor():
    """On weights with uneven column ranges (the serving case this mode
    exists for), per-channel scales give strictly lower quantization error
    than int8_fast's per-tensor scale."""
    from mamba_clip_tpu.ops.qdot import int8_dense_dot, int8_serve_dot

    r = np.random.default_rng(2)
    # lhs lies exactly on its int8 grid (ints, absmax pinned to 127) so
    # the error comparison isolates the WEIGHT scale granularity — with a
    # noisy lhs both modes' errors are dominated by the shared activation
    # quantization and the comparison is vacuous.
    lhs_i = r.integers(-126, 127, size=(8, 64)).astype(np.float32)
    lhs_i[0, 0] = 127.0
    lhs = jnp.asarray(lhs_i / 127.0, jnp.float32)
    rhs = jnp.asarray(r.normal(size=(64, 32)) *
                      np.geomspace(0.01, 10.0, 32), jnp.float32)
    exact = np.asarray(lhs @ rhs)
    # Per-column RELATIVE error: per-tensor scales crush the small-range
    # columns' resolution (their error is flat in absolute terms across
    # columns); per-channel scales make every column's error proportional
    # to its own range. Max-abs alone would only see the largest column,
    # where the two modes coincide by construction.
    col_norm = np.abs(exact).max(axis=0)
    rel_serve = (np.abs(np.asarray(int8_serve_dot(lhs, rhs)) - exact)
                 .max(axis=0) / col_norm)
    rel_fast = (np.abs(np.asarray(int8_dense_dot(lhs, rhs)) - exact)
                .max(axis=0) / col_norm)
    assert rel_serve.max() < rel_fast.max() / 20, (
        rel_serve.max(), rel_fast.max())
    assert rel_serve.mean() < rel_fast.mean() / 20


def test_int8_fast_rejects_non_dense_pattern():
    import jax.numpy as jnp

    from mamba_clip_tpu.ops.qdot import Int8FastDotGeneral

    dg = Int8FastDotGeneral()
    a = jnp.ones((2, 3, 4))
    b = jnp.ones((2, 4, 5))
    with pytest.raises(NotImplementedError):
        dg(a, b, (((2,), (1,)), ((0,), (0,))))  # batched contraction


@pytest.mark.parametrize("quant", ["int8", "int8_fast", "int8_fast_attn"])
def test_int8_train_step_trains(quant):
    rng = jax.random.PRNGKey(0)
    model = _clip(quant)
    variables = model.init(
        {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
        text=jnp.ones((2, 16), jnp.int32),
    )
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1,
                precision="fp32", quant=quant)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    state = create_train_state(variables["params"], tx, {})
    fn = jax.jit(make_clip_train_step(model, tx, policy, args, tcfg, schedule))
    r = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(r.integers(0, 256, (8, 40, 40, 3), dtype=np.uint8)),
        "tokens": jnp.asarray(r.integers(4, 64, (8, 16), dtype=np.int32)),
    }
    new_state, metrics = fn(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0
    delta = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(new_state.params))
    )
    assert delta > 0


def test_quant_applies_to_vssm_tower():
    """--quant engages the VSSM (medmamba) family's Denses too: quantized
    forward differs from unquantized but stays close, and grads flow."""
    from mamba_clip_tpu.models import build_classifier

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 32, 32, 3))

    def feats(quant):
        m = build_classifier("medmamba", num_classes=3, quant=quant)
        v = m.init({"params": rng}, img)
        return m, v, np.asarray(m.apply(v, img))

    m0, _, a = feats(None)
    mq, vq, b = feats("int8_fast")
    assert not np.allclose(a, b)
    assert np.max(np.abs(a - b)) < 1.0

    g = jax.grad(
        lambda p: jnp.sum(
            mq.apply({**vq, "params": p}, img) ** 2
        )
    )(vq["params"])
    in_proj_g = g["layer0"]["block0"]["self_attention"]["in_proj"]["kernel"]
    assert np.isfinite(np.asarray(in_proj_g)).all()
    assert np.abs(np.asarray(in_proj_g)).max() > 0


def test_int8_fast_sharded_step_matches_single_device():
    """--quant int8_fast under a data x fsdp x model mesh tracks the
    single-device step closely.

    The model forward runs under jit with NamedShardings (global-semantics
    SPMD), so qdot's per-tensor absmax is a GLOBAL reduction and the int8
    dots partial-sum exactly in int32 across shards. Bit-equality is NOT
    the spec though: sharding changes reduction orders in the upstream
    layernorms/matmuls by ~1 ULP, and int8 ``round()`` amplifies any such
    difference discontinuously when an element sits on a rounding
    boundary (measured: 0.2% loss delta on a full-width model — vs 1e-7
    for the unquantized step, pinned exactly by
    test_fsdp_tp_train_step_matches_replicated). This test pins that
    --quant composes with the data/fsdp/model mesh (compiles, runs, and
    stays in the quantization-noise envelope) rather than being a
    single-chip-only mode."""
    from mamba_clip_tpu.models.clip import ClipModel
    from mamba_clip_tpu.models.text_bert import TextBert
    from mamba_clip_tpu.models.vit import VisionTransformer
    from mamba_clip_tpu.ops.qdot import Int8FastDotGeneral
    from mamba_clip_tpu.parallel.mesh import (
        MeshSpec, create_mesh, data_sharding, param_sharding, replicated)

    rng = jax.random.PRNGKey(0)
    visual = VisionTransformer(
        image_size=32, patch_size=16, width=32, depth=1, num_heads=2,
        embed_dim=16, dot_general_cls=Int8FastDotGeneral, name="visual")
    text = TextBert(
        vocab_size=64, context_length=16, width=32, depth=1, num_heads=2,
        embed_dim=16, dot_general_cls=Int8FastDotGeneral, name="text")
    model = ClipModel(visual=visual, text=text)
    variables = model.init(
        {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
        text=jnp.ones((2, 16), jnp.int32),
    )
    args = Args(batch_size=16, epochs=1, lr=1e-3, warmup=1,
                precision="fp32", quant="int8_fast")
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    r = np.random.default_rng(0)
    batch = {
        "image": r.integers(0, 256, (16, 40, 40, 3), dtype=np.uint8),
        "tokens": r.integers(4, 64, (16, 16), dtype=np.int32),
    }

    results = {}
    for name, spec in [("replicated", MeshSpec()),
                       ("fsdp_tp", MeshSpec(data=2, fsdp=2, model=2))]:
        mesh = create_mesh(spec)
        state = create_train_state(variables["params"], tx, {})
        if name == "fsdp_tp":
            state = jax.device_put(state, param_sharding(mesh, state))
        else:
            state = jax.device_put(state, replicated(mesh))
        b = jax.device_put(batch, data_sharding(mesh))
        fn = jax.jit(make_clip_train_step(model, tx, policy, args, tcfg,
                                          schedule))
        with mesh:
            new_state, metrics = fn(state, b, rng)
        results[name] = (float(metrics["loss"]),
                         float(metrics["grad_norm"]),
                         jax.device_get(new_state.params))

    rep, sh = results["replicated"], results["fsdp_tp"]
    # quantization-noise envelope, not ULP equality (see docstring)
    assert np.isclose(rep[0], sh[0], rtol=1e-2)
    assert np.isclose(rep[1], sh[1], rtol=1e-1)
    # AdamW bounds each element's update by ~lr; rounding-boundary flips
    # can at most swing it to the opposite sign
    lr = 1e-3
    for a, b_ in zip(jax.tree_util.tree_leaves(rep[2]),
                     jax.tree_util.tree_leaves(sh[2])):
        diff = np.abs(np.asarray(a) - np.asarray(b_))
        assert diff.max(initial=0.0) <= 2 * lr + 1e-6, diff.max()


# ---------------------------------------------------------------------------
# attention-interior int8 dots (--quant int8_fast_attn)
# ---------------------------------------------------------------------------


def test_int8_attention_dots_close_and_differentiable():
    """int8_qk_dot / int8_pv_dot track the bf16/fp32 einsums within the
    int8 quantization envelope, forward and through both gradients
    (straight-through semantics: grads are int8 dots over the shared
    residuals, close to the exact einsum grads)."""
    from mamba_clip_tpu.ops.qdot import int8_pv_dot, int8_qk_dot

    r = np.random.default_rng(0)
    B, T, h, hd = 2, 9, 3, 8
    q = jnp.asarray(r.normal(0, 1, (B, T, h, hd)), jnp.float32)
    k = jnp.asarray(r.normal(0, 1, (B, T, h, hd)), jnp.float32)
    v = jnp.asarray(r.normal(0, 1, (B, T, h, hd)), jnp.float32)
    p = jax.nn.softmax(
        jnp.asarray(r.normal(0, 1, (B, h, T, T)), jnp.float32), axis=-1)

    def rel(a, b):
        return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))

    s_ref = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    s_q = int8_qk_dot(q, k)
    assert 0 < rel(s_q, s_ref) < 0.03  # quantized: close, not equal

    o_ref = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    o_q = int8_pv_dot(p, v)
    assert 0 < rel(o_q, o_ref) < 0.03

    def loss_q(q, k, v, p):
        return jnp.sum(int8_qk_dot(q, k) ** 2) + jnp.sum(
            int8_pv_dot(p, v) ** 2)

    def loss_ref(q, k, v, p):
        return (jnp.sum(jnp.einsum("bqhd,bkhd->bhqk", q, k) ** 2)
                + jnp.sum(jnp.einsum("bhqk,bkhd->bqhd", p, v) ** 2))

    g_q = jax.grad(loss_q, argnums=(0, 1, 2, 3))(q, k, v, p)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, p)
    for a, b in zip(g_q, g_r):
        assert rel(a, b) < 0.06, rel(a, b)


def test_int8_fast_attn_model_close_to_int8_fast():
    """The attention-interior quantization is a bounded increment on top
    of int8_fast: same tiny model/batch, forward losses agree within the
    attention quantization envelope and differ (it really engaged)."""
    rng = jax.random.PRNGKey(0)
    losses = {}
    for quant in ("int8_fast", "int8_fast_attn"):
        model = _clip(quant)
        variables = model.init(
            {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
            text=jnp.ones((2, 16), jnp.int32),
        )
        args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1,
                    precision="fp32", quant=quant)
        policy = get_policy("fp32")
        tcfg = get_transform_config(None, 32, is_train=True)
        schedule = create_schedule(args, 10)
        tx = build_optimizer(args, schedule)
        state = create_train_state(variables["params"], tx, {})
        fn = jax.jit(make_clip_train_step(model, tx, policy, args, tcfg,
                                          schedule))
        r = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(
                r.integers(0, 256, (8, 40, 40, 3), dtype=np.uint8)),
            "tokens": jnp.asarray(r.integers(4, 64, (8, 16), dtype=np.int32)),
        }
        _, metrics = fn(state, batch, rng)
        losses[quant] = float(metrics["loss"])
    assert np.isfinite(losses["int8_fast_attn"])
    assert losses["int8_fast"] != losses["int8_fast_attn"]
    assert abs(losses["int8_fast"] - losses["int8_fast_attn"]) < 0.1


# ---------------------------------------------------------------------------
# delayed scaling (--quant int8_delayed)
# ---------------------------------------------------------------------------


def test_int8_delayed_dot_matches_fake_quant_with_given_scales():
    """int8_delayed_dot == fake-quant at the CALLER's scales (fwd) with
    dynamically-calibrated STE backward (same backward as int8_fast)."""
    from mamba_clip_tpu.ops.qdot import (
        _absmax_scale, _quantize, int8_delayed_dot)

    r = np.random.default_rng(0)
    lhs = jnp.asarray(r.normal(size=(4, 7, 16)), jnp.float32)
    rhs = jnp.asarray(r.normal(size=(16, 24)), jnp.float32)
    w = jnp.asarray(r.normal(size=(4, 7, 24)), jnp.float32)
    sl = jnp.float32(0.021)  # deliberately NOT lhs's absmax scale
    sr = jnp.float32(0.013)

    def fq(x, s):
        return _quantize(x, s).astype(jnp.float32) * s

    out = int8_delayed_dot(lhs, rhs, sl, sr)
    ref = jnp.einsum("blk,kn->bln", fq(lhs, sl), fq(rhs, sr))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    gl, gr, gsl, gsr = jax.grad(
        lambda a, b, s1, s2: jnp.sum(int8_delayed_dot(a, b, s1, s2) * w),
        argnums=(0, 1, 2, 3),
    )(lhs, rhs, sl, sr)
    sg = _absmax_scale(w)
    ref_gl = jnp.einsum("bln,kn->blk", fq(w, sg), fq(rhs, sr))
    ref_gr = jnp.einsum("blk,bln->kn", fq(lhs, sl), fq(w, sg))
    np.testing.assert_allclose(np.asarray(gl), np.asarray(ref_gl), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(ref_gr), atol=1e-5)
    assert float(gsl) == 0.0 and float(gsr) == 0.0  # STE: scales carry no grad


def test_int8_delayed_dense_state_semantics():
    """The stateful injection: init calibrates on the init batch; a
    read-only apply on the same inputs equals int8_fast exactly (same
    scales); a mutable apply records the NEW batch's absmax while still
    quantizing with the OLD scales (one-step delay)."""
    from flax import linen as nn

    from mamba_clip_tpu.ops.qdot import (
        Int8DelayedDotGeneral, int8_dense_dot)

    dense = nn.Dense(8, dot_general_cls=Int8DelayedDotGeneral)
    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.normal(size=(3, 16)), jnp.float32)
    x1 = jnp.asarray(2.5 * r.normal(size=(3, 16)), jnp.float32)

    variables = dense.init(jax.random.PRNGKey(0), x0)
    q0 = jax.tree_util.tree_leaves(variables["quant"])
    kernel = variables["params"]["kernel"]
    bias = variables["params"]["bias"]
    assert len(q0) == 2  # amax_lhs, amax_rhs
    amaxes = {float(v) for v in q0}
    assert float(jnp.max(jnp.abs(x0))) in amaxes
    assert float(jnp.max(jnp.abs(kernel))) in amaxes

    # read-only apply at the calibration batch == dynamic int8_fast
    y = dense.apply(variables, x0)
    y_ref = int8_dense_dot(x0, kernel) + bias
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)

    # mutable apply on x1: quantizes with x0's scales, records x1's absmax
    y1, mut = dense.apply(variables, x1, mutable=["quant"])
    new_amaxes = {float(v) for v in jax.tree_util.tree_leaves(mut["quant"])}
    assert float(jnp.max(jnp.abs(x1))) in new_amaxes
    y1_stale = int8_dense_dot(x1 * (jnp.max(jnp.abs(x0))
                                    / jnp.max(jnp.abs(x1))), kernel)
    del y1_stale  # (structure only; exact value pinned by the dot test)
    assert not np.allclose(np.asarray(y1), np.asarray(
        int8_dense_dot(x1, kernel) + bias))  # stale scales != fresh scales


def test_int8_delayed_train_step_threads_quant_state():
    """Full stage-1 step under --quant int8_delayed: the quant collection
    initializes, updates every step, the calibration hook re-anchors it,
    and training moves (finite loss/grads, params change)."""
    rng = jax.random.PRNGKey(0)
    model = _clip("int8_delayed")
    variables = model.init(
        {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
        text=jnp.ones((2, 16), jnp.int32),
    )
    assert variables.get("quant"), "delayed mode must create quant state"
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1,
                precision="fp32", quant="int8_delayed")
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    state = create_train_state(variables["params"], tx, {},
                               quant_stats=variables["quant"])
    fn = make_clip_train_step(model, tx, policy, args, tcfg, schedule)
    jfn = jax.jit(fn)
    r = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(r.integers(0, 256, (8, 40, 40, 3), dtype=np.uint8)),
        "tokens": jnp.asarray(r.integers(4, 64, (8, 16), dtype=np.int32)),
    }

    # the calibration hook replaces the zeros-batch scales with real ones
    calibrated = fn.calibrate_quant(state, batch, rng)
    c0 = jax.tree_util.tree_leaves(state.quant_stats)
    c1 = jax.tree_util.tree_leaves(calibrated.quant_stats)
    assert any(float(a) != float(b) for a, b in zip(c0, c1))
    assert int(calibrated.step) == 0  # no optimizer step

    s1, metrics = jfn(calibrated, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    s2, _ = jfn(s1, batch, jax.random.PRNGKey(1))
    q1 = jax.tree_util.tree_leaves(s1.quant_stats)
    q2 = jax.tree_util.tree_leaves(s2.quant_stats)
    # params moved between steps, so the recorded weight amaxes move too
    assert any(float(a) != float(b) for a, b in zip(q1, q2))
    delta = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(calibrated.params),
                        jax.tree_util.tree_leaves(s1.params))
    )
    assert delta > 0


def test_int8_delayed_composes_with_remat_and_accum():
    """nn.remat (--grad-checkpointing) and --accum-freq both carry the
    mutable quant collection correctly."""
    rng = jax.random.PRNGKey(0)
    model = build_clip(
        "biomedclip", image_size=32, context_length=16, vocab_size=64,
        quant="int8_delayed", grad_checkpointing=True,
    )
    variables = model.init(
        {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
        text=jnp.ones((2, 16), jnp.int32),
    )
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1,
                precision="fp32", quant="int8_delayed", accum_freq=2)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    state = create_train_state(variables["params"], tx, {},
                               quant_stats=variables["quant"])
    fn = jax.jit(make_clip_train_step(model, tx, policy, args, tcfg, schedule))
    r = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(r.integers(0, 256, (8, 40, 40, 3), dtype=np.uint8)),
        "tokens": jnp.asarray(r.integers(4, 64, (8, 16), dtype=np.int32)),
    }
    new_state, metrics = fn(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    q0 = jax.tree_util.tree_leaves(state.quant_stats)
    q1 = jax.tree_util.tree_leaves(new_state.quant_stats)
    assert any(float(a) != float(b) for a, b in zip(q0, q1))


def test_int8_delayed_checkpoint_roundtrip(tmp_path):
    """quant_stats survive save/restore (a resumed run quantizes with the
    scales the interrupted run would have used)."""
    from mamba_clip_tpu.checkpoint import load_checkpoint, save_checkpoint

    rng = jax.random.PRNGKey(0)
    model = _clip("int8_delayed")
    variables = model.init(
        {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
        text=jnp.ones((2, 16), jnp.int32),
    )
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1, precision="fp32")
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    state = create_train_state(variables["params"], tx, {},
                               quant_stats=variables["quant"])
    # make the stats distinguishable from a fresh init
    bumped = jax.tree_util.tree_map(lambda a: a + 1.25, state.quant_stats)
    state = state.replace(quant_stats=bumped)
    path = save_checkpoint(str(tmp_path), state, epoch=1, block=True)

    fresh = create_train_state(variables["params"], tx, {},
                               quant_stats=variables["quant"])
    restored, start_epoch = load_checkpoint(path, fresh)
    assert start_epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves(bumped),
                    jax.tree_util.tree_leaves(restored.quant_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_int8_delayed_composes_with_mesh():
    """int8_delayed under a data x fsdp x model mesh: the scalar amax
    state replicates (parallel/mesh.param_sharding P() rule), the absmax
    recordings are global reductions under SPMD, and the step runs to a
    finite loss with the quant state updating."""
    from mamba_clip_tpu.models.clip import ClipModel
    from mamba_clip_tpu.models.text_bert import TextBert
    from mamba_clip_tpu.models.vit import VisionTransformer
    from mamba_clip_tpu.ops.qdot import Int8DelayedDotGeneral
    from mamba_clip_tpu.parallel.mesh import (
        MeshSpec, create_mesh, data_sharding, param_sharding)

    rng = jax.random.PRNGKey(0)
    visual = VisionTransformer(
        image_size=32, patch_size=16, width=32, depth=1, num_heads=2,
        embed_dim=16, dot_general_cls=Int8DelayedDotGeneral, name="visual")
    text = TextBert(
        vocab_size=64, context_length=16, width=32, depth=1, num_heads=2,
        embed_dim=16, dot_general_cls=Int8DelayedDotGeneral, name="text")
    model = ClipModel(visual=visual, text=text)
    variables = model.init(
        {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
        text=jnp.ones((2, 16), jnp.int32),
    )
    args = Args(batch_size=16, epochs=1, lr=1e-3, warmup=1,
                precision="fp32", quant="int8_delayed")
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    mesh = create_mesh(MeshSpec(data=2, fsdp=2, model=2))
    state = create_train_state(variables["params"], tx, {},
                               quant_stats=variables["quant"])
    state = jax.device_put(state, param_sharding(mesh, state))
    r = np.random.default_rng(0)
    batch = jax.device_put(
        {"image": r.integers(0, 256, (16, 40, 40, 3), dtype=np.uint8),
         "tokens": r.integers(4, 64, (16, 16), dtype=np.int32)},
        data_sharding(mesh))
    fn = jax.jit(make_clip_train_step(model, tx, policy, args, tcfg,
                                      schedule))
    with mesh:
        new_state, metrics = fn(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    q0 = jax.tree_util.tree_leaves(state.quant_stats)
    q1 = jax.tree_util.tree_leaves(new_state.quant_stats)
    assert any(float(a) != float(b) for a, b in zip(q0, q1))


def test_int8_delayed_applies_to_classifier_path():
    """medmamba/VSSM classifier under int8_delayed: quant state
    initializes, the classifier train step threads it, and it updates."""
    from mamba_clip_tpu.models import build_classifier
    from mamba_clip_tpu.train import make_classifier_train_step

    rng = jax.random.PRNGKey(0)
    model = build_classifier("medmamba", num_classes=3,
                             quant="int8_delayed")
    img0 = jnp.zeros((2, 32, 32, 3))
    variables = model.init({"params": rng}, img0)
    assert variables.get("quant"), "VSSM Denses must carry delayed scales"

    args = Args(batch_size=4, epochs=1, lr=1e-3, warmup=1,
                precision="fp32", quant="int8_delayed")
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    state = create_train_state(
        variables["params"], tx, variables.get("batch_stats", {}),
        quant_stats=variables["quant"])
    fn = jax.jit(make_classifier_train_step(
        model, tx, policy, args, tcfg, schedule, num_classes=3,
        takes_text=False))
    r = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(r.integers(0, 256, (4, 40, 40, 3),
                                        dtype=np.uint8)),
        "target": jnp.asarray(r.integers(0, 3, (4,), dtype=np.int32)),
    }
    new_state, metrics = fn(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    q0 = jax.tree_util.tree_leaves(state.quant_stats)
    q1 = jax.tree_util.tree_leaves(new_state.quant_stats)
    assert any(float(a) != float(b) for a, b in zip(q0, q1))


# ---------------------------------------------------------------------------
# delayed-scale attention interior (--quant int8_delayed_attn)
# ---------------------------------------------------------------------------


def test_int8_delayed_attn_dots_match_fake_quant_at_given_scales():
    """int8_qk_dot_delayed / int8_pv_dot_delayed == fake-quant at the
    caller's per-head scales (probs at the static 1/127 scale); scales
    carry zero gradient (straight-through); cotangents stay dynamically
    calibrated like int8_fast_attn's."""
    from mamba_clip_tpu.ops.qdot import (
        int8_pv_dot_delayed, int8_qk_dot_delayed)

    r = np.random.default_rng(0)
    B, T, h, hd = 2, 5, 3, 4
    q = jnp.asarray(r.normal(0, 1, (B, T, h, hd)), jnp.float32)
    k = jnp.asarray(r.normal(0, 1, (B, T, h, hd)), jnp.float32)
    v = jnp.asarray(r.normal(0, 1, (B, T, h, hd)), jnp.float32)
    p = jax.nn.softmax(
        jnp.asarray(r.normal(0, 1, (B, h, T, T)), jnp.float32), axis=-1)
    # deliberately NOT the operands' own absmax scales (delayed = stale)
    sq = jnp.asarray(r.uniform(0.01, 0.05, (1, 1, h, 1)), jnp.float32)
    sk = sq * 1.3
    sv = sq * 0.7

    def fq(x, s):
        return jnp.clip(jnp.round(x / s), -127, 127) * s

    ref_s = jnp.einsum("bqhd,bkhd->bhqk", fq(q, sq), fq(k, sk))
    got_s = int8_qk_dot_delayed(q, k, sq, sk)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               atol=1e-5)
    ref_o = jnp.einsum(
        "bhqk,bkhd->bqhd",
        jnp.clip(jnp.round(p * 127.0), 0, 127) / 127.0, fq(v, sv))
    got_o = int8_pv_dot_delayed(p, v, sv)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(ref_o),
                               atol=1e-5)

    def loss(q, k, v, p, sq, sk, sv):
        s = int8_qk_dot_delayed(q, k, sq, sk)
        return jnp.sum(int8_pv_dot_delayed(jax.nn.softmax(s, -1), v, sv) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 4, 5, 6))(q, k, v, p, sq, sk, sv)
    for g in grads[:3]:
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0
    for gs in grads[3:]:
        assert float(jnp.abs(gs).max()) == 0.0  # STE: scales carry no grad


def test_int8_delayed_attn_module_state_and_closeness():
    """FusedAttention with the delayed interior: identical params to the
    plain module, output within the int8 envelope, per-head amax state
    recorded on mutable applies and readable on eval applies."""
    from mamba_clip_tpu.models.vit import FusedAttention

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 32))
    m_ref = FusedAttention(num_heads=4, dtype=jnp.float32)
    m_q = FusedAttention(num_heads=4, dtype=jnp.float32,
                         int8_delayed_interior=True)
    vars_ref = m_ref.init(jax.random.PRNGKey(4), x)
    vars_q = m_q.init(jax.random.PRNGKey(4), x)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.allclose(a, b)),
        vars_ref["params"], vars_q["params"]))
    assert set(vars_q["quant"]) == {"amax_q", "amax_k", "amax_v"}
    assert vars_q["quant"]["amax_q"].shape == (4,)  # per-head

    o_ref = m_ref.apply(vars_ref, x)
    o_q, mut = m_q.apply(vars_q, x, mutable=["quant"])
    rel = float(jnp.linalg.norm(o_ref - o_q) / jnp.linalg.norm(o_ref))
    assert 0 < rel < 0.05  # quantized: close, not equal

    # a mutable apply on different data records that data's amax ...
    _, mut2 = m_q.apply({"params": vars_q["params"], "quant": mut["quant"]},
                        x * 2.0, mutable=["quant"])
    assert not np.allclose(np.asarray(mut["quant"]["amax_q"]),
                           np.asarray(mut2["quant"]["amax_q"]))
    # ... and an eval apply reads the stored scales without mutating
    o_eval = m_q.apply({"params": vars_q["params"], "quant": mut["quant"]}, x)
    assert o_eval.shape == o_ref.shape


def test_int8_delayed_attn_train_step_threads_quant_state():
    """Full stage-1 step under --quant int8_delayed_attn: the quant
    collection carries BOTH the Dense delayed scales and the per-head
    attention amaxes, training moves, and the loss stays within the
    quantization envelope of int8_delayed's."""
    rng = jax.random.PRNGKey(0)
    losses = {}
    for quant in ("int8_delayed", "int8_delayed_attn"):
        model = _clip(quant)
        variables = model.init(
            {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
            text=jnp.ones((2, 16), jnp.int32),
        )
        if quant == "int8_delayed_attn":
            flat = jax.tree_util.tree_leaves_with_path(variables["quant"])
            names = {str(p[-1].key) for p, _ in flat}
            assert {"amax_q", "amax_k", "amax_v"} <= names
        args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1,
                    precision="fp32", quant=quant)
        policy = get_policy("fp32")
        tcfg = get_transform_config(None, 32, is_train=True)
        schedule = create_schedule(args, 10)
        tx = build_optimizer(args, schedule)
        state = create_train_state(variables["params"], tx, {},
                                   quant_stats=variables["quant"])
        fn = make_clip_train_step(model, tx, policy, args, tcfg, schedule)
        jfn = jax.jit(fn)
        r = np.random.default_rng(0)
        batch = {
            "image": jnp.asarray(
                r.integers(0, 256, (8, 40, 40, 3), dtype=np.uint8)),
            "tokens": jnp.asarray(r.integers(4, 64, (8, 16), dtype=np.int32)),
        }
        state = fn.calibrate_quant(state, batch, rng)
        s1, metrics = jfn(state, batch, rng)
        assert np.isfinite(float(metrics["loss"]))
        # the attention amax state updates across steps
        s2, _ = jfn(s1, batch, jax.random.PRNGKey(1))
        q1 = jax.tree_util.tree_leaves(s1.quant_stats)
        q2 = jax.tree_util.tree_leaves(s2.quant_stats)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(q1, q2)
        )
        losses[quant] = float(metrics["loss"])
    assert losses["int8_delayed"] != losses["int8_delayed_attn"]
    assert abs(losses["int8_delayed"] - losses["int8_delayed_attn"]) < 0.1
