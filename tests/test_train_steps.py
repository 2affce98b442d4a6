"""Train-step unit tests: grad accumulation (cached-negatives recipe),
precision policies, balanced mixup, logit-scale clamp in-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_clip_tpu.config import Args
from mamba_clip_tpu.data.preprocess_cfg import get_transform_config
from mamba_clip_tpu.models.clip import ClipModel, LOGIT_SCALE_MAX
from mamba_clip_tpu.models.text_bert import TextBert
from mamba_clip_tpu.models.vit import VisionTransformer
from mamba_clip_tpu.optim import build_optimizer
from mamba_clip_tpu.schedules import create_schedule
from mamba_clip_tpu.train import (
    create_train_state,
    make_classifier_train_step,
    make_clip_train_step,
)
from mamba_clip_tpu.utils.precision import get_policy


@pytest.fixture(scope="module")
def setup():
    visual = VisionTransformer(image_size=32, patch_size=16, width=32,
                               depth=1, num_heads=2, embed_dim=16,
                               name="visual")
    text = TextBert(vocab_size=128, context_length=16, width=32, depth=1,
                    num_heads=2, embed_dim=16, name="text")
    model = ClipModel(visual=visual, text=text)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng}, image=jnp.zeros((2, 32, 32, 3)),
        text=jnp.zeros((2, 16), jnp.int32),
    )
    r = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(r.integers(0, 256, (8, 40, 40, 3), dtype=np.uint8)),
        "tokens": jnp.asarray(r.integers(4, 128, (8, 16), dtype=np.int32)),
        "target": jnp.asarray(r.integers(0, 2, (8,), dtype=np.int32)),
    }
    return model, variables, batch, rng


def _step(model, variables, args, policy_name="fp32"):
    policy = get_policy(policy_name)
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    state = create_train_state(variables["params"], tx, {})
    fn = jax.jit(make_clip_train_step(model, tx, policy, args, tcfg, schedule))
    return state, fn


def test_grad_accum_cached_negatives(setup):
    """accum_freq=2 runs the two-phase cached-negatives recipe and produces
    finite loss/grads (the intent of reference train.py:199-290, SURVEY
    §2.12.6)."""
    model, variables, batch, rng = setup
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1, accum_freq=2,
                precision="fp32")
    state, fn = _step(model, variables, args)
    new_state, metrics = fn(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually moved
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree_util.tree_leaves(delta)) > 0


@pytest.mark.parametrize("precision", ["fp32", "amp", "fp16"])
def test_precision_policies(setup, precision):
    model, variables, batch, rng = setup
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1, precision=precision)
    state, fn = _step(model, variables, args, precision)
    new_state, metrics = fn(state, batch, rng)
    assert np.isfinite(float(metrics["loss"])), precision


def test_logit_scale_clamped(setup):
    model, variables, batch, rng = setup
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1, precision="fp32")
    params = dict(variables["params"])
    params["logit_scale"] = jnp.float32(10.0)  # above ln(100)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    tx = build_optimizer(args, create_schedule(args, 10))
    state = create_train_state(params, tx, {})
    fn = jax.jit(make_clip_train_step(
        model, tx, policy, args, tcfg, create_schedule(args, 10)))
    new_state, _ = fn(state, batch, rng)
    assert float(new_state.params["logit_scale"]) <= LOGIT_SCALE_MAX + 1e-6


def test_stage2_frozen_clip_not_decayed(setup):
    """The frozen CLIP subtree must stay BIT-IDENTICAL through a stage-2
    step even with weight decay on: stop_gradient zeroes grads, but AdamW's
    decoupled wd would still shrink the weights unless the subtree is
    excluded from the optimizer (reference freezes via requires_grad=False,
    model.py:1129-1131; fix = multi_transform set_to_zero over 'clip')."""
    from mamba_clip_tpu.models.heads import ClipClassifier
    from mamba_clip_tpu.optim import freeze_submodule_mask

    model, variables, batch, rng = setup
    head = ClipClassifier(clip=model.copy(name=None), num_classes=2)
    hv = head.init({"params": rng}, jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 16), jnp.int32))
    args = Args(batch_size=8, epochs=1, lr=1e-2, wd=0.05, warmup=0,
                precision="fp32", num_classes=2)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)

    def run(mask):
        tx = build_optimizer(args, schedule, trainable_mask=mask)
        state = create_train_state(hv["params"], tx, {})
        fn = jax.jit(make_classifier_train_step(
            model=head, tx=tx, policy=policy, args=args, tcfg=tcfg,
            schedule=schedule, num_classes=2, takes_text=True,
        ))
        new_state, _ = fn(state, batch, rng)
        return state, new_state

    # without the mask, wd corrupts the "frozen" towers (the round-1 bug)
    state, new_state = run(None)
    clip_delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["clip"], new_state.params["clip"])))
    assert clip_delta > 0, "expected unmasked wd to move frozen params"

    mask = freeze_submodule_mask(hv["params"], ["clip"])
    state, new_state = run(mask)
    clip_delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["clip"], new_state.params["clip"])))
    assert clip_delta == 0.0
    head_delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        {k: v for k, v in state.params.items() if k != "clip"},
        {k: v for k, v in new_state.params.items() if k != "clip"})))
    assert head_delta > 0


def test_balanced_mixup_classifier(setup):
    """Mixup produces soft targets and a finite CE loss
    (reference train.py:75-84 semantics)."""
    from mamba_clip_tpu.models.heads import ClipClassifier

    model, variables, batch, rng = setup
    head = ClipClassifier(clip=model.copy(name=None), num_classes=2)
    hv = head.init({"params": rng}, jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 16), jnp.int32))
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1, precision="fp32",
                balanced_mixup=0.3, num_classes=2)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    tx = build_optimizer(args, create_schedule(args, 10))
    state = create_train_state(hv["params"], tx, {})
    fn = jax.jit(make_classifier_train_step(
        model=head, tx=tx, policy=policy, args=args, tcfg=tcfg,
        schedule=create_schedule(args, 10), num_classes=2, takes_text=True,
    ))
    mix_batch = dict(batch)
    mix_batch["mix_image"] = batch["image"][::-1]
    mix_batch["mix_tokens"] = batch["tokens"][::-1]
    mix_batch["mix_target"] = batch["target"][::-1]
    new_state, metrics = fn(state, mix_batch, rng)
    assert np.isfinite(float(metrics["loss"]))


def test_classifier_accum_matches_full_batch(setup):
    """accum_freq=2 on the classifier path must equal accum_freq=1 at the
    same global batch — exact fp32 loss AND updated-params agreement for
    unweighted mean CE (VERDICT r2 item 3; reference train.py:199-290
    applies accum to any model)."""
    from mamba_clip_tpu.models.heads import ClipClassifier

    model, variables, batch, rng = setup
    head = ClipClassifier(clip=model.copy(name=None), num_classes=2)
    hv = head.init({"params": rng}, jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 16), jnp.int32))
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)

    def run(accum):
        args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=0,
                    precision="fp32", num_classes=2, accum_freq=accum)
        schedule = create_schedule(args, 10)
        tx = build_optimizer(args, schedule)
        state = create_train_state(hv["params"], tx, {})
        fn = jax.jit(make_classifier_train_step(
            model=head, tx=tx, policy=policy, args=args, tcfg=tcfg,
            schedule=schedule, num_classes=2, takes_text=True,
        ))
        return fn(state, batch, rng)

    s1, m1 = run(1)
    s2, m2 = run(2)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_classifier_accum_indivisible_raises(setup):
    """--accum-freq that does not divide the batch must fail loudly, never
    silently ignore (VERDICT r2: no silent accum ignore)."""
    from mamba_clip_tpu.models.heads import ClipClassifier

    model, variables, batch, rng = setup
    head = ClipClassifier(clip=model.copy(name=None), num_classes=2)
    hv = head.init({"params": rng}, jnp.zeros((2, 32, 32, 3)),
                   jnp.zeros((2, 16), jnp.int32))
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=0,
                precision="fp32", num_classes=2, accum_freq=3)
    policy = get_policy("fp32")
    tcfg = get_transform_config(None, 32, is_train=True)
    schedule = create_schedule(args, 10)
    tx = build_optimizer(args, schedule)
    state = create_train_state(hv["params"], tx, {})
    fn = jax.jit(make_classifier_train_step(
        model=head, tx=tx, policy=policy, args=args, tcfg=tcfg,
        schedule=schedule, num_classes=2, takes_text=True,
    ))
    with pytest.raises(ValueError, match="accum-freq"):
        fn(state, batch, rng)


def test_debug_adds_grad_stats(setup):
    """--debug surfaces per-subtree param/grad norms — the wandb.watch
    analog (reference pipeline.py:62-63)."""
    model, variables, batch, rng = setup
    args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1,
                precision="fp32", debug=True)
    state, fn = _step(model, variables, args)
    _, metrics = fn(state, batch, rng)
    keys = set(metrics)
    assert any(k.startswith("gnorm/") for k in keys)
    assert any(k.startswith("pnorm/") for k in keys)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


class TestDynamicLossScale:
    """GradScaler-parity dynamic scaling for the fp16 modes (VERDICT r2
    item 8; reference pipeline.py:309-310, train.py:292-305)."""

    def _state(self):
        import optax

        from mamba_clip_tpu.train import create_train_state
        from mamba_clip_tpu.utils.precision import get_policy

        params = {"w": jnp.ones((3,), jnp.float32)}
        tx = optax.adam(1e-2)
        return create_train_state(params, tx, {}, policy=get_policy("fp16")), tx

    def test_fp16_policy_initializes_scaler(self):
        state, _ = self._state()
        assert state.loss_scale is not None
        assert float(state.loss_scale.scale) == 2.0**16

    def test_inf_grad_skips_step_and_halves_scale(self):
        from mamba_clip_tpu.train import _finish_step

        state, tx = self._state()
        bad = {"w": jnp.array([jnp.inf, 1.0, 1.0], jnp.float32)}
        new_state, _, extra = _finish_step(
            state, bad, {}, tx, jnp.float32(1.0), dynamic=True, clamp=False
        )
        np.testing.assert_array_equal(
            np.asarray(new_state.params["w"]), np.asarray(state.params["w"]))
        for a, b in zip(jax.tree_util.tree_leaves(new_state.opt_state),
                        jax.tree_util.tree_leaves(state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(new_state.loss_scale.scale) == 2.0**15
        assert int(new_state.loss_scale.growth_count) == 0
        assert int(extra["skipped_steps"]) == 1
        assert int(new_state.step) == 1  # schedule keeps advancing

    def test_finite_grad_steps_and_grows_on_interval(self):
        from mamba_clip_tpu.train import _finish_step
        from mamba_clip_tpu.utils.precision import GROWTH_INTERVAL

        state, tx = self._state()
        good = {"w": jnp.full((3,), 0.5, jnp.float32)}
        new_state, _, extra = _finish_step(
            state, good, {}, tx, jnp.float32(1.0), dynamic=True, clamp=False
        )
        assert not np.allclose(np.asarray(new_state.params["w"]),
                               np.asarray(state.params["w"]))
        assert int(new_state.loss_scale.growth_count) == 1
        assert float(new_state.loss_scale.scale) == 2.0**16
        # one step before the interval boundary → scale doubles
        primed = state.replace(loss_scale=state.loss_scale.replace(
            growth_count=jnp.int32(GROWTH_INTERVAL - 1)))
        grown, _, _ = _finish_step(
            primed, good, {}, tx, jnp.float32(1.0), dynamic=True, clamp=False
        )
        assert float(grown.loss_scale.scale) == 2.0**17
        assert int(grown.loss_scale.growth_count) == 0

    def test_fp16_clip_step_reports_scale(self, setup):
        model, variables, batch, rng = setup
        args = Args(batch_size=8, epochs=1, lr=1e-3, warmup=1, precision="fp16")
        from mamba_clip_tpu.data.preprocess_cfg import get_transform_config
        from mamba_clip_tpu.optim import build_optimizer
        from mamba_clip_tpu.schedules import create_schedule
        from mamba_clip_tpu.train import create_train_state, make_clip_train_step
        from mamba_clip_tpu.utils.precision import get_policy

        policy = get_policy("fp16")
        tcfg = get_transform_config(None, 32, is_train=True)
        schedule = create_schedule(args, 10)
        tx = build_optimizer(args, schedule)
        state = create_train_state(variables["params"], tx, {}, policy=policy)
        fn = jax.jit(make_clip_train_step(model, tx, policy, args, tcfg, schedule))
        new_state, metrics = fn(state, batch, rng)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss_scale"]) == 2.0**16
        assert int(metrics["skipped_steps"]) in (0, 1)
        assert new_state.loss_scale is not None
