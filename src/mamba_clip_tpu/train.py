"""Train engine: jitted train steps + host epoch loop.

TPU re-design of the reference's train loop (reference:
src/mamba_clip/train.py:92-385). The per-batch Python work (autocast,
.to(device), backward, scaler, clip, clamp) collapses into ONE jitted
step function per stage:

  uint8 batch → on-device preprocess (ops/preprocess.py) → [balanced
  mixup] → forward (bf16 compute / fp32 params) → loss → grad → clip →
  AdamW update → logit_scale clamp (train.py:312-314)

Other reference behaviors preserved:
- gradient accumulation implements the *intended* cached-negatives recipe
  (SURVEY §2.12.6; the reference computes the concatenated feature bank
  but drops it, train.py:272-281): a no-grad pass caches features of all
  micro-batches, then each micro-batch re-forwards with grad and takes the
  InfoNCE loss against the full bank with its own slice substituted;
- balanced mixup (train.py:66-89): lam ~ Beta(alpha, 1),
  images = (1-lam)·imbalanced + lam·balanced, texts switch to the
  balanced stream when lam > 0.5, targets become soft one-hot mixes;
- throughput meters: data time, batch time, samples/s, samples/s/device
  logged every --log-every-n-steps (train.py:319-384).
"""

from __future__ import annotations

import math
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .losses import clip_loss, cross_entropy_loss, siglip_loss
from .models.clip import LOGIT_SCALE_MAX
from .ops.preprocess import eval_preprocess, train_preprocess
from .utils.logging import get_logger
from .utils.precision import Policy

logger = get_logger(__name__)


class AverageMeter:
    """Running average (reference: train.py:25-41)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = struct.field(default_factory=dict)
    # GradScaler-equivalent state; None unless the policy is dynamic (fp16)
    loss_scale: Any = None
    # --quant int8_delayed per-tensor absmax state (the "quant" variable
    # collection; empty for every other mode)
    quant_stats: Any = struct.field(default_factory=dict)

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.quant_stats:
            v["quant"] = self.quant_stats
        return v


def create_train_state(params, tx, batch_stats=None, policy=None,
                       quant_stats=None) -> TrainState:
    from .utils.precision import init_loss_scale

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats or {},
        loss_scale=(
            init_loss_scale(policy.loss_scale)
            if policy is not None and policy.dynamic_loss_scale else None
        ),
        quant_stats=quant_stats or {},
    )


def _mutable_apply(model, params, batch_stats, quant_stats, *inputs,
                   rngs, **kw):
    """model.apply with the mutable state collections threaded through.

    Returns (out, new_batch_stats, new_quant_stats). Collections that are
    empty stay out of the apply entirely (no mutable overhead for the
    common no-BN/no-delayed-quant models)."""
    variables = {"params": params}
    mutable = []
    if batch_stats:
        variables["batch_stats"] = batch_stats
        mutable.append("batch_stats")
    if quant_stats:
        variables["quant"] = quant_stats
        mutable.append("quant")
    if mutable:
        out, mut = model.apply(
            variables, *inputs, rngs=rngs, mutable=mutable, **kw
        )
        return (out, mut.get("batch_stats", batch_stats),
                mut.get("quant", quant_stats))
    return model.apply(variables, *inputs, rngs=rngs, **kw), batch_stats, \
        quant_stats


def _clamp_logit_scale(params):
    if "logit_scale" in params:
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, LOGIT_SCALE_MAX)
    return params


def _mixup(rng, args, images, tokens, targets, mix_images, mix_tokens, mix_targets,
           num_classes: int):
    """Balanced-mixup math (reference: train.py:75-84)."""
    lam = jax.random.beta(rng, args.balanced_mixup, 1.0)
    images = (1.0 - lam) * images + lam * mix_images
    if tokens is not None and mix_tokens is not None:
        tokens = jnp.where(lam > 0.5, mix_tokens, tokens)
    soft = None
    if targets is not None:
        one = jax.nn.one_hot(targets, num_classes)
        two = jax.nn.one_hot(mix_targets, num_classes)
        soft = (1.0 - lam) * one + lam * two
    return images.astype(images.dtype), tokens, soft


def _finish_step(state: TrainState, grads, new_stats, tx, s, dynamic: bool,
                 clamp: bool, new_quant=None):
    """Unscale grads by ``s`` and apply the optimizer update.

    Static path: plain update. Dynamic path (fp16 GradScaler parity,
    reference train.py:292-305): non-finite grads skip the optimizer step
    entirely (params AND opt_state keep their old values) and back off the
    scale; finite steps feed the growth counter. Returns
    (new_state, extra_metrics)."""
    from .utils.precision import update_loss_scale

    if not (isinstance(s, float) and s == 1.0):  # keep the HLO clean at ls=1
        grads = jax.tree_util.tree_map(lambda g: g / s, grads)
    if new_quant is None:
        new_quant = state.quant_stats
    gnorm = optax.global_norm(grads)
    if not dynamic:
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if clamp:
            new_params = _clamp_logit_scale(new_params)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt,
            batch_stats=new_stats, quant_stats=new_quant,
        )
        return new_state, grads, {"grad_norm": gnorm}
    finite = jnp.isfinite(gnorm)
    # zero out non-finite grads so tx.update stays NaN-free; the select
    # below discards its result on the skip path anyway
    safe = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
    )
    updates, new_opt = tx.update(safe, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if clamp:
        new_params = _clamp_logit_scale(new_params)
    sel = lambda n, o: jnp.where(finite, n, o)  # noqa: E731
    # batch_stats and quant amaxes are forward-pass observations — they
    # update even on a skipped step (matches torch: BN stats move during
    # the forward regardless of the scaler's skip decision)
    new_state = state.replace(
        step=state.step + 1,
        params=jax.tree_util.tree_map(sel, new_params, state.params),
        opt_state=jax.tree_util.tree_map(sel, new_opt, state.opt_state),
        batch_stats=new_stats,
        quant_stats=new_quant,
        loss_scale=update_loss_scale(state.loss_scale, finite),
    )
    return new_state, grads, {
        "grad_norm": gnorm,
        "loss_scale": state.loss_scale.scale,
        "skipped_steps": (~finite).astype(jnp.int32),
    }


def _debug_grad_stats(params, grads) -> Dict[str, jnp.ndarray]:
    """Per-top-level-subtree param/grad norms — the wandb.watch(model)
    analog (reference: pipeline.py:62-63 logs param/grad histograms via
    torch hooks; JAX traced fns have no hooks, so --debug surfaces named
    norm scalars through the ordinary metric sinks instead)."""
    stats = {}
    for k in params:
        stats[f"gnorm/{k}"] = optax.global_norm(grads[k])
        stats[f"pnorm/{k}"] = optax.global_norm(params[k])
    return stats


def _preprocess_train(batch_images_u8, rng, tcfg, policy: Policy):
    return train_preprocess(
        batch_images_u8, rng,
        out_size=tcfg.image_size, scale=tcfg.scale, ratio=tcfg.ratio,
        hflip=tcfg.hflip, re_prob=tcfg.re_prob, mean=tcfg.mean, std=tcfg.std,
        out_dtype=policy.compute_dtype,
        interpolation=getattr(tcfg, "interpolation", "bilinear"),
    )


def make_clip_train_step(
    model,
    tx,
    policy: Policy,
    args,
    tcfg,
    schedule: Optional[Callable] = None,
    mesh=None,
):
    """Stage-1 contrastive train step. Returns fn(state, batch, rng) ->
    (state, metrics). `batch` carries uint8 images + int32 tokens
    (+ mix_* when balanced mixup).

    With ``mesh`` and --local-loss, the InfoNCE runs inside shard_map with
    an explicit `all_gather` over the data axis and per-shard logits
    (the reference's memory-saving local_loss, loss.py:101-103); otherwise
    the loss is written over global features and pjit inserts the gather
    (gather_with_grad semantics for free)."""

    use_siglip = bool(args.siglip)
    accum = max(int(args.accum_freq), 1)
    ls = policy.loss_scale
    dynamic = bool(getattr(policy, "dynamic_loss_scale", False))
    # --lock-image-freeze-bn-stats: a locked image tower also keeps its
    # BN running stats frozen (reference: model.py lock_image_tower
    # freeze_bn_stats path) — restore the visual batch_stats subtree after
    # the forward's mutable update.
    freeze_bn = bool(
        getattr(args, "lock_image", False)
        and getattr(args, "lock_image_freeze_bn_stats", False)
    )
    use_shardmap = (
        mesh is not None
        and bool(args.local_loss)
        and int(np.prod(list(mesh.shape.values()))) > 1
    )

    def encode(params, batch_stats, quant_stats, images, tokens, rngs):
        return _mutable_apply(
            model, params, batch_stats, quant_stats,
            image=images, text=tokens, deterministic=False, rngs=rngs,
        )

    def contrastive(out):
        if use_shardmap:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .parallel.mesh import DATA_AXIS, FSDP_AXIS

            batch_axes = tuple(
                ax for ax in (DATA_AXIS, FSDP_AXIS) if mesh.shape.get(ax, 1) > 1
            ) or (DATA_AXIS,)
            spec = P(batch_axes)

            def f(img, txt, scale, bias):
                if use_siglip:
                    l = siglip_loss(img, txt, scale, bias, axis_name=batch_axes)
                else:
                    l = clip_loss(
                        img, txt, scale, axis_name=batch_axes, local_loss=True,
                        logit_bias=bias if use_siglip else None,
                    )
                return jax.lax.pmean(l, batch_axes)

            bias = out.get("logit_bias", jnp.float32(0.0))
            return shard_map(
                f, mesh=mesh, in_specs=(spec, spec, P(), P()), out_specs=P(),
                check_vma=False,
            )(out["image_features"], out["text_features"],
              out["logit_scale"], bias)
        if use_siglip:
            return siglip_loss(
                out["image_features"], out["text_features"],
                out["logit_scale"], out.get("logit_bias", jnp.float32(0.0)),
            )
        return clip_loss(
            out["image_features"], out["text_features"], out["logit_scale"],
        )

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        rng = jax.random.fold_in(rng, state.step)
        # distinct keys: preprocess, mix-preprocess, Beta lambda, dropout —
        # sharing a key between the mix augmentation stream and the lambda
        # draw would correlate the mix ratio with the crop/flip randomness
        r_pp, r_mixpp, r_lam, r_drop = jax.random.split(rng, 4)
        images = _preprocess_train(batch["image"], r_pp, tcfg, policy)
        tokens = batch.get("tokens")
        if args.balanced_mixup and "mix_image" in batch:
            mix_images = _preprocess_train(batch["mix_image"], r_mixpp, tcfg, policy)
            images, tokens, _ = _mixup(
                r_lam, args, images, tokens, None,
                mix_images, batch.get("mix_tokens"), None, 2,
            )
        rngs = {"dropout": r_drop}
        # dynamic scaling needs scaler state; states built without
        # policy= (older call sites, eval-only restores) degrade to the
        # static scale
        dyn = dynamic and state.loss_scale is not None
        ls_ = state.loss_scale.scale if dyn else ls

        if accum == 1:
            def loss_fn(params):
                out, new_stats, new_quant = encode(
                    params, state.batch_stats, state.quant_stats,
                    images, tokens, rngs,
                )
                return contrastive(out) * ls_, (out, new_stats, new_quant)

            (loss, (out, new_stats, new_quant)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            loss = loss / ls_
        else:
            mb = images.shape[0] // accum
            im_mb = images.reshape(accum, mb, *images.shape[1:])
            tk_mb = tokens.reshape(accum, mb, *tokens.shape[1:])

            # Phase 1: no-grad feature bank (the OpenCLIP cached-negatives
            # recipe the reference intended, SURVEY §2.12.6).
            def fwd(xs):
                o, _, _ = encode(
                    state.params, state.batch_stats, state.quant_stats,
                    xs[0], xs[1], rngs,
                )
                return o["image_features"], o["text_features"]

            bank_img, bank_txt = jax.lax.map(fwd, (im_mb, tk_mb))
            bank_img = jax.lax.stop_gradient(bank_img)
            bank_txt = jax.lax.stop_gradient(bank_txt)

            def micro(carry, j):
                g_acc, loss_acc, stats, qstats = carry
                im_j = jax.lax.dynamic_index_in_dim(im_mb, j, keepdims=False)
                tk_j = jax.lax.dynamic_index_in_dim(tk_mb, j, keepdims=False)

                def loss_fn(params):
                    o, new_stats, new_quant = encode(
                        params, stats, qstats, im_j, tk_j, rngs
                    )
                    bi = jax.lax.dynamic_update_index_in_dim(
                        bank_img, o["image_features"], j, 0
                    )
                    bt = jax.lax.dynamic_update_index_in_dim(
                        bank_txt, o["text_features"], j, 0
                    )
                    full = dict(
                        image_features=bi.reshape(-1, bi.shape[-1]),
                        text_features=bt.reshape(-1, bt.shape[-1]),
                        logit_scale=o["logit_scale"],
                    )
                    if "logit_bias" in o:
                        full["logit_bias"] = o["logit_bias"]
                    return contrastive(full) * ls_, (new_stats, new_quant)

                (l, (new_stats, new_quant)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, loss_acc + l, new_stats, new_quant), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss_sum, new_stats, new_quant), _ = jax.lax.scan(
                micro,
                (zero_g, 0.0, state.batch_stats, state.quant_stats),
                jnp.arange(accum),
            )
            loss = loss_sum / (ls_ * accum)
            out = {"logit_scale": jnp.exp(state.params["logit_scale"])}

        if freeze_bn and isinstance(new_stats, dict) and "visual" in new_stats:
            new_stats = {**new_stats, "visual": state.batch_stats["visual"]}
        new_state, grads, extra = _finish_step(
            state, grads, new_stats, tx, ls_, dyn, clamp=True,
            new_quant=new_quant,
        )
        metrics = {"loss": loss, "logit_scale": out["logit_scale"], **extra}
        if getattr(args, "debug", False):
            metrics.update(_debug_grad_stats(state.params, grads))
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        return new_state, metrics

    def calibrate_quant(state, batch, rng):
        """Refresh --quant int8_delayed absmax state with one forward on a
        real batch (no optimizer step): model.init calibrated the delayed
        scales on the init batch (zeros at pipeline init), so the first
        real batch re-anchors them before training starts."""
        r_pp, _, _, r_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 4
        )
        images = _preprocess_train(batch["image"], r_pp, tcfg, policy)
        _, _, new_quant = encode(
            state.params, state.batch_stats, state.quant_stats,
            images, batch.get("tokens"), {"dropout": r_drop},
        )
        return state.replace(quant_stats=new_quant)

    step_fn.calibrate_quant = jax.jit(calibrate_quant)
    return step_fn


def make_classifier_train_step(
    model,
    tx,
    policy: Policy,
    args,
    tcfg,
    schedule: Optional[Callable] = None,
    class_weights: Optional[np.ndarray] = None,
    num_classes: int = 2,
    takes_text: bool = True,
):
    """Stage-2 CE train step (frozen-CLIP ClipClassifier or VSSM/medmamba).

    The model is any module whose apply(image, text?) returns logits.

    ``--accum-freq N`` splits the batch into N equal micro-batches and
    averages their CE gradients (reference: train.py:199-290 applies
    accum_freq to any model). For equal-size micro-batches the averaged
    mean-CE gradient equals the full-batch gradient exactly (for
    *class-weighted* CE it matches the reference's accum semantics —
    average of per-micro weighted means — which differs from one
    full-batch weighted mean when class mix varies across micro-batches),
    so unlike the contrastive path no feature bank is needed."""
    weights = (
        jnp.asarray(class_weights, jnp.float32) if class_weights is not None else None
    )
    ls = policy.loss_scale
    dynamic = bool(getattr(policy, "dynamic_loss_scale", False))
    accum = max(int(args.accum_freq), 1)

    def forward(params, batch_stats, quant_stats, images, tokens, rngs):
        inputs = (images, tokens) if takes_text else (images,)
        return _mutable_apply(
            model, params, batch_stats, quant_stats, *inputs,
            deterministic=False, rngs=rngs,
        )

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        r_pp, r_mixpp, r_lam, r_drop = jax.random.split(rng, 4)
        images = _preprocess_train(batch["image"], r_pp, tcfg, policy)
        tokens = batch.get("tokens")
        targets = batch["target"]
        soft = None
        if args.balanced_mixup and "mix_image" in batch:
            mix_images = _preprocess_train(batch["mix_image"], r_mixpp, tcfg, policy)
            images, tokens, soft = _mixup(
                r_lam, args, images, tokens, targets,
                mix_images, batch.get("mix_tokens"), batch["mix_target"],
                num_classes,
            )
        rngs = {"dropout": r_drop}
        # dynamic scaling needs scaler state; states built without
        # policy= (older call sites, eval-only restores) degrade to the
        # static scale
        dyn = dynamic and state.loss_scale is not None
        ls_ = state.loss_scale.scale if dyn else ls

        tgt = soft if soft is not None else targets

        def loss_fn(params, stats, qstats, im, tk, tg):
            logits, new_stats, new_quant = forward(
                params, stats, qstats, im, tk, rngs
            )
            l = cross_entropy_loss(logits, tg, weight=weights)
            return l * ls_, (new_stats, new_quant)

        if accum == 1:
            (loss, (new_stats, new_quant)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, state.quant_stats,
              images, tokens, tgt)
            loss = loss / ls_
        else:
            if images.shape[0] % accum:
                raise ValueError(
                    f"--accum-freq {accum} must divide the per-host batch "
                    f"size {images.shape[0]} (micro-batches are equal-size "
                    "so averaged grads match the full batch exactly)"
                )
            mb = images.shape[0] // accum
            im_mb = images.reshape(accum, mb, *images.shape[1:])
            tk_mb = (
                tokens.reshape(accum, mb, *tokens.shape[1:])
                if tokens is not None else None
            )
            tg_mb = tgt.reshape(accum, mb, *tgt.shape[1:])

            def micro(carry, j):
                g_acc, loss_acc, stats, qstats = carry
                im_j = jax.lax.dynamic_index_in_dim(im_mb, j, keepdims=False)
                tk_j = (
                    jax.lax.dynamic_index_in_dim(tk_mb, j, keepdims=False)
                    if tk_mb is not None else None
                )
                tg_j = jax.lax.dynamic_index_in_dim(tg_mb, j, keepdims=False)
                (l, (new_stats, new_quant)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, stats, qstats, im_j, tk_j, tg_j)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, loss_acc + l, new_stats, new_quant), None

            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss_sum, new_stats, new_quant), _ = jax.lax.scan(
                micro,
                (zero_g, 0.0, state.batch_stats, state.quant_stats),
                jnp.arange(accum),
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss = loss_sum / (ls_ * accum)
        new_state, grads, extra = _finish_step(
            state, grads, new_stats, tx, ls_, dyn, clamp=False,
            new_quant=new_quant,
        )
        metrics = {"loss": loss, **extra}
        if getattr(args, "debug", False):
            metrics.update(_debug_grad_stats(state.params, grads))
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        return new_state, metrics

    def calibrate_quant(state, batch, rng):
        """See make_clip_train_step.calibrate_quant."""
        r_pp, _, _, r_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 4
        )
        images = _preprocess_train(batch["image"], r_pp, tcfg, policy)
        _, _, new_quant = forward(
            state.params, state.batch_stats, state.quant_stats,
            images, batch.get("tokens"), {"dropout": r_drop},
        )
        return state.replace(quant_stats=new_quant)

    step_fn.calibrate_quant = jax.jit(calibrate_quant)
    return step_fn


def train_one_epoch(
    step_fn,
    state: TrainState,
    data: Dict[str, Any],
    epoch: int,
    args,
    rng,
    run_state=None,
    tb_writer=None,
    device_put_fn=None,
    trace_dir: Optional[str] = None,
    start_batch: int = 0,
    step_ckpt_cb=None,
) -> TrainState:
    """Host epoch loop: feeds device, meters throughput
    (reference: train.py:92-385). When ``trace_dir`` is set (the --trace
    flag; the reference's TorchScript trace has no TPU analog, so it maps
    to a jax.profiler capture) steps 3-8 of the epoch are profiled.

    ``start_batch`` resumes mid-epoch (--checkpoint-steps): the loader
    fast-forwards to that batch of this epoch's deterministic index
    order, and the restored ``state.step`` keeps the in-step RNG stream
    (fold_in(rng, state.step)) exactly where it left off.
    ``step_ckpt_cb(state, epoch, batches_done)`` is invoked every
    ``args.checkpoint_steps`` optimizer steps (never on the epoch's last
    batch — the epoch-boundary checkpoint path owns that)."""
    from .data.loader import device_prefetch

    train_data = data["train"]
    train_data.set_epoch(epoch)
    loader = train_data.loader
    num_batches = loader.num_batches
    if start_batch >= num_batches > 0:
        raise ValueError(
            f"--resume from a mid-epoch checkpoint at batch {start_batch}, "
            f"but this run's epoch has only {num_batches} batches — the "
            "data/batch-size configuration changed since the checkpoint "
            "was written; mid-epoch resume is only exact under the same "
            "loader geometry"
        )
    loader.start_batch = start_batch
    sample_digits = math.ceil(math.log10(max(loader.num_samples, 1) + 1))
    world = getattr(run_state, "world_size", 1) if run_state else 1

    batch_time_m, data_time_m = AverageMeter(), AverageMeter()
    losses_m: Dict[str, AverageMeter] = {}
    end = time.perf_counter()
    window_start = end
    window_steps = 0

    it = iter(loader)
    if device_put_fn is not None:
        it = device_put_fn(it)

    tracing = False
    # trace steps 3-8 of THIS iteration (relative to start_batch, so a
    # mid-epoch-resumed run still captures a profile)
    trace_lo, trace_hi = start_batch + 3, start_batch + 8
    calibrate = getattr(step_fn, "calibrate_quant", None)
    need_calib = bool(getattr(state, "quant_stats", None)) and calibrate
    for i, batch in enumerate(it, start=start_batch):
        if need_calib:
            # --quant int8_delayed: re-anchor the absmax state on the
            # first real batch of a fresh run (step 0); resumed runs keep
            # their checkpointed scales
            need_calib = False
            if int(jax.device_get(state.step)) == 0:
                state = calibrate(state, batch, rng)
        if trace_dir and i == trace_lo and not tracing:
            try:
                jax.profiler.start_trace(trace_dir)
                tracing = True
            except Exception as e:  # backend without profiler support
                logger.warning(f"--trace: profiler unavailable ({e})")
                trace_dir = None
        data_time_m.update(time.perf_counter() - end)
        state, metrics = step_fn(state, batch, rng)
        if tracing and i == trace_hi:
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            tracing = False
            logger.info(f"profiler trace written to {trace_dir}")

        if (step_ckpt_cb is not None
                and getattr(args, "checkpoint_steps", 0) > 0
                and (i + 1) % args.checkpoint_steps == 0
                and i + 1 < num_batches):
            step_ckpt_cb(state, epoch, i + 1, num_batches=num_batches)

        window_steps += 1
        log_now = (
            i % args.log_every_n_steps == 0 or i == num_batches - 1
        )
        if log_now:
            # fetching a metric scalar is the real device barrier (on the
            # tunnel backend block_until_ready can return early)
            metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            now = time.perf_counter()
            batch_time_m.update((now - window_start) / window_steps, window_steps)
            for k, v in metrics.items():
                losses_m.setdefault(k, AverageMeter()).update(v, 1)
            bs = int(batch["image"].shape[0])
            n_done = (i + 1) * bs
            pct = 100.0 * (i + 1) / num_batches
            sps = bs * world / max(batch_time_m.val, 1e-9)
            info = " ".join(
                f"{k}: {m.val:#.5g}" for k, m in sorted(losses_m.items())
            )
            logger.info(
                f"Train Epoch: {epoch} [{n_done:>{sample_digits}}/"
                f"{loader.num_samples} ({pct:.0f}%)] {info} "
                f"data: {data_time_m.avg:.3f}s "
                f"batch: {batch_time_m.val:.3f}s "
                f"samples/s: {sps:.1f} samples/s/device: {sps / max(world,1):.1f}"
            )
            if tb_writer is not None:
                gstep = num_batches * epoch + i
                for k, v in metrics.items():
                    tb_writer.add_scalar(f"train/{k}", v, gstep)
            window_start = now
            window_steps = 0
        end = time.perf_counter()
    if tracing:
        jax.block_until_ready(state.params)
        jax.profiler.stop_trace()
    return state
