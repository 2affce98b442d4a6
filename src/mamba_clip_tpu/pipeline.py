"""Orchestration: run setup, param prep, epoch loop, two-stage dispatch.

Re-design of the reference's pipeline (reference: src/mamba_clip/pipeline.py —
``setup_paths`` :68-103, ``setup_train`` :106-202, ``prepare_params``
:205-408, ``step`` :411-527, ``pipeline`` :530-639), with the §2.12 bugs
fixed (the get_data positional misbind, the torchcompile None-return, the
resume-latest epochs==0 crash):

- stage 1: CLIP contrastive fine-tune (ViT/PubMedBERT or medmamba tower),
  checkpoints ``stage_1_epoch_<N>`` (+ ``stage_1_epoch_latest``);
- stage 2: ClipClassifier over the frozen stage-1 CLIP found via the
  latest-run convention (pipeline.py:587-636);
- lr is scaled by world size at entry (pipeline.py:532);
- "DDP wrap" is replaced by sharding: state lives replicated (or
  fsdp-sharded) on a jax Mesh, batches are sharded over the data axis, and
  the jitted train step carries all collectives.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import (
    delete_previous_checkpoint,
    get_latest_checkpoint,
    load_checkpoint,
    load_params_only,
    save_checkpoint,
    start_sync_process,
    remote_sync,
)
from .config import Args, RunState
from .data import get_data, get_metadata, undersample_data
from .data.loader import device_prefetch
from .data.tokenizer import get_tokenizer
from .eval import evaluate
from .models import ClipClassifier, build_clip, lock_mask
from .ops.flash_attn import resolve_attn_flash
from .optim import build_optimizer, freeze_submodule_mask, merge_masks
from .parallel.mesh import (
    broadcast_object,
    create_mesh,
    data_sharding,
    is_master,
    maybe_initialize_distributed,
    replicated,
)
from .schedules import create_schedule
from .train import (
    TrainState,
    create_train_state,
    make_classifier_train_step,
    make_clip_train_step,
    train_one_epoch,
)
from .utils.logging import ResultsWriter, create_log_path, get_logger, logger_setup
from .utils.precision import get_policy

logger = get_logger(__name__)

LATEST_CHECKPOINT_NAME = "epoch_latest"


def init_run(args: Args):
    """Device/mesh/rank/logging bring-up (reference: init_device,
    dist_utils.py:34-88)."""
    from .parallel.mesh import MeshSpec, enable_compilation_cache

    enable_compilation_cache()
    maybe_initialize_distributed()
    rank = jax.process_index()
    world = jax.process_count()
    run = RunState(
        rank=rank,
        world_size=world,
        distributed=world > 1,
        device=jax.devices()[0].platform,
    )
    # --debug: DEBUG log level (reference: pipeline.py:108 sets
    # args.log_level = DEBUG when args.debug); the wandb.watch(model)
    # analog (reference: pipeline.py:62-63) is per-subtree param/grad
    # norms added to the step metrics (train.py debug_grad_stats) — JAX
    # has no module hooks, so the histograms become named norm scalars.
    import logging as _logging

    logger_setup(
        rank=rank,
        log_level=_logging.DEBUG if getattr(args, "debug", False)
        else _logging.INFO,
    )
    mesh = create_mesh(
        MeshSpec(fsdp=getattr(args, "mesh_fsdp", 1) or 1,
                 model=getattr(args, "mesh_model", 1) or 1)
    )
    return run, mesh


def setup_paths(args: Args, run: RunState) -> RunState:
    """Experiment naming + dirs (reference: pipeline.py:68-103)."""
    name = args.name or create_log_path(args)
    log_base = os.path.join(args.logs, name)
    if is_master(run) and args.name is not None and os.path.exists(
        os.path.join(log_base, "checkpoints")
    ) and args.resume is None:
        raise FileExistsError(
            f"Experiment {name} already exists; use --name or --resume."
        )
    run.name = name
    run.log_path = log_base
    run.checkpoint_path = os.path.join(log_base, "checkpoints")
    run.tensorboard_path = os.path.join(log_base, "tensorboard")
    report_to = (args.report_to or "").split(",")
    run.tensorboard = "tensorboard" in report_to
    run.wandb = "wandb" in report_to
    if is_master(run):
        os.makedirs(run.checkpoint_path, exist_ok=True)
        if run.tensorboard:
            os.makedirs(run.tensorboard_path, exist_ok=True)
        args.dump(os.path.join(log_base, "params.txt"))
    if is_master(run) and args.copy_codebase:
        # snapshot the package source into the run dir (reference:
        # --copy-codebase, pipeline.py copy_codebase path)
        import shutil

        src_dir = os.path.dirname(os.path.abspath(__file__))
        dst = os.path.join(log_base, "code", "mamba_clip_tpu")
        if not os.path.exists(dst):
            shutil.copytree(src_dir, dst)
    if args.log_local:
        # per-rank log file (reference: logger_setup per-rank file redirect,
        # utils/logging.py:440-491)
        logger_setup(
            log_file=os.path.join(log_base, f"out-{run.rank}.log"),
            rank=run.rank,
        )
    return run


def parse_aug_cfg(items) -> dict:
    """--aug-cfg 'scale=0.4,1.0' 'hflip=0.3' → dict (reference: open_clip
    aug_cfg k=v list, cli --aug-cfg)."""
    out = {}
    for item in items or []:
        if "=" not in str(item):
            continue
        k, v = str(item).split("=", 1)
        parts = v.split(",")

        def conv(s):
            try:
                return float(s) if "." in s or "e" in s.lower() else int(s)
            except ValueError:
                return s

        out[k.strip()] = conv(parts[0]) if len(parts) == 1 else tuple(
            conv(p) for p in parts
        )
    return out


def setup_train(args: Args, run: RunState, checkpoint_prefix: str = "") -> RunState:
    """Resume discovery + remote-sync bring-up (reference:
    pipeline.py:106-202)."""
    resume = args.resume
    if resume == "latest":
        found = None
        if is_master(run):
            base = run.checkpoint_path
            if args.remote_sync:
                found = get_latest_checkpoint(
                    os.path.join(args.remote_sync, run.name, "checkpoints"),
                    remote=True, prefix=checkpoint_prefix,
                )
            if found is None:
                found = get_latest_checkpoint(base, prefix=checkpoint_prefix)
        found = broadcast_object(found)
        run.resume_from = found
        if found:
            logger.info(f"Resuming from latest checkpoint: {found}")
        else:
            logger.info("No latest checkpoint found; starting fresh.")
    elif resume:
        run.resume_from = resume

    if args.remote_sync and is_master(run):
        remote_dir = os.path.join(args.remote_sync, run.name)
        if not remote_sync(run.log_path, remote_dir, args.remote_sync_protocol):
            raise RuntimeError("remote sync startup validation failed")
        start_sync_process(
            run.log_path, remote_dir, args.remote_sync_frequency,
            args.remote_sync_protocol,
        )
    return run


def _tb_writer(args: Args, run: RunState):
    if not run.tensorboard or not is_master(run):
        return None
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(run.tensorboard_path)
    except Exception:
        return None


def prepare_params(
    args: Args,
    model,
    data: Dict[str, Any],
    mesh,
    run: RunState,
    stage: int,
    rng,
    takes_text: bool = True,
    class_weights=None,
    init_params=None,
    init_batch_stats=None,
    init_quant_stats=None,
):
    """Model/optimizer/schedule/state assembly (reference:
    pipeline.py:205-408). Returns everything `step` needs."""
    policy = get_policy(args.precision)
    tcfg_train = data.get("tcfg_train")
    B = args.batch_size
    img = jnp.zeros((2, tcfg_train.image_size, tcfg_train.image_size, 3),
                    policy.compute_dtype)
    text_mod = getattr(model, "text", None) or getattr(
        getattr(model, "clip", None), "text", None
    )
    ctx = getattr(text_mod, "context_length", 256)
    tok = jnp.zeros((2, ctx), jnp.int32)

    if init_params is None:
        if stage == 1 and takes_text:
            variables = model.init({"params": rng, "dropout": rng}, image=img, text=tok)
        elif takes_text:
            variables = model.init({"params": rng, "dropout": rng}, img, tok)
        else:
            variables = model.init({"params": rng, "dropout": rng}, img)
        init_params = variables["params"]
        init_batch_stats = variables.get("batch_stats", {})
        # --quant int8_delayed absmax state; re-anchored on the first real
        # batch by train_one_epoch's calibration pass
        init_quant_stats = variables.get("quant", {})
        if getattr(args, "pretrained", None) and "visual" in init_params:
            # converted open_clip weights (tools/convert_weights.py) — the
            # TPU analog of the reference's hub-pretrained start
            # (model.py:1266-1281)
            from .checkpoint import load_torch_clip

            init_params = load_torch_clip(args.pretrained, init_params)
            logger.info(f"Loaded pretrained CLIP weights from {args.pretrained}")

    # bf16/pure_bf16/pure_fp16 keep the PARAMS (and thus optimizer moments)
    # in the low-precision dtype (reference: model.to(bf16) under
    # --precision pure_bf16, amp_utils.py:19-52); amp keeps fp32 masters.
    if policy.param_dtype != jnp.float32:
        init_params = policy.cast_to_param(init_params)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(init_params))
    logger.info(f"Model parameters: {n_params / 1e6:.2f}M")

    # One optimizer step per loader batch — accumulation splits each batch
    # into micro-batches INSIDE the jitted step (train.py cached-negatives
    # recipe), unlike the reference where the loader yields micro-batches
    # and the effective batch is batch_size*accum (train.py:199-290). So the
    # schedule horizon is num_batches, NOT num_batches//accum_freq.
    steps_per_epoch = data["train"].num_batches if "train" in data else 0
    total_steps = steps_per_epoch * args.epochs
    schedule = create_schedule(args, total_steps) if total_steps else None

    mask = None
    if stage == 1 and (args.lock_image or args.lock_text) and takes_text:
        mask = lock_mask(
            {"params": init_params},
            lock_image=args.lock_image,
            lock_image_unlocked_groups=args.lock_image_unlocked_groups,
            lock_text=args.lock_text,
            lock_text_unlocked_layers=args.lock_text_unlocked_layers,
            lock_text_freeze_layer_norm=args.lock_text_freeze_layer_norm,
        )["params"]
    # Frozen submodules (stage-2 grafted CLIP / MambaVision backbone) must be
    # excluded from the optimizer: the model's stop_gradient only zeroes
    # grads — AdamW's decoupled weight decay would still shrink the "frozen"
    # weights every step (reference freezes via requires_grad=False, which
    # removes them from the optimizer entirely; model.py:1129-1131).
    frozen = [
        name for name, flag in (("clip", "freeze_clip"),
                                ("backbone", "freeze_backbone"))
        if getattr(model, flag, False) and name in init_params
    ]
    if frozen:
        mask = merge_masks(mask, freeze_submodule_mask(init_params, frozen))
    tx = build_optimizer(args, schedule, trainable_mask=mask)
    state = create_train_state(init_params, tx, init_batch_stats,
                               policy=policy, quant_stats=init_quant_stats)

    # Place state on the mesh: replicated under pure DP (the reference's
    # mode); fsdp/model axes >1 shard params AND optimizer moments
    # (param_sharding rule — the moments mirror param shapes).
    if mesh.shape["fsdp"] > 1 or mesh.shape["model"] > 1:
        from .parallel.mesh import param_sharding

        state = jax.device_put(state, param_sharding(mesh, state))
    else:
        state = jax.device_put(state, replicated(mesh))

    start_epoch = 0
    start_batch = 0
    if run.resume_from:
        # eval-only runs may restore params without the optimizer tree
        # (their optimizer has no schedule); training resumes stay strict
        state, start_epoch = load_checkpoint(
            run.resume_from, state, allow_partial=bool(args.is_test)
        )
        # mid-epoch step checkpoint (--checkpoint-steps): the name carries
        # the batch offset within start_epoch; the payload schema is the
        # same as an epoch checkpoint (old checkpoints stay loadable)
        from .checkpoint import parse_step_checkpoint

        parsed = parse_step_checkpoint(run.resume_from)
        if parsed is not None:
            start_batch = parsed[1]
            from .checkpoint import validate_step_resume

            validate_step_resume(
                run.resume_from, args.batch_size,
                num_batches=(data["train"].num_batches
                             if "train" in data else None),
            )
            logger.info(
                f"Resumed mid-epoch checkpoint (epoch {start_epoch}, "
                f"batch {start_batch})"
            )
        else:
            logger.info(f"Resumed checkpoint (start epoch {start_epoch})")

    if stage == 1 and takes_text:
        step_fn = make_clip_train_step(
            model, tx, policy, args, tcfg_train, schedule, mesh=mesh
        )
    else:
        step_fn = make_classifier_train_step(
            model, tx, policy, args, tcfg_train, schedule,
            class_weights=class_weights if args.class_weighted_loss else None,
            num_classes=args.num_classes or 2,
            takes_text=takes_text,
        )
    step_fn = jax.jit(step_fn, donate_argnums=(0,))

    writer = _tb_writer(args, run)
    return dict(
        state=state, step_fn=step_fn, schedule=schedule, policy=policy,
        start_epoch=start_epoch, start_batch=start_batch, writer=writer,
        mask=mask,
    )


def step(
    args: Args,
    run: RunState,
    model,
    data: Dict[str, Any],
    params: Dict[str, Any],
    mesh,
    rng,
    save_prefix: str = "",
    stage: int = 1,
    takes_text: bool = True,
    class_weights=None,
):
    """Epoch loop (reference: pipeline.py:411-527)."""
    state: TrainState = params["state"]
    step_fn = params["step_fn"]
    policy = params["policy"]
    writer = params["writer"]
    tcfg_val = data.get("tcfg_val")
    results = ResultsWriter(os.path.join(run.checkpoint_path, "results.jsonl")) \
        if is_master(run) else None

    n_shards = mesh.shape["data"] * mesh.shape["fsdp"]
    if args.batch_size % n_shards:
        raise ValueError(
            f"--batch-size {args.batch_size} must be divisible by the "
            f"{n_shards}-way data sharding of the device mesh"
        )
    in_shard = data_sharding(mesh)

    def put(it):
        return device_prefetch(it, sharding=in_shard)

    if run.wandb and is_master(run):
        from .utils import wandb_utils

        wandb_utils.init_wandb(args, run)

    trace_dir = (
        os.path.join(run.log_path, "trace") if args.trace and is_master(run) else None
    )

    from .eval import make_eval_step

    # every rank evaluates its host-local shard (see eval.evaluate)
    eval_step = make_eval_step(
        model, policy, tcfg_val, stage=stage,
        class_weights=class_weights if args.class_weighted_loss else None,
        takes_text=takes_text,
    )

    step_ckptr = None
    if args.checkpoint_steps > 0 and is_master(run):
        from .checkpoint import StepCheckpointer

        step_ckptr = StepCheckpointer(
            run.checkpoint_path, args, prefix=save_prefix
        )

    metrics = None
    best = None
    for epoch in range(params["start_epoch"], args.epochs):
        if is_master(run):
            logger.info(f"Start epoch {epoch}")
        first = epoch == params["start_epoch"]
        state = train_one_epoch(
            step_fn, state, data, epoch, args, rng,
            run_state=run, tb_writer=writer, device_put_fn=put,
            trace_dir=trace_dir if first else None,
            start_batch=params.get("start_batch", 0) if first else 0,
            step_ckpt_cb=step_ckptr,
        )
        completed = epoch + 1

        _metrics = evaluate(
            model, state, data, completed, args, policy, tcfg_val,
            run_state=run, stage=stage, results_writer=results,
            tb_writer=writer,
            class_weights=class_weights if args.class_weighted_loss else None,
            takes_text=takes_text, eval_step=eval_step,
        )
        if (args.return_best and args.eval_loss
                and _metrics and args.eval_loss in _metrics):
            better = (
                best is None
                or ("min" in args.hopt_direction
                    and _metrics[args.eval_loss] < best[args.eval_loss])
                or ("max" in args.hopt_direction
                    and _metrics[args.eval_loss] > best[args.eval_loss])
            )
            if better:
                best = _metrics
            metrics = best
        elif _metrics:
            metrics = _metrics

        if is_master(run):
            should_save = completed == args.epochs or (
                args.save_frequency > 0 and completed % args.save_frequency == 0
            )
            if should_save:
                save_checkpoint(
                    run.checkpoint_path, state, completed, args,
                    name=f"{save_prefix}epoch_{completed}",
                )
            if args.delete_previous_checkpoint:
                delete_previous_checkpoint(
                    run.checkpoint_path, completed, prefix=save_prefix
                )
            if args.save_most_recent:
                save_checkpoint(
                    run.checkpoint_path, state, completed, args,
                    name=f"{save_prefix}{LATEST_CHECKPOINT_NAME}",
                )
    if metrics is None and params["start_epoch"] >= args.epochs:
        # resuming an already-finished run: nothing left to train — still
        # evaluate the restored state so the caller gets metrics instead of
        # a silent None (the reference's empty range(start, epochs) loop
        # returns nothing, pipeline.py:411-527; evident intent is "run it
        # again → see where it stands")
        metrics = evaluate(
            model, state, data, params["start_epoch"], args, policy,
            tcfg_val, run_state=run, stage=stage, results_writer=results,
            tb_writer=writer,
            class_weights=class_weights if args.class_weighted_loss else None,
            takes_text=takes_text, eval_step=eval_step,
        )
    # always leave a stage-latest checkpoint for stage-2 consumption
    if is_master(run) and args.epochs > 0:
        save_checkpoint(
            run.checkpoint_path, state, args.epochs, args,
            name=f"{save_prefix}{LATEST_CHECKPOINT_NAME}",
        )
    if is_master(run):
        from .checkpoint import wait_for_checkpoints

        wait_for_checkpoints()
        if step_ckptr is not None:
            # the stage's final numbered epoch checkpoint has committed;
            # the surviving mid-epoch checkpoints are now redundant
            step_ckptr.finalize()
    if run.wandb and is_master(run):
        from .utils import wandb_utils

        wandb_utils.finish()
    return metrics, state


def _build_data(args: Args, run: RunState, tokenizer, tcfg_train, tcfg_val,
                model_context: int = 256):
    def resolve_ctx(mds):
        # --text-context: trim the tokenizer's padded length to the data
        # (train/val reports carry the diagnosis sentence at stage 1, the
        # test split never does — same include_target logic as get_data)
        if tokenizer is None or not args.text_context:
            return
        from .data.tokenizer import resolve_text_context

        s1 = getattr(args, "stage", 1) == 1
        splits = [(md, s1 and split != "test")
                  for md, split in mds if md is not None]
        resolve_text_context(
            args.text_context, tokenizer, splits,
            model_context=model_context, logger=logger,
        )

    if args.synthetic_data:
        if str(args.text_context).lower() == "auto":
            # measure on the same distribution SyntheticIsicDataset draws
            from .data.dataset import synthetic_metadata

            n = min(int(args.train_num_samples or 2048), 2048)
            resolve_ctx([(synthetic_metadata(n, args.seed), "train")])
        else:
            resolve_ctx([])
        data = get_data(
            args, tokenizer=tokenizer, staging_size=tcfg_train.staging_size,
            rank=run.rank, world_size=run.world_size,
        )
    else:
        train_md, val_md, test_md = get_metadata(args)
        if args.undersample and train_md is not None:
            train_md, val_md = undersample_data(args, train_md, val_md)
        resolve_ctx([(train_md, "train"), (val_md, "val"), (test_md, "test")])
        data = get_data(
            args, train_metadata=train_md, val_metadata=val_md,
            test_metadata=test_md, tokenizer=tokenizer,
            staging_size=tcfg_train.staging_size,
            rank=run.rank, world_size=run.world_size,
        )
    data["tcfg_train"] = tcfg_train
    data["tcfg_val"] = tcfg_val
    return data


def pipeline(args: Args):
    """Two-stage dispatch (reference: pipeline.py:530-639)."""
    run, mesh = init_run(args)
    from .config import warn_ignored_flags

    warn_ignored_flags(args, logger)
    args = args.replace(lr=args.lr * run.world_size)  # pipeline.py:532
    policy = get_policy(args.precision)
    rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), run.rank)

    from .data.preprocess_cfg import get_transform_config

    image_size = (args.force_image_size or [224])[0]
    aug = parse_aug_cfg(args.aug_cfg)
    tcfg_train = get_transform_config(
        aug, image_size, is_train=True, mean=args.image_mean,
        std=args.image_std, interpolation=args.image_interpolation,
    )
    tcfg_val = get_transform_config(
        None, image_size, is_train=False, mean=args.image_mean,
        std=args.image_std, interpolation=args.image_interpolation,
    )

    metrics = None
    stage1_name = args.model_stage_1 or args.model or "biomedclip"
    # experiment names carry the resolved model so the stage-2 latest-run
    # lookup (create_log_path(latest=True)) can find stage-1 runs
    args = args.replace(model=args.model or stage1_name)
    # classifier-family models (the optuna model zoo, optuna.py:85-114):
    # medmamba/vssm and mambavision train the CE path, not contrastive
    is_medmamba_cls = args.stage == 1 and (
        stage1_name.lower() in ("medmamba", "vssm")
        or "mambavision" in stage1_name.lower()
    )

    if args.stage == 1:
        takes_text = not (args.use_visual_only or is_medmamba_cls)
        tokenizer = get_tokenizer(
            args.tokenizer or stage1_name,
            require_real=bool(args.pretrained),
        ) if takes_text else None
        if is_medmamba_cls:
            from .models import build_classifier

            model = build_classifier(
                stage1_name, num_classes=args.num_classes or 2,
                dtype=policy.compute_dtype,
                grad_checkpointing=args.grad_checkpointing,
                quant=args.quant,
            )
        else:
            model = build_clip(
                model_name=stage1_name,
                image_size=image_size,
                quick_gelu=args.force_quick_gelu,
                patch_dropout=args.force_patch_dropout or 0.0,
                grad_checkpointing=args.grad_checkpointing,
                siglip=args.siglip,
                dtype=policy.compute_dtype,
                quant=args.quant,
                gelu=args.gelu,
                attn_flash=resolve_attn_flash(args.attn_impl),
            )
        data = _build_data(
            args, run, tokenizer, tcfg_train, tcfg_val,
            model_context=getattr(
                getattr(model, "text", None), "context_length", 256),
        )
        run = setup_paths(args, run)
        run = setup_train(args, run, checkpoint_prefix=f"stage_{args.stage}_")
        cw = data["train"].class_weights if "train" in data else None
        params = prepare_params(
            args, model, data, mesh, run, stage=1 if takes_text else 2,
            rng=rng, takes_text=takes_text, class_weights=cw,
        )
        if "train" not in data:
            from .eval import make_eval_step

            metrics = evaluate(
                model, params["state"], data, params["start_epoch"], args,
                params["policy"], tcfg_val, run_state=run,
                stage=1 if takes_text else 2, takes_text=takes_text,
                eval_step=make_eval_step(
                    model, params["policy"], tcfg_val,
                    stage=1 if takes_text else 2, class_weights=cw,
                    takes_text=takes_text,
                ),
            )
        else:
            metrics, _ = step(
                args, run, model, data, params, mesh, rng,
                save_prefix=f"stage_{args.stage}_",
                stage=1 if takes_text else 2,
                takes_text=takes_text, class_weights=cw,
            )
    elif args.stage == 2:
        tokenizer = get_tokenizer(
            args.tokenizer or stage1_name,
            require_real=bool(args.pretrained),
        )
        clip = build_clip(
            model_name=stage1_name, image_size=image_size,
            quick_gelu=args.force_quick_gelu, dtype=policy.compute_dtype,
            quant=args.quant, gelu=args.gelu,
            attn_flash=resolve_attn_flash(args.attn_impl),
        )
        model = ClipClassifier(
            clip=clip,
            num_classes=args.num_classes or 2,
            use_visual_only=args.use_visual_only,
            use_text_only=args.use_text_only,
            use_inner_prod=args.use_inner_prod,
        )
        data = _build_data(
            args, run, tokenizer, tcfg_train, tcfg_val,
            model_context=getattr(clip.text, "context_length", 256),
        )
        # Locate the stage-1 run BEFORE minting this run's own dir — the
        # reference looks up first too (pipeline.py:594-602), otherwise the
        # fresh stage-2 dir shadows it in the latest-run scan.
        s1_ckpt = None
        if not args.use_original_model:
            s1_rel = os.path.join(
                "checkpoints", f"stage_1_{LATEST_CHECKPOINT_NAME}"
            )
            try:
                s1_name = create_log_path(
                    args.replace(model=stage1_name), latest=True,
                    containing=s1_rel,
                )
                s1_ckpt = os.path.join(args.logs, s1_name, s1_rel)
            except FileNotFoundError as s1_err:
                if not args.resume:
                    raise
                # resuming a stage-2 checkpoint restores the full classifier
                # (frozen CLIP included); the stage-1 graft is only the
                # bootstrap, so a missing stage-1 run is not fatal here
                # (e.g. --is-test --resume latest in a logs dir whose
                # newest runs are stage-2) — PROVIDED the resume actually
                # resolves; checked after setup_train below.
                logger.warning(
                    "no stage-1 run with a stage_1 checkpoint found; "
                    "relying on --resume to restore the stage-2 state"
                )
                s1_missing_err = s1_err
            else:
                s1_missing_err = None
        else:
            s1_missing_err = None
        run = setup_paths(args, run)
        run = setup_train(args, run, checkpoint_prefix=f"stage_{args.stage}_")
        if s1_missing_err is not None and not run.resume_from:
            # neither stage-1 weights nor a resumable stage-2 checkpoint:
            # continuing would train/evaluate a randomly initialized CLIP
            raise FileNotFoundError(
                "stage 2 has nothing to start from: no stage-1 run with a "
                f"stage_1 checkpoint ({s1_missing_err}) and --resume "
                f"{args.resume!r} resolved to no checkpoint"
            )

        # init then graft stage-1 weights (reference: pipeline.py:594-606)
        img = jnp.zeros((2, image_size, image_size, 3), policy.compute_dtype)
        ctx = getattr(clip.text, "context_length", 256)
        tok = jnp.zeros((2, ctx), jnp.int32)
        variables = model.init({"params": rng, "dropout": rng}, img, tok)
        init_params = dict(variables["params"])
        init_stats = dict(variables.get("batch_stats", {}))
        if s1_ckpt is not None:
            ckpt = s1_ckpt
            # ClipClassifier nests the CLIP under scope "clip"
            clip_template = init_params["clip"]
            loaded, stats = load_params_only_into(ckpt, clip_template)
            init_params["clip"] = loaded
            if stats:
                init_stats["clip"] = stats
            logger.info(f"Loaded stage-1 weights from {ckpt}")
        elif args.pretrained:
            # --use-original-model + --pretrained: classify over the
            # converted hub CLIP directly (reference: pipeline.py:594-606
            # use_original_model path)
            from .checkpoint import load_torch_clip

            init_params["clip"] = load_torch_clip(
                args.pretrained, init_params["clip"]
            )
            logger.info(f"Loaded pretrained CLIP weights from {args.pretrained}")

        cw = data["train"].class_weights if "train" in data else None
        params = prepare_params(
            args, model, data, mesh, run, stage=2, rng=rng,
            takes_text=True, class_weights=cw,
            init_params=init_params, init_batch_stats=init_stats,
        )
        if "train" not in data:
            # --is-test: eval-only on the test split, writes submission.csv
            from .eval import make_eval_step

            metrics = evaluate(
                model, params["state"], data, params["start_epoch"], args,
                params["policy"], tcfg_val, run_state=run, stage=2,
                takes_text=True,
                eval_step=make_eval_step(
                    model, params["policy"], tcfg_val, stage=2,
                    class_weights=cw, takes_text=True,
                ),
            )
        else:
            metrics, _ = step(
                args, run, model, data, params, mesh, rng,
                save_prefix="stage_2_", stage=2, takes_text=True,
                class_weights=cw,
            )
    return metrics


def load_params_only_into(ckpt_path: str, template):
    """Load a stage-1 checkpoint's params into a template pytree."""
    from .checkpoint import load_params_only

    return load_params_only(ckpt_path, template)
