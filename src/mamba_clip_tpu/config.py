"""Typed run configuration and CLI flag system.

Single source of truth replacing the reference's dual Args-dataclass /
argparse definition (reference: src/mamba_clip/cli/main.py:9-120 dataclass,
:123-498 parser — whose defaults diverge; the reference's argparse defaults
win for CLI use, so those are the defaults here). The parser is generated
from this dataclass so flag names and defaults cannot drift.

Unlike the reference, the config is not silently mutated as global run
state; runtime-derived fields (rank, world_size, resolved paths) live in a
separate ``RunState``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field, fields
from typing import Any, List, Optional, get_args, get_origin


@dataclass
class Args:
    """All run flags. Names mirror the reference CLI one-for-one."""

    # -- data ---------------------------------------------------------------
    data_path: Optional[str] = None
    val_data_path: Optional[str] = None
    train_num_samples: Optional[int] = None
    val_num_samples: Optional[int] = None
    zero_shot: bool = False
    num_classes: Optional[int] = None
    sampling: Optional[str] = None  # instance|class|sqrt|cbrt|prog
    undersample: Optional[int] = None
    undersample_by: Optional[str] = None
    undersample_sort_by: Optional[str] = None
    add_remaining_samples: bool = False
    balanced_mixup: float = 0.0  # mixup alpha; 0 disables
    workers: int = 4
    synthetic_data: bool = False  # NEW: ISIC-shaped synthetic data (tests/bench)
    on_device_preprocess: bool = True  # NEW: fused TPU-side augment/normalize
    cache_staging: Optional[str] = None  # NEW: dir for decoded-image memmap cache

    # -- run placement / logging --------------------------------------------
    device: str = "auto"
    logs: str = "./logs/"
    log_local: bool = False
    name: Optional[str] = None
    log_every_n_steps: int = 100
    report_to: str = ""  # "", "tensorboard", "wandb", comma-sep
    wandb_notes: str = ""
    wandb_project_name: str = "mamba-clip"
    debug: bool = False
    copy_codebase: bool = False

    # -- optimization ---------------------------------------------------------
    batch_size: int = 64
    epochs: int = 1
    epochs_cooldown: Optional[int] = None
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    wd: float = 0.05
    # >=1: literal step count (reference CLI semantics); [0,1): fraction of
    # total steps (schedules.resolve_warmup — the HPO space's float warmup)
    warmup: float = 1
    skip_scheduler: bool = False
    lr_scheduler: str = "cosine"  # cosine|const|const-cooldown
    lr_restart_interval: Optional[int] = None
    lr_cooldown_end: float = 0.0
    lr_cooldown_power: float = 1.0
    accum_freq: int = 1
    grad_clip_norm: Optional[float] = None
    grad_checkpointing: bool = False

    # -- checkpointing ---------------------------------------------------------
    save_frequency: int = 1
    save_most_recent: bool = False
    # NEW: mid-epoch step checkpointing for preemption-safe training.
    # The reference checkpoints at epoch granularity only (SURVEY §5;
    # reference: pipeline.py:488-523); on preemptible TPU pods an epoch
    # can be hours. N>0 saves `<stage>_epoch_<e>_step_<m>` every N
    # optimizer steps (async, master-only) and `--resume latest` resumes
    # EXACTLY mid-epoch: the loader fast-forwards to batch m of epoch e
    # (index order is deterministic in (seed, epoch)) and the step RNG
    # folds in the restored global step.
    checkpoint_steps: int = 0
    val_frequency: int = 1
    resume: Optional[str] = None
    delete_previous_checkpoint: bool = False
    remote_sync: Optional[str] = None
    remote_sync_frequency: int = 300
    remote_sync_protocol: str = "fsspec"

    # -- precision ---------------------------------------------------------
    precision: str = "amp"  # amp|amp_bf16|amp_bfloat16|bf16|pure_bf16|fp16|pure_fp16|fp32
    # NEW: int8 quantized training (ops/quant.py) — the TPU analog of
    # --use-bnb-linear. int8 = AQT fwd+bwd dots; int8_fwd = AQT forward
    # only; int8_fast = native shared-calibration dot (ops/qdot.py, one
    # calibration per tensor per step instead of AQT's per-use six);
    # int8_fast_attn = int8_fast + the attention-interior dots (QK^T,
    # P.V and their backward dots) on the int8 MXU.
    quant: Optional[str] = None  # int8|int8_fwd|int8_fast|int8_fast_attn|int8_delayed|int8_delayed_attn|int8_serve|none
    # NEW: MLP GELU form. auto = tanh when compute dtype is bf16 (erf costs
    # more than the fc1 matmul on the TPU VPU; tanh error is 33x below bf16
    # rounding — PERF.md round-3), exact otherwise (torch parity).
    gelu: str = "auto"  # auto|exact|tanh
    # NEW: attention interior. einsum = XLA-fused QK^T/softmax/PV (the
    # reference's eager-torch semantics); flash = the Pallas TPU
    # flash-attention kernel (ops/flash_attn.py) — never materializes the
    # [B,h,T,T] probs in HBM, fwd+bwd; TPU only. Measured NEGATIVE at
    # CLIP sequence lengths (PERF.md round-4: tuned-best 1.85x slower
    # than XLA's fusion; bs-64 e2e OOMs one v5e chip) — a long-sequence
    # lever, not a recipe flag.
    attn_impl: str = "einsum"  # einsum|flash

    # -- device mesh (beyond the reference's pure DP) -----------------------
    # devices lay out as data x fsdp x model; data = all remaining. fsdp>1
    # shards params/optimizer dim 0 (ZeRO-3 style), model>1 tensor-shards
    # the last dim; the batch shards over data x fsdp.
    mesh_fsdp: int = 1
    mesh_model: int = 1

    # -- model ---------------------------------------------------------
    stage: int = 1
    model: Optional[str] = None
    model_stage_1: Optional[str] = None
    model_stage_2: Optional[str] = None
    use_inner_prod: bool = False
    use_visual_only: bool = False
    use_text_only: bool = False
    use_original_model: bool = False
    # path to a converted open_clip checkpoint (.npz from
    # tools/convert_weights.py) — the TPU equivalent of the reference's
    # implicit hf-hub pretrained fetch (model.py:1266-1281)
    pretrained: Optional[str] = None
    tokenizer: Optional[str] = None
    # NEW: tokenizer context trimming. The reference pads every report to
    # the text tower's full 256-token context (reference: model.py:1007)
    # and computes attention/GEMMs over the trailing padding — ISIC
    # reports measure p99 200 / max 205 tokens at full field population
    # (perf/report_tokens_r5.json), ~25% pure padding. N trims the padded
    # length to N (overflow = hard error); "auto" measures the dataset's
    # exact max report length with the live tokenizer (report_gen.
    # report_token_upper_bound) and rounds up to a multiple of 16; unset
    # keeps reference-parity 256. Embeddings are bit-identical either way
    # (pad columns are masked; tests/test_text_context.py).
    text_context: Optional[str] = None
    lock_image: bool = False
    lock_image_unlocked_groups: int = 0
    lock_image_freeze_bn_stats: bool = False
    lock_text: bool = False
    lock_text_unlocked_layers: int = 0
    lock_text_freeze_layer_norm: bool = True
    image_mean: Optional[List[float]] = None
    image_std: Optional[List[float]] = None
    image_interpolation: Optional[str] = None
    image_resize_mode: Optional[str] = None
    aug_cfg: List[str] = field(default_factory=list)
    force_image_size: Optional[List[int]] = None
    force_quick_gelu: bool = False
    force_patch_dropout: Optional[float] = None
    force_custom_text: bool = False
    siglip: bool = False
    use_bnb_linear: Optional[str] = None

    # -- loss ---------------------------------------------------------
    local_loss: bool = False
    gather_with_grad: bool = False
    class_weighted_loss: bool = False
    coca_caption_loss_weight: float = 2.0
    coca_contrastive_loss_weight: float = 1.0

    # -- compile / trace (torch flags kept for CLI parity; jit is always on) --
    torchscript: bool = False
    torchcompile: bool = False
    trace: bool = False

    # -- distributed ---------------------------------------------------------
    dist_url: str = "env://"
    dist_backend: str = "jax"  # reference default "nccl"; accepted + ignored
    distributed: bool = False
    ddp_static_graph: bool = False
    no_set_device_rank: bool = False
    use_bn_sync: bool = False
    horovod: bool = False

    # -- misc ---------------------------------------------------------
    seed: int = 0
    small_test: bool = False
    is_test: bool = False

    # -- HPO ---------------------------------------------------------
    hyperparameter_tuning: bool = False
    hyperparameter_strategy: str = "optuna"
    optuna_study_name: str = "mamba_clip_study"
    optuna_storage: Optional[str] = None
    training_iterations: int = 30
    eval_loss: Optional[str] = None
    study_name: str = "mamba_clip_study"
    return_best: bool = False
    hopt_direction: str = "minimize"

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def dump(self, path: str) -> None:
        """params.txt-style dump (reference: pipeline.py:259-264)."""
        with open(path, "w") as f:
            for k in sorted(self.to_dict()):
                f.write(f"{k}: {getattr(self, k)}\n")

    def replace(self, **kw) -> "Args":
        return dataclasses.replace(self, **kw)


# Flags accepted for CLI parity but deliberately without effect here, with
# the reason. This is the explicit contract (VERDICT r2 item 6): anything
# accepted-but-ignored must appear in this table; everything else parsed
# from Args has a tested effect.
IGNORED_FLAGS = {
    "torchscript": "torch-only compile mode; every step is XLA-jit-compiled",
    "torchcompile": "torch-only compile mode; every step is XLA-jit-compiled",
    "use_bnb_linear": "bitsandbytes is CUDA-only; use --quant int8 (AQT, "
                      "ops/quant.py) for TPU int8",
    "use_bn_sync": "SyncBatchNorm is a DDP construct; under pjit/shard_map "
                   "batch stats already reduce over the mesh where sharded",
    "ddp_static_graph": "DDP tuning knob; no DDP wrapper exists under pjit",
    "no_set_device_rank": "torch.cuda.set_device plumbing; JAX binds "
                          "process→device at init",
    "horovod": "alternative torch launcher; JAX distributed replaces it",
    "dist_url": "torch.distributed rendezvous URL; jax.distributed uses "
                "its coordinator env",
    "dist_backend": "nccl/gloo choice; collectives ride XLA/ICI",
    "zero_shot": "parsed by the reference and likewise never read "
                 "(cli/main.py:15)",
    "coca_caption_loss_weight": "CoCa loss weights; the reference parses "
                                "them but ships no CoCa path",
    "coca_contrastive_loss_weight": "see coca_caption_loss_weight",
    "force_custom_text": "open_clip custom-text toggle; the reference "
                         "never reads it",
    "image_resize_mode": "the reference never reads it either "
                         "(cli/main.py:66); host staging implements the "
                         "'shortest' keep-ratio mode",
}


def warn_ignored_flags(args: "Args", logger) -> list:
    """Warn (once per run) for each IGNORED_FLAGS entry set away from its
    default, so 'accepted but ignored' is loud and documented rather than
    silent."""
    hit = []
    defaults = Args()
    for name, why in IGNORED_FLAGS.items():
        if getattr(args, name, None) != getattr(defaults, name, None):
            hit.append(name)
            logger.warning(
                f"--{name.replace('_', '-')} has no effect on TPU: {why}"
            )
    return hit


@dataclass
class RunState:
    """Runtime-derived state the reference stored by mutating Args."""

    rank: int = 0
    local_rank: int = 0
    world_size: int = 1
    distributed: bool = False
    device: str = "tpu"
    name: str = ""
    log_path: Optional[str] = None
    checkpoint_path: str = ""
    tensorboard_path: str = ""
    tensorboard: bool = False
    wandb: bool = False
    resume_from: Optional[str] = None


def _flag_name(field_name: str) -> str:
    return "--" + field_name.replace("_", "-")


def _unwrap_optional(tp):
    if get_origin(tp) is not None and type(None) in get_args(tp):
        inner = [a for a in get_args(tp) if a is not type(None)]
        if len(inner) == 1:
            return inner[0]
    return tp


def arg_parser() -> argparse.ArgumentParser:
    """Generate the argparse parser from the Args dataclass."""
    parser = argparse.ArgumentParser("mamba-clip-tpu")
    for f in fields(Args):
        name = _flag_name(f.name)
        tp = _unwrap_optional(f.type if not isinstance(f.type, str) else eval(f.type))  # noqa: S307
        default = (
            f.default
            if f.default is not dataclasses.MISSING
            else (f.default_factory() if f.default_factory is not dataclasses.MISSING else None)
        )
        if tp is bool:
            parser.add_argument(name, dest=f.name, action="store_true", default=default)
            if default:  # allow turning off a default-on bool
                parser.add_argument(
                    "--no-" + name[2:], dest=f.name, action="store_false"
                )
        elif get_origin(tp) is list or tp is list or (get_origin(tp) is None and tp in (List[float], List[str])):
            elem = get_args(tp)[0] if get_args(tp) else str
            parser.add_argument(name, dest=f.name, type=elem, nargs="*", default=default)
        else:
            parser.add_argument(name, dest=f.name, type=tp, default=default)
    return parser


def parse_args(argv: Optional[List[str]] = None) -> Args:
    ns = arg_parser().parse_args(argv)
    valid = {f.name for f in fields(Args)}
    return Args(**{k: v for k, v in vars(ns).items() if k in valid})


def args_from_dict(d: dict) -> Args:
    valid = {f.name for f in fields(Args)}
    return Args(**{k: v for k, v in d.items() if k in valid})


def save_args(args: Args, path: str) -> None:
    with open(path, "w") as f:
        json.dump(args.to_dict(), f, indent=2, default=str)


def load_args(path: str) -> Args:
    with open(path) as f:
        return args_from_dict(json.load(f))
