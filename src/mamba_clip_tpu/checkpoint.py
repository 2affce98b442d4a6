"""Checkpointing, resume discovery, remote sync.

TPU-native replacement for the reference's torch.save/fsspec stack
(reference: src/mamba_clip/utils/file_utils.py, pipeline.py:488-523):

- Orbax checkpoints of {params, opt_state, batch_stats, step, epoch}
  written per epoch as ``epoch_<N>`` plus an ``epoch_latest`` copy —
  Orbax's atomic-rename commit replaces the reference's tmp + os.replace
  dance (pipeline.py:516-523);
- ``--resume latest`` discovery: natural-sorted scan of the checkpoint dir
  (reference: generic_utils.py:22-42), master scans and the path is
  broadcast in multi-host runs (pipeline.py:158-161);
- ``--delete-previous-checkpoint`` (pipeline.py:508-514);
- remote sync: a background thread copies the checkpoint dir to a remote
  fsspec URL every --remote-sync-frequency seconds, skipping
  ``epoch_latest`` and same-size files (file_utils.py:62-80, 103-128);
- a PyTorch→JAX weight importer hook for converted reference checkpoints.
"""

from __future__ import annotations

import os
import re
import shutil
import threading
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .utils.logging import get_logger

logger = get_logger(__name__)

_EPOCH_RE = re.compile(r"epoch_(\d+)(?:_step_(\d+))?$")

# mid-epoch step checkpoints (--checkpoint-steps) are named
# `<prefix>epoch_<e>_step_<m>` with e the CURRENT 0-based epoch and m the
# batches completed in it; natural sort orders them exactly right:
# epoch_e < epoch_e_step_m < epoch_{e+1}
_STEP_SUFFIX_RE = re.compile(r"epoch_(\d+)_step_(\d+)$")
# matches a step checkpoint ANYWHERE in a relative path (remote_sync walks
# files inside the checkpoint dirs)
_STEP_SKIP_RE = re.compile(r"epoch_\d+_step_\d+(?:\.meta\.json)?(?:/|$)")


def parse_step_checkpoint(path: str):
    """(epoch, batches_done) if `path` is a mid-epoch step checkpoint,
    else None."""
    m = _STEP_SUFFIX_RE.search(os.path.basename(path.rstrip("/")))
    return (int(m.group(1)), int(m.group(2))) if m else None


def validate_step_resume(
    path: str, batch_size: int, num_batches: Optional[int] = None
) -> None:
    """Check a step checkpoint's sidecar against this run's loader
    geometry. The stored batch offset is only meaningful under the batch
    size AND epoch length it was written with — fast-forwarding `m`
    batches over a different-length index permutation would silently
    misalign the epoch (some samples seen twice, some never), so a
    mismatch is an error. Checkpoints without a sidecar (older runs)
    skip the check; pass ``num_batches=None`` to skip the length check."""
    meta_path = path.rstrip("/") + ".meta.json"
    if not os.path.exists(meta_path):
        return
    import json

    with open(meta_path) as f:
        meta = json.load(f)
    if (meta.get("batch_size") is not None
            and meta["batch_size"] != batch_size):
        raise ValueError(
            f"mid-epoch checkpoint {path} was written at --batch-size "
            f"{meta['batch_size']}; resuming at {batch_size} would "
            "fast-forward a different sample offset. Use the original "
            "batch size (or resume from an epoch checkpoint)."
        )
    if (num_batches is not None and meta.get("num_batches") is not None
            and meta["num_batches"] != num_batches):
        raise ValueError(
            f"mid-epoch checkpoint {path} was written over an epoch of "
            f"{meta['num_batches']} batches; this run's epoch has "
            f"{num_batches} — the dataset changed, so the stored batch "
            "offset points at different samples. Resume from an epoch "
            "checkpoint instead."
        )


def natural_key(s: str):
    """Natural sort key (reference: generic_utils.py:22-42)."""
    return [int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", s)]


def get_latest_checkpoint(
    path: str, remote: bool = False, prefix: str = ""
) -> Optional[str]:
    """Newest ``[<prefix>]epoch_<N>`` checkpoint under `path` (local or
    fsspec remote). Checkpoints are written as ``stage_<S>_epoch_<N>``
    (pipeline save_prefix), so discovery matches numbered epochs with the
    given stage prefix and skips ``epoch_latest``."""
    names = []
    if remote:
        import fsspec

        fs, root = fsspec.core.url_to_fs(path)
        try:
            names = [os.path.basename(p.rstrip("/")) for p in fs.ls(root)]
        except FileNotFoundError:
            return None
    elif os.path.isdir(path):
        names = os.listdir(path)
    cands = [
        n for n in names
        if n.startswith(prefix) and _EPOCH_RE.search(n)
    ]
    if not cands:
        return None
    cands.sort(key=natural_key)
    return os.path.join(path, cands[-1])


_ckptr_singleton = None


def _checkpointer():
    global _ckptr_singleton
    if _ckptr_singleton is None:
        import orbax.checkpoint as ocp

        _ckptr_singleton = ocp.StandardCheckpointer()
    return _ckptr_singleton


def wait_for_checkpoints() -> None:
    """Block until all async checkpoint writes have committed."""
    if _ckptr_singleton is not None:
        _ckptr_singleton.wait_until_finished()


def save_checkpoint(
    ckpt_dir: str,
    state,
    epoch: int,
    args=None,
    name: Optional[str] = None,
    block: bool = False,
) -> str:
    """Write epoch_<N> (+ epoch_latest if --save-most-recent); honor
    save_frequency/delete-previous at the call site (pipeline).

    Async by default: Orbax stages the arrays and commits with an atomic
    rename in the background (replacing the reference's tmp + os.replace,
    pipeline.py:516-523); training overlaps the write. Call
    :func:`wait_for_checkpoints` (or pass block=True) to ensure
    durability."""
    os.makedirs(ckpt_dir, exist_ok=True)
    tag = name or f"epoch_{epoch}"
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "batch_stats": jax.device_get(state.batch_stats) or {},
        "step": int(jax.device_get(state.step)),
        "epoch": epoch,
    }
    if getattr(state, "loss_scale", None) is not None:
        # dynamic fp16 GradScaler state (reference checkpoints
        # scaler.state_dict(), pipeline.py:494-496): without it a resume
        # would reset to 2^16 and skip steps until backoff re-converges.
        payload["loss_scale"] = {
            "scale": float(jax.device_get(state.loss_scale.scale)),
            "growth_count": int(jax.device_get(state.loss_scale.growth_count)),
        }
    if getattr(state, "quant_stats", None):
        # --quant int8_delayed absmax state: a resume must quantize with
        # the same scales the interrupted run would have used.
        payload["quant_stats"] = jax.device_get(state.quant_stats)
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # one in-flight save at a time
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    if block:
        ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, state, allow_partial: bool = False):
    """Restore into an existing TrainState-shaped pytree. Returns
    (state, start_epoch) (reference: file_utils.py:83-100 semantics —
    resume restores optimizer + epoch; bare params-only checkpoints load
    with strict=False equivalents).

    ``allow_partial`` permits a params-only restore when the saved
    optimizer tree doesn't match this run's optimizer — only safe for
    eval-only runs (--is-test), where fresh moments/schedule don't matter.
    A TRAINING resume must keep the hard error: silently resetting Adam
    moments and replaying warmup behind a warning corrupts the run."""
    wait_for_checkpoints()
    path = os.path.abspath(path)
    template = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "batch_stats": jax.device_get(state.batch_stats) or {},
        "step": 0,
        "epoch": 0,
    }
    has_scaler = getattr(state, "loss_scale", None) is not None
    if has_scaler:
        template["loss_scale"] = {"scale": 0.0, "growth_count": 0}
    has_quant = bool(getattr(state, "quant_stats", None))
    if has_quant:
        template["quant_stats"] = jax.device_get(state.quant_stats)
    ckptr = _checkpointer()
    try:
        try:
            restored = ckptr.restore(path, template)
        except Exception:
            if not (has_scaler or has_quant):
                raise
            # run resuming a checkpoint written without the optional
            # subtrees (older save, or a stage trained under a different
            # precision/quant mode): restore the rest and keep the fresh
            # scaler / init-calibrated quant scales.
            template.pop("loss_scale", None)
            template.pop("quant_stats", None)
            restored = ckptr.restore(path, template)
            logger.warning(
                f"checkpoint {path} is missing loss-scale and/or quant "
                "state; starting those fresh"
            )
        opt_state = restored["opt_state"]
    except Exception:
        # opt_state tree mismatch — e.g. resuming a TRAINED checkpoint into
        # an eval-only run whose optimizer was built without a schedule
        # (--is-test --resume). The reference loads with strict=False
        # (file_utils.py:96); the params are what matters, keep our fresh
        # opt_state. Broad except (ADVICE r2): orbax 0.11.x raises
        # ValueError on structure mismatch but other versions surface
        # TypeError/KeyError; a genuine IO failure re-raises from the
        # params-only PyTreeRestore below anyway.
        if not allow_partial:
            raise
        logger.warning(
            f"checkpoint {path}: optimizer state does not match this run's "
            "optimizer (different schedule/masks?); restoring params only"
        )
        import orbax.checkpoint as ocp

        partial = {k: v for k, v in template.items() if k != "opt_state"}
        with ocp.PyTreeCheckpointer() as ptc:
            # partial_restore skips the opt_state subtree entirely (it can
            # dominate the checkpoint: 2 AdamW moments per param)
            restored = ptc.restore(
                path, args=ocp.args.PyTreeRestore(
                    item=partial, partial_restore=True
                ),
            )
        opt_state = state.opt_state
    new_state = state.replace(
        params=restored["params"],
        opt_state=opt_state,
        batch_stats=restored["batch_stats"],
        step=np.asarray(restored["step"], np.int32),
        quant_stats=restored.get("quant_stats", state.quant_stats),
    )
    if has_scaler and "loss_scale" in restored:
        from .utils.precision import LossScaleState

        new_state = new_state.replace(
            loss_scale=LossScaleState(
                scale=jnp.float32(restored["loss_scale"]["scale"]),
                growth_count=jnp.int32(
                    restored["loss_scale"]["growth_count"]
                ),
            )
        )
    # stored epoch is completed_epoch (1-based); the epoch loop is 0-based,
    # so it doubles as the next epoch index (reference: file_utils.py:83-100
    # restores start_epoch = checkpoint["epoch"]).
    start_epoch = int(restored["epoch"])
    return new_state, start_epoch


def load_params_only(path: str, params):
    """Load just the model params (stage-2 consumes stage_1_latest this way,
    reference: pipeline.py:594-606)."""
    wait_for_checkpoints()
    ckptr = _checkpointer()
    template = {
        "params": jax.device_get(params),
        "opt_state": None,
        "batch_stats": {},
        "step": 0,
        "epoch": 0,
    }
    try:
        restored = ckptr.restore(path, template)
        return restored["params"], restored.get("batch_stats", {})
    except Exception:
        restored = ckptr.restore(path)
        return restored["params"], restored.get("batch_stats", {})


class StepCheckpointer:
    """Rotating mid-epoch checkpoint writer (--checkpoint-steps; no
    reference analog — the reference is epoch-granular only, SURVEY §5 /
    pipeline.py:488-523).

    Writes ``<prefix>epoch_<e>_step_<m>`` (e = current 0-based epoch,
    m = batches completed in it) and keeps the TWO most recent: deletion
    lags one save behind, so even if preemption strikes while the newest
    (async) save is still committing, a fully-committed step checkpoint
    survives on disk. ``finalize()`` removes the leftovers once the
    stage's final numbered epoch checkpoint exists and has committed.
    """

    def __init__(self, ckpt_dir: str, args=None, prefix: str = ""):
        self.ckpt_dir = ckpt_dir
        self.args = args
        self.prefix = prefix
        self._ring: list = []

    def __call__(self, state, epoch: int, batches_done: int,
                 num_batches: Optional[int] = None) -> str:
        path = save_checkpoint(
            self.ckpt_dir, state, epoch, self.args,
            name=f"{self.prefix}epoch_{epoch}_step_{batches_done}",
        )
        # sidecar: the loader geometry the batch offset is meaningful in.
        # Resume validates it — fast-forwarding `m` batches of a DIFFERENT
        # batch size/num_batches would silently misalign the epoch.
        import json as _json

        with open(path + ".meta.json", "w") as f:
            _json.dump({"batch_size": getattr(self.args, "batch_size", None),
                        "num_batches": num_batches}, f)
        self._ring.append(path)
        if len(self._ring) > 2:
            doomed = self._ring.pop(0)
            if os.path.isdir(doomed):
                shutil.rmtree(doomed)
            if os.path.exists(doomed + ".meta.json"):
                os.remove(doomed + ".meta.json")
        return path

    def finalize(self) -> None:
        """Delete remaining step checkpoints for this stage prefix —
        including ones left by a previous preempted process that this run
        resumed from. Call only after the final epoch checkpoint has
        durably committed (wait_for_checkpoints): every mid-epoch
        checkpoint is then strictly older training state."""
        wait_for_checkpoints()
        try:
            names = os.listdir(self.ckpt_dir)
        except FileNotFoundError:
            names = []
        for n in names:
            if n.startswith(self.prefix) and _STEP_SKIP_RE.search(n):
                p = os.path.join(self.ckpt_dir, n)
                if os.path.isdir(p):
                    shutil.rmtree(p)
                elif os.path.isfile(p):  # the .meta.json sidecar
                    os.remove(p)
        self._ring.clear()


def delete_previous_checkpoint(ckpt_dir: str, epoch: int, prefix: str = "") -> None:
    """--delete-previous-checkpoint (reference: pipeline.py:508-514)."""
    prev = os.path.join(ckpt_dir, f"{prefix}epoch_{epoch - 1}")
    if os.path.isdir(prev):
        shutil.rmtree(prev)


# ---------------------------------------------------------------------------
# Remote sync (reference: file_utils.py:14-28, 62-80, 103-128)
# ---------------------------------------------------------------------------


def remote_sync(local_dir: str, remote_dir: str, protocol: str = "fsspec") -> bool:
    """One sync pass: copy new/changed files, skip epoch_latest and
    same-size keys. Mid-epoch step checkpoints (--checkpoint-steps) are
    skipped too: they rotate (the local ring deletes them seconds after
    creation) and the deletion is never mirrored, so syncing them would
    leave partial/stale step dirs that remote `--resume latest`
    discovery would natural-sort as newest."""
    try:
        import fsspec

        rfs, rroot = fsspec.core.url_to_fs(remote_dir)
        for dirpath, _, filenames in os.walk(local_dir):
            for fn in filenames:
                lpath = os.path.join(dirpath, fn)
                rel = os.path.relpath(lpath, local_dir)
                if "epoch_latest" in rel or _STEP_SKIP_RE.search(rel):
                    continue
                rpath = os.path.join(rroot, rel)
                try:
                    if rfs.exists(rpath) and rfs.size(rpath) == os.path.getsize(lpath):
                        continue
                except FileNotFoundError:
                    pass  # probe raced a delete; fall through to upload
                except Exception as e:
                    # transient probe flake (HTTP 5xx, auth hiccup):
                    # upload anyway — put() overwrites, so the worst case
                    # is re-copying an unchanged file (reference
                    # file_utils.py:113-118 likewise ignores probe errors)
                    logger.warning(f"remote probe failed for {rel}: {e}")
                try:
                    rfs.makedirs(os.path.dirname(rpath), exist_ok=True)
                    rfs.put(lpath, rpath)
                except FileNotFoundError:
                    # a rotating artifact vanished mid-walk; skip, don't
                    # abort the whole pass
                    continue
        return True
    except Exception as e:
        logger.error(f"remote sync failed: {e}")
        return False


class RemoteSyncThread(threading.Thread):
    """Background loop syncing every `frequency` seconds
    (reference: keep_running_remote_sync, file_utils.py:14-28; thread
    instead of multiprocessing.Process — no CUDA context to escape)."""

    def __init__(self, local_dir: str, remote_dir: str, frequency: int = 300,
                 protocol: str = "fsspec"):
        super().__init__(daemon=True)
        self.local_dir = local_dir
        self.remote_dir = remote_dir
        self.frequency = frequency
        self.protocol = protocol
        self._halt = threading.Event()  # NB: Thread reserves `_stop`

    def run(self):
        while not self._halt.wait(self.frequency):
            remote_sync(self.local_dir, self.remote_dir, self.protocol)

    def stop(self):
        self._halt.set()


def start_sync_process(local_dir, remote_dir, frequency=300, protocol="fsspec"):
    t = RemoteSyncThread(local_dir, remote_dir, frequency, protocol)
    t.start()
    return t


# ---------------------------------------------------------------------------
# PyTorch → JAX weight conversion hook
# ---------------------------------------------------------------------------


def _cubic_resize_matrix(n_in: int, n_out: int):
    """(n_out, n_in) 1-D bicubic interpolation matrix, torch-antialias
    semantics.

    Matches ``F.interpolate(mode="bicubic", antialias=True)`` — what timm's
    ``resample_abs_pos_embed`` calls. torch's antialias kernels are
    PIL-derived: cubic-convolution filter with A=-0.5 (NOT the -0.75 of the
    non-AA path), kernel widened by the scale factor on downscale, window
    TRUNCATED at the borders (no pixel duplication) with weights
    renormalized, output center ``(i + 0.5) * scale``. Golden-tested
    against the torch oracle in tests/test_pos_resample.py.
    """
    if n_in == n_out:
        return np.eye(n_in)
    scale = n_in / n_out
    ks = max(scale, 1.0)
    support = 2.0 * ks
    A = -0.5

    def cubic(x):
        x = np.abs(x)
        return np.where(
            x <= 1.0,
            ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * A, 0.0),
        )

    M = np.zeros((n_out, n_in), dtype=np.float64)
    for i in range(n_out):
        center = (i + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(n_in, int(center + support + 0.5))
        js = np.arange(xmin, xmax)
        w = cubic((js - center + 0.5) / ks)
        M[i, js] = w / w.sum()
    return M


def resample_pos_embed(src: np.ndarray, n_tokens: int,
                       num_prefix: int = 1) -> np.ndarray:
    """Bicubic-resize a ViT absolute position table to a new patch grid.

    ``src`` is ``(1, old_grid**2 + num_prefix, C)``; returns
    ``(1, n_tokens, C)`` where ``n_tokens - num_prefix`` is the new square
    grid. Prefix (CLS) slots are kept verbatim; the grid part is resized
    as an image, torch-bicubic/antialias — the same operation timm's
    ``resample_abs_pos_embed`` performs when open_clip loads a checkpoint
    at a non-native ``force_image_size``. (The torch reference parses
    --force-image-size but never wires it into model creation —
    cli/main.py force_image_size, pipeline.py:207-211 — so this is
    beyond-reference robustness: a 224px converted checkpoint grafts
    cleanly at 336px instead of erroring on the shape mismatch.)
    """
    _, n_src, ch = src.shape
    g_old = int(round((n_src - num_prefix) ** 0.5))
    g_new = int(round((n_tokens - num_prefix) ** 0.5))
    if g_old * g_old != n_src - num_prefix or g_new * g_new != n_tokens - num_prefix:
        raise ValueError(
            f"resample_pos_embed: non-square grids ({n_src} -> {n_tokens} "
            f"tokens with {num_prefix} prefix)"
        )
    prefix = src[:, :num_prefix]
    grid = src[0, num_prefix:].astype(np.float64).reshape(g_old, g_old, ch)
    M = _cubic_resize_matrix(g_old, g_new)
    grid = np.einsum("ij,jkc->ikc", M, grid)      # rows
    grid = np.einsum("kj,ijc->ikc", M, grid)      # cols
    out = np.concatenate(
        [prefix.astype(np.float64), grid.reshape(1, g_new * g_new, ch)], axis=1
    )
    return out.astype(src.dtype)


def load_torch_clip(path: str, params, strict: bool = True) -> Any:
    """Import a reference (open_clip BiomedCLIP) torch checkpoint into our
    ClipModel params when a converted .npz mapping is available. Conversion
    tables ship in tools/convert_weights.py; this loader only consumes the
    resulting npz (no torch dependency on the TPU host).

    Position embeddings longer than the target (BERT stores 512 positions,
    BiomedCLIP runs context 256 — model.py:1266-1281) are truncated from the
    front, matching HF's position_ids[:seq_len] indexing. Any template leaf
    with no source tensor is reported; with ``strict`` (the default for
    --pretrained runs) that is an error — silently keeping random init in a
    "pretrained" tower would quietly destroy its quality."""
    from .utils.logging import get_logger

    logger = get_logger(__name__)
    data = np.load(path, allow_pickle=False)
    flat = dict(data.items())
    missing, used = [], set()

    def adapt(key, src, shape):
        if tuple(src.shape) == tuple(shape):
            return src
        # ViT patch-grid position table at a different --force-image-size:
        # bicubic-resample the grid (checked BEFORE the generic truncation
        # rule — truncating a 2-D grid flattened row-major would scramble
        # it). The text table is named pos_emb, so only the visual grid
        # matches here.
        if (key.endswith("pos_embed") and src.ndim == 3 == len(shape)
                and src.shape[0] == shape[0] == 1
                and src.shape[-1] == shape[-1]):
            resized = resample_pos_embed(src, shape[1])
            logger.info(
                f"{key}: resampled position grid {src.shape[1] - 1} -> "
                f"{shape[1] - 1} tokens (bicubic, force_image_size graft)"
            )
            return resized
        # position tables: truncate extra positions (dim -2)
        if src.ndim == len(shape) and src.shape[-1] == shape[-1] and \
                src.shape[-2] > shape[-2] and src.shape[:-2] == tuple(shape[:-2]):
            return src[..., : shape[-2], :]
        if src.size == int(np.prod(shape)):
            return src.reshape(shape)
        raise ValueError(
            f"{key}: converted tensor {src.shape} incompatible with "
            f"model param {tuple(shape)}"
        )

    def fill(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
            if isinstance(v, dict):
                out[k] = fill(v, key)
            elif key in flat:
                used.add(key)
                out[k] = adapt(key, flat[key], v.shape).astype(v.dtype)
            else:
                missing.append(key)
                out[k] = v
        return out

    result = fill(jax.device_get(params))
    unused = sorted(set(flat) - used)
    if missing:
        msg = (f"load_torch_clip: {len(missing)} params have NO source tensor "
               f"in {path} (kept random init): {missing[:8]}"
               f"{'...' if len(missing) > 8 else ''}")
        if strict:
            raise ValueError(msg)
        logger.warning(msg)
    if unused:
        logger.warning(
            f"load_torch_clip: {len(unused)} converted tensors unused: "
            f"{unused[:8]}{'...' if len(unused) > 8 else ''}"
        )
    return result
