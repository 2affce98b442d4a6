"""Device mesh and distributed runtime for TPU.

TPU-native replacement for the reference's torch.distributed/NCCL layer
(reference: src/mamba_clip/utils/dist_utils.py). Instead of a process group
with rank discovery from torchrun/SLURM env vars, JAX gives us:

- multi-host rendezvous via ``jax.distributed.initialize()`` (DCN), replacing
  ``init_process_group`` (dist_utils.py:58-75);
- a ``jax.sharding.Mesh`` over all devices (ICI within a slice), replacing
  the implicit DDP world — the reference's only strategy is data parallelism
  (SURVEY §2.17), which here is a 1-D "data" mesh; the mesh helper also
  supports extra axes (fsdp/model) so the framework can scale past DP;
- collectives by sharding annotation: gradients all-reduce automatically
  under jit, and the contrastive feature all_gather (loss.py:16-44 in the
  reference) is a ``jax.lax.all_gather`` inside ``shard_map`` — which is
  natively differentiable, so "gather_with_grad" is free.

"rank" maps to ``jax.process_index()``: data loading is per-host, logging
and checkpoint writes are master-only, exactly like the reference's
``is_master`` predicates (dist_utils.py:101-123).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"


def enable_compilation_cache(path: str = "~/.cache/mamba_clip_tpu/jax") -> None:
    """Persistent XLA compilation cache — first-compile cost (significant
    through the remote-compile tunnel, and for the Pallas kernels) is paid
    once per shape across processes."""
    import os as _os

    path = _os.path.expanduser(path)
    _os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass


def world_info_from_env() -> Tuple[int, int, int]:
    """(rank, local_rank, world_size) — the JAX process view.

    Replaces env-var spelunking across torchrun/MPI/SLURM
    (reference: dist_utils.py:9-31); JAX owns this after initialize().
    """
    return jax.process_index(), 0, jax.process_count()


_distributed_initialized = False


def maybe_initialize_distributed(coordinator: Optional[str] = None) -> None:
    """Multi-host DCN rendezvous. Safe no-op on single-process runs.

    Replaces ``torch.distributed.init_process_group``
    (reference: dist_utils.py:58-75). The decision to initialize comes from
    the ENVIRONMENT ONLY (JAX_NUM_PROCESSES/NPROC/JAX_COORDINATOR_ADDRESS,
    or TPU-pod metadata that ``jax.distributed.initialize()`` discovers
    itself) — it must run BEFORE any other jax API: querying
    ``jax.process_count()`` first would initialize the local backend and
    turn the rendezvous into a broken no-op, silently running N
    independent single-process worlds. Initialization failures propagate
    (a half-joined world must not train).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return
    num_procs = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get("NPROC")
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator or num_procs:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_procs) if num_procs else None,
        )
    _distributed_initialized = True


def is_master(state_or_rank) -> bool:
    """Master predicate (reference: dist_utils.py:101-123)."""
    rank = getattr(state_or_rank, "rank", state_or_rank)
    return int(rank) == 0


@dataclass
class MeshSpec:
    """How to lay devices out. data × fsdp × model, data outermost.

    The reference supports DP only; defaults reproduce that (all devices on
    the data axis). fsdp/model axes are available for scaling beyond the
    reference (ICI-major ordering so model collectives ride ICI).
    """

    data: int = -1  # -1 = all remaining devices
    fsdp: int = 1
    model: int = 1


def create_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    spec = spec or MeshSpec()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    denom = spec.fsdp * spec.model
    data = spec.data if spec.data > 0 else n // denom
    if data * denom != n:
        raise ValueError(
            f"mesh {data}x{spec.fsdp}x{spec.model} != {n} devices"
        )
    arr = np.asarray(devices).reshape(data, spec.fsdp, spec.model)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs — the DistributedSampler equivalent
    (reference: data.py:575-577 shards the dataset; here the global batch is
    sharded over the data axis)."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """Parameter shardings: replicated for pure DP (the reference's only
    mode); when the fsdp axis is >1, ndim>=2 params shard dim 0 over it
    (ZeRO-3 style — XLA inserts the all-gathers before use and keeps the
    optimizer update sharded); otherwise, when the model axis is >1, the
    last dim is tensor-parallel where divisible. Applies to any state
    pytree whose leaves mirror param shapes (AdamW moments shard
    identically).

    Each matrix is deliberately sharded on ONE axis only: sharding BOTH
    axes (P('fsdp','model')) of consecutive mlp matmuls miscompiles the
    backward in XLA SPMD (jax 0.9.0, CPU, shardy AND legacy GSPMD: loss
    exact but upstream grads off by >1e1 vs single-device ground truth —
    see tests/test_parallel.py::test_fsdp_tp_train_step_matches_replicated,
    which pins this workaround against ground truth)."""
    fsdp = mesh.shape[FSDP_AXIS]
    tp = mesh.shape[MODEL_AXIS]

    def shard_one(x):
        if not hasattr(x, "ndim") or x.ndim < 2:
            return NamedSharding(mesh, P())
        if fsdp > 1 and x.shape[0] % fsdp == 0:
            return NamedSharding(mesh, P(FSDP_AXIS, *([None] * (x.ndim - 1))))
        if tp > 1 and x.shape[-1] % tp == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [MODEL_AXIS])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(shard_one, params)


def local_batch_slice(global_batch: int, rank: int, world: int) -> slice:
    """Per-host contiguous shard of the global batch (per-host data loading)."""
    per = global_batch // world
    return slice(rank * per, (rank + 1) * per)


def broadcast_object(obj, rank: int = 0):
    """Rank-0 object broadcast (reference: dist_utils.py:91-98).

    Uses multihost_utils when running multi-process; identity otherwise.
    """
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(obj)
