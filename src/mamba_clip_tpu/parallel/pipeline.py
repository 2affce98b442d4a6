"""Pipeline parallelism (GPipe schedule) over a mesh axis.

The reference has no pipeline parallelism — DDP data parallelism is its
only strategy (reference: src/mamba_clip/utils/dist_utils.py:58-75,
SURVEY §2.17 checklist: "PP: absent"). Like the sequence-parallel scan
(ops/sharded_scan.py), this is a TPU-first headroom item: partition a
homogeneous block stack (transformer encoder blocks, VSSM layers) across
chips on a ``pipe`` mesh axis and stream microbatches through with
``ppermute`` stage handoffs riding the ICI.

Design — everything is static and jit-friendly:

- Stage parameters are STACKED on a leading axis (one slice per stage)
  and sharded over the pipe axis, so each device holds exactly its own
  stage's weights (the pipeline analog of "each rank owns its layers").
- The schedule is the classic GPipe fill-drain: with S stages and M
  microbatches, every device runs T = M + S - 1 ticks of its stage
  function inside a ``lax.scan``; activations hop to the next stage
  with a ring ``lax.ppermute`` after every tick. Devices compute
  garbage during fill/drain ticks (the pipeline bubble, M/(M+S-1)
  efficiency) — the standard price of a static schedule, paid in
  compute instead of dynamic control flow XLA cannot compile.
- The last stage collects its M real outputs; a masked ``psum``
  broadcasts them to every device so downstream (loss) code sees a
  replicated array.
- Backward is plain autodiff: ``ppermute`` has an exact transpose (the
  reversed ring) and ``lax.scan`` reverses the tick order, so
  ``jax.grad`` through ``shard_map`` yields the textbook backward
  pipeline without a bespoke VJP — the same property the
  sequence-parallel scan exploits.

Constraints: every stage must preserve the activation's shape and dtype
(true for encoder blocks / VSSM layers between downsamples), and the
global batch must split into equal microbatches.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_apply", "stack_stages", "split_into_stages"]


def stack_stages(stage_trees: Sequence[Any]):
    """Stack per-stage parameter trees on a new leading axis.

    The trees must be structurally identical (homogeneous stages); the
    result is what :func:`pipeline_apply` shards over the pipe axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stage_trees)


def split_into_stages(block_params: Sequence[Any], n_stages: int):
    """Group an ordered list of homogeneous block param trees into
    ``n_stages`` equal stage trees (each a dict ``sub0..subK``), then
    stack them. ``len(block_params)`` must divide evenly."""
    n = len(block_params)
    if n % n_stages:
        raise ValueError(
            f"{n} blocks do not split into {n_stages} equal pipeline stages"
        )
    k = n // n_stages
    stages = [
        {f"sub{j}": block_params[i * k + j] for j in range(k)}
        for i in range(n_stages)
    ]
    return stack_stages(stages)


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: int,
) -> jnp.ndarray:
    """Run ``x`` through S pipelined stages on mesh axis ``axis``.

    Args:
      stage_fn: ``(stage_params, h) -> h`` applying ONE stage; must
        preserve h's shape and dtype.
      stacked_params: pytree with a leading stage axis of size S
        (see :func:`stack_stages`); sharded so each device holds one
        stage.
      x: global batch ``(B, ...)``; B must divide into ``microbatches``
        equal microbatches.
      microbatches: M, the GPipe schedule's unroll width. Larger M →
        smaller bubble (efficiency M/(M+S-1)) but more live activations.

    Returns the full-batch output, replicated across the pipe axis.
    """
    S = mesh.shape[axis]
    B = x.shape[0]
    M = int(microbatches)
    if M <= 0 or B % M:
        raise ValueError(f"batch {B} does not split into {M} microbatches")
    xm = x.reshape(M, B // M, *x.shape[1:])

    def per_device(p_local, xm_rep):
        p = jax.tree_util.tree_map(lambda a: a[0], p_local)
        s = lax.axis_index(axis)
        T = M + S - 1
        ring = [(i, (i + 1) % S) for i in range(S)]

        h0 = jnp.zeros_like(xm_rep[0])
        outs0 = jnp.zeros_like(xm_rep)

        def tick(carry, t):
            h_recv, outs = carry
            # stage 0 feeds microbatch t (clamped during drain ticks —
            # those results are never collected, see module docstring)
            inp = lax.dynamic_index_in_dim(
                xm_rep, jnp.minimum(t, M - 1), 0, keepdims=False
            )
            h_in = jnp.where(s == 0, inp, h_recv)
            y = stage_fn(p, h_in)
            # the last stage's tick t completes microbatch t-(S-1)
            mi = jnp.clip(t - (S - 1), 0, M - 1)
            cur = lax.dynamic_index_in_dim(outs, mi, 0, keepdims=False)
            take = (s == S - 1) & (t >= S - 1)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(take, y, cur), mi, 0
            )
            h_next = lax.ppermute(y, axis, ring)
            return (h_next, outs), None

        (_, outs), _ = lax.scan(tick, (h0, outs0), jnp.arange(T))
        # replicate the last stage's collected outputs everywhere
        outs = lax.psum(
            jnp.where(s == S - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs

    out = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(axis), stacked_params),
            P(),
        ),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, xm)
    return out.reshape(B, *out.shape[2:])
