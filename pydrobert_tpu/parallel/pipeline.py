"""GPipe-style pipeline parallelism over a named ``pipe`` mesh axis.

TPU-native layer parallelism for deep stacks: the layer stack is split into
``pp`` stages, each stage's parameters live on one slice of the mesh's
``pipe`` axis, and microbatches stream through the stages with activations
handed stage-to-stage by ``jax.lax.ppermute`` (one ICI hop per step) inside a
single :func:`jax.shard_map`. This composes with the package's other axes:
microbatch rows shard over every non-pipe axis that divides them (the
``model`` axis then contributes as extra within-microbatch data parallelism
inside the stages — stage weights are replicated across it; true in-stage
tensor parallelism would need hand-written collectives in ``stage_fn``),
while the un-pipelined parts of the model keep their own tensor-parallel
shardings.

The schedule is GPipe (all-forward-then-all-backward, as produced by
``jax.grad`` through the loop): with ``m`` microbatches and ``pp`` stages the
pipeline-bubble fraction is ``(pp - 1) / (m + pp - 1)``, so choose
``m >> pp``. Everything is a static-shape ``lax.scan`` — one compiled
program, no per-microbatch dispatch.

The reference has no pipeline parallelism (its distributed story is
DDP-style data parallelism, SURVEY.md §2 parallelism inventory); this module
is part of the TPU-native scaling surface, like tensor parallelism in
:func:`pydrobert_tpu.models.conformer.conformer_partition_rules`.
"""

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import DATA_AXIS, MODEL_AXIS

__all__ = [
    "PIPE_AXIS",
    "make_pipeline_mesh",
    "pipeline_apply",
]

PIPE_AXIS = "pipe"


def make_pipeline_mesh(
    pipeline_parallelism: int,
    model_parallelism: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str, str] = (DATA_AXIS, MODEL_AXIS, PIPE_AXIS),
) -> Mesh:
    """Build a 3-D ``(data, model, pipe)`` mesh.

    ``pipeline_parallelism`` chips hold consecutive pipeline stages and
    ``model_parallelism`` chips cooperate tensor-parallel within a stage
    boundary; the remaining factor of the device count is data parallelism.
    The ``pipe`` axis is placed innermost so the stage-to-stage ``ppermute``
    rides adjacent ICI links under topology-aware placement.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    pp, tp = pipeline_parallelism, model_parallelism
    if pp < 1 or tp < 1 or n % (pp * tp):
        raise ValueError(
            f"pipeline_parallelism {pp} x model_parallelism {tp} must divide "
            f"device count {n}"
        )
    shape = (n // (pp * tp), tp, pp)
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array, Any], jax.Array],
    stage_params: Any,
    x: jax.Array,
    extras: Any = None,
    *,
    mesh: Mesh,
    n_microbatches: int,
    batch_axis: str = DATA_AXIS,
    pipe_axis: str = PIPE_AXIS,
) -> jax.Array:
    """Run ``x`` through ``pp`` pipeline stages of ``stage_fn`` on `mesh`.

    `stage_params` is a pytree whose leaves carry a leading stage dimension
    of size ``pp = mesh.shape[pipe_axis]``, sharded (or shardable) as
    ``PartitionSpec(pipe_axis)``; stage ``s`` applies ``stage_fn(params[s],
    x_mb, extras_mb)``, which must return an array of `x_mb`'s shape and
    dtype (the activation handed to stage ``s + 1``).

    `x` is the batch-major activation ``(B, ...)``; it is split into
    `n_microbatches` along dim 0 (``B`` must be divisible by it, and the
    microbatch size by the data-axis size). `extras` is an optional pytree of
    per-sample side inputs, each ``(B, ...)`` (e.g. a padding mask); the
    matching microbatch slice accompanies ``x_mb`` into every stage
    unchanged.

    Differentiable: ``jax.grad`` through the returned value runs the
    backward pipeline (reverse ``ppermute`` schedule) automatically.

    Returns the ``(B, ...)`` output of the final stage, sharded like the
    input (batch over `batch_axis`, replicated over the other axes).
    """
    pp = mesh.shape[pipe_axis]
    B = x.shape[0]
    m = n_microbatches
    if B % m:
        raise ValueError(f"batch size {B} not divisible by microbatches {m}")
    mb = B // m
    # the microbatch rows shard over EVERY non-pipe axis: stage weights are
    # replicated across the model axis inside the pipeline (true in-stage
    # tensor parallelism would need hand-written collectives in stage_fn),
    # so the model axis contributes as extra within-microbatch data
    # parallelism instead of idling — full FLOP utilization, identical
    # numerics. The un-pipelined parts of the model (e.g. the CTC head)
    # still get true tensor parallelism from their own shardings.
    all_rows = tuple(
        n for n in mesh.axis_names if n != pipe_axis and mesh.shape[n] > 1
    )

    def _extent(axes):
        e = 1
        for n in axes:
            e *= mesh.shape[n]
        return e

    row_axes = None
    for cand in (all_rows, (batch_axis,)):
        cand = tuple(n for n in cand if mesh.shape.get(n, 1) > 1)
        if mb % _extent(cand) == 0:
            row_axes = cand
            break
    if row_axes is None:
        raise ValueError(
            f"microbatch size {mb} not divisible by the data axis "
            f"({mesh.shape[batch_axis]})"
        )

    def to_mb(a):
        return a.reshape((m, mb) + a.shape[1:])

    x_mb = to_mb(x)
    extras_mb = jax.tree.map(to_mb, extras)

    # per-shard specs: stages over pipe, microbatch rows over the rest
    pspec = jax.tree.map(lambda _: PartitionSpec(pipe_axis), stage_params)
    xspec = PartitionSpec(None, row_axes if row_axes else None)
    espec = jax.tree.map(lambda _: xspec, extras_mb)

    inner = functools.partial(_pipeline_inner, stage_fn, pp, m, pipe_axis)
    out_mb = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(pspec, xspec, espec),
        out_specs=xspec,
        check_vma=False,
    )(stage_params, x_mb, extras_mb)
    return out_mb.reshape((B,) + x.shape[1:])


def _pipeline_inner(stage_fn, pp, m, pipe_axis, stage_params, x_mb, extras_mb):
    """Per-device GPipe loop body (runs inside shard_map).

    Each device holds ONE stage's params (leading dim 1 after sharding) and
    its data shard of every microbatch. ``m + pp - 1`` scan steps: at step
    ``t`` stage ``s`` works on microbatch ``t - s`` (idle edges compute on
    zeros and are masked out of the collected output).
    """
    stage_params = jax.tree.map(lambda a: a[0], stage_params)
    s = jax.lax.axis_index(pipe_axis)
    n_steps = m + pp - 1
    out = jnp.zeros_like(x_mb)
    state = jnp.zeros(x_mb.shape[1:], x_mb.dtype)
    fwd_perm = [(i, (i + 1) % pp) for i in range(pp)]

    def body(carry, t):
        state, out = carry
        i = jnp.clip(t - s, 0, m - 1)  # this stage's current microbatch
        feed = jax.lax.dynamic_index_in_dim(x_mb, i, 0, keepdims=False)
        h = jnp.where(s == 0, feed, state)
        ex = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            extras_mb,
        )
        y = stage_fn(stage_params, h, ex)
        # the LAST stage finishes microbatch t - (pp - 1) at step t
        j = t - (pp - 1)
        done = jax.lax.dynamic_update_index_in_dim(
            out, y, jnp.clip(j, 0, m - 1), 0
        )
        out = jnp.where((s == pp - 1) & (j >= 0), done, out)
        state = jax.lax.ppermute(y, pipe_axis, fwd_perm)
        return (state, out), None

    (state, out), _ = jax.lax.scan(
        body, (state, out), jnp.arange(n_steps, dtype=jnp.int32)
    )
    # outputs live on the last stage; broadcast so out_specs can replicate
    # over the pipe axis
    return jax.lax.psum(
        jnp.where(s == pp - 1, out, jnp.zeros_like(out)), pipe_axis
    )
