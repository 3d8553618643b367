"""Device-mesh construction and sharding helpers.

Replaces the reference's ``torch.distributed`` integration points
(``_dataloaders.py:84-105`` rank/world striding, ``training.py:887-908``
metric all-reduce) with JAX-native equivalents: a named
:class:`jax.sharding.Mesh`, :class:`~jax.sharding.NamedSharding` for batch
and parameter placement, and jitted ``psum``-style reductions that XLA lowers
to ICI collectives.
"""

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "all_reduce_metrics",
    "batch_sharding",
    "host_shard_info",
    "make_mesh",
    "replicated_sharding",
    "shard_params",
]

# Canonical mesh axis names used throughout the package. "data" shards the
# batch (data parallelism); "model" shards weight matrices (tensor
# parallelism). Collectives over these axes ride ICI within a slice.
DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    model_parallelism: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    ``model_parallelism`` chips cooperate on each model replica; the
    remaining factor of the device count is data parallelism. With the
    default ``model_parallelism=1`` this is pure DP, matching the
    reference's capability level (SURVEY.md §2 parallelism inventory).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model_parallelism < 1 or n % model_parallelism:
        raise ValueError(
            f"model_parallelism {model_parallelism} must divide device count {n}"
        )
    shape = (n // model_parallelism, model_parallelism)
    try:
        # topology-aware placement: on multi-host/torus TPUs, neighboring
        # mesh coordinates land on physically adjacent chips so the model
        # axis's collectives ride ICI
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def sequence_sharding(
    mesh: Mesh,
    batch_axis: str = DATA_AXIS,
    seq_axis: str = MODEL_AXIS,
) -> NamedSharding:
    """Sequence-parallel activation sharding: ``(batch, time, ...)`` arrays
    split their batch dim over the data axis AND their time dim over the
    model axis. Constrained onto activations between blocks (e.g.
    ``ConformerConfig.seq_sharding``), it makes per-position work
    (layernorms, residuals, dropout) tensor-parallel too; XLA inserts the
    gather/scatter collectives around the attention/FFN matmuls."""
    return NamedSharding(mesh, PartitionSpec(batch_axis, seq_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that replicates an array over every device in the mesh."""
    return NamedSharding(mesh, PartitionSpec())


def param_partition_specs(
    params: Any,
    mesh: Mesh,
    rules: Callable[[Tuple[Any, ...], jax.Array], PartitionSpec],
) -> Any:
    """The *effective* ``PartitionSpec`` for every leaf of `params`.

    Applies `rules` plus the divisibility fallback :func:`shard_params`
    uses (a leaf whose dims don't divide the assigned mesh axes is
    replicated), so the result is exactly how :func:`shard_params` would
    place each leaf — reusable for jit ``in_shardings`` or serialization
    (:mod:`pydrobert_tpu.export`).
    """

    def effective(path, leaf):
        spec = rules(path, leaf)
        # replicate any leaf whose dims don't divide the assigned mesh axes
        # (e.g. a vocab+1 CTC head on an even-way model axis)
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            axes = (axis,) if isinstance(axis, str) else tuple(axis)
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if leaf.shape[dim] % size:
                return PartitionSpec()
        return spec

    return jax.tree_util.tree_map_with_path(effective, params)


def shard_params(
    params: Any,
    mesh: Mesh,
    rules: Callable[[Tuple[Any, ...], jax.Array], PartitionSpec],
) -> Any:
    """Place a parameter pytree on `mesh` according to path-based `rules`.

    `rules` maps ``(path, leaf) -> PartitionSpec``; see
    :func:`pydrobert_tpu.models.conformer.conformer_partition_rules` for the
    flagship model's tensor-parallel layout.
    """
    specs = param_partition_specs(params, mesh, rules)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec),
    )


def host_shard_info() -> Tuple[int, int]:
    """(rank, world_size) for host-side data sharding.

    TPU-native stand-in for the reference's ``torch.distributed`` probing in
    ``AbstractEpochSampler`` (``_dataloaders.py:84-105``): each *process*
    takes a strided shard of the sample stream.
    """
    return jax.process_index(), jax.process_count()


def all_reduce_metrics(
    metrics: Dict[str, float], op: str = "mean"
) -> Dict[str, float]:
    """Reduce scalar metrics across processes/devices.

    Mirrors the reference controller's async ``all_reduce`` of train/val
    metrics (``training.py:887-908``, mean by default). Under a single
    process this is the identity; under multihost it all-gathers via a tiny
    jitted psum so the reduction rides ICI/DCN.
    """
    if op not in ("mean", "sum"):
        raise ValueError(f"unknown op {op!r}")
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    local = jnp.asarray([float(metrics[k]) for k in keys], jnp.float32)
    gathered = multihost_utils.process_allgather(local)  # (W, K)
    if op == "mean":
        red = gathered.mean(0)
    elif op == "sum":
        red = gathered.sum(0)
    else:
        raise ValueError(f"unknown op {op!r}")
    return {k: float(v) for k, v in zip(keys, red)}
