"""Sharded (multi-chip / multi-host) checkpointing on Orbax.

The training controller's msgpack checkpoints
(:mod:`pydrobert_tpu.training`) gather full pytrees to the host — right
for single-host experiments and byte-stable files, wrong at scale: a
dp x tp x pp sharded train state should be written *per shard, in
parallel, without host gathering*, and restored straight into the mesh
layout. These helpers wrap :mod:`orbax.checkpoint` with that contract:

- :func:`save_sharded` writes a pytree of (possibly sharded)
  ``jax.Array`` leaves; each process writes only its shards. With
  ``async_save=True`` the device->storage copy overlaps subsequent steps
  (call :func:`wait_for_saves` before relying on the files).
- :func:`restore_sharded` restores into the shardings of a template
  pytree (e.g. the freshly-`shard_params`'d init state), so the restored
  leaves land distributed exactly where the step function expects them.

The reference's checkpoint story is single-process ``torch.save``
(SURVEY §5 checkpoint/resume); this is the TPU-native scale-out of it.
"""

import os
import threading
from typing import Any, Optional

import jax

__all__ = ["save_sharded", "restore_sharded", "wait_for_saves"]

_ASYNC = []  # in-flight AsyncCheckpointer saves
_LOCK = threading.Lock()


def save_sharded(path: str, tree: Any, async_save: bool = False) -> None:
    """Write `tree` (pytree of jax.Arrays, sharded or not) to directory
    `path`, overwriting. Every process must call this (collective); each
    writes only the shards it owns. ``async_save=True`` returns as soon as
    the on-device data is snapshot; finalize with :func:`wait_for_saves`.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(path, args=ocp.args.StandardSave(tree), force=True)
        with _LOCK:
            _ASYNC.append(ckptr)
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def wait_for_saves() -> None:
    """Block until every in-flight :func:`save_sharded` (async) completes."""
    with _LOCK:
        pending, _ASYNC[:] = _ASYNC[:], []
    for ckptr in pending:
        ckptr.wait_until_finished()
        ckptr.close()


def restore_sharded(path: str, template: Any) -> Any:
    """Restore a pytree from `path` into `template`'s shapes/dtypes AND
    shardings: sharded leaves come back distributed across the mesh
    without a host round-trip. `template` may hold real arrays (e.g. the
    init state) or ``jax.ShapeDtypeStruct`` leaves carrying shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)

    def as_abstract(leaf):
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return leaf
        arr = jax.numpy.asarray(leaf) if not isinstance(leaf, jax.Array) else leaf
        return jax.ShapeDtypeStruct(
            arr.shape, arr.dtype, sharding=getattr(arr, "sharding", None)
        )

    abstract = jax.tree.map(as_abstract, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
