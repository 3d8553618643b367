"""Mesh/sharding utilities for multi-chip TPU execution.

The reference library's only parallelism is data parallelism via
``torch.distributed`` hooks (SURVEY.md §2, reference ``_dataloaders.py:84-105``,
``training.py:887-908``). The TPU-native equivalent is declarative: build a
:class:`jax.sharding.Mesh` over the chips, annotate array shardings, and let
XLA insert the collectives over ICI. This subpackage holds those utilities
plus model-parallel (tensor-parallel) parameter sharding rules used by
:mod:`pydrobert_tpu.models`.
"""

from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    all_reduce_metrics,
    batch_sharding,
    host_shard_info,
    make_mesh,
    param_partition_specs,
    replicated_sharding,
    sequence_sharding,
    shard_params,
)
from .pipeline import (  # noqa: F401
    PIPE_AXIS,
    make_pipeline_mesh,
    pipeline_apply,
)
from .checkpoint import (  # noqa: F401
    restore_sharded,
    save_sharded,
    wait_for_saves,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "all_reduce_metrics",
    "batch_sharding",
    "host_shard_info",
    "make_mesh",
    "make_pipeline_mesh",
    "param_partition_specs",
    "pipeline_apply",
    "replicated_sharding",
    "restore_sharded",
    "save_sharded",
    "sequence_sharding",
    "shard_params",
    "wait_for_saves",
]
