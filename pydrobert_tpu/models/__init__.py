"""Reference model families for pydrobert_tpu.

The reference library is model-agnostic (it supplies ops around user models);
this subpackage provides the flagship end-to-end model used by the package's
own benchmarks, docs, and the driver entry point: a Conformer CTC acoustic
model (feats -> SpecAugment -> conformer encoder -> CTC head) whose decode
path runs through :mod:`pydrobert_tpu.ops.decoding`.
"""

from .conformer import (  # noqa: F401
    ConformerConfig,
    ConformerCTC,
    conformer_partition_rules,
    make_train_step,
)

__all__ = [
    "ConformerConfig",
    "ConformerCTC",
    "conformer_partition_rules",
    "make_train_step",
]
