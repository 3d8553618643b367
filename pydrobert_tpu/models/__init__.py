"""Reference model families for pydrobert_tpu.

The reference library is model-agnostic (it supplies ops around user models);
this subpackage provides the flagship end-to-end model used by the package's
own benchmarks, docs, and the driver entry point: a Conformer CTC acoustic
model (feats -> SpecAugment -> conformer encoder -> CTC head) whose decode
path runs through :mod:`pydrobert_tpu.ops.decoding`.
"""

from .seq2seq import (  # noqa: F401
    AttentionSeq2Seq,
    Seq2SeqConfig,
    Seq2SeqDecoderLM,
    make_mer_train_step,
)
from .transducer import (  # noqa: F401
    ConformerTransducer,
    TransducerConfig,
    lookup_lm_fusion,
    make_transducer_pipeline_train_step,
    make_transducer_train_step,
    streaming_transducer_beam,
    streaming_transducer_greedy,
    transducer_partition_rules,
    transducer_pipeline_partition_rules,
    transducer_stack_block_params,
    transducer_unstack_block_params,
)
from .conformer import (  # noqa: F401
    ConformerConfig,
    ConformerCTC,
    conformer_partition_rules,
    make_pipeline_train_step,
    make_pipelined_forward,
    make_train_step,
    moe_aux_loss,
    pipeline_partition_rules,
    stack_block_params,
    streaming_logits,
    unstack_block_params,
)

__all__ = [
    "AttentionSeq2Seq",
    "ConformerTransducer",
    "Seq2SeqConfig",
    "Seq2SeqDecoderLM",
    "TransducerConfig",
    "lookup_lm_fusion",
    "make_transducer_pipeline_train_step",
    "make_transducer_train_step",
    "streaming_transducer_beam",
    "streaming_transducer_greedy",
    "transducer_partition_rules",
    "transducer_pipeline_partition_rules",
    "transducer_stack_block_params",
    "transducer_unstack_block_params",
    "make_mer_train_step",
    "ConformerConfig",
    "ConformerCTC",
    "conformer_partition_rules",
    "make_pipeline_train_step",
    "make_pipelined_forward",
    "make_train_step",
    "moe_aux_loss",
    "pipeline_partition_rules",
    "stack_block_params",
    "streaming_logits",
    "unstack_block_params",
]
