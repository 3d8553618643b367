"""Data pipeline: parsers, datasets, loaders, samplers.

Mirrors the reference's ``pydrobert.torch.data`` public module
(``data.py:64-98``): transcript/LM file parsing (ARPA, NIST trn/ctm, Praat
TextGrid), the on-disk SpectDataSet directory convention, epoch-deterministic
(and process-sharded) samplers, bucket batching, and padded-batch collation.
Host-side code is numpy; device hand-off produces (optionally sharded)
``jax.Array`` batches.
"""

from .datasets import (  # noqa: F401
    ContextWindowDataSet,
    LangDataSet,
    SpectDataSet,
    SpectTarDataSet,
    extract_window,
    validate_spect_data_set,
)
from .dataloaders import (  # noqa: F401
    AbstractEpochSampler,
    BucketBatchSampler,
    ContextWindowDataLoader,
    ContextWindowDataLoaderParams,
    DataLoaderParams,
    DynamicLengthDataLoaderParams,
    EpochRandomSampler,
    EpochSequentialSampler,
    LangDataLoader,
    LangDataLoaderParams,
    SpectDataLoader,
    SpectDataLoaderParams,
    context_window_seq_to_batch,
    lang_seq_to_batch,
    spect_seq_to_batch,
)
from .params import (  # noqa: F401
    ContextWindowDataParams,
    LangDataParams,
    SpectDataParams,
    params_from_dict,
    params_to_dict,
)
from .parsing import (  # noqa: F401
    parse_arpa_lm,
    read_ctm,
    read_textgrid,
    read_trn,
    read_trn_iter,
    token_to_transcript,
    transcript_to_token,
    write_ctm,
    write_textgrid,
    write_trn,
)

__all__ = [
    "AbstractEpochSampler",
    "BucketBatchSampler",
    "ContextWindowDataLoader",
    "ContextWindowDataLoaderParams",
    "ContextWindowDataParams",
    "ContextWindowDataSet",
    "DataLoaderParams",
    "DynamicLengthDataLoaderParams",
    "EpochRandomSampler",
    "EpochSequentialSampler",
    "LangDataLoader",
    "LangDataLoaderParams",
    "LangDataParams",
    "LangDataSet",
    "SpectDataLoader",
    "SpectDataLoaderParams",
    "SpectDataParams",
    "SpectDataSet",
    "SpectTarDataSet",
    "context_window_seq_to_batch",
    "extract_window",
    "lang_seq_to_batch",
    "params_from_dict",
    "params_to_dict",
    "parse_arpa_lm",
    "spect_seq_to_batch",
    "validate_spect_data_set",
    "read_ctm",
    "read_textgrid",
    "read_trn",
    "read_trn_iter",
    "token_to_transcript",
    "transcript_to_token",
    "write_ctm",
    "write_textgrid",
    "write_trn",
]


# ---------------------------------------------------------------------------
# Deprecated v0.3-era names (reference data.py:101-135 and
# _dataloaders.py:1118-1548): warn-and-forward aliases.
# ---------------------------------------------------------------------------


def _deprecated_alias(old_name, cls, **fixed_kwargs):
    import functools
    import warnings as _warnings

    @functools.wraps(cls, assigned=("__doc__",), updated=())
    def make(*args, **kwargs):
        _warnings.warn(
            f"The name '{old_name}' is deprecated. Please switch to "
            f"'{cls.__name__}'",
            DeprecationWarning,
            stacklevel=2,
        )
        kwargs = {**fixed_kwargs, **kwargs}
        return cls(*args, **kwargs)

    make.__name__ = old_name
    return make


DataSetParams = _deprecated_alias("DataSetParams", DataLoaderParams)
SpectDataSetParams = _deprecated_alias(
    "SpectDataSetParams", SpectDataLoaderParams
)
ContextWindowDataSetParams = _deprecated_alias(
    "ContextWindowDataSetParams", ContextWindowDataLoaderParams
)
SpectTrainingDataLoader = _deprecated_alias(
    "SpectTrainingDataLoader", SpectDataLoader, shuffle=True
)
SpectEvaluationDataLoader = _deprecated_alias(
    "SpectEvaluationDataLoader", SpectDataLoader, shuffle=False,
    suppress_uttids=False,
)
ContextWindowTrainingDataLoader = _deprecated_alias(
    "ContextWindowTrainingDataLoader", ContextWindowDataLoader, shuffle=True
)
ContextWindowEvaluationDataLoader = _deprecated_alias(
    "ContextWindowEvaluationDataLoader", ContextWindowDataLoader,
    shuffle=False, suppress_uttids=False,
)
