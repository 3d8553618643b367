"""Data pipeline: parsers, datasets, loaders, samplers.

Mirrors the reference's ``pydrobert.torch.data`` public module
(``data.py:64-98``): transcript/LM file parsing (ARPA, NIST trn/ctm, Praat
TextGrid), the on-disk SpectDataSet directory convention, epoch-deterministic
(and process-sharded) samplers, bucket batching, and padded-batch collation.
Host-side code is numpy; device hand-off produces (optionally sharded)
``jax.Array`` batches.
"""

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
    "parse_arpa_lm",
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
