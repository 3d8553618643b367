"""Public distributions interface.

Mirrors the reference's ``pydrobert.torch.distributions``
(``distributions.py:35-45``): straight-through protocols, relaxed
distributions, fixed-cardinality sampling, and the sequential-LM sequence
distribution. All sampling methods take explicit PRNG keys.
"""

from .ops.combinatorics import (  # noqa: F401
    SimpleRandomSamplingWithoutReplacement,
)
from .ops.straight_through import (  # noqa: F401
    ConditionalStraightThrough,
    Density,
    GumbelOneHotCategorical,
    LogisticBernoulli,
    StraightThrough,
)

__all__ = [
    "ConditionalStraightThrough",
    "Density",
    "GumbelOneHotCategorical",
    "LogisticBernoulli",
    "SequentialLanguageModelDistribution",
    "SimpleRandomSamplingWithoutReplacement",
    "StraightThrough",
    "TokenSequenceConstraint",
]


def __getattr__(name):
    if name in ("SequentialLanguageModelDistribution", "TokenSequenceConstraint"):
        from .ops import decoding as _decoding

        return getattr(_decoding, name)
    raise AttributeError(name)
