"""Public estimators interface.

Mirrors the reference's ``pydrobert.torch.estimators``
(``estimators.py:40-51``): exact enumeration plus the Monte Carlo family.
Sampling estimators take an explicit PRNG key when called; see
:mod:`pydrobert_tpu.ops.mc` for the JAX-native RELAX variance-minimizing
objective (:func:`relax_variance_loss`).
"""

from .ops.mc import (  # noqa: F401
    DirectEstimator,
    EnumerateEstimator,
    Estimator,
    ImportanceSamplingEstimator,
    IndependentMetropolisHastingsEstimator,
    MonteCarloEstimator,
    RelaxEstimator,
    ReparameterizationEstimator,
    StraightThroughEstimator,
    relax_variance_loss,
)

__all__ = [
    "DirectEstimator",
    "EnumerateEstimator",
    "Estimator",
    "ImportanceSamplingEstimator",
    "IndependentMetropolisHastingsEstimator",
    "MonteCarloEstimator",
    "RelaxEstimator",
    "ReparameterizationEstimator",
    "StraightThroughEstimator",
    "relax_variance_loss",
]
