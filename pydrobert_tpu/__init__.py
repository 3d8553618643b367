"""pydrobert_tpu: a TPU-native (JAX/XLA/Pallas) speech & sequence toolkit.

A ground-up rebuild of the capabilities of sdrobert/pydrobert-pytorch for TPU:
batched sequence decoding (beam search, CTC greedy/prefix search with
shallow-fusion LMs, random walks), string-alignment algorithms and losses,
SpecAugment and spline image warping, feature transforms, discrete-gradient
estimators and relaxed distributions, a SpectDataSet-compatible data pipeline,
an epoch-level training controller, and the full CLI — all designed around
``jax.jit``/``lax.scan`` static-shape compute, explicit PRNG threading, Pallas
kernels on hot paths, and ``jax.sharding`` data parallelism.

Public submodules (mirroring the reference layout, ``__init__.py:25-33``):

- :mod:`pydrobert_tpu.config` — package constants
- :mod:`pydrobert_tpu.argcheck` — argument validators
- :mod:`pydrobert_tpu.functional` — pure jitted functions
- :mod:`pydrobert_tpu.modules` — stateless/parameterized module wrappers
- :mod:`pydrobert_tpu.distributions` — relaxed/sequence distributions
- :mod:`pydrobert_tpu.estimators` — discrete gradient estimators
- :mod:`pydrobert_tpu.data` — datasets, loaders, parsers
- :mod:`pydrobert_tpu.training` — training state controller

TPU-specific additions:

- :mod:`pydrobert_tpu.ops` — implementation modules (incl. Pallas kernels)
- :mod:`pydrobert_tpu.models` — reference model families (Conformer-CTC, ...)
- :mod:`pydrobert_tpu.parallel` — mesh/sharding utilities
- :mod:`pydrobert_tpu.serving` — online (streaming) recognition sessions
- :mod:`pydrobert_tpu.export` — AOT serving artifacts (StableHLO export)
"""

__version__ = "0.1.0"

__all__ = [
    "argcheck",
    "config",
    "data",
    "distributions",
    "estimators",
    "export",
    "functional",
    "models",
    "modules",
    "ops",
    "parallel",
    "serving",
    "training",
    "utils",
]
