"""Implementation modules for pydrobert_tpu ops.

Public, stable re-exports live in :mod:`pydrobert_tpu.functional` (pure
functions) and :mod:`pydrobert_tpu.modules` (configured callables). The
submodules here group implementations by domain:

- :mod:`pydrobert_tpu.ops.string` — string matching DP, error rates, losses
- :mod:`pydrobert_tpu.ops.pad` — padding/chunking
- :mod:`pydrobert_tpu.ops.feats` — feature transforms and slicing
- :mod:`pydrobert_tpu.ops.img` — spline/warp/SpecAugment
- :mod:`pydrobert_tpu.ops.combinatorics` — enumeration and sampling
- :mod:`pydrobert_tpu.ops.rl` — reinforcement-learning returns
- :mod:`pydrobert_tpu.ops.decoding` — search steps and loops
- :mod:`pydrobert_tpu.ops.transducer` — RNN-T loss and greedy search
- :mod:`pydrobert_tpu.ops.pallas` — hand-written TPU kernels
"""
