"""Deprecated alias of :mod:`pydrobert_tpu.functional`.

Mirrors the reference's deprecated ``pydrobert.torch.util`` shim
(``util.py:1-44``): warns and forwards.
"""

import warnings

warnings.warn(
    "pydrobert_tpu.util is deprecated. Use pydrobert_tpu.functional",
    DeprecationWarning,
    stacklevel=2,
)

from .functional import *  # noqa: F401,F403,E402
