"""Deprecated alias of :mod:`pydrobert_tpu.modules` (+ some functionals).

Mirrors the reference's deprecated ``pydrobert.torch.layers`` shim
(``layers.py:1-62``): warns and forwards so code written against the old
name keeps working.
"""

import warnings

warnings.warn(
    "pydrobert_tpu.layers is deprecated. Use pydrobert_tpu.functional for "
    "functions and pydrobert_tpu.modules for modules",
    DeprecationWarning,
    stacklevel=2,
)

from .functional import (  # noqa: F401,E402
    hard_optimal_completion_distillation_loss,
    minimum_error_rate_loss,
    random_shift,
    spec_augment,
    spec_augment_apply_parameters,
    spec_augment_draw_parameters,
)
from .modules import *  # noqa: F401,F403,E402
