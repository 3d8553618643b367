"""Profiling/tracing hooks (TPU-native capability).

The reference's closest analogue is its TorchScript compile switch
(``config.USE_JIT``); on TPU the compile layer is ``jax.jit`` and actual
tracing comes from ``jax.profiler``. These helpers standardize capturing a
trace viewable in TensorBoard/Perfetto and annotating named regions.
"""

import contextlib
from typing import Iterator

import jax

__all__ = ["annotate", "trace"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace for the enclosed block into `log_dir`."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str, **kwargs):
    """Named region that shows up on the trace timeline
    (``jax.profiler.TraceAnnotation``)."""
    return jax.profiler.TraceAnnotation(name, **kwargs)
