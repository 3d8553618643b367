"""Profiling/tracing (TPU-native capability).

The reference's closest analogue is its TorchScript compile switch
(``config.USE_JIT``); on TPU the compile layer is ``jax.jit``, actual
timeline tracing comes from ``jax.profiler``, and the metrics that
*transfer* across chips come from the compiled HLO (kernel counts, bytes,
FLOPs — see :mod:`pydrobert_tpu.utils.hlostats`). This module bundles all
three:

- :func:`trace` / :func:`annotate`: TensorBoard/Perfetto timeline capture.
- :func:`measure_sync_overhead`: the per-call dispatch + device->host sync
  cost of the current device connection (remote-device tunnels charge tens
  of milliseconds; timings that don't amortize it measure the wire, not
  the program).
- :func:`profile_program`: compile + run a function and report wall time
  with the overhead amortized away, plus the HLO-derived stats — the exact
  methodology ``bench.py`` uses for the driver's numbers.
"""

import contextlib
import statistics
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "annotate",
    "trace",
    "measure_sync_overhead",
    "profile_program",
]


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


def _drain(out) -> None:
    # device->host read: drains the execution stream even where
    # block_until_ready is a no-op (observed over remote-device tunnels)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def measure_sync_overhead(reps: int = 5) -> float:
    """Seconds of per-call overhead: one timed call of a trivial jitted
    program (dispatch + device->host sync, no real device work). Subtract
    this from single-call timings, or amortize it by batching calls."""
    tiny = jnp.zeros((8,), jnp.float32)
    fn = jax.jit(lambda x: x + 1.0)
    _drain(fn(tiny))
    times = []
    for _ in range(max(3, reps)):
        t0 = time.perf_counter()
        _drain(fn(tiny))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def profile_program(
    fn: Callable,
    *args,
    calls: int = 8,
    reps: int = 3,
    static_argnames=None,
    donate_argnums=(),
) -> Dict[str, Any]:
    """Compile ``fn`` for ``args`` and measure it with the per-call sync
    overhead amortized: each rep dispatches `calls` back-to-back executions
    and syncs ONCE (in-order execution makes draining the last output a
    barrier for all of them).

    Returns a dict with:

    - ``seconds_per_call``: median amortized wall time per execution
    - ``sync_overhead_s``: the per-call overhead that was amortized away
    - ``bytes_accessed`` / ``flops`` / ``transcendentals``: XLA cost
      analysis of one execution. CAVEAT: cost analysis counts each
      while/scan BODY ONCE, not x trip count — for loop-heavy programs
      these are one iteration's figures, not totals
    - ``loop_kernels`` / ``loop_trip_count``: per-iteration kernel count of
      the hottest while loop (largest trip count), 0 if none — the
      dispatch-bound figure that transfers across chips
    - ``us_per_kernel``: measured loop-iteration time over ``loop_kernels``
      (only when the program has a hot loop)
    """
    from .hlostats import count_body_kernels

    if donate_argnums:
        # donated buffers are consumed by the first execution; back-to-back
        # identical calls would reuse them
        calls = 1
    jitted = fn if hasattr(fn, "lower") else jax.jit(
        fn, static_argnames=static_argnames, donate_argnums=donate_argnums
    )
    compiled = jitted.lower(*args).compile()
    stats: Dict[str, Any] = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        for k_out, k_in in (
            ("bytes_accessed", "bytes accessed"),
            ("flops", "flops"),
            ("transcendentals", "transcendentals"),
        ):
            stats[k_out] = float(ca.get(k_in, 0.0))
    except Exception:
        stats.update(bytes_accessed=0.0, flops=0.0, transcendentals=0.0)
    hot: Optional[Dict[str, Any]] = None
    try:
        bodies = count_body_kernels(compiled.as_text())
        if bodies:
            hot = max(
                bodies.values(),
                key=lambda b: (b["trip_count"], b["kernels"]),
            )
    except Exception:
        pass
    stats["loop_kernels"] = hot["kernels"] if hot else 0
    stats["loop_trip_count"] = hot["trip_count"] if hot else 0

    _drain(compiled(*args))  # warm
    times = []
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        out = None
        for _ in range(max(1, calls)):
            out = compiled(*args)
        _drain(out)
        times.append((time.perf_counter() - t0) / max(1, calls))
    stats["seconds_per_call"] = statistics.median(times)
    stats["sync_overhead_s"] = measure_sync_overhead()
    if hot and hot["trip_count"] and hot["kernels"]:
        stats["us_per_kernel"] = round(
            stats["seconds_per_call"]
            / hot["trip_count"]
            * 1e6
            / hot["kernels"],
            3,
        )
    return stats
