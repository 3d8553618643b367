"""Per-kernel dispatch slope inside a scan body (VERDICT r4 item 2).

The round-4 floor story charges decode scans ~0.8 us per kernel per step
and asserts the charge is a dev-tunnel artifact that a production v5e
would not pay (TODO.md round-4 notes). This probe settles that claim with
a direct measurement: a ``lax.scan`` whose body is K trivially-chained
tiny matmuls (each ``dot`` is its own XLA fusion => K kernels/step, the
HLO census verifies the count), timed at two scan lengths so the ~25 ms
per-call tunnel sync cancels in the difference. The slope of
step-time-vs-K IS the in-loop per-kernel dispatch charge on this chip,
separated from per-call sync (already measured by ``canary_sync_ms``)
and from real device work (a 128x128 f32 dot is ~0.1 us of MXU time).

Prints one JSON line: per-K step times, the fitted slope (us/kernel) and
intercept (us/step), and the census kernel counts.
"""

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pydrobert_tpu.utils.hlostats import count_body_kernels


def _sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])


def make_scan(K, length):
    """Scan of `length` steps, each step K chained 128x128 f32 dots."""

    def run(c, a):
        def step(c, _):
            for _ in range(K):
                c = (c @ a) * jnp.float32(1.0 / 16.0)
            return c, None

        out, _ = jax.lax.scan(step, c, None, length=length)
        return out

    return run


def measure(K, short=512, long=2048, reps=5):
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(128, 128).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.randn(128, 128).astype(np.float32))

    outs = {}
    for length in (short, long):
        compiled = jax.jit(make_scan(K, length)).lower(c, a).compile()
        if length == long:
            bodies = count_body_kernels(compiled.as_text())
            hot = max(
                bodies.values(), key=lambda b: (b["trip_count"], b["kernels"])
            )
            outs["kernels"] = hot["kernels"]
        _sync(compiled(c, a))  # warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(compiled(c, a))
            times.append(time.perf_counter() - t0)
        outs[length] = statistics.median(times)
    step_us = (outs[long] - outs[short]) / (long - short) * 1e6
    return step_us, outs["kernels"]


def main():
    Ks = [8, 16, 32, 64]
    rows = []
    for K in Ks:
        step_us, kernels = measure(K)
        rows.append({"K": K, "kernels_per_step": kernels,
                     "step_us": round(step_us, 3)})
        print(f"K={K:3d} kernels/step={kernels:3d} step={step_us:8.3f} us",
              flush=True)
    # least-squares line through (kernels, step_us)
    xs = np.array([r["kernels_per_step"] for r in rows], np.float64)
    ys = np.array([r["step_us"] for r in rows], np.float64)
    slope, intercept = np.polyfit(xs, ys, 1)
    out = {
        "rows": rows,
        "slope_us_per_kernel": round(float(slope), 4),
        "intercept_us_per_step": round(float(intercept), 3),
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
