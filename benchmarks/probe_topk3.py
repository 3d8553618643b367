"""Third-round top-K probe: two-stage lax.top_k composites + width curve.

Stage 1 = per-beam top-K of the S=34 slots (ties by slot index), stage 2
= top-K over the Kp*K=256 merged survivors. Stage-2 input index is
(k major, per-beam rank minor), so stable ties order exactly like a flat
``lax.top_k`` over (N, Kp*S). Variants differ in stage-1 layout.
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
from pydrobert_tpu.utils.cache import enable_cache

enable_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax"))

K, Kp, S = 16, 16, 34


def _sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])


def twostage_3d(x):
    N = x.shape[0]
    x3 = x.reshape(N, Kp, S)
    v1, s1 = jax.lax.top_k(x3, K)  # (N, Kp, K)
    flat1 = s1 + jnp.arange(Kp, dtype=jnp.int32)[None, :, None] * S
    v2, j2 = jax.lax.top_k(v1.reshape(N, Kp * K), K)
    idx = jnp.take_along_axis(flat1.reshape(N, Kp * K), j2, axis=1)
    return v2, idx


def twostage_2d(x):
    N = x.shape[0]
    x2 = x.reshape(N * Kp, S)
    v1, s1 = jax.lax.top_k(x2, K)  # (N*Kp, K)
    flat1 = (
        s1.reshape(N, Kp, K)
        + jnp.arange(Kp, dtype=jnp.int32)[None, :, None] * S
    )
    v2, j2 = jax.lax.top_k(v1.reshape(N, Kp * K), K)
    idx = jnp.take_along_axis(flat1.reshape(N, Kp * K), j2, axis=1)
    return v2, idx


def check(fn):
    rng = np.random.RandomState(0)
    for case in [
        rng.randn(64, Kp * S).astype(np.float32),
        (rng.randint(0, 4, (64, Kp * S)) * 0.5).astype(np.float32),
        np.zeros((64, Kp * S), np.float32),
    ]:
        x = jnp.asarray(case)
        rv, ri = jax.lax.top_k(x, K)
        v, i = jax.jit(fn)(x)
        if not (np.array_equal(np.asarray(rv), np.asarray(v))
                and np.array_equal(np.asarray(ri), np.asarray(i))):
            return False
    return True


def time_in_scan(build, N, C=Kp * S, short=512, long=2048, reps=5):
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(N, C).astype(np.float32))

    def make(length):
        def run(x0):
            def step(c, _):
                v, i = build(c)
                upd = jnp.zeros_like(c)
                upd = upd.at[:, : v.shape[1]].set(
                    v * 1e-6 + i.astype(jnp.float32) * 1e-9
                )
                return c + upd, None
            out, _ = jax.lax.scan(step, x0, None, length=length)
            return out
        return jax.jit(run).lower(x0).compile()

    ts = {}
    for length in (short, long):
        compiled = make(length)
        _sync(compiled(x0))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(compiled(x0))
            times.append(time.perf_counter() - t0)
        ts[length] = statistics.median(times)
    return (ts[long] - ts[short]) / (long - short) * 1e6


def main():
    print("twostage_3d exact:", check(twostage_3d), flush=True)
    print("twostage_2d exact:", check(twostage_2d), flush=True)
    out = {}
    for N in (32, 256):
        out[f"N{N}_twostage3d"] = time_in_scan(twostage_3d, N)
        out[f"N{N}_twostage2d"] = time_in_scan(twostage_2d, N)
        for w in (160, 192, 256):
            out[f"N{N}_width{w}"] = time_in_scan(
                lambda c, w=w: jax.lax.top_k(c[:, :w], K), N)
        for k, v in list(out.items()):
            if k.startswith(f"N{N}"):
                print(f"{k:22s} {v:8.3f} us/step", flush=True)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
