"""Fifth-round top-K probe: chunked exact top_k (all widths <= 256).

Split the (N, 544) candidates into chunks of <= 256 (the cheap side of
XLA's sort-width cliff), top-16 each, then one <= 64-wide merge top_k.
Chunk-local stable ties + chunk-ordered concatenation = flat stable tie
order, identical to one big ``lax.top_k``.
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

K = 16


def topk_chunked(x, K, chunk=256):
    N, C = x.shape
    if C <= chunk:
        return jax.lax.top_k(x, K)
    vs, js = [], []
    for lo in range(0, C, chunk):
        hi = min(lo + chunk, C)
        v, j = jax.lax.top_k(x[:, lo:hi], min(K, hi - lo))
        vs.append(v)
        js.append(j + lo)
    vcat = jnp.concatenate(vs, 1)
    jcat = jnp.concatenate(js, 1)
    v2, j2 = jax.lax.top_k(vcat, K)
    idx = jnp.take_along_axis(jcat, j2, axis=1)
    return v2, idx


def check(fn):
    rng = np.random.RandomState(0)
    for case in [
        rng.randn(64, 544).astype(np.float32),
        (rng.randint(0, 4, (64, 544)) * 0.5).astype(np.float32),
        np.zeros((64, 544), np.float32),
        np.full((64, 544), -np.inf, np.float32),
    ]:
        x = jnp.asarray(case)
        rv, ri = jax.lax.top_k(x, K)
        v, i = jax.jit(lambda x: fn(x, K))(x)
        if not (np.array_equal(np.asarray(rv), np.asarray(v))
                and np.array_equal(np.asarray(ri), np.asarray(i))):
            return False
    return True


def _sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])


def time_in_scan(build, N, C=544, short=512, long=2048, reps=5):
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
    print("chunked exact:", check(topk_chunked), flush=True)
    out = {}
    for N in (32, 256):
        out[f"N{N}_full"] = time_in_scan(lambda c: jax.lax.top_k(c, K), N)
        out[f"N{N}_chunk256"] = time_in_scan(
            lambda c: topk_chunked(c, K, 256), N)
        out[f"N{N}_chunk192"] = time_in_scan(
            lambda c: topk_chunked(c, K, 192), N)
        for k, v in list(out.items()):
            if k.startswith(f"N{N}"):
                print(f"{k:20s} {v:8.3f} us/step", flush=True)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
