"""A/B acoustic-fetch formulations at serving batch (VERDICT r4 #3 area).

The fused decode fetches the acoustic probabilities of Q~384 candidate
tokens per batch row per frame from the step's (N, V+1) logits row. At
N=32 the where-reduce won the r4 A/B (gathers cost ~85us in-loop there).
At N=256 the where-reduce generates (N, Q, V) ~ 100M elements in-fusion
per step (measured 76 us/step); re-measure all three formulations at
serving batch.
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


def _sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])


def time_in_scan(build, N, Q, V, short=256, long=1024, reps=5):
    rng = np.random.RandomState(1)
    row0 = jnp.asarray(rng.randn(N, V).astype(np.float32))
    tok0 = jnp.asarray(rng.randint(0, V, (N, Q)).astype(np.int32))

    def make(length):
        def run(row, tok):
            def step(c, _):
                out = build(c, tok)
                # fold everything back; rotate tokens so steps differ
                return c + out.sum(1, keepdims=True) * 1e-9, None
            out, _ = jax.lax.scan(step, row, None, length=length)
            return out
        return jax.jit(run).lower(row0, tok0).compile()

    ts = {}
    for length in (short, long):
        compiled = make(length)
        _sync(compiled(row0, tok0))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(compiled(row0, tok0))
            times.append(time.perf_counter() - t0)
        ts[length] = statistics.median(times)
    return (ts[long] - ts[short]) / (long - short) * 1e6


def where_reduce(row, tok):
    V = row.shape[1]
    eq = tok[:, :, None] == jnp.arange(V, dtype=jnp.int32)[None, None]
    return jnp.where(eq, row[:, None, :], 0.0).sum(2)


def take_along(row, tok):
    return jnp.take_along_axis(row, tok, axis=1)


def onehot_dot(row, tok):
    V = row.shape[1]
    oh = (
        tok[:, :, None] == jnp.arange(V, dtype=jnp.int32)[None, None]
    ).astype(jnp.float32)
    return jnp.einsum("nqv,nv->nq", oh, row,
                      precision=jax.lax.Precision.HIGHEST)


def flat_take(row, tok):
    # flatten to one global gather: idx = n*V + tok
    N, V = row.shape
    flat = row.reshape(N * V)
    idx = tok + jnp.arange(N, dtype=jnp.int32)[:, None] * V
    return jnp.take(flat, idx, axis=0)


def main():
    out = {}
    for N in (32, 256):
        for name, fn in (
            ("where_reduce", where_reduce),
            ("take_along", take_along),
            ("flat_take", flat_take),
            ("onehot_dot", onehot_dot),
        ):
            if name == "onehot_dot" and N == 256:
                continue  # (256,384,1024) f32 operand = 400 MB; skip
            us = time_in_scan(fn, N, 384, 1024)
            out[f"N{N}_{name}"] = round(us, 2)
            print(f"N={N:4d} {name:13s} {us:8.2f} us/step", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
