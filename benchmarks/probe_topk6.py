"""Sixth-round top-K probe: sortedness-exploiting stage 1.

Per-beam slots are c*v_s with v_s desc-sorted: top-16 per beam =
compaction of the sorted run (cumsum over removal holes) + rank
insertion of <= 3 irregular values (dip/last/nonext). This probe mocks
stage 1's cost pieces in-scan at the real shapes, then a full mock
composite (stage1 elementwise + 256-wide merge top_k) WITHOUT semantic
correctness (cost probe only — exact integration comes after).
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


def time_in_scan(build, N, C=Kp * S, short=512, long=2048, reps=5):
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(N, C).astype(np.float32))

    def make(length):
        def run(x0):
            def step(c, _):
                out = build(c)
                # fold EVERY output leaf back in so nothing is elided
                # (consuming only element [0] lets XLA rewrite a top-k
                # sort into a max — measured 3 us vs the real 43)
                upd = jnp.zeros_like(c)
                for leaf in jax.tree_util.tree_leaves(out):
                    lf = leaf.reshape(leaf.shape[0], -1).astype(jnp.float32)
                    upd = upd.at[:, : lf.shape[1]].add(lf * 1e-7)
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


def piece_cumsum(c):
    v = c.reshape(c.shape[0], Kp, S)
    removed = v < -1.0
    return jnp.cumsum((~removed).astype(jnp.int32), axis=2)


def piece_compact_reduce(c):
    N = c.shape[0]
    v = c.reshape(N, Kp, S)
    rank = jnp.cumsum((v < -1.0).astype(jnp.int32), axis=2)  # mock ranks
    hit = rank[..., None, :] == jnp.arange(K, dtype=jnp.int32)[:, None]
    v16 = jnp.where(hit, v[..., None, :], 0.0).sum(-1)
    s16 = jnp.where(
        hit, jnp.arange(S, dtype=jnp.int32)[None, None, None], 0
    ).sum(-1)
    return v16, s16


def mock_full(c):
    N = c.shape[0]
    v16, s16 = piece_compact_reduce(c)
    # 3 mock insertions: rank computations + shifted selects
    for extra in range(3):
        ev = c[:, extra * Kp : extra * Kp + Kp].reshape(N, Kp, 1) * 0.5
        beats = ((v16 > ev) | ((v16 == ev) & (s16 < extra))).sum(
            -1, keepdims=True
        )  # (N, Kp, 1) insertion rank
        pos = jnp.arange(K, dtype=jnp.int32)[None, None]
        shifted_v = jnp.concatenate([v16[..., :1], v16[..., :-1]], -1)
        shifted_s = jnp.concatenate([s16[..., :1], s16[..., :-1]], -1)
        v16 = jnp.where(
            pos < beats, v16, jnp.where(pos == beats, ev, shifted_v)
        )
        s16 = jnp.where(
            pos < beats, s16, jnp.where(pos == beats, extra, shifted_s)
        )
    flat1 = s16 + jnp.arange(Kp, dtype=jnp.int32)[None, :, None] * S
    v2, j2 = jax.lax.top_k(v16.reshape(N, Kp * K), K)
    idx = jnp.take_along_axis(flat1.reshape(N, Kp * K), j2, axis=1)
    return v2, idx


def stage2_only(c):
    return jax.lax.top_k(c[:, : Kp * K], K)


def main():
    out = {}
    for N in (32, 256):
        out[f"N{N}_full544"] = time_in_scan(
            lambda c: jax.lax.top_k(c, K), N)
        out[f"N{N}_cumsum"] = time_in_scan(piece_cumsum, N)
        out[f"N{N}_compact"] = time_in_scan(piece_compact_reduce, N)
        out[f"N{N}_mockfull"] = time_in_scan(mock_full, N)
        out[f"N{N}_stage2only"] = time_in_scan(stage2_only, N)
        for k, v in list(out.items()):
            if k.startswith(f"N{N}"):
                print(f"{k:20s} {v:8.3f} us/step", flush=True)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
