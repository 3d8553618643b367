"""Fourth-round top-K probe: rank-select stage 1 + 256-wide top_k stage 2.

Stage 1 computes each candidate's exact lexicographic rank inside its
beam's S=34 slots via an (S, S) compare matrix (fused elementwise +
reduce; no sort), compacts the top K=16 per beam into rank-indexed slots
with where-reduces, then stage 2 runs one 256-wide ``lax.top_k`` (the
cheap side of XLA's sort-width cliff). Tie order (value desc, flat index
asc) is exact by construction.
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


def rankselect(x):
    N = x.shape[0]
    v = x.reshape(N, Kp, S)
    # rank[s] = #{s' : v[s'] > v[s] or (v[s'] == v[s] and s' < s)}
    gt = v[..., None, :] > v[..., :, None]  # [n,g,s,s'] : s' beats s
    eq = v[..., None, :] == v[..., :, None]
    lower = (
        jnp.arange(S, dtype=jnp.int32)[None, :]
        < jnp.arange(S, dtype=jnp.int32)[:, None]
    )  # [s, s'] : s' < s
    rank = (gt | (eq & lower)).sum(-1).astype(jnp.int32)  # (N, Kp, S)
    # compact slots with rank < K into rank-indexed positions
    r_iota = jnp.arange(K, dtype=jnp.int32)
    hit = rank[..., None, :] == r_iota[:, None]  # (N, Kp, K, S)
    v16 = jnp.where(hit, v[..., None, :], 0.0).sum(-1)  # (N, Kp, K)
    s16 = jnp.where(
        hit, jnp.arange(S, dtype=jnp.int32)[None, None, None], 0
    ).sum(-1)
    # rank r >= #live slots (can't happen here: S > K always fills): S >= K
    flat1 = s16 + jnp.arange(Kp, dtype=jnp.int32)[None, :, None] * S
    v2, j2 = jax.lax.top_k(v16.reshape(N, Kp * K), K)
    idx = jnp.take_along_axis(flat1.reshape(N, Kp * K), j2, axis=1)
    return v2, idx


def check(fn):
    rng = np.random.RandomState(0)
    for case in [
        rng.randn(64, Kp * S).astype(np.float32),
        (rng.randint(0, 4, (64, Kp * S)) * 0.5).astype(np.float32),
        np.zeros((64, Kp * S), np.float32),
        np.full((64, Kp * S), -np.inf, np.float32),
    ]:
        x = jnp.asarray(case)
        rv, ri = jax.lax.top_k(x, K)
        v, i = jax.jit(fn)(x)
        if not (np.array_equal(np.asarray(rv), np.asarray(v))
                and np.array_equal(np.asarray(ri), np.asarray(i))):
            print("mismatch")
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
    rs_inf = jax.jit(rankselect)  # warm check
    print("rankselect exact:", check(rankselect), flush=True)
    out = {}
    for N in (32, 256):
        out[f"N{N}_full544"] = time_in_scan(
            lambda c: jax.lax.top_k(c, K), N)
        out[f"N{N}_rankselect"] = time_in_scan(rankselect, N)
        # re-measure the suspicious width-256 point 3x
        for rep in range(3):
            out[f"N{N}_width256_r{rep}"] = time_in_scan(
                lambda c: jax.lax.top_k(c[:, :256], K), N)
        for k, v in list(out.items()):
            if k.startswith(f"N{N}"):
                print(f"{k:24s} {v:8.3f} us/step", flush=True)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
