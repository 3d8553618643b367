"""A/B exact top-K selection variants for the decode scan (VERDICT r4 #1).

The B=256 device-time profile attributes 38.8 us/step (26% of the frame
loop) to ``lax.top_k`` over the (N, Kp*S=544) candidate matrix, which XLA
lowers to a full 544-wide stable variadic sort. The candidates have
structure (N, Kp=16, S=34); exact alternatives:

- ``full``: current ``lax.top_k`` (stable sort + slice).
- ``twostage``: per-beam stable sort over S (ties by slot), keep the top
  K of each beam, then one stable (N, Kp*K=256)-wide merge sort. Ties
  order by (value desc, k major, slot minor) = flat index — identical to
  ``lax.top_k``.
- ``iter``: K sequential max/argmax/mask passes (stable: argmax returns
  the first maximum).
- ``approx``: ``lax.approx_max_k`` with recall_target=1.0 (TPU
  PartialReduce custom call); exactness checked, tie order suspect.

Each variant is verified bit-exact (values AND indices) against
``lax.top_k`` on random + adversarial-tie inputs before timing.
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


def topk_full(x, K, Kp, S):
    return jax.lax.top_k(x.reshape(x.shape[0], Kp * S), K)


def topk_twostage(x, K, Kp, S):
    N = x.shape[0]
    x3 = x.reshape(N, Kp, S)
    # stage 1: per-beam top-K (stable sort desc over S; iota breaks ties
    # by slot). is_stable + descending order on values only.
    slot = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (N, Kp, S))
    v1, s1 = jax.lax.sort_key_val(-x3, slot, dimension=2)
    v1 = -v1[:, :, :K]  # (N, Kp, K) per-beam top-K desc
    s1 = s1[:, :, :K]
    flat1 = s1 + jnp.arange(Kp, dtype=jnp.int32)[None, :, None] * S
    # stage 2: merge. Stable sort over Kp*K keeps ties in (k major,
    # slot minor) = ascending flat order, matching lax.top_k exactly.
    v2, f2 = jax.lax.sort_key_val(
        -v1.reshape(N, Kp * K), flat1.reshape(N, Kp * K), dimension=1
    )
    return -v2[:, :K], f2[:, :K]


def topk_iter(x, K, Kp, S):
    N = x.shape[0]
    xf = x.reshape(N, Kp * S)
    vals, idxs = [], []
    cur = xf
    for _ in range(K):
        i = jnp.argmax(cur, axis=1)
        v = jnp.take_along_axis(cur, i[:, None], axis=1)[:, 0]
        vals.append(v)
        idxs.append(i.astype(jnp.int32))
        cur = jnp.where(
            jnp.arange(Kp * S, dtype=jnp.int32)[None] == i[:, None],
            -jnp.inf, cur,
        )
    return jnp.stack(vals, 1), jnp.stack(idxs, 1)


def topk_approx(x, K, Kp, S):
    return jax.lax.approx_max_k(
        x.reshape(x.shape[0], Kp * S), K, recall_target=1.0
    )


VARIANTS = {
    "full": topk_full,
    "twostage": topk_twostage,
    "iter": topk_iter,
    "approx": topk_approx,
}


def check_exact(fn, K, Kp, S, N=64):
    rng = np.random.RandomState(0)
    cases = [rng.randn(N, Kp * S).astype(np.float32)]
    # adversarial ties: few distinct values
    cases.append(
        rng.randint(0, 4, (N, Kp * S)).astype(np.float32) * 0.5
    )
    cases.append(np.zeros((N, Kp * S), np.float32))
    ref = jax.jit(lambda x: topk_full(x, K, Kp, S))
    f = jax.jit(lambda x: fn(x, K, Kp, S))
    for c in cases:
        rv, ri = ref(jnp.asarray(c))
        v, i = f(jnp.asarray(c))
        if not (np.array_equal(np.asarray(rv), np.asarray(v))
                and np.array_equal(np.asarray(ri), np.asarray(i))):
            return False
    return True


def _sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])


def time_in_scan(fn, K, Kp, S, N, short=512, long=2048, reps=5):
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(N, Kp * S).astype(np.float32))

    def make(length):
        def run(x0):
            def step(c, _):
                v, i = fn(c, K, Kp, S)
                # fold back so iterations can't be elided; perturb so the
                # input changes every step
                upd = jnp.zeros_like(c).reshape(N, Kp * S)
                upd = upd.at[:, :K].set(v * 1e-6 + i.astype(jnp.float32) * 1e-9)
                return c + upd.reshape(c.shape), None
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
    K, Kp, S = 16, 16, 34
    out = {}
    for N in (32, 256):
        for name, fn in VARIANTS.items():
            try:
                exact = check_exact(fn, K, Kp, S)
            except Exception as e:
                print(f"N={N} {name}: check failed {e!r}")
                continue
            us = time_in_scan(fn, K, Kp, S, N)
            out[f"N{N}_{name}"] = {"exact": exact, "us_per_step": round(us, 3)}
            print(f"N={N:4d} {name:9s} exact={exact} {us:8.3f} us/step",
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
