"""Second-round top-K probe: cost structure of the decode sort.

Measures (in-scan, two-length difference): payload share (values-only vs
variadic sort), width scaling, and a hand-rolled bitonic tournament
top-K (sorted 16-blocks, pairwise bitonic merges, keep top half) with
exact (value desc, index asc) tie semantics. Also diagnoses
``approx_max_k``'s exactness failure (tie order only, or value loss).
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


def time_in_scan(build, N, C, short=512, long=2048, reps=5):
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


# ---------------- bitonic tournament top-K ----------------

def _cs(va, ia, vb, ib):
    """Lexicographic compare-swap: keep (value desc, index asc) winners."""
    a_wins = (va > vb) | ((va == vb) & (ia < ib))
    hi_v = jnp.where(a_wins, va, vb)
    hi_i = jnp.where(a_wins, ia, ib)
    lo_v = jnp.where(a_wins, vb, va)
    lo_i = jnp.where(a_wins, ib, ia)
    return hi_v, hi_i, lo_v, lo_i


def _net_stage(v, i, j, desc):
    """One compare-exchange stage of a bitonic network along axis -1.

    ``desc[p]`` says whether position p's K-window sorts descending.
    Positions p with partner ``p ^ j > p`` receive the winner (when
    desc) or loser (when not); partners receive the complement.
    """
    K = v.shape[-1]
    idx = np.arange(K)
    partner = idx ^ j
    va, ia = v[..., partner], i[..., partner]
    hi_v, hi_i, lo_v, lo_i = _cs(v, i, va, ia)
    is_first = jnp.asarray(partner > idx)
    want_hi = jnp.asarray(desc) == is_first  # first slot of a desc pair: hi
    new_v = jnp.where(want_hi, hi_v, lo_v)
    new_i = jnp.where(want_hi, hi_i, lo_i)
    return new_v, new_i


def _sort_blocks_desc(v, i, K):
    """Sort each trailing block of K (desc, ties idx asc) via a bitonic
    network on axis -1 reshaped to (..., nblocks, K)."""
    shp = v.shape
    nb = shp[-1] // K
    v = v.reshape(shp[:-1] + (nb, K))
    i = i.reshape(shp[:-1] + (nb, K))
    idx = np.arange(K)
    k = 2
    while k <= K:
        desc = (idx & k) == 0  # alternating directions build bitonic runs
        j = k // 2
        while j >= 1:
            v, i = _net_stage(v, i, j, desc)
            j //= 2
        k *= 2
    return v.reshape(shp), i.reshape(shp)


def _merge_desc(v, i, K):
    """v, i: (..., nb, K) desc-sorted blocks; merge pairs -> (..., nb/2, K)
    keeping each pair's top K."""
    shp = v.shape
    nb = shp[-2]
    va, ia = v[..., 0::2, :], i[..., 0::2, :]
    vb, ib = v[..., 1::2, :], i[..., 1::2, :]
    # reverse b so (a, reversed b) is bitonic; elementwise max keeps the
    # top-K of the pair (standard bitonic-merge first stage)
    vb = vb[..., ::-1]
    ib = ib[..., ::-1]
    hi_v, hi_i, _, _ = _cs(va, ia, vb, ib)
    # hi is bitonic; clean with a descending bitonic merge (j = K/2 .. 1)
    v, i = hi_v, hi_i
    desc = np.ones(K, bool)
    j = K // 2
    while j >= 1:
        v, i = _net_stage(v, i, j, desc)
        j //= 2
    return v, i


def topk_tournament(x, K):
    N, C = x.shape
    nb = -(-C // K)
    pad = nb * K - C
    v = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-np.inf)
    idx = jnp.broadcast_to(jnp.arange(nb * K, dtype=jnp.int32), (N, nb * K))
    v, i = _sort_blocks_desc(v, idx, K)
    v = v.reshape(N, nb, K)
    i = i.reshape(N, nb, K)
    if nb & (nb - 1):  # pad blocks to a power of two
        nb2 = 1 << (nb - 1).bit_length()
        v = jnp.pad(v, ((0, 0), (0, nb2 - nb), (0, 0)),
                    constant_values=-np.inf)
        i = jnp.pad(i, ((0, 0), (0, nb2 - nb), (0, 0)),
                    constant_values=2**30)
        nb = nb2
    while nb > 1:
        v, i = _merge_desc(v, i, K)
        nb //= 2
    return v[:, 0], i[:, 0]


def check_tournament():
    rng = np.random.RandomState(0)
    for case in [
        rng.randn(64, 544).astype(np.float32),
        (rng.randint(0, 4, (64, 544)) * 0.5).astype(np.float32),
        np.zeros((64, 544), np.float32),
    ]:
        x = jnp.asarray(case)
        rv, ri = jax.lax.top_k(x, 16)
        v, i = jax.jit(lambda x: topk_tournament(x, 16))(x)
        if not (np.array_equal(np.asarray(rv), np.asarray(v))
                and np.array_equal(np.asarray(ri), np.asarray(i))):
            bad = np.nonzero(
                ~(np.asarray(ri) == np.asarray(i)).all(1))[0][:3]
            print("tournament mismatch rows", bad)
            for b in bad[:1]:
                print(" ref", np.asarray(rv)[b][:8], np.asarray(ri)[b][:8])
                print(" got", np.asarray(v)[b][:8], np.asarray(i)[b][:8])
            return False
    return True


def approx_diagnose():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(256, 544).astype(np.float32))
    rv, ri = jax.lax.top_k(x, 16)
    av, ai = jax.lax.approx_max_k(x, 16, recall_target=1.0)
    vals_eq = np.array_equal(np.asarray(rv), np.asarray(av))
    idx_eq = np.array_equal(np.asarray(ri), np.asarray(ai))
    print(f"approx (random): values_equal={vals_eq} idx_equal={idx_eq}")
    xt = jnp.asarray((rng.randint(0, 4, (256, 544)) * 0.5).astype(np.float32))
    rv, ri = jax.lax.top_k(xt, 16)
    av, ai = jax.lax.approx_max_k(xt, 16, recall_target=1.0)
    print(
        f"approx (ties): values_equal="
        f"{np.array_equal(np.asarray(rv), np.asarray(av))} idx_equal="
        f"{np.array_equal(np.asarray(ri), np.asarray(ai))}"
    )


def main():
    print("tournament exact:", check_tournament(), flush=True)
    approx_diagnose()
    out = {}
    for N in (32, 256):
        out[f"N{N}_variadic544"] = time_in_scan(
            lambda c: jax.lax.top_k(c, 16), N, 544)
        out[f"N{N}_valsonly544"] = time_in_scan(
            lambda c: (jax.lax.sort(-c, dimension=1)[:, :16] * -1.0,
                       jnp.zeros((c.shape[0], 16), jnp.int32)), N, 544)
        out[f"N{N}_variadic304"] = time_in_scan(
            lambda c: jax.lax.top_k(c[:, :304], 16), N, 544)
        out[f"N{N}_variadic128"] = time_in_scan(
            lambda c: jax.lax.top_k(c[:, :128], 16), N, 544)
        out[f"N{N}_tournament"] = time_in_scan(
            lambda c: topk_tournament(c, 16), N, 544)
        for k, v in list(out.items()):
            if k.startswith(f"N{N}"):
                print(f"{k:22s} {v:8.3f} us/step", flush=True)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
