"""Headline benchmark: SpecAugment + CTC beam-16 decode throughput per chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline", ...}``.
The headline value is batched CTC prefix beam search (width 16) throughput on
B=32, T=500, V=1024 logits (target 5k utt/sec/chip); extra fields carry the
SpecAugment throughput (B=16, T=1000, 80-mel; target 50k utt/sec/chip) and
p50 per-utterance decode latency. Configs from BASELINE.json.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pydrobert_tpu.ops.decoding import CTCPrefixSearch
from pydrobert_tpu.ops.img import spec_augment

SPECAUG_TARGET = 50_000.0
DECODE_TARGET = 5_000.0


def _sync(out):
    # Fetch one element to host: block_until_ready can be a no-op over
    # remote-device tunnels, but a device->host read must drain the stream.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def _time(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_spec_augment():
    B, T, F = 16, 1000, 80
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, T, F), jnp.float32)
    lengths = jnp.asarray(
        rng.randint(T // 2, T + 1, (B,)).astype(np.float32)
    )

    @jax.jit
    def run(key, feats, lengths):
        return spec_augment(
            key,
            feats,
            max_time_warp=80.0,
            max_freq_warp=0.0,
            max_time_mask=100,
            max_freq_mask=27,
            max_time_mask_proportion=1.0,
            num_time_mask=20,
            num_time_mask_proportion=0.04,
            num_freq_mask=2,
            lengths=lengths,
        )

    key = jax.random.PRNGKey(0)
    dt = _time(run, key, feats, lengths, iters=50)
    return B / dt


def bench_ctc_beam16():
    B, T, V, W = 32, 500, 1024, 16
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(T, B, V + 1), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (B,)).astype(np.int32))
    search = CTCPrefixSearch(W)

    run = jax.jit(lambda logits, lens: search(logits, lens))
    dt = _time(run, logits, lens, iters=10)
    return B / dt, dt / B


def main():
    sa = bench_spec_augment()
    dec, per_utt = bench_ctc_beam16()
    print(
        json.dumps(
            {
                "metric": "ctc_prefix_beam16_decode_throughput",
                "value": round(dec, 1),
                "unit": "utt/sec/chip",
                "vs_baseline": round(dec / DECODE_TARGET, 3),
                "specaugment_utt_per_sec": round(sa, 1),
                "specaugment_vs_baseline": round(sa / SPECAUG_TARGET, 3),
                "decode_p50_latency_ms_per_utt": round(per_utt * 1e3, 3),
                "device": jax.devices()[0].platform,
            }
        )
    )


if __name__ == "__main__":
    main()
