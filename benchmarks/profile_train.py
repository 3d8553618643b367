"""Per-op device-time attribution of the flagship training step.

Same jax.profiler harness as profile_decode.py, pointed at
bench.bench_train_mfu's exact step (d512/L8, B=32, T=1000, SpecAugment +
fwd + CTC + bwd + adamw, rbg dropout keys). Aggregates device time by op
and prints the top blocks with their HLO one-liners — the direct
decomposition of where the step's milliseconds go.

Usage: ``python benchmarks/profile_train.py [inner] [d_model]``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (enables the compile cache)
from profile_decode import hlo_index, profile  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    inner = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    d_model = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    import optax
    from pydrobert_tpu.models import (
        ConformerConfig, ConformerCTC, make_train_step,
    )
    from pydrobert_tpu.ops.img import spec_augment

    B, T, U = 32, 1000, 100
    cfg = ConformerConfig(
        vocab_size=1024, num_filts=80, d_model=d_model, num_layers=8,
        num_heads=max(8, d_model // 64),
    )
    model = ConformerCTC(cfg)
    rng = np.random.RandomState(5)
    feats = jnp.asarray(rng.randn(B, T, cfg.num_filts), jnp.float32)
    feat_lens = jnp.full((B,), T, jnp.int32)
    refs = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, U)), jnp.int32)
    ref_lens = jnp.full((B,), U, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens)["params"]
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)

    def augment(key, f, lens):
        return spec_augment(
            key, f, max_time_warp=80.0, max_time_mask=100, max_freq_mask=27,
            lengths=lens.astype(jnp.float32),
        )

    step = make_train_step(model, optimizer, augment=augment)

    def run(params, opt_state, key, feats, feat_lens, refs, ref_lens):
        def body(carry, k):
            params, opt_state = carry
            params, opt_state, loss = step(
                params, opt_state, k, feats, feat_lens, refs, ref_lens
            )
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, inner)
        )
        return losses

    key = jax.random.key(1, impl="rbg")
    args = (params, opt_state, key, feats, feat_lens, refs, ref_lens)
    agg, hlo, wall, _ = profile(run, args)
    idx = hlo_index(hlo)
    total_us = sum(v[1] for v in agg.values())
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(f"TRAIN d={d_model} B={B} T={T} inner={inner}")
    print(f"wall/call {wall*1e3:.1f} ms; device total {total_us/3/1e3:.1f} "
          f"ms/call = {total_us/3/inner/1e3:.2f} ms/step")
    print(f"{'op':<46}{'calls':>7}{'tot_ms':>9}{'us/step':>9}  hlo")
    for name, (cnt, us) in rows[:50]:
        per_step = us / 3 / inner
        d = idx.get(name, "")[:100]
        print(f"{name:<46}{cnt:>7}{us/1e3:>9.2f}{per_step:>9.2f}  {d}")
    print(f"\nops total: {len(rows)}, device us total {total_us:.0f}")


if __name__ == "__main__":
    main()
