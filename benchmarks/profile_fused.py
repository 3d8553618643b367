"""Per-op device-time attribution of the FUSED (3-gram LM) decode step.

Same harness as profile_decode.py, pointed at the shallow-fusion path
(bench's 3-gram LookupLanguageModel, beta=0.5), with the Pallas gates
calibrated first so the traced program is the one the bench measures.

Usage: ``python benchmarks/profile_fused.py [B] [inner]``.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (enables the compile cache)
from profile_decode import hlo_index, profile  # noqa: E402

import jax  # noqa: E402
from pydrobert_tpu.ops.decoding import CTCPrefixSearch  # noqa: E402
from pydrobert_tpu.ops.pallas import calibrate_gates  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    T, V, W = 500, 1024, 16
    calibrate_gates(force=False, beam_shapes=[(64, 8, 128, 8),
                                              (500, 32, 1024, 16)])
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(T, B, V + 1), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (B,)).astype(np.int32))
    lm = bench._bench_lm()
    search = CTCPrefixSearch(W, beta=0.5, lm=lm)

    def run(logits, lens):
        def step(carry, _):
            y, y_lens, y_probs = search(carry, lens)
            return carry.at[0, 0, 0].add(y_probs.sum() * 1e-9), y_lens
        out, y_lens = jax.lax.scan(step, logits, None, length=inner)
        return out, y_lens

    agg, hlo, wall, _ = profile(run, (logits, lens))
    idx = hlo_index(hlo)
    total_us = sum(v[1] for v in agg.values())
    steps = inner * (T - 1)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(f"FUSED B={B} T={T} V={V} W={W} inner={inner}")
    print(f"wall/call {wall*1e3:.1f} ms; device total {total_us/3/1e3:.1f} "
          f"ms/call; per-utt {total_us/3/1e3/B*1e3:.1f} us")
    print(f"{'op':<42}{'calls':>7}{'tot_ms':>9}{'us/step':>9}  hlo")
    for name, (cnt, us) in rows[:45]:
        per_step = us / 3 / steps
        d = idx.get(name, "")[:110]
        print(f"{name:<42}{cnt:>7}{us/1e3:>9.2f}{per_step:>9.2f}  {d}")
    print(f"\nops total: {len(rows)}, device us total {total_us:.0f}")


if __name__ == "__main__":
    main()
