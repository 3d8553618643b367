"""Per-op device-time attribution of the no-LM decode step (VERDICT r4 #1).

``jax.profiler`` traces DO capture per-op TPU events through the axon
tunnel (verified 2026-08-21): each HLO instruction that executes appears
as a device-lane event with a microsecond duration. This script compiles
the headline no-LM ``CTCPrefixSearch`` at a configurable batch size,
captures a trace, and aggregates device time by op — the direct
decomposition of the decode scan body that rounds 1-4 never had (they
worked from kernel censuses + ablation A/Bs).

Usage: ``python benchmarks/profile_decode.py [B] [inner]``.

Prints one table (op, calls, total us, us/step) sorted by total device
time, plus the HLO one-liner for each hot op so the table reads as
"which part of the step" rather than "fusion.123".
"""

import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pydrobert_tpu.utils.cache import enable_cache

enable_cache(
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache", "jax",
    )
)

from pydrobert_tpu.ops.decoding import CTCPrefixSearch


def _sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])


def hlo_index(txt):
    """op name -> its HLO definition line (shapes + op kind)."""
    idx = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+) = (.*)", line)
        if m:
            idx.setdefault(m.group(1), m.group(2))
    return idx


def profile(fn, args, calls=3, trace_dir=None):
    compiled = jax.jit(fn).lower(*args).compile()
    hlo = compiled.as_text()
    _sync(compiled(*args))  # warm
    d = trace_dir or tempfile.mkdtemp(prefix="pdt_prof_")
    jax.profiler.start_trace(d)
    t0 = time.perf_counter()
    out = None
    for _ in range(calls):
        out = compiled(*args)
    _sync(out)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(d, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    evs = tr.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    agg = defaultdict(lambda: [0, 0.0])  # name -> [count, total_us]
    for e in evs:
        if e.get("ph") == "X" and e["pid"] in dev_pids:
            agg[e["name"]][0] += 1
            agg[e["name"]][1] += e.get("dur", 0.0)
    return agg, hlo, wall / calls, compiled


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    inner = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    T, V, W = 500, 1024, 16
    # calibrate the Pallas gates first so the traced program is the one
    # the bench measures (uncalibrated, the prologue top-M runs as a full
    # stable sort — ~45 us/step of phantom attribution at B=256)
    from pydrobert_tpu.ops.pallas import calibrate_gates

    calibrate_gates(force=False, beam_shapes=[(64, 8, 128, 8),
                                              (500, 32, 1024, 16)])
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(T, B, V + 1), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (B,)).astype(np.int32))
    search = CTCPrefixSearch(W)

    def run(logits, lens):
        def step(carry, _):
            y, y_lens, y_probs = search(carry, lens)
            return carry + y_probs.sum() * 1e-9, y_lens
        out, y_lens = jax.lax.scan(step, logits, None, length=inner)
        return out, y_lens

    agg, hlo, wall, _ = profile(run, (logits, lens))
    idx = hlo_index(hlo)
    total_us = sum(v[1] for v in agg.values())
    # each inner iteration runs the T-1 step frame loop; per-step figures
    # divide by calls*inner*(T-1) for ops with ~that many executions
    steps = inner * (T - 1)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(f"B={B} T={T} V={V} W={W} inner={inner}")
    print(f"wall/call {wall*1e3:.1f} ms; device total {total_us/3/1e3:.1f} "
          f"ms/call; per-utt {total_us/3/1e3/B*1e3:.1f} us")
    print(f"{'op':<42}{'calls':>7}{'tot_ms':>9}{'us/step':>9}  hlo")
    for name, (cnt, us) in rows[:40]:
        per_step = us / 3 / steps  # 3 calls traced
        d = idx.get(name, "")[:110]
        print(f"{name:<42}{cnt:>7}{us/1e3:>9.2f}{per_step:>9.2f}  {d}")
    print(f"\nops total: {len(rows)}, device us total {total_us:.0f}")


if __name__ == "__main__":
    main()
