"""Headline-shape A/B of the no-LM decode paths, on the real chip.

The whole-loop beam kernel is checked BEFORE the prologue gate in
``CTCPrefixSearch`` (ops/decoding.py), so when its gate is on the top-M
prologue kernel never runs in the no-LM path: the meaningful comparison at
the headline shape (B=32, T=500, V=1024, W=16) is 3-way —

  xla      USE_PALLAS_BEAM=0 USE_PALLAS_TOPM=0   (pure XLA scan + sort)
  prologue USE_PALLAS_BEAM=0 USE_PALLAS_TOPM=1   (fused prologue kernel)
  beamkern USE_PALLAS_BEAM=1                     (whole-loop kernel)

— plus the fused (3-gram LM) search with the prologue kernel off/on (the
whole-loop kernel never applies there). The winners are written into the
ORGANIC gate cache keys so later traced decodes route through the
headline-informed decision, and printed as JSON for the calibration seed
(pydrobert_tpu/ops/calibration/gates.json).

r2 calibration (tiny shape, T=64 N=8 V=128 W=8) said beamkern 32.4 ms vs
xla 34.1; prologue 29.6 vs sort 32.0 — thin margins that needed this
headline-shape confirmation (VERDICT r2 weak #2).
"""
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
import pydrobert_tpu.config as config
from pydrobert_tpu.ops import pallas
from pydrobert_tpu.ops.decoding import CTCPrefixSearch

B, T, V, W = 32, 500, 1024, 16
out = {"shape": dict(B=B, T=T, V=V, W=W)}
print("devices:", jax.devices(), flush=True)


def run_nolm(name, beam, topm):
    config.USE_PALLAS_BEAM = beam
    config.USE_PALLAS_TOPM = topm
    t0 = time.perf_counter()
    thr, per_utt, kernels, upk = bench._bench_search(
        CTCPrefixSearch(W), B, T, V, seed=1
    )
    out[name] = dict(
        thr=round(thr, 1), kernels=kernels, upk=upk,
        wall=round(time.perf_counter() - t0, 1),
    )
    print(name, out[name], flush=True)
    return thr


try:
    t_xla = run_nolm("xla", "0", "0")
    t_pro = run_nolm("prologue", "0", "1")
    t_beam = run_nolm("beamkern", "1", "0")
finally:
    config.USE_PALLAS_BEAM = "auto"
    config.USE_PALLAS_TOPM = "auto"

# fused search: prologue off/on (whole-loop kernel never applies)
lm = bench._bench_lm()
fsearch = CTCPrefixSearch(W, beta=0.5, lm=lm)
try:
    for name, topm in (("fused_xla", "0"), ("fused_prologue", "1")):
        config.USE_PALLAS_BEAM = "0"
        config.USE_PALLAS_TOPM = topm
        t0 = time.perf_counter()
        thr, _, kernels, upk = bench._bench_search(fsearch, B, T, V, seed=2)
        out[name] = dict(
            thr=round(thr, 1), kernels=kernels, upk=upk,
            wall=round(time.perf_counter() - t0, 1),
        )
        print(name, out[name], flush=True)
finally:
    config.USE_PALLAS_BEAM = "auto"
    config.USE_PALLAS_TOPM = "auto"

# headline-informed gate decisions -> organic keys (throughputs: higher wins)
d = jax.devices()[0]
kind = getattr(d, "device_kind", "unknown")
beam_key = f"{d.platform}:{kind}:{pallas._beam_kernel_rev()}"
topm_key = f"topm:{d.platform}:{kind}:{pallas._topm_rev()}"
best_nolm = max(t_xla, t_pro, t_beam)
decisions = {
    beam_key: {
        "use_pallas": bool(t_beam == best_nolm),
        "pallas_ms": round(B / t_beam * 1e3, 3),
        "xla_ms": round(B / max(t_xla, t_pro) * 1e3, 3),
        "shape": f"headline B{B} T{T} V{V} W{W} (ms = batch wall)",
    },
    topm_key: {
        "use_pallas": bool(t_pro > t_xla),
        "pallas_ms": round(B / t_pro * 1e3, 3),
        "sort_ms": round(B / t_xla * 1e3, 3),
        "shape": f"headline B{B} T{T} V{V} W{W} (ms = batch wall)",
    },
}
path = pallas._beam_gate_path()
disk = {}
if os.path.exists(path):
    disk = json.load(open(path))
disk.update(decisions)
os.makedirs(os.path.dirname(path), exist_ok=True)
json.dump(disk, open(path, "w"), indent=1)
out["decisions"] = decisions
print("AB-FINAL", json.dumps(out), flush=True)
