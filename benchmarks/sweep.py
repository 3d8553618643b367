"""One-shot TPU measurement sweep after tunnel recovery (run by watcher).

Ordered most-important-first so a short tunnel window still yields the
essentials: (1) no-LM + fused throughput/kernels, (2) fresh HLO dumps,
(3) beam-gate calibration (new kernel), (4) unroll sweep.
"""
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
import pydrobert_tpu.config as config
from pydrobert_tpu.ops.decoding import CTCPrefixSearch
from pydrobert_tpu.utils.hlostats import count_body_kernels

out = {}
print("devices:", jax.devices(), flush=True)

# --- 0. prime the Pallas gates (organic keys; instant when cached) so the
# decode traces below bake in the calibrated winners
from pydrobert_tpu.ops import pallas as _pallas
try:
    print("gates primed:", json.dumps(_pallas.calibrate_gates()), flush=True)
except Exception as e:
    print("gate priming error:", e, flush=True)

# --- 1. no-LM + fused throughput + kernels/step
t0 = time.perf_counter()
thr, per_utt, kernels, upk = bench._bench_search(
    CTCPrefixSearch(16), 32, 500, 1024, seed=1
)
out["nolm"] = dict(thr=round(thr, 1), kernels=kernels, upk=upk,
                   wall=round(time.perf_counter() - t0, 1))
print("noLM", out["nolm"], flush=True)

lm = bench._bench_lm()
fsearch = CTCPrefixSearch(16, beta=0.5, lm=lm)
t0 = time.perf_counter()
thr, per_utt, kernels, upk = bench._bench_search(fsearch, 32, 500, 1024, seed=2)
out["fused"] = dict(thr=round(thr, 1), kernels=kernels, upk=upk,
                    wall=round(time.perf_counter() - t0, 1))
print("fused", out["fused"], flush=True)
print("SWEEP1", json.dumps(out), flush=True)

# --- 1b. LM-only beam search (batch-major rework) throughput
t0 = time.perf_counter()
thr = bench.bench_ngram_beam_search()
out["ngram_beam"] = dict(thr=round(thr, 1),
                         wall=round(time.perf_counter() - t0, 1))
print("ngram_beam", out["ngram_beam"], flush=True)

# --- 2. fresh HLO dumps (for copy/layout analysis)
search = CTCPrefixSearch(16)
logits, lens = bench._decode_inputs(32, 500, 1024, 1)
txt = jax.jit(lambda l, n: search(l, n)).lower(logits, lens).compile().as_text()
open("/tmp/decode_hlo_new.txt", "w").write(txt)
logits, lens = bench._decode_inputs(32, 500, 1024, 2)
txt = jax.jit(lambda l, n: fsearch(l, n)).lower(logits, lens).compile().as_text()
open("/tmp/fused_hlo_new.txt", "w").write(txt)
print("HLO dumps written", flush=True)

# --- 3. gate calibration under the ORGANIC keys (the ones the gates read
# back at decode time — r2's "manual:*" keys were write-only), forced fresh
import logging
logging.basicConfig(level=logging.INFO)
from pydrobert_tpu.ops import pallas
try:
    gates = pallas.calibrate_gates(force=True)
    out["gates"] = gates
    print("gates:", json.dumps(gates), flush=True)
except Exception as e:
    print("gate calibration error:", e, flush=True)

# --- 4. unroll sweep
for name, s in (("nolm", search), ("fused", fsearch)):
    for unroll in (2, 4):
        config.DECODE_SCAN_UNROLL = unroll
        t0 = time.perf_counter()
        thr, _, kernels, upk = bench._bench_search(
            s, 32, 500, 1024, seed=1 if name == "nolm" else 2
        )
        out[f"{name}_u{unroll}"] = dict(
            thr=round(thr, 1), kernels=kernels, upk=upk,
            wall=round(time.perf_counter() - t0, 1),
        )
        print(name, "unroll", unroll, out[f"{name}_u{unroll}"], flush=True)
    config.DECODE_SCAN_UNROLL = 1

print("SWEEP", json.dumps(out), flush=True)

# --- 5. top-M kernel headline-shape A/B (gate already calibrated above
# under its organic key): the prologue top-M was ~60% of no-LM decode
try:
    import pydrobert_tpu.config as _cfg
    for mode in ("0", "1"):
        _cfg.USE_PALLAS_TOPM = mode
        t0 = time.perf_counter()
        thr, _, kernels, upk = bench._bench_search(
            CTCPrefixSearch(16), 32, 500, 1024, seed=1
        )
        out[f"nolm_topm{mode}"] = dict(thr=round(thr, 1), kernels=kernels,
                                       wall=round(time.perf_counter()-t0, 1))
        print("nolm topm", mode, out[f"nolm_topm{mode}"], flush=True)
    _cfg.USE_PALLAS_TOPM = "auto"
except Exception as e:
    print("topm calibration error:", e, flush=True)
print("SWEEP-FINAL", json.dumps(out), flush=True)
