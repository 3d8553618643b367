"""On-hardware Pallas kernel-parity pinning (VERDICT r2 next-step #6).

Round 2 proved interpret-mode parity is NOT sufficient evidence that a
kernel works: the top-M kernel passed interpret-mode tests but failed to
compile on the real chip ("Reductions over unsigned integers not
implemented"). This script runs the TPU-gated parity tests
(``tests/test_pallas.py``: edit distance, beam kernel, top-M, fused decode
prologue, SpecAugment apply) ON THE REAL DEVICE and records the outcome —
device kind, the source-hash revision of every gated kernel, per-test
counts — as a row in the committed ``HW_PARITY.md`` table, so every kernel
revision that ships has a pinned green (or red) hardware run.

Usage (from the repo root, with the TPU tunnel up)::

    python benchmarks/hw_parity.py

Exits nonzero if the run could not reach a TPU or any parity test failed.
"""

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "HW_PARITY.md")

HEADER = """# HW_PARITY — on-hardware Pallas kernel parity runs

Each row pins one run of the TPU-gated parity suite
(`PYDROBERT_TPU_TEST_TPU=1 pytest tests/test_pallas.py`) on real hardware:
the device kind, the source-hash revision of every gated kernel at that
commit, and the pass/fail counts. Interpret-mode parity alone proved
insufficient in round 2 (a kernel that passed interpret mode failed to
compile on the chip), so a kernel revision is only considered
hardware-validated if it appears here with `pass` and zero failures.
Regenerate a row with `python benchmarks/hw_parity.py`.

| date (UTC) | device kind | git | beam rev | topm rev | prologue rev | passed | failed | skipped | verdict |
|---|---|---|---|---|---|---|---|---|---|
"""


def kernel_revs() -> dict:
    """Source-hash revisions of the gated kernels (same functions the gate
    cache keys use, so a row here matches gate-cache entries exactly)."""
    sys.path.insert(0, ROOT)
    from pydrobert_tpu.ops import pallas

    revs = {
        "beam": pallas._beam_kernel_rev(),
        "topm": pallas._topm_rev(),
    }
    try:
        revs["prologue"] = pallas._prologue_rev()
    except AttributeError:
        revs["prologue"] = "-"
    return revs


def run_suite() -> dict:
    env = dict(os.environ, PYDROBERT_TPU_TEST_TPU="1")
    # drop any CPU pin the caller exported
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_pallas.py", "-q",
         "--tb=line", "-p", "no:cacheprovider"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=3600,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    counts = {"passed": 0, "failed": 0, "skipped": 0, "error": 0}
    for num, what in re.findall(r"(\d+) (passed|failed|skipped|error)", tail):
        counts[what] = int(num)
    counts["returncode"] = proc.returncode
    counts["summary_line"] = tail
    counts["stdout"] = proc.stdout
    counts["stderr"] = proc.stderr[-4000:]
    return counts


def git_head() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
            capture_output=True, text=True,
        ).stdout.strip() or "-"
    except Exception:
        return "-"


def main() -> int:
    revs = kernel_revs()
    counts = run_suite()
    # a run where everything was skipped means the chip was never reached
    reached = counts["passed"] + counts["failed"] > 0
    verdict = (
        "pass" if reached and not counts["failed"] and not counts["error"]
        else ("no-tpu" if not reached else "FAIL")
    )
    device = "-"
    m = re.search(r"device kind: (.+)", counts["stdout"])
    if m:
        device = m.group(1)
    else:
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].device_kind)"],
                capture_output=True, text=True, timeout=120,
                env={k: v for k, v in os.environ.items()
                     if k != "JAX_PLATFORMS"},
            )
            device = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "-"
        except Exception:
            pass
    row = (
        f"| {time.strftime('%Y-%m-%d %H:%M', time.gmtime())} | {device} "
        f"| {git_head()} | {revs['beam']} | {revs['topm']} "
        f"| {revs['prologue']} | {counts['passed']} | {counts['failed']} "
        f"| {counts['skipped']} | {verdict} |\n"
    )
    if os.path.exists(OUT):
        body = open(OUT).read()
    else:
        body = HEADER
    with open(OUT, "w") as f:
        f.write(body + row)
    print(json.dumps({k: counts[k] for k in
                      ("passed", "failed", "skipped", "returncode")} |
                     {"verdict": verdict, "device": device, **revs}))
    if verdict != "pass":
        print(counts["summary_line"], file=sys.stderr)
        print(counts["stderr"], file=sys.stderr)
    return 0 if verdict == "pass" else 1


if __name__ == "__main__":
    sys.exit(main())
