"""Package constants used throughout pydrobert_tpu.

Behavioral parity with the reference library's constants module
(``pydrobert/torch/config.py`` in sdrobert/pydrobert-pytorch); the values and
semantics match so data directories, CLI defaults, and numerics line up.
TPU-specific additions are grouped at the bottom.
"""

import math
import os

__all__ = [
    "AM_ONEHOT_MAX_ELEMS",
    "DECODE_BUF_F16",
    "DECODE_PACK_LOGITS",
    "DECODE_RENORM",
    "DECODE_SCAN_UNROLL",
    "DEFT_ALI_SUBDIR",
    "DEFT_CHUNK_SIZE",
    "DEFT_CTM_CHANNEL",
    "DEFT_DEL_COST",
    "DEFT_DTYPE",
    "DEFT_FEAT_SUBDIR",
    "DEFT_FILE_PREFIX",
    "DEFT_FILE_SUFFIX",
    "DEFT_FLOAT_PRINT_PRECISION",
    "DEFT_FRAME_SHIFT_MS",
    "DEFT_HYP_SUBDIR",
    "DEFT_INS_COST",
    "DEFT_NUM_WORKERS",
    "DEFT_PAD_VALUE",
    "DEFT_PDFS_SUBDIR",
    "DEFT_REF_SUBDIR",
    "DEFT_SUB_COST",
    "DEFT_TEXTGRID_SUFFIX",
    "DEFT_TEXTGRID_TIER_ID",
    "DEFT_TEXTGRID_TIER_NAME",
    "EPS_0",
    "EPS_INF",
    "EPS_NINF",
    "FUSED_TOPK_TWOSTAGE",
    "INDEX_PAD_VALUE",
    "SPARSE_FUSION_MAX_CORRECTIONS",
    "SPARSE_MEMBERSHIP_GATHER",
    "TINY",
    "TOPK_COMPACT_MIN_BATCH",
    "USE_JIT",
    "USE_PALLAS",
    "USE_PALLAS_BEAM",
    "USE_PALLAS_TOPM",
]

INDEX_PAD_VALUE = -100
"""The value to pad index-based arrays with.

Batched operations often involve variable-width input. This value is used to
right-pad index-based arrays to indicate the element should be ignored. The
value -100 coincides with the common ``ignore_index`` convention so data
directories are interchangeable with the reference library.
"""

TINY = 1.1754943508222875e-38
"""Smallest normal single-precision floating-point value."""

USE_JIT = os.environ.get("PYDROBERT_TPU_JIT", "1") != "0"
"""Whether functionals are eagerly wrapped in :func:`jax.jit` on import.

Defaults to on (XLA compilation is the whole point on TPU); set the
environment variable ``PYDROBERT_TPU_JIT=0`` to disable for debugging.
"""

USE_PALLAS = os.environ.get("PYDROBERT_TPU_PALLAS", "1") != "0"
"""Whether hand-written Pallas TPU kernels are used on hot paths.

When off (``PYDROBERT_TPU_PALLAS=0``) the pure-XLA fallbacks run instead.
Automatically off on non-TPU backends.
"""

USE_PALLAS_BEAM = os.environ.get("PYDROBERT_TPU_PALLAS_BEAM", "auto")
"""Route :class:`pydrobert_tpu.ops.decoding.CTCPrefixSearch` (no-LM path)
through the whole-loop Pallas beam-search kernel: ``"1"``/``True`` forces
the kernel, ``"0"``/``False`` forces the XLA scan, and ``"auto"`` (default)
runs a one-time micro-calibration per device kind — both paths are compiled
and timed on a small representative decode, the winner is chosen, and the
decision (with both timings) is logged and cached on disk
(``~/.cache/pydrobert_tpu/beam_gate.json``).

The kernel's VMEM-resident beam state and path buffer remove the scan's
per-step HBM traffic and op-dispatch cost on production TPUs, but lose on
dev chips where Pallas grid-step overhead dominates — hence measurement,
not a blind default.

The kernel carries RAW linear masses (the reference's semantics), so
with :data:`DECODE_RENORM` on (the default) the ``"auto"`` gate never
routes to it — the XLA scan is denormal-proof and the kernel is not.
Forcing ``"1"`` is an explicit opt-in to raw masses and dispatches
regardless.
"""

USE_PALLAS_TOPM = os.environ.get("PYDROBERT_TPU_PALLAS_TOPM", "auto")
"""Route the decode prologues' hoisted whole-``(T, N, V)`` top-M through
the single-pass Pallas selection kernel
(:func:`pydrobert_tpu.ops.pallas.top_m_pallas`): ``"1"``/``True`` forces
the kernel, ``"0"``/``False`` forces the stable-sort form
(:func:`pydrobert_tpu.ops.topk.exact_top_k`), and ``"auto"`` (default)
runs a one-time per-device-kind calibration of both, cached alongside the
beam-gate decisions. The kernel reads the logits once through VMEM and
writes only the winners; the sort lowering makes several full-width HBM
passes — which wins depends on the chip's sort throughput vs its Pallas
op overhead, hence measurement."""

DECODE_SCAN_UNROLL = int(
    os.environ.get("PYDROBERT_TPU_DECODE_SCAN_UNROLL", "1")
)
"""Unroll factor for the CTC prefix search's time-step scan.

Each scan iteration dispatches a fixed number of XLA kernels (the
transferable ``decode_kernels_per_step`` bench quantity); unrolling packs
several time steps into one loop iteration so per-iteration loop machinery
amortizes and XLA can fuse across step boundaries. Steps are sequentially
dependent, so compute doesn't parallelize — this only trades compile time
for dispatch count. ``T - 1`` must not need padding: when ``(T - 1) %
unroll != 0`` XLA adds a remainder epilogue, which is handled but compiles
a second body.
"""

DECODE_PACK_LOGITS = (
    os.environ.get("PYDROBERT_TPU_DECODE_PACK_LOGITS", "0") == "1"
)
"""Fold the logits stream into the decode scan's single packed xs array.

One dynamic-slice per step instead of two, at the cost of an up-front f32
copy of the whole (T, N, V+1) logits (and the bf16 stream's bandwidth
halving). Off by default; A/B measured r4 — see BASELINE.md."""

DECODE_RENORM = (
    os.environ.get("PYDROBERT_TPU_DECODE_RENORM", "1") != "0"
)
"""Per-frame power-of-two renormalization of the CTC beam masses.

The reference carries prefix masses in linear f32
(``_decoding.py:636-934``); with diffuse acoustics they decay
multiplicatively and reach f32 denormal range by ~frame 45 at V=256 —
where torch (keeps denormals) limps to ~frame 56 and then flushes to
exactly zero, after which its beam selection is arbitrary. XLA:TPU
flushes denormals immediately, so long high-entropy utterances silently
diverge. With this flag each scan step rescales every beam's masses by
``2**-e`` where ``e`` is the exponent of the batch row's best total
mass, carrying ``e`` in an int32 accumulator, and the final probabilities
apply ``ldexp`` once. Scaling by a power of two is EXACT in floating
point: every candidate product/sum/comparison is bit-identical to the
unrenormalized trajectory wherever that trajectory stays in normal
range, and where it would underflow the renormalized one keeps full
precision (pinned by
``tests/test_decoding.py::test_ctc_prefix_search_renorm_invariant`` and
the T=200 diffuse-logits parity test vs the float64 reference oracle).
"""

DECODE_BUF_F16 = (
    os.environ.get("PYDROBERT_TPU_DECODE_BUF_F16", "1") != "0"
)
"""Carry the in-loop decode path buffer as float16 when exact.

The batch-major (N, W, T) buffer is permuted (one-hot dot), written, and
re-read (row interrogation) every decode step — the largest per-step HBM
traffic at serving batch sizes (~33 MB/step f32 at B=256; the permute
fusion alone measured 20.3 us/step, at the f32 bandwidth floor). Token
ids are small integers, exact in float16 up to 2048, so for vocabularies
``V <= 2048`` the buffer halves to f16 and the dots upcast exactly
(results bit-identical; pinned by
``tests/test_decoding.py::test_ctc_prefix_search_buf_f16_invariant``).
Disable to force the f32 carry; vocabularies past 2048 use f32 always.
"""

FUSED_TOPK_TWOSTAGE = (
    os.environ.get("PYDROBERT_TPU_FUSED_TOPK_TWOSTAGE", "0") == "1"
)
"""Two-stage exact top-K in the fused (shallow-fusion) advance.

Tried for VERDICT r4 #3 and REJECTED on-chip, default off. The fused
advance's candidate row is ``Kp * (M + C + 2)`` wide (~1.3k at the
headline shape) and its single TopK custom call profiles at 28.7
us/step (B=32) — but the in-scan microbench shows the flat TopK IS the
fastest exact formulation on TPU v5 lite: flat ``lax.top_k`` 16.1
us/step vs flat two-key sort 40.0, per-beam sort + 256-wide merge 45.8,
per-beam top_k + merge 46.3 (sorts pay several full-width passes; the
TopK custom kernel doesn't). Full-decode A/B: two-stage 450.3/537.8
utt/s vs flat 578.7/962.5 at B=32/B=256. The flag keeps the two-stage
form selectable for re-measurement on other chips; selections are
bit-identical either way (ties included)."""

TOPK_COMPACT_MIN_BATCH = int(
    os.environ.get("PYDROBERT_TPU_TOPK_COMPACT_MIN_BATCH", "128")
)
"""Batch size at which the factored advance's candidate top-K switches
from one flat ``lax.top_k`` to the rank-compaction two-stage form.

``lax.top_k`` lowers to a stable bitonic sort whose cost cliffs with the
padded network width (measured on TPU v5 lite at N=256, in-scan: width
<= 256 ~ 10.6 us, 304 ~ 24.6, 544 ~ 42.8 — BASELINE.md round-5 notes).
The factored advance's (N, Kp*(M+2) = 544) candidate row sits past the
cliff, but its per-beam slots are sorted-by-construction up to <= 3
irregular values (the repeat-rule coefficient dip, the last-token slot,
the non-extension slot) and removal holes, so each beam's exact top-K
compacts with a cumsum + fused compares (no sort), leaving one cheap
``Kp * K <= 256``-wide merge ``top_k``. Tie order is exactly flat-stable
(value desc, flat index asc) — pinned against ``lax.top_k`` by
``tests/test_decoding.py``. Composite sort forms (chunked/two-stage
``top_k``) were A/B'd and LOST to the flat sort (XLA inserts relayout
copies at every composition boundary); only the sort-free stage 1 wins.
At small N the fused elementwise stage is dispatch-bound and the flat
sort is cheaper (N=32: 6.4 us vs ~15), hence the batch gate."""

AM_ONEHOT_MAX_ELEMS = int(
    os.environ.get("PYDROBERT_TPU_AM_ONEHOT_MAX_ELEMS", str(1 << 22))
)
"""Largest ``N * Q * V`` one-hot the in-loop acoustic fetch materializes.

Decode loops read the acoustic probabilities of ``Q`` candidate tokens per
batch row each frame. For small ``Q`` a one-hot contraction is the
measured winner (bit-exact — one nonzero term per dot row). Above this
element count the fetch switches to a WHERE-REDUCE: the same one-hot
predicate generated inside the reduce's input fusion and never
materialized (identical values read from the same clamped operands —
bit-identical results, pinned by
``tests/test_decoding.py::test_fused_am_fetch_formulations_bit_equal``).
A third formulation, ``take_along_axis`` gathers, was A/B'd and LOST on
the dev chip (~85 us per large in-loop gather — BASELINE.md round-4
notes); it is NOT what this flag enables."""

SPARSE_MEMBERSHIP_GATHER = (
    os.environ.get("PYDROBERT_TPU_SPARSE_MEMBERSHIP_GATHER", "0") == "1"
)
"""Answer "does token v have a stored n-gram under this context" via
direct-indexed bigram-table gathers instead of comparing against the
``max_children``-wide correction lists, inside the fused CTC decode.

Off by default: on the dev tunnel chip an additional in-loop gather costs
~6 us/step at 512 indices up to ~85 us for large ``take_along_axis``
fetches (r4 microbench, BASELINE.md), while the where-reduce membership
blocks it replaces fuse and are nearly free; on production TPUs with fast
gathers the trade flips for LMs with wide correction lists (the reduce
blocks scale with ``max_children``, the gathers don't).
"""

SPARSE_FUSION_MAX_CORRECTIONS = int(
    os.environ.get("PYDROBERT_TPU_SPARSE_FUSION_MAX_C", "128")
)
"""Largest per-context correction count for the sparse-slot fused decode.

:class:`pydrobert_tpu.ops.decoding.CTCPrefixSearch` with a
:class:`pydrobert_tpu.lm.LookupLanguageModel` scores only candidate slots
(shared top-M + per-beam stored n-gram corrections) instead of all ``V``
extensions per beam, provided the LM's ``max_corrections`` (the summed
per-order maximum children count) does not exceed this bound; larger LMs
fall back to the dense advance.
"""

EPS_NINF = math.log(1.1754943508222875e-38) / 2
"""A small enough log-space value that exponentiating it is very close to 0."""

EPS_0 = math.log1p(-2 * 1.1920928955078125e-07)
"""A large enough log-space value that exponentiating it is very close to 1."""

EPS_INF = math.log(3.4028234663852886e38) / 2
"""A large enough log-space value that exponentiating it is near infinity."""

DEFT_FRAME_SHIFT_MS = 10.0
"""The default frame shift in milliseconds for commands."""

DEFT_TEXTGRID_SUFFIX = ".TextGrid"
"""The default suffix indicating TextGrid files for commands."""

DEFT_CHUNK_SIZE = 1000
"""Default number of units to process at once when multiprocessing."""


def _cpu_count() -> int:
    if hasattr(os, "sched_getaffinity"):
        return len(os.sched_getaffinity(0))
    cpu_count = os.cpu_count()
    return 0 if cpu_count is None else cpu_count


DEFT_NUM_WORKERS = _cpu_count()
"""Default number of workers when multiprocessing."""

DEFT_FILE_PREFIX = ""
"""Default prefix of a data file in a data directory."""

DEFT_FILE_SUFFIX = ".pt"
"""Default suffix of a data file in a data directory.

Data directories remain byte-compatible with the reference's ``torch.save``
convention; see :mod:`pydrobert_tpu.utils.serial`.
"""

DEFT_FLOAT_PRINT_PRECISION = 3
"""Default precision to write floating point values to file with."""

DEFT_CTM_CHANNEL = "A"
"""Default channel to write to CTM files."""

DEFT_TEXTGRID_TIER_ID = 0
"""Default TextGrid tier to read transcripts from."""

DEFT_TEXTGRID_TIER_NAME = "transcript"
"""Default TextGrid tier to write transcripts to."""

DEFT_FEAT_SUBDIR = "feat"
"""Default subdirectory of a data directory containing features."""

DEFT_ALI_SUBDIR = "ali"
"""Default subdirectory of a data directory containing alignments."""

DEFT_REF_SUBDIR = "ref"
"""Default subdirectory of a data directory containing reference tokens."""

DEFT_PDFS_SUBDIR = "pdfs"
"""Default subdirectory of a data directory to write pdfs to."""

DEFT_HYP_SUBDIR = "hyp"
"""Default subdirectory of a data directory to write hypothesis tokens to."""

DEFT_PAD_VALUE = 0.0
"""Default value to pad floating-point arrays with."""

DEFT_INS_COST = 1.0
"""Default insertion cost in error rate/distance computations."""

DEFT_DEL_COST = 1.0
"""Default deletion cost in error rate/distance computations."""

DEFT_SUB_COST = 1.0
"""Default substitution cost in error rate/distance computations."""

DEFT_DTYPE = "float32"
"""Default floating-point dtype name for feature computation on TPU."""
