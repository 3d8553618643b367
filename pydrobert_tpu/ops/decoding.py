"""Sequence decoding: beam search, CTC greedy/prefix search, random walks.

Capability parity with the reference's ``_decoding.py``:
``beam_search_advance`` (``_decoding.py:41-155``), ``BeamSearch``
(``_decoding.py:158-504``), ``ctc_greedy_search`` (``_decoding.py:507-558``),
``ctc_prefix_search_advance`` (``_decoding.py:636-934``), ``CTCPrefixSearch``
with shallow fusion (``_decoding.py:937-1204``), ``random_walk_advance`` /
``RandomWalk`` (``_decoding.py:1207-1513``), and ``sequence_log_probs``
(``_decoding.py:1516-1721``, dense path).

TPU-first design:

- The searches run as ``lax.while_loop``/``lax.scan`` bodies over
  **preallocated static-shape path buffers** ``(max_iters, N, width)``
  instead of the reference's per-step reallocation (``_decoding.py:127-143``)
  — XLA requires loop-invariant shapes, and the dense ``-inf``-masked beam
  the reference already uses is exactly the right formulation.
- ``max_iters`` is therefore a required static argument of
  :class:`BeamSearch` / :class:`RandomWalk` calls (the reference substitutes
  a practically-infinite bound when ``eos`` is set).
- Early termination still happens on-device via the while-loop condition.
- LM state rides through the loops as a pytree; beam reordering is a tree
  gather (:func:`pydrobert_tpu.lm.ExtractableSequentialLanguageModel.extract_by_src`).
- Stochastic search (:class:`RandomWalk`) takes an explicit PRNG key.
- torch's ``PackedSequence`` input to ``sequence_log_probs`` has no JAX
  analogue; the dense + ``eos`` path covers that use case.
"""

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .topk import hoisted_top_k
from ..lm import (
    ExtractableSequentialLanguageModel,
    MixableSequentialLanguageModel,
    SequentialLanguageModel,
)

__all__ = [
    "BeamSearch",
    "beam_search_advance",
    "compress_blank_frames",
    "CTCForcedAligner",
    "CTCGreedySearch",
    "ctc_forced_align",
    "ctc_greedy_search",
    "ctc_prefix_search_advance",
    "CTCPrefixSearch",
    "RandomWalk",
    "random_walk_advance",
    "sequence_log_probs",
]

NEG_INF = -float("inf")
# beam-mass sentinel for width-padded beams: probability-space masses must
# stay FINITE or the advances compute -inf * 0 = NaN (e.g. the padded
# beam's last-token one-hot), and NaN outranks every real candidate in
# top_k. Real masses are >= 0, so any negative mass marks a dummy beam;
# outputs convert them back to -inf (same convention as the Pallas
# kernel's _DUMMY).
MASS_PAD = -1.0e30


def _sparse_at(lm, ctx):
    """LM sparse structure for contexts (Ng-1, N, Kp) (most recent first),
    with (N, Kp, ...) leading dims (shared by BeamSearch and
    CTCPrefixSearch). Contexts ride the decode loops order-major and the
    probe is batch-polymorphic: passing (N, Kp) natively instead of
    flattening to (N * Kp,) and reshaping the outputs back saves a retile
    (reshape/copy) kernel per tensor per decode step on TPU."""
    return lm.sparse_corrections_ext(ctx)


def _decode_prologue(logits, M, g_bias=None):
    """Hoisted decode prologue: ``(top_lgts, top_inds, sm_max, sm_den,
    blank_probs)`` from time-major ``logits (T, N, V + 1)``.

    Top-M runs over ``logits[..., :V] (+ g_bias)``; softmax stats cover all
    ``V + 1`` lanes. When the top-M kernel gate prefers it the WHOLE
    prologue is one Pallas pass over the logits
    (:func:`pydrobert_tpu.ops.pallas.decode_prologue_pallas`) — the largest
    single component of decode wall-clock was this prologue's sort +
    reduction passes. ``sm_den``'s reduction order may differ in the last
    ulp between paths; it scales every candidate of a frame uniformly, so
    selections are unaffected.
    """
    T, N, Vp1 = logits.shape
    V = Vp1 - 1
    from .pallas import decode_prologue_pallas
    from .topk import kernel_top_m_ok

    if M <= V and kernel_top_m_ok(logits.dtype, Vp1, M):
        tl, ti, mx, den, blank = decode_prologue_pallas(logits, M, g_bias)
        return tl, ti, mx, den, jnp.exp(blank - mx) / den
    # bf16 logits upcast here: XLA fuses the convert into each consumer, so
    # the full-width HBM reads stay bf16 (half the bytes) while the math —
    # and therefore parity with the kernel path — is f32
    logits = logits.astype(jnp.float32)
    sm_max = logits.max(2)  # (T, N)
    sm_den = jnp.exp(logits - sm_max[..., None]).sum(2)  # (T, N)
    blank_probs = jnp.exp(logits[..., V] - sm_max) / sm_den
    g = (
        logits[..., :V]
        if g_bias is None
        else logits[..., :V] + g_bias[None, None]
    )
    tl, ti = hoisted_top_k(g, M)
    return tl, ti, sm_max, sm_den, blank_probs


def _scatter_token_rows(y_ext, lens, y_t):
    """Write ``y_t`` (1, N, K) into ``y_ext`` (S1, N, K) at row ``lens[n,k]``."""
    S1 = y_ext.shape[0]
    pos = jnp.arange(S1, dtype=jnp.int32).reshape(S1, 1, 1)
    return jnp.where(pos == lens[None], y_t, y_ext)


def beam_search_advance(
    log_probs_t: jax.Array,
    width: int,
    log_probs_prev: jax.Array,
    y_prev: jax.Array,
    y_prev_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One beam search step: extend, prune to `width`.

    Parity: reference ``beam_search_advance`` (``_decoding.py:41-155``),
    except the returned ``y_next`` always has ``S + 1`` rows (static shapes;
    the reference only grows the path buffer when forced to).
    """
    log_probs_t = jnp.asarray(log_probs_t)
    if log_probs_t.ndim != 3:
        raise RuntimeError("log_probs_t must be 3 dimensional")
    N, Kp, V = log_probs_t.shape
    if width < 1:
        raise RuntimeError(f"Expected width to be >= 1, got {width}")
    log_probs_prev = jnp.asarray(log_probs_prev)
    if log_probs_prev.shape != (N, Kp):
        raise RuntimeError(
            f"Expected log_probs_prev to be of shape {(N, Kp)}, got "
            f"{log_probs_prev.shape}"
        )
    y_prev = jnp.asarray(y_prev)
    if y_prev.ndim != 3:
        raise RuntimeError("y_prev must be 3 dimensional")
    if y_prev.shape[1:] != (N, Kp):
        raise RuntimeError(
            f"Expected the last two dimensions of y_prev to be {(N, Kp)}, "
            f"got {y_prev.shape[1:]}"
        )
    tm1 = y_prev.shape[0]
    if y_prev_lens is not None:
        y_prev_lens = jnp.asarray(y_prev_lens)
        if y_prev_lens.shape != (N, Kp):
            raise RuntimeError(
                f"Expected y_prev_lens to have shape {(N, Kp)}, got "
                f"{y_prev_lens.shape}"
            )

    K = min(width, Kp * V)
    cand = (log_probs_prev[..., None] + log_probs_t).reshape(N, Kp * V)
    log_probs_next, next_ind = jax.lax.top_k(cand, K)
    next_src = next_ind // V
    y_t = (next_ind % V)[None].astype(y_prev.dtype)  # (1, N, K)

    if tm1:
        y_next = jnp.take_along_axis(y_prev, next_src[None], axis=2)
        y_next = jnp.concatenate([y_next, jnp.zeros_like(y_t)], 0)
        if y_prev_lens is None:
            y_next = y_next.at[tm1].set(y_t[0])
            y_next_lens = jnp.full((N, K), tm1 + 1, jnp.int32)
        else:
            lens_prefix = jnp.take_along_axis(y_prev_lens, next_src, axis=1)
            y_next = _scatter_token_rows(y_next, lens_prefix, y_t)
            y_next_lens = lens_prefix + 1
    else:
        if y_prev_lens is not None and not isinstance(
            y_prev_lens, jax.core.Tracer
        ):
            if np.any(np.asarray(y_prev_lens) != 0):
                raise RuntimeError("Invalid lengths for t=0")
        y_next = y_t
        y_next_lens = jnp.ones((N, K), jnp.int32)

    if K < width:
        rem = width - K
        y_next = jnp.concatenate(
            [y_next, jnp.zeros((y_next.shape[0], N, rem), y_next.dtype)], 2
        )
        log_probs_next = jnp.concatenate(
            [log_probs_next, jnp.full((N, rem), NEG_INF, log_probs_next.dtype)], 1
        )
        zeros = jnp.zeros((N, rem), jnp.int32)
        y_next_lens = jnp.concatenate([y_next_lens.astype(jnp.int32), zeros], 1)
        next_src = jnp.concatenate([next_src, zeros], 1)

    return y_next, y_next_lens.astype(jnp.int32), log_probs_next, next_src


class BeamSearch:
    """Batched beam search over a :class:`SequentialLanguageModel`.

    Parity: reference ``BeamSearch`` (``_decoding.py:158-504``): per-path eos
    freezing, optional all-paths finishing, frozen-batch padding with
    `pad_value`. ``max_iters`` must be provided when calling (static bound of
    the on-device while-loop).

    Call returns ``(y, y_lens, y_log_probs)`` with ``y`` of shape
    ``(max_iters, N, width)`` (valid region ``y[:y_lens[n, k], n, k]``).
    """

    def __init__(
        self,
        lm: ExtractableSequentialLanguageModel,
        width: int,
        eos: Optional[int] = None,
        finish_all_paths: bool = False,
        pad_value: int = config.INDEX_PAD_VALUE,
    ):
        from .. import argcheck

        self.width = argcheck.is_posi(width, "width")
        if eos is not None:
            if eos < -lm.vocab_size or eos >= lm.vocab_size:
                raise ValueError(
                    f"eos ({eos}) must index a token in the vocabulary"
                )
            eos = (eos + lm.vocab_size) % lm.vocab_size
        self.lm = lm
        self.eos = eos
        self.finish_all_paths = argcheck.is_bool(
            finish_all_paths, "finish_all_paths"
        )
        self.pad_value = argcheck.is_int(pad_value, "pad_value")

    def update_log_probs_for_step(
        self, log_probs_prev, log_probs_t, y_prev, y_prev_lens, eos_mask
    ):
        """Subclass hook to turn probabilities into scores for one step.

        Mirrors reference ``BeamSearch.update_log_probs_for_step``
        (``_decoding.py:306-350``).
        """
        return log_probs_prev, log_probs_t

    def __call__(
        self,
        initial_state: Optional[Dict[str, Any]] = None,
        batch_size: Optional[int] = None,
        max_iters: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        lm, W, V = self.lm, self.width, self.lm.vocab_size
        eos = self.eos
        initial_state = {} if initial_state is None else initial_state
        if max_iters is None:
            raise ValueError(
                "max_iters must be set (static loop bound on TPU)"
            )
        if max_iters < 0:
            raise RuntimeError(f"max_iters must be non-negative, got {max_iters}")
        N = 1 if batch_size is None else batch_size
        S = max_iters

        state = lm.update_input(initial_state, jnp.zeros((0, N), jnp.int32))
        if S == 0:
            y = jnp.zeros((0, N, W), jnp.int32)
            lens = jnp.zeros((N, W), jnp.int32)
            lp = jnp.full((N, W), NEG_INF).at[:, 0].set(0.0)
            if batch_size is None:
                return y[:, 0], lens[0], lp[0]
            return y, lens, lp

        y_buf = jnp.full((S, N, 1), self.pad_value, jnp.int32)

        def lm_step(y_buf_k, state, t, Kp):
            hist = jnp.clip(y_buf_k, 0, V - 1).reshape(S, N * Kp)
            log_probs_t, in_next = lm.calc_idx_log_probs(hist, state, t)
            log_probs_t = jax.nn.log_softmax(
                log_probs_t.reshape(N, Kp, V), axis=-1
            )
            return log_probs_t, in_next

        def mask_eos(log_probs_t, eos_mask):
            if eos is None:
                return log_probs_t
            lp = jnp.where(eos_mask[..., None], NEG_INF, log_probs_t)
            eos_vec = jax.nn.one_hot(eos, V, dtype=bool)
            return jnp.where(eos_mask[..., None] & eos_vec, 0.0, lp)

        # Backoff n-gram LMs are scored per-beam on candidate slots only:
        # ``lm(v|ctx) = uni[v] + base_k`` except on C stored corrections, and
        # the per-beam additive scalars don't change within-beam order, so
        # the true top-W extensions come from a STATIC top-M of the unigram
        # vector plus the beam's corrections (and eos). O(N W (M + C)) per
        # step instead of O(N W V) dense LM scoring.
        from ..lm import LookupLanguageModel

        use_sparse = (
            isinstance(lm, LookupLanguageModel)
            and lm.max_ngram >= 2
            and lm.max_corrections <= config.SPARSE_FUSION_MAX_CORRECTIONS
            and type(self).update_log_probs_for_step
            is BeamSearch.update_log_probs_for_step
        )
        if use_sparse:
            Ng = lm.max_ngram
            Csp = lm.max_corrections
            M = min(V, W + Csp + 1)
            uni_np = np.asarray(lm._uni_logp)
            order = np.argsort(-uni_np, kind="stable")[:M]
            top_toks = jnp.asarray(order.astype(np.int32))  # (M,) static
            stop_vals = jnp.asarray(uni_np[order].astype(np.float32))
            uni_eos = float(uni_np[eos]) if eos is not None else 0.0

            def sparse_at(ctx, Kp):
                return _sparse_at(lm, ctx)

            def select_sparse(lp_prev, ctx, eos_mask, Kp, K):
                """(lp_next, next_src, y_tok): top-K over per-beam slots."""
                base, ctoks, cvals, cvalid, logZ = sparse_at(ctx, Kp)[:5]
                lp3 = lp_prev[:, :, None]
                shared = lp3 + (base - logZ)[:, :, None] + stop_vals
                dup = (
                    (top_toks[None, None, :, None] == ctoks[:, :, None, :])
                    & cvalid[:, :, None, :]
                ).any(3)
                if eos is not None:
                    dup = dup | (top_toks == eos)[None, None, :]
                shared = jnp.where(dup, NEG_INF, shared)
                corr = lp3 + cvals - logZ[:, :, None]
                corr_bad = ~cvalid
                if eos is not None:
                    corr_bad = corr_bad | (ctoks == eos)
                corr = jnp.where(corr_bad, NEG_INF, corr)
                slots = [shared, corr]
                slot_toks = [
                    jnp.broadcast_to(top_toks[None, None], (N, Kp, M)),
                    ctoks,
                ]
                if eos is not None:
                    em3 = eos_mask[:, :, None]
                    slots = [
                        jnp.where(em3, NEG_INF, shared),
                        jnp.where(em3, NEG_INF, corr),
                    ]
                    eos_in_corr = (ctoks == eos) & cvalid
                    lm_eos = jnp.where(eos_in_corr, cvals, 0.0).sum(
                        2
                    ) + jnp.where(eos_in_corr.any(2), 0.0, base + uni_eos)
                    eos_score = lp_prev + lm_eos - logZ
                    # finished beams continue only via eos, at log-prob 0
                    eos_score = jnp.where(eos_mask, lp_prev, eos_score)
                    slots.append(eos_score[:, :, None])
                    slot_toks.append(jnp.full((N, Kp, 1), eos, jnp.int32))
                cand = jnp.concatenate(slots, 2)  # (N, Kp, Ssl)
                toks = jnp.concatenate(slot_toks, 2)
                Ssl = cand.shape[2]
                lp_next, ind = jax.lax.top_k(cand.reshape(N, Kp * Ssl), K)
                next_src = ind // Ssl
                # mask-reduce instead of a gather: a standalone in-loop
                # take_along_axis dispatches its own (relayout-flanked)
                # kernel per step; the compare+sum fuses (exact: one
                # nonzero term per row, token ids < 2**24)
                y_tok = (
                    jnp.where(
                        ind[:, :, None]
                        == jnp.arange(Kp * Ssl, dtype=ind.dtype)[None, None],
                        toks.reshape(N, 1, Kp * Ssl),
                        0,
                    )
                    .sum(2)
                    .astype(jnp.int32)
                )
                return lp_next, next_src, y_tok

            ctx = jnp.full((Ng - 1, N, 1), lm.sos, jnp.int32)
        else:
            ctx = jnp.zeros((0,), jnp.int32)

        # ---- step 0 (beam width 1 -> W) ----
        t0 = jnp.asarray(0, jnp.int32)
        lp_prev0 = jnp.zeros((N, 1))
        lens0 = jnp.zeros((N, 1), jnp.int32)
        eos_mask0 = jnp.zeros((N, 1), bool)
        K = min(W, V)
        if use_sparse:
            in_next = state
            log_probs, _src0, y_t = select_sparse(
                lp_prev0, ctx, eos_mask0, 1, K
            )
        else:
            log_probs_t, in_next = lm_step(y_buf, state, t0, 1)
            lp_prev0, log_probs_t = self.update_log_probs_for_step(
                lp_prev0, log_probs_t, y_buf, lens0, eos_mask0
            )
            log_probs_t = mask_eos(log_probs_t, eos_mask0)
            cand = (lp_prev0[..., None] + log_probs_t).reshape(N, V)
            log_probs, next_ind = jax.lax.top_k(cand, K)
            y_t = (next_ind % V).astype(jnp.int32)
        if use_sparse:
            ctx_b = jnp.broadcast_to(ctx, (Ng - 1, N, K))
            ctx = jnp.concatenate([y_t[None], ctx_b[:-1]], 0)
            if K < W:
                ctx = jnp.concatenate(
                    [ctx, jnp.full((Ng - 1, N, W - K), lm.sos, jnp.int32)], 2
                )
        if K < W:
            log_probs = jnp.concatenate(
                [log_probs, jnp.full((N, W - K), NEG_INF)], 1
            )
            y_t = jnp.concatenate([y_t, jnp.zeros((N, W - K), jnp.int32)], 1)
        if use_sparse:
            # batch-major (N, W, S) float32 path buffer: every per-step
            # buffer op below is then a one-hot MXU contraction or a fused
            # mask-select instead of a gather/scatter (token values < 2**24
            # are exact in f32; converted back once after the loop)
            y_buf = jnp.where(
                jnp.arange(S, dtype=jnp.int32)[None, None] == 0,
                y_t[:, :, None].astype(jnp.float32),
                float(self.pad_value),
            )
        else:
            y_buf = jnp.broadcast_to(y_buf, (S, N, W)).at[0].set(y_t)
        y_lens = jnp.concatenate(
            [
                jnp.ones((N, K), jnp.int32),
                jnp.zeros((N, W - K), jnp.int32),
            ],
            1,
        )
        state = lm.extract_by_src(
            in_next, jnp.repeat(jnp.arange(N, dtype=jnp.int32), W)
        )

        def cond(carry):
            t, y_buf, y_lens, log_probs, state, ctx, eos_mask = carry
            if eos is None:
                return t < S
            done = (
                eos_mask.all(1) if self.finish_all_paths else eos_mask[:, 0]
            )
            return (t < S) & ~done.all()

        def body(carry):
            # eos_mask rides in the carry: deriving it from the path buffer
            # costs two full (S, N, W) passes per step (cond + body)
            t, y_buf, y_lens, log_probs, state, ctx, eos_mask = carry
            if eos is not None:
                done_mask = (
                    eos_mask.all(1, keepdims=True)
                    if self.finish_all_paths
                    else eos_mask[:, :1]
                )
            else:
                done_mask = jnp.zeros((N, 1), bool)

            if use_sparse:
                in_next = state
                lp_next, next_src, y_tok = select_sparse(
                    log_probs, ctx, eos_mask, W, W
                )
                y_t = y_tok[None]  # (1, N, W)
            else:
                log_probs_t, in_next = lm_step(y_buf, state, t, W)
                log_probs_prev, log_probs_t = self.update_log_probs_for_step(
                    log_probs, log_probs_t, y_buf, y_lens, eos_mask
                )
                log_probs_t = mask_eos(log_probs_t, eos_mask)

                cand = (log_probs_prev[..., None] + log_probs_t).reshape(
                    N, W * V
                )
                lp_next, next_ind = jax.lax.top_k(cand, W)
                next_src = next_ind // V
                y_t = (next_ind % V).astype(jnp.int32)[None]  # (1, N, W)
            if use_sparse:
                # every per-beam pick rides ONE one-hot: buffer permute and
                # ctx permute as MXU contractions, lens/eos picks as small
                # dots — no in-loop gathers (see _ctc_advance_tail docstring)
                hp = jax.lax.Precision.HIGHEST
                oh_src = (
                    next_src[:, :, None]
                    == jnp.arange(W, dtype=next_src.dtype)[None, None]
                ).astype(jnp.float32)  # (N, W, Wprev)
                y_next = jnp.einsum(
                    "nkj,njs->nks", oh_src, y_buf, precision=hp
                )
                lens_prefix = jnp.einsum(
                    "nkj,nj->nk", oh_src, y_lens.astype(jnp.float32),
                    precision=hp,
                ).astype(jnp.int32)
                y_next = jnp.where(
                    jnp.arange(S, dtype=jnp.int32)[None, None]
                    == lens_prefix[:, :, None],
                    y_t[0][:, :, None].astype(jnp.float32),
                    y_next,
                )
                lens_next = lens_prefix + 1
                if eos is not None:
                    lens_next = lens_next - jnp.einsum(
                        "nkj,nj->nk", oh_src, eos_mask.astype(jnp.float32),
                        precision=hp,
                    ).astype(jnp.int32)
            else:
                y_next = jnp.take_along_axis(y_buf, next_src[None], axis=2)
                lens_prefix = jnp.take_along_axis(y_lens, next_src, axis=1)
                y_next = _scatter_token_rows(y_next, lens_prefix, y_t)
                lens_next = lens_prefix + 1
                if eos is not None:
                    lens_next = lens_next - jnp.take_along_axis(
                        eos_mask.astype(jnp.int32), next_src, axis=1
                    )
            flat_src = (
                jnp.arange(N, dtype=jnp.int32)[:, None] * W + next_src
            ).reshape(-1)
            state_next = lm.extract_by_src(in_next, flat_src)

            if use_sparse:
                ctx_src = jnp.einsum(
                    "nkj,gnj->gnk", oh_src, ctx.astype(jnp.float32),
                    precision=hp,
                ).astype(ctx.dtype)
                ctx_next = jnp.concatenate([y_t, ctx_src[:-1]], 0)
                ctx_next = jnp.where(done_mask[None], ctx, ctx_next)
            else:
                ctx_next = ctx

            # freeze finished batch elements
            if use_sparse:
                y_next = jnp.where(done_mask[:, :, None], y_buf, y_next)
            else:
                y_next = jnp.where(done_mask[None], y_buf, y_next)
            lens_next = jnp.where(done_mask, y_lens, lens_next)
            lp_next = jnp.where(done_mask, log_probs, lp_next)
            if eos is not None and not use_sparse:
                state_next = jax.tree.map(
                    lambda new, old: jnp.where(
                        jnp.repeat(done_mask[:, 0], W).reshape(
                            (N * W,) + (1,) * (new.ndim - 1)
                        ),
                        old,
                        new,
                    )
                    if new.ndim and new.shape[0] == N * W
                    else new,
                    state_next,
                    state,
                )
            if eos is not None:
                eos_next = (y_t[0] == eos) & (lens_next > 0)
                eos_next = jnp.where(done_mask, eos_mask, eos_next)
            else:
                eos_next = eos_mask
            return (
                t + 1, y_next, lens_next, lp_next, state_next, ctx_next,
                eos_next,
            )

        if eos is not None:
            eos_mask0 = (y_t == eos) & (y_lens > 0)
        else:
            eos_mask0 = jnp.zeros((N, W), bool)
        carry = (
            jnp.asarray(1, jnp.int32), y_buf, y_lens, log_probs, state, ctx,
            eos_mask0,
        )
        _, y_buf, y_lens, log_probs, _, _, _ = jax.lax.while_loop(
            cond, body, carry
        )
        if use_sparse:
            # back to the API's time-major int32 layout (values are exact)
            y_buf = jnp.transpose(y_buf, (2, 0, 1)).astype(jnp.int32)

        if batch_size is None:
            return y_buf[:, 0], y_lens[0], log_probs[0]
        return y_buf, y_lens, log_probs


@partial(jax.jit, static_argnames=("blank_idx", "batch_first", "is_probs"))
def _ctc_greedy(logits, in_lens, blank_idx, batch_first, is_probs):
    if not batch_first:
        logits = jnp.swapaxes(logits, 0, 1)
    if not is_probs:
        logits = jax.nn.log_softmax(logits, axis=2)
    max_, argmax = logits.max(2), logits.argmax(2)
    keep = argmax != blank_idx
    keep = keep.at[:, 1:].set(keep[:, 1:] & (argmax[:, 1:] != argmax[:, :-1]))
    Tm = argmax.shape[1]
    if in_lens is not None:
        valid = jnp.arange(Tm)[None] < in_lens[:, None]
        keep = keep & valid
        max_ = jnp.where(valid, max_, 1.0 if is_probs else 0.0)
    out_lens = keep.sum(1)
    order = jnp.argsort(~keep, axis=1, stable=True)
    paths = jnp.take_along_axis(argmax, order, axis=1)
    out_valid = jnp.arange(Tm)[None] < out_lens[:, None]
    paths = jnp.where(out_valid, paths, 0)
    max_ = max_.prod(1) if is_probs else max_.sum(1)
    if not batch_first:
        paths = paths.T
    return max_, paths, out_lens.astype(jnp.int32)


def ctc_greedy_search(
    logits: jax.Array,
    in_lens: Optional[jax.Array] = None,
    blank_idx: int = -1,
    batch_first: bool = False,
    is_probs: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """CTC greedy decode: argmax, collapse repeats, drop blanks.

    Parity: reference ``ctc_greedy_search`` (``_decoding.py:507-558``)
    (positions past ``out_lens`` are zero-filled here). Fully vectorized and
    jittable.
    """
    logits = jnp.asarray(logits)
    if logits.ndim != 3:
        raise RuntimeError("logits must be 3-dimensional")
    V = logits.shape[2]
    if blank_idx < -V or blank_idx > (V - 1):
        raise RuntimeError(
            "Blank index out of range (expected to be in the range of "
            f"[-{V},{V-1}], but got {blank_idx})"
        )
    blank_idx = (blank_idx + V) % V
    if in_lens is not None:
        in_lens = jnp.asarray(in_lens)
    if logits.dtype == jnp.bfloat16:
        # argmax order is dtype-invariant; max-prob sums return f32 (the
        # bf16->f32 converts fuse into the consumers, reads stay bf16)
        logits = logits.astype(jnp.float32)
    return _ctc_greedy(logits, in_lens, blank_idx, batch_first, is_probs)


def ctc_prefix_search_advance(
    probs_t: Tuple[jax.Array, jax.Array, jax.Array],
    width: int,
    probs_prev: Tuple[jax.Array, jax.Array],
    y_prev: jax.Array,
    y_prev_last: jax.Array,
    y_prev_lens: jax.Array,
    prev_is_prefix: jax.Array,
    return_core: bool = False,
    valid=None,
):
    """One frame of CTC prefix search (probabilities in linear space).

    Parity: reference ``ctc_prefix_search_advance``
    (``_decoding.py:636-934``), including extending-candidate absorption into
    matching non-extending prefixes. ``y_next`` always has one more row than
    ``y_prev`` (static shapes).
    """
    ext_probs_t, nonext_probs_t, blank_probs_t = (
        jnp.asarray(p) for p in probs_t
    )
    if width < 1:
        raise RuntimeError("width must be positive")
    if ext_probs_t.ndim != 3:
        raise RuntimeError("ext_probs_t must be 3 dimensional")
    N, Kp, V = ext_probs_t.shape
    nb_probs_prev, b_probs_prev = (jnp.asarray(p) for p in probs_prev)
    y_prev = jnp.asarray(y_prev)
    y_prev_last = jnp.asarray(y_prev_last)
    y_prev_lens = jnp.asarray(y_prev_lens)
    prev_is_prefix = jnp.asarray(prev_is_prefix)
    tm1 = y_prev.shape[0]
    K = min(width, Kp * (V + 1))

    tot_probs_prev = nb_probs_prev + b_probs_prev
    y_prev_last = jnp.clip(y_prev_last, 0, V - 1)

    last_onehot = jax.nn.one_hot(y_prev_last, V, dtype=ext_probs_t.dtype)
    nb_ext_probs_cand = (
        nb_probs_prev[..., None] * (1 - last_onehot) + b_probs_prev[..., None]
    ) * ext_probs_t  # (N, Kp, V)
    b_nonext_probs_cand = tot_probs_prev * blank_probs_t[:, None]  # (N, Kp)
    nb_nonext_probs_cand = nb_probs_prev * jnp.take_along_axis(
        nonext_probs_t, y_prev_last, axis=1
    )  # (N, Kp)

    to_match, ext_is_exact = _ctc_match_info(
        y_prev_last, y_prev_lens, prev_is_prefix
    )
    absorbed = jnp.where(
        ext_is_exact,
        jnp.take_along_axis(nb_ext_probs_cand, to_match, axis=2),
        0.0,
    ).sum(1)
    nb_nonext_probs_cand = nb_nonext_probs_cand + absorbed
    # has_match[n, k, v] = any_j exact[n, k, j] & (last[n, j] == v); since
    # to_match[n, k, j] = last[n, j] is k-independent this is a matmul-shaped
    # contraction over j — contract it (batched dot) instead of a 3-axis
    # scatter-max (TPU scatters serialize) or an (N, Kp, Kp, V) blowup
    oh_last = jax.nn.one_hot(y_prev_last, V, dtype=jnp.float32)  # (N, j, V)
    has_match = (
        jnp.einsum(
            "nkj,njv->nkv",
            ext_is_exact.astype(jnp.float32),
            oh_last,
            precision=jax.lax.Precision.HIGHEST,
        )
        > 0
    )
    nb_ext_probs_cand = jnp.where(has_match, NEG_INF, nb_ext_probs_cand)

    tot_probs_cand = jnp.concatenate(
        [
            nb_ext_probs_cand.reshape(N, Kp * V),
            nb_nonext_probs_cand + b_nonext_probs_cand,
        ],
        1,
    )
    sel_vals, next_ind = jax.lax.top_k(tot_probs_cand, K)  # (N, K)

    next_is_nonext = next_ind >= Kp * V
    next_src = jnp.where(next_is_nonext, next_ind - Kp * V, next_ind // V)
    next_ext = next_ind % V
    # the selected extension mass IS the candidate score top_k already
    # returned (nonext slots are masked by next_is_nonext downstream)
    nb_ext_sel = sel_vals
    core = _ctc_advance_tail(
        y_prev, y_prev_last, y_prev_lens, prev_is_prefix,
        next_src, next_ext, next_is_nonext, nb_ext_sel,
        nb_nonext_probs_cand, b_nonext_probs_cand, width, K,
        valid=valid,
    )
    if return_core:
        return core
    return _finish_with_buffer(y_prev, core)


def _ctc_match_info(y_prev_last, y_prev_lens, prev_is_prefix):
    """Token-to-match and the exact-extension mask.

    The reference reads ``y_prev[lens[n,k], n, k']``
    (``_decoding.py:797-817``), but every consumer masks by `ext_is_exact`
    (``lens_k + 1 == lens_k'`` and prefix), under which that token is
    exactly beam ``k'``'s *last* token — so no path-buffer read is needed.
    """
    N, Kp = y_prev_last.shape
    to_match = jnp.broadcast_to(y_prev_last[:, None, :], (N, Kp, Kp))
    ext_is_exact = (
        (y_prev_lens + 1)[:, :, None] == y_prev_lens[:, None, :]
    ) & prev_is_prefix  # (N, Kp, Kp)
    return to_match, ext_is_exact


def _topk_candidates_compact(vals3, shared_is_last, removed, K):
    """Exact top-K over the factored advance's (N, Kp, S) candidates
    without a wide sort.

    ``lax.top_k`` over the flat (N, Kp*S = 544) row lowers to a stable
    bitonic sort whose cost cliffs with padded network width (in-scan on
    TPU v5 lite at N=256: ~10.6 us at width <= 256 vs ~42.8 at 544; see
    ``config.TOPK_COMPACT_MIN_BATCH``). But each beam's S slots are
    sorted by construction up to three irregular values: the M shared
    slots are ``coeff * top_vals`` with ``top_vals`` descending and
    ``coeff = tot`` constant >= 0 — except the one ``shared_is_last``
    slot (the repeat-rule dip, ``coeff = b <= tot``) — plus the
    last-token slot (M) and the non-extension slot (M+1). So each beam's
    exact top-K is a cumsum compaction of the sorted run plus rank
    arithmetic for the <= 3 irregular values (all fused elementwise, no
    sort), and one cheap ``Kp*K <= 256``-wide merge ``top_k`` finishes.

    Tie order is exactly ``lax.top_k``'s flat stable order (value desc,
    flat index asc): within the sorted run ties sit in slot order, the
    irregular ranks use lexicographic (value, slot) compares, and the
    merge sees beams in (k major, per-beam rank minor) order. Pinned
    bit-exact against the flat form by
    ``tests/test_decoding.py::test_topk_candidates_compact_exact``.

    REQUIRES the shared slots of ``vals3`` to be ``coeff * v_s`` with
    ``v_s`` non-increasing and ``coeff >= 0`` constant per beam outside
    ``shared_is_last`` (true for the in-loop factored advance: the
    prologue's top-M values are top_k-sorted and masses are
    non-negative; MASS_PAD beams only exist when ``K < width``, which
    the caller gates out), AND ``M >= 2 * K`` so every beam keeps at
    least ``K`` live candidates after removal — an unfilled rank would
    compact to a phantom ``(0.0, slot 0)`` entry where the flat sort
    ranks the removed slots' ``NEG_INF`` values (the caller's gate
    enforces this).

    ``vals3``: final candidate values (removal masks already applied).
    ``shared_is_last``: (N, Kp, M) dip marker (at most one per beam).
    ``removed``: (N, Kp, M+1) removal mask over shared + last slots.
    """
    N, Kp, S = vals3.shape
    M = S - 2
    C = Kp * S
    # the whole stage-1 works in the FLAT (N, C) layout the wide sort
    # consumed: a first cut computed ranks on (N, Kp, S)/(N, Kp, M)
    # tensors and XLA relayout-copied every producer/consumer boundary
    # (measured +44 us/step of stage-1 kernels at N=256 vs ~20 expected
    # from isolated probes). Index helpers are numpy constants — folded
    # into the loop body, zero runtime cost.
    c_slot = np.arange(C, dtype=np.int32) % S
    c_in_sh = jnp.asarray(c_slot < M)
    c_is_L = jnp.asarray(c_slot == M)
    vflat = vals3.reshape(N, C)
    rem_flat = jnp.pad(removed, ((0, 0), (0, 0), (0, 1))).reshape(N, C)
    dip_flat = jnp.pad(shared_is_last, ((0, 0), (0, 0), (0, 2))).reshape(
        N, C
    )
    live = c_in_sh[None] & ~rem_flat & ~dip_flat  # the sorted run R
    # exclusive within-beam count of run slots before each slot: global
    # exclusive cumsum minus its value at the beam's first slot
    excl = jnp.cumsum(live.astype(jnp.int32), -1) - live
    base = excl[:, ::S]  # (N, Kp) — beam-start values
    pos_in_run = excl - jnp.broadcast_to(
        base[:, :, None], (N, Kp, S)
    ).reshape(N, C)
    # per-beam irregular values, broadcast flat (broadcast + reshape of
    # row-major views — shape ops, no data movement)
    def _flat(per_beam):
        return jnp.broadcast_to(
            per_beam[:, :, None], (N, Kp) + (S,)
        ).reshape(N, C)

    has_dip = shared_is_last.any(-1)  # (N, Kp)
    d_val = jnp.where(has_dip, jnp.where(
        shared_is_last, vals3[..., :M], 0.0).sum(-1), NEG_INF)
    s_d = jnp.where(
        shared_is_last, jnp.arange(M, dtype=jnp.int32), 0
    ).sum(-1)
    L = vals3[..., M]
    NE = vals3[..., M + 1]
    d_f, sd_f, L_f, NE_f = _flat(d_val), _flat(s_d), _flat(L), _flat(NE)
    hd_f = _flat(has_dip)
    sl_f = jnp.asarray(c_slot)
    # rank of a run slot = run slots before it (the run is sorted desc
    # with ties already in slot order) + one lexicographic compare per
    # irregular value; all elementwise on (N, C)
    dip_beats = hd_f & (
        (d_f > vflat) | ((d_f == vflat) & (sd_f < sl_f))
    )
    rank_run = pos_in_run + dip_beats + (L_f > vflat) + (NE_f > vflat)
    # irregular ranks need within-beam counts of run slots that beat
    # them: flat indicators, then one segment reduce each via the
    # (N, Kp, S) view's trailing sum
    def _seg_sum(flag):
        return flag.reshape(N, Kp, S).sum(-1)

    beats_d = _seg_sum(
        live & ((vflat > d_f) | ((vflat == d_f) & (sl_f < sd_f)))
    )
    rank_d = beats_d + (L > d_val) + (NE > d_val)
    rank_L = (
        _seg_sum(live & (vflat >= L_f))
        + (has_dip & (d_val >= L))
        + (NE > L)
    )
    rank_NE = (
        _seg_sum(live & (vflat >= NE_f))
        + (has_dip & (d_val >= NE))
        + (L >= NE)
    )
    big = jnp.int32(S + 2)  # any value >= K excludes a slot
    rank_all = jnp.where(
        rem_flat,
        big,
        jnp.where(
            dip_flat,
            _flat(rank_d),
            jnp.where(
                c_in_sh[None],
                rank_run,
                jnp.where(c_is_L[None], _flat(rank_L), _flat(rank_NE)),
            ),
        ),
    )
    # compact ranks < K into per-beam rank-indexed slots (where-reduce:
    # the one-hot is generated inside the reduce fusion, never
    # materialized); rank is within-beam so compaction reduces the
    # (N, Kp, K, S) view over S
    rank3 = rank_all.reshape(N, Kp, S)
    r_iota = jnp.arange(K, dtype=jnp.int32)
    hit = rank3[..., None, :] == r_iota[:, None]  # (N, Kp, K, S)
    v16 = jnp.where(hit, vals3[..., None, :], 0.0).sum(-1)  # (N, Kp, K)
    # emit the FLAT candidate index straight from the compaction and
    # carry it through the merge as a stable-sort PAYLOAD: top_k +
    # mask-reduce index decode cost ~8.6 us/step at N=256 (the one-hot
    # compare over (N, K, Kp*K) rode a bad layout); the payload is free.
    i16 = jnp.where(
        hit,
        jnp.asarray(c_slot.reshape(Kp, S))[None, :, None],
        0,
    ).sum(-1) + jnp.arange(Kp, dtype=jnp.int32)[None, :, None] * S
    return _merge_topk(
        v16.reshape(N, Kp * K), i16.reshape(N, Kp * K), K
    )


def _merge_topk(v, idx, K):
    """Descending top-K of (value, flat-candidate-index) pairs.

    Ascending sort of ``(-v, idx)`` as a TWO-KEY unstable sort ==
    descending of ``v`` with ties in flat candidate order: identical to
    a stable single-key sort, but XLA's stable lowering appends a hidden
    iota tie-breaker operand (a third full-width array through the sort
    — measured 11.2 vs 7.6 us/step at (256, 256)); the flat index IS
    the tie-breaker, so make it a key instead. The negations fuse into
    the producer/consumer. Shared by the rank-compaction and two-stage
    fused selections — the tie order is bit-exactness-critical."""
    negv, i = jax.lax.sort(
        (-v, idx), dimension=1, is_stable=False, num_keys=2
    )
    return -negv[:, :K], i[:, :K]


def ctc_prefix_search_advance_factored(
    top_probs_t: Tuple[jax.Array, jax.Array],
    nonext_probs_t: Optional[jax.Array],
    blank_probs_t: jax.Array,
    width: int,
    probs_prev: Tuple[jax.Array, jax.Array],
    y_prev: jax.Array,
    y_prev_last: jax.Array,
    y_prev_lens: jax.Array,
    prev_is_prefix: jax.Array,
    return_core: bool = False,
    *,
    p_last: Optional[jax.Array] = None,
    p_last_ext: Optional[jax.Array] = None,
    vocab_size: Optional[int] = None,
    batch_major: bool = False,
    valid: Optional[jax.Array] = None,
):
    """One frame of CTC prefix search when extension probabilities factor as
    ``ext[n, k, v] = nonext_probs_t[n, v]`` (no per-beam LM fusion).

    TPU-first fast path: instead of scoring all ``Kp*V`` extensions per step
    (reference ``_decoding.py:636-934``), each beam's global top-``width``
    picks must come from the frame's shared top-``M`` tokens
    (``M >= width + Kp``, covering up to ``Kp - 1`` absorption removals and
    one last-token correction), plus the beam's last token and the
    non-extension candidate. Per-step work drops from ``O(N K V)`` to
    ``O(N K (width + K))``; the ``O(N V)`` top-M is hoisted out of the decode
    loop. Results match :func:`ctc_prefix_search_advance` exactly (up to ties
    in candidate scores).

    `top_probs_t` is ``(values, indices)`` of the frame's top-M
    ``nonext_probs_t`` tokens, ``M >= width + Kp``.
    """
    top_vals, top_inds = (jnp.asarray(p) for p in top_probs_t)
    blank_probs_t = jnp.asarray(blank_probs_t)
    nb_probs_prev, b_probs_prev = (jnp.asarray(p) for p in probs_prev)
    y_prev = jnp.asarray(y_prev)
    y_prev_lens = jnp.asarray(y_prev_lens)
    prev_is_prefix = jnp.asarray(prev_is_prefix)
    if nonext_probs_t is None:
        # caller supplies the per-beam last-token probabilities directly
        # (e.g. gathered from raw logits; avoids materializing the (N, V)
        # probability row at all)
        if p_last is None or vocab_size is None:
            raise ValueError(
                "p_last and vocab_size are required when nonext_probs_t is "
                "None"
            )
        V = vocab_size
        N = nb_probs_prev.shape[0]
        p_last = jnp.asarray(p_last)
    else:
        nonext_probs_t = jnp.asarray(nonext_probs_t)
        N, V = nonext_probs_t.shape
    Kp = nb_probs_prev.shape[1]
    M = top_inds.shape[1]
    if M < min(width + Kp, V):
        raise RuntimeError(f"M ({M}) must be at least width + Kp or V")
    K = min(width, Kp * (V + 1))
    S = M + 2  # per-beam slots: M shared + last-token + non-extension

    tot_probs_prev = nb_probs_prev + b_probs_prev
    y_prev_last = jnp.clip(jnp.asarray(y_prev_last), 0, V - 1)
    if nonext_probs_t is not None:
        p_last = jnp.take_along_axis(nonext_probs_t, y_prev_last, axis=1)
    if p_last_ext is None:
        # without fusion, the extension and continuation probabilities of
        # the last token coincide; with beam-independent fusion (unigram
        # LMs) the caller passes the LM-weighted value separately
        p_last_ext = p_last
    else:
        p_last_ext = jnp.asarray(p_last_ext)

    # shared-token extension scores; the beam's own last token only carries
    # the blank mass (CTC repeat rule)
    shared_is_last = top_inds[:, None, :] == y_prev_last[:, :, None]
    coeff = jnp.where(
        shared_is_last, b_probs_prev[:, :, None], tot_probs_prev[:, :, None]
    )
    shared_scores = coeff * top_vals[:, None, :]  # (N, Kp, M)
    # dedicated last-token slot, disabled when the last token is already in
    # the shared top-M (dedup)
    last_scores = jnp.where(
        shared_is_last.any(-1), NEG_INF, b_probs_prev * p_last_ext
    )

    b_nonext_probs_cand = tot_probs_prev * blank_probs_t[:, None]
    nb_nonext_probs_cand = nb_probs_prev * p_last

    to_match, ext_is_exact = _ctc_match_info(
        y_prev_last, y_prev_lens, prev_is_prefix
    )
    # to_match[n, k, j] = y_prev_last[n, j], so the matched-token probability
    # is just p_last_ext broadcast over k -- no extra gather
    p_tm = jnp.broadcast_to(p_last_ext[:, None, :], (N, Kp, Kp))
    tm_coeff = jnp.where(
        to_match == y_prev_last[:, :, None],
        b_probs_prev[:, :, None],
        tot_probs_prev[:, :, None],
    )
    absorbed = jnp.where(ext_is_exact, tm_coeff * p_tm, 0.0).sum(1)
    nb_nonext_probs_cand = nb_nonext_probs_cand + absorbed

    # slot assembly as pad + select instead of concatenate: inside the
    # decode scan each concat materializes its (N, Kp, 1) operands through
    # relayout copy kernels (3 per step measured on TPU), while the
    # pad/where chain stays elementwise and fuses into one loop fusion.
    # Slot map (unchanged): [0, M) shared top-M | M last token | M+1 nonext.
    is_shared = (jnp.arange(M + 1) < M)[None, None]  # (1, 1, M + 1)
    # removed[n, k, s] = any_j exact[n, k, j] & (cand_v[n, k, s] ==
    # last[n, j]). The candidate token of every SHARED slot is
    # k-independent (top_inds[n, s]), so the match predicate factors out
    # of k and the reduction over j is a batched (Kp x Kp) @ (Kp x M+1)
    # dot on 0/1 operands (exact: counts < 2^24) — the direct 4-D
    # (N, Kp, M+1, Kp) compare+any reduce measured 3.6 us/step at B=32
    # (latency-bound at these minor-dim sizes); the MXU form ~0.5.
    # slot M's candidate token IS y_prev_last[n, k] (k-dependent), so it
    # is handled separately; the shared columns' reduction over j is
    # either a batched 0/1 dot (MXU; exact, counts < 2^24) or the direct
    # compare+any reduce — measured on TPU v5 lite: the dot wins at
    # small N (B=32: 0.5 vs 3.6 us/step — the 4-D reduce is
    # latency-bound at these minor-dim sizes) and LOSES at large N
    # (B=256: the dot's operand relayouts cost ~23 us/step); gate on the
    # same batch threshold as the compact top-K.
    cand_shared = jnp.pad(top_inds, ((0, 0), (0, 1)))  # (N, M+1)
    if N < config.TOPK_COMPACT_MIN_BATCH:
        match_f = (
            cand_shared[:, :, None] == y_prev_last[:, None, :]
        ).astype(jnp.float32)  # (N, M+1, Kp)
        removed_sh = (
            jnp.einsum(
                "nkj,nsj->nks",
                ext_is_exact.astype(jnp.float32),
                match_f,
                precision=jax.lax.Precision.HIGHEST,
            )
            > 0
        )  # (N, Kp, M+1); its column M is recomputed below
        removed_last = (
            ext_is_exact
            & (y_prev_last[:, :, None] == y_prev_last[:, None, :])
        ).any(-1)  # (N, Kp)
        removed = jnp.where(
            is_shared, removed_sh, removed_last[:, :, None]
        )
    else:
        cand_v = jnp.where(
            is_shared,
            cand_shared[:, None],
            y_prev_last[:, :, None],
        )  # (N, Kp, M + 1)
        removed = (
            ext_is_exact[:, :, None, :]
            & (cand_v[:, :, :, None] == to_match[:, :, None, :])
        ).any(-1)
    ext_scores = jnp.where(
        is_shared,
        jnp.pad(shared_scores, ((0, 0), (0, 0), (0, 1))),
        last_scores[:, :, None],
    )
    ext_scores = jnp.where(removed, NEG_INF, ext_scores)

    tot_probs_cand3 = jnp.where(
        (jnp.arange(S) < S - 1)[None, None],
        jnp.pad(ext_scores, ((0, 0), (0, 0), (0, 1))),
        (nb_nonext_probs_cand + b_nonext_probs_cand)[:, :, None],
    )  # (N, Kp, S)
    # candidate selection: above the batch gate, the rank-compaction
    # two-stage form replaces the flat (N, Kp*S)-wide sort (bit-exact
    # incl. tie order — see _topk_candidates_compact). The structural
    # preconditions: in-loop (batch_major), no MASS_PAD beams (K ==
    # width == Kp and V + 1 >= width), the merge width Kp*K on the
    # cheap side of the sort cliff, and M >= 2*width so every beam
    # always has >= K live candidates: removal can disable at most
    # K - 1 distinct shared tokens plus the last slot, so live >=
    # (M + 2) - K >= K + 2 and the compaction never reaches a phantom
    # rank (an unfilled rank compacts to value 0.0 at slot 0, which a
    # scarcity regime — M < 2*width with heavy absorption removal —
    # could otherwise select; the flat sort ranks the removed slots'
    # NEG_INF entries instead).
    if (
        batch_major
        and K == width
        and Kp == width
        and Kp * K <= 256
        and V + 1 >= width
        and M >= 2 * width
        and N >= config.TOPK_COMPACT_MIN_BATCH
    ):
        sel_vals, next_ind = _topk_candidates_compact(
            tot_probs_cand3, shared_is_last, removed, K
        )
    else:
        # (a two-key unstable sort replacement for this flat top_k — the
        # compact path's merge trick — was A/B'd r5 and measured neutral:
        # 2,822.7 vs 2,838 utt/s at B=32. lax.top_k's stable lowering
        # here already carries only two operands, so there is no hidden
        # payload to drop; the sort IS ~5 us/step of the body, but it is
        # floor-priced.)
        sel_vals, next_ind = jax.lax.top_k(
            tot_probs_cand3.reshape(N, Kp * S), K
        )

    slot = next_ind % S
    next_src = next_ind // S
    next_is_nonext = slot == (S - 1)
    # one gather from the concatenated (shared tokens | last tokens) row
    # instead of two (gathers break XLA fusion)
    ext_src_cat = jnp.concatenate([top_inds, y_prev_last], 1)  # (N, M + Kp)
    ext_idx = jnp.where(slot < M, slot, M + next_src)
    if batch_major:
        # in-loop form: mask-reduce instead of a gather (see tail docstring)
        next_ext = jnp.where(
            ext_idx[:, :, None]
            == jnp.arange(M + Kp, dtype=ext_idx.dtype)[None, None],
            ext_src_cat[:, None, :],
            0,
        ).sum(2)
    else:
        next_ext = jnp.take_along_axis(ext_src_cat, ext_idx, axis=1)
    # the selected extension mass IS the candidate score top_k already
    # returned (nonext slots are masked by next_is_nonext downstream)
    nb_ext_sel = sel_vals

    core = _ctc_advance_tail(
        y_prev, y_prev_last, y_prev_lens, prev_is_prefix,
        next_src, next_ext, next_is_nonext, nb_ext_sel,
        nb_nonext_probs_cand, b_nonext_probs_cand, width, K,
        batch_major=batch_major,
        valid=valid,
    )
    if return_core:
        return core
    return _finish_with_buffer(y_prev, core)


def _ctc_prefix_search_advance_sparse(
    top_g: Tuple[jax.Array, jax.Array],
    am_at,
    uni: jax.Array,
    blank_probs_t: jax.Array,
    beta: float,
    sparse: Tuple[jax.Array, ...],
    width: int,
    probs_prev: Tuple[jax.Array, jax.Array],
    y_prev: jax.Array,
    y_prev_last: jax.Array,
    y_prev_lens: jax.Array,
    prev_is_prefix: jax.Array,
    bi: Optional[jax.Array] = None,
    c1: Optional[jax.Array] = None,
    batch_major: bool = False,
    valid: Optional[jax.Array] = None,
):
    """One frame of CTC prefix search with a backoff n-gram LM shallow-fused
    (``lm_probs**beta * am``), scoring only candidate slots.

    The backoff LM's conditional decomposes per beam ``k`` as ``lm(v|ctx_k)
    = uni[v] + base_k`` except on a sparse set of stored n-gram tokens
    (:func:`pydrobert_tpu.lm.LookupLanguageModel.sparse_corrections`). The
    per-beam additive scalars (``base_k`` and the ``log_softmax``
    normalizer) don't change the within-beam candidate order, so each
    beam's true top-``width`` extensions must come from: the frame's shared
    top-``M`` tokens of ``g[v] = am[v] * exp(beta * uni[v])`` (hoisted out
    of the decode loop; ``M >= 2 * width + C``), the beam's ``C`` corrected
    tokens, its last token, and the non-extension candidate — ``O(N K (M +
    C))`` per frame instead of the dense advance's ``O(N K V)`` LM scoring
    (reference semantics: ``_decoding.py:636-934`` with fusion
    ``_decoding.py:1113-1135``). Exact up to ties.

    `top_g` is ``(values, indices)`` of top-M ``g``; `am_at` maps token ids
    ``(N, Q)`` to ``(acoustic probabilities, unigram log-probs clamped at
    -1e30)`` — both fetched through one shared one-hot; `sparse` is
    ``sparse_corrections`` output reshaped to ``(N, Kp, ...)`` leading dims.
    """
    top_vals, top_inds = top_g
    nb_probs_prev, b_probs_prev = (jnp.asarray(p) for p in probs_prev)
    N, Kp = nb_probs_prev.shape
    M = top_inds.shape[1]
    V = uni.shape[0]
    base, ctoks, cvals, cvalid, logZ, logb, bounds = sparse
    C = ctoks.shape[2]
    K = min(width, Kp * (V + 1))
    L = M + C + 1  # ext slots per beam; +1 nonext slot below
    # static split of the correction axis: order-2 slots answer to the
    # direct-indexed bigram table (when available), orders >= 3 are the
    # (typically short) tail
    hi0 = int(bounds[1]) if bi is not None else 0
    C_hi = C - hi0

    tot_probs_prev = nb_probs_prev + b_probs_prev
    y_prev_last = jnp.clip(jnp.asarray(y_prev_last), 0, V - 1)
    scal = jnp.exp(beta * (base - logZ))  # (N, Kp)

    # one acoustic+unigram fetch for correction tokens AND last tokens
    # (both ride one shared one-hot; a native-shapes split — one dot for
    # (N, Kp, C) corrections, a stacked-rhs dot for last tokens — was
    # A/B'd in r4 and measured +2 kernels/step over this packed form)
    am_all, uni_last = am_at(
        jnp.concatenate([ctoks.reshape(N, Kp * C), y_prev_last], 1),
        uni_tail=Kp,
    )
    am_corr = am_all[:, : Kp * C].reshape(N, Kp, C)
    am_last = am_all[:, Kp * C:]  # (N, Kp) plain acoustic prob

    # fused ext prob of beam j's last token under beam k's LM context,
    # p_tm[n, k, j] — needed for absorption; every per-beam "own last
    # token" quantity is its k == j diagonal, so compute it ONCE and read
    # diagonals instead of running a separate (N, Kp, C) block per step
    # (uni_last (N, Kp) came from am_at's uni_tail fast path)
    if bi is not None:
        # lm(last_j | ctx_k), highest stored order winning: start from the
        # unigram backoff, override with the ONE-GATHER bigram value, then
        # with matches among the short order->=3 correction tail — instead
        # of comparing last_j against all C correction slots (the
        # max_children-wide order-2 lists dominated that block)
        # ONE bigram-table gather answers BOTH membership queries — the
        # last-token block (j axis, Kp) and the shared top-M block — the
        # two separate gathers cost a gather fusion + reshape pair each per
        # decode step; candidates ride one concatenated axis
        cand2 = jnp.concatenate([y_prev_last, top_inds], 1)  # (N, Kp + M)
        big = jnp.take(
            bi,
            (c1[:, :, None] * V + cand2[:, None, :]).reshape(-1),
            axis=0,
        ).reshape(N, Kp, Kp + M)
        biq = big[..., :Kp]
        found2 = jnp.isfinite(biq)
        pen2 = logb[..., 1:].sum(-1)  # (N, Kp): backoffs of orders > 2
        lm_tm = jnp.where(
            found2,
            pen2[:, :, None] + jnp.where(found2, biq, 0.0),
            base[:, :, None] + uni_last[:, None, :],
        )
        found_tm = found2
        shared_in_corr_bi = jnp.isfinite(big[..., Kp:])  # (N, Kp, M)
        if C_hi:
            # the order>=3 correction tails for both blocks ride ONE
            # compare against the (short) high-order candidate lists too
            mhi = (
                ctoks[:, :, None, hi0:] == cand2[:, None, :, None]
            ) & cvalid[:, :, None, hi0:]  # (N, Kp, Kp + M, C_hi)
            anyhi = mhi.any(3)
            any3 = anyhi[..., :Kp]
            lm_tm = jnp.where(
                any3,
                jnp.where(
                    mhi[..., :Kp, :], cvals[:, :, None, hi0:], 0.0
                ).sum(3),
                lm_tm,
            )
            found_tm = found_tm | any3
            shared_in_corr_bi = shared_in_corr_bi | anyhi[..., Kp:]
    else:
        # corrected value AND match flag for every (beam k, candidate
        # token) pair via WHERE-REDUCES over the correction axis: the
        # (N, Kp, Kp+M, C) predicate is generated inside each reduce's
        # input fusion and never materialized (the r3 HIGHEST-precision
        # dot form materialized it as the dot's f32 operand — ~3.3 MB of
        # HBM write+read per decode step; the pre-r3 compare chain
        # materialized it in three layouts with relayout copies — the
        # reduce-input-fusion form does neither). Exact: dup-masked
        # corrections are unique per context, so at most one nonzero term
        # per reduction row (x + 0s == x). The candidate axis carries the
        # OTHER-beam last tokens AND the shared top-M tokens, so the same
        # predicate also answers the shared-slot membership mask.
        cand2 = jnp.concatenate([y_prev_last, top_inds], 1)  # (N, Kp + M)
        eqm = (
            ctoks[:, :, None, :] == cand2[:, None, :, None]
        ) & cvalid[:, :, None, :]  # fuses into both reduces below
        val_sum = jnp.where(eqm, cvals[:, :, None, :], 0.0).sum(3)
        found_all = eqm.any(3)  # (N, Kp, Kp + M)
        found_tm = found_all[..., :Kp]
        shared_in_corr_bi = found_all[..., Kp:]  # (N, Kp, M)
        lm_tm = val_sum[..., :Kp] + jnp.where(
            found_tm, 0.0, base[:, :, None] + uni_last[:, None, :]
        )
    p_tm = am_last[:, None, :] * jnp.exp(beta * (lm_tm - logZ[:, :, None]))
    eye = jnp.asarray(np.eye(Kp, dtype=bool))
    last_in_corr_any = (found_tm & eye).any(2)  # diag: own-last stored
    p_last_ext = jnp.where(eye, p_tm, 0.0).sum(2)  # diag: own-last fused

    # shared slots
    shared_is_last = top_inds[:, None, :] == y_prev_last[:, :, None]
    coeff_sh = jnp.where(
        shared_is_last, b_probs_prev[:, :, None], tot_probs_prev[:, :, None]
    )
    shared_scores = coeff_sh * scal[:, :, None] * top_vals[:, None, :]
    # membership came from the merged bigram gather + high-order tail
    # compare (bi path) or rode the candidate axis of the correction
    # contraction (einsum path) — one op for both blocks either way
    shared_scores = jnp.where(shared_in_corr_bi, NEG_INF, shared_scores)

    # correction slots
    corr_is_last = ctoks == y_prev_last[:, :, None]
    coeff_c = jnp.where(
        corr_is_last, b_probs_prev[:, :, None], tot_probs_prev[:, :, None]
    )
    corr_scores = (
        coeff_c * am_corr * jnp.exp(beta * (cvals - logZ[:, :, None]))
    )
    corr_scores = jnp.where(cvalid, corr_scores, NEG_INF)

    # dedicated last-token slot (disabled when covered by shared or corr)
    last_scores = jnp.where(
        shared_is_last.any(2) | last_in_corr_any,
        NEG_INF,
        b_probs_prev * p_last_ext,
    )

    # non-extension masses; absorption uses the fused ext prob p_tm of
    # every OTHER beam's last token under THIS beam's LM context (computed
    # above)
    b_nonext_probs_cand = tot_probs_prev * blank_probs_t[:, None]
    to_match, ext_is_exact = _ctc_match_info(
        y_prev_last, y_prev_lens, prev_is_prefix
    )
    tm_coeff = jnp.where(
        y_prev_last[:, None, :] == y_prev_last[:, :, None],
        b_probs_prev[:, :, None],
        tot_probs_prev[:, :, None],
    )
    absorbed = jnp.where(ext_is_exact, tm_coeff * p_tm, 0.0).sum(1)
    nb_nonext_probs_cand = nb_probs_prev * am_last + absorbed

    # absorption removal across all ext slots. Slot assembly as pad +
    # select instead of concatenate: inside the decode scan each concat
    # materializes its operands through relayout copy kernels, while the
    # pad/where chain stays elementwise and fuses into one loop fusion.
    # Slot map (unchanged): [0, M) shared | [M, M + C) corrections | M + C
    # last token | M + C + 1 nonext.
    li = jnp.arange(L)[None, None]  # (1, 1, L)
    in_sh = li < M
    in_corr = (li >= M) & (li < M + C)
    slot_toks = jnp.where(
        in_sh,
        jnp.pad(top_inds, ((0, 0), (0, L - M)))[:, None],
        jnp.where(
            in_corr,
            jnp.pad(ctoks, ((0, 0), (0, 0), (M, 1))),
            y_prev_last[:, :, None],
        ),
    )  # (N, Kp, L)
    removed = (
        ext_is_exact[:, :, None, :]
        & (slot_toks[:, :, :, None] == to_match[:, :, None, :])
    ).any(3)
    ext_scores = jnp.where(
        in_sh,
        jnp.pad(shared_scores, ((0, 0), (0, 0), (0, C + 1))),
        jnp.where(
            in_corr,
            jnp.pad(corr_scores, ((0, 0), (0, 0), (M, 1))),
            last_scores[:, :, None],
        ),
    )
    ext_scores = jnp.where(removed, NEG_INF, ext_scores)

    S = L + 1
    tot_probs_cand = jnp.where(
        (jnp.arange(S) < L)[None, None],
        jnp.pad(ext_scores, ((0, 0), (0, 0), (0, 1))),
        (nb_nonext_probs_cand + b_nonext_probs_cand)[:, :, None],
    )  # (N, Kp, S)
    if config.FUSED_TOPK_TWOSTAGE and S >= K:
        # two-stage exact top-K: the flat (N, Kp*S) row is ~1.3k wide at
        # the headline fused shape, past lax.top_k's sort-network cliff
        # (pads to 2048 lanes; the single TopK custom call measured 28.7
        # us/step at B=32 — the largest block in the fused scan body).
        # Any global top-K candidate is in its own beam's top-K, so take
        # per-beam top-K over the S slots (sorts a 128-lane row) and
        # finish with one 256-wide two-key merge. Ties stay bit-identical
        # to the flat form: top_k is stable (lower index first) and the
        # merge sorts (-value, flat index) exactly like the factored
        # path's compact top-K above.
        v1, s1 = jax.lax.top_k(tot_probs_cand, K)  # (N, Kp, K)
        f1 = s1 + jnp.arange(Kp, dtype=jnp.int32)[None, :, None] * S
        sel_vals, next_ind = _merge_topk(
            v1.reshape(N, Kp * K), f1.reshape(N, Kp * K), K
        )
    else:
        sel_vals, next_ind = jax.lax.top_k(
            tot_probs_cand.reshape(N, Kp * S), K
        )

    slot = next_ind % S
    next_src = next_ind // S
    next_is_nonext = slot == (S - 1)
    ext_idx = next_src * L + jnp.minimum(slot, L - 1)
    if batch_major:
        # in-loop form: mask-reduce instead of a gather (see tail
        # docstring). A 2-axis (src, slot) decomposition that avoids the
        # (N, Kp*L) flatten was A/B'd in r4 and measured +2 kernels/step
        # (the 4-D predicate splits the fusion); the flat form stays.
        next_ext = jnp.where(
            ext_idx[:, :, None]
            == jnp.arange(Kp * L, dtype=ext_idx.dtype)[None, None],
            slot_toks.reshape(N, Kp * L)[:, None, :],
            0,
        ).sum(2)
    else:
        next_ext = jnp.take_along_axis(
            slot_toks.reshape(N, Kp * L), ext_idx, axis=1
        )

    return _ctc_advance_tail(
        y_prev, y_prev_last, y_prev_lens, prev_is_prefix,
        next_src, next_ext, next_is_nonext, sel_vals,
        nb_nonext_probs_cand, b_nonext_probs_cand, width, K,
        batch_major=batch_major,
        valid=valid,
    )


def _finish_with_buffer(y_prev, core):
    """Reconstruct the reference-shaped ``y_next`` (``tm1 + 1`` rows) from
    core outputs, for the public step-function API."""
    (
        prefix_lens, y_last, y_lens, probs, is_prefix, src, ext, is_nonext,
        y_gathered,
    ) = core
    tm1, N, _ = y_prev.shape
    K = src.shape[1]
    y_next = jnp.concatenate(
        [y_gathered, jnp.zeros((1, N, K), y_prev.dtype)], 0
    )
    n_sc = jnp.arange(N)[:, None]
    k_sc = jnp.arange(K)[None, :]
    y_next = y_next.at[prefix_lens, n_sc, k_sc].set(
        ext.astype(y_prev.dtype), mode="drop"
    )
    return (y_next, y_last, y_lens, probs, is_prefix, src, is_nonext)


def _ctc_advance_tail(
    y_prev, y_prev_last, y_prev_lens, prev_is_prefix,
    next_src, next_ext, next_is_nonext, nb_ext_sel,
    nb_nonext_probs_cand, b_nonext_probs_cand, width, K,
    batch_major: bool = False,
    valid=None,
):
    """Common bookkeeping after candidate selection: masses, lengths, and
    prefix matrix. Reads the old path buffer only through an ``O(N K^2)``
    element gather (new-beam tokens at interrogation points are derived from
    ``(next_src, next_ext)``), so callers can maintain the ``(T, N, K)``
    buffer themselves without per-step full-buffer rewrites.

    With ``batch_major`` the path buffer is ``(N, K, T)`` float32 — time in
    the minor (lane) dimension — (token values are exact small ints) and
    every per-beam pick lowers as a
    one-hot mask-reduce or HIGHEST-precision one-hot contraction instead of
    a gather: inside a decode loop each ``take_along_axis`` costs an index
    reshape, a gather kernel, and layout copies on its consumers every
    step (~3-4 dispatches), while the one-hot forms fuse into neighboring
    elementwise work. Bit-exact (one nonzero term per reduction).

    Returns ``(y_next_prefix_lens, y_next_last, y_next_lens,
    (nb, b), next_is_prefix, next_src, next_ext, next_is_nonext)``,
    width-padded.

    With ``valid`` (``(N, 1)`` bool, in-loop batch freezing), frozen rows
    permute by the IDENTITY instead of ``next_src``: the caller's path
    buffer then needs no buffer-wide freeze select (``cols`` already
    carries frozen rows through unchanged), removing a whole (N, K, T)
    read+select from every decode step. Every other tail output is
    discarded for frozen rows anyway: the per-(N, K) carries are masked by
    the caller, and once ``t >= lens[n]`` the row stays frozen, so its
    clobbered ``y_last``/``is_prefix`` never reach a live step.
    """
    if batch_major:
        N, Kp, tm1 = y_prev.shape
    else:
        tm1, N, Kp = y_prev.shape
    K_new = next_src.shape[1]
    if valid is None:
        src_eff = next_src
    else:
        src_eff = jnp.where(
            valid, next_src, jnp.arange(K_new, dtype=next_src.dtype)[None]
        )
    if batch_major:
        # shared one-hot over the source beams; ALL per-beam picks (four
        # scalars-per-beam plus the prefix matrix's Kp-wide rows) ride ONE
        # HIGHEST-precision contraction against a packed (N, Kp, 4 + Kp)
        # value block — the batch-major analogue of the time-major path's
        # single packed gather. Exact: one nonzero term per dot row picks
        # each value verbatim (1 * x + 0s == x), ints are < 2**24.
        oh_src = (
            src_eff[:, :, None]
            == jnp.arange(Kp, dtype=src_eff.dtype)[None, None]
        )  # (N, K, Kp)
        oh_src_f = oh_src.astype(jnp.float32)
        # per-beam scalar picks: stack the four (N, Kp) carries along a NEW
        # AXIS 1 — beams stay in the lane dimension, so the stack is a
        # same-layout concatenate (the earlier lane-axis pack cost one
        # relayout copy kernel per operand per decode step) — and orient
        # the dot's output (N, c, K) so each picked row slices out as a
        # (N, K) in the carries' own layout (the (N, K, c) orientation cost
        # four more relayout copies slicing it)
        packed_scalars = jnp.stack(
            [
                y_prev_lens.astype(jnp.float32),
                nb_nonext_probs_cand.astype(jnp.float32),
                b_nonext_probs_cand.astype(jnp.float32),
                y_prev_last.astype(jnp.float32),
            ],
            1,
        )  # (N, 4, Kp)
        picked = jnp.einsum(
            "ncj,nkj->nck",
            packed_scalars,
            oh_src_f,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, 4, K)
        y_next_prefix_lens = picked[:, 0].astype(jnp.int32)
        y_next_lens = y_next_prefix_lens + (~next_is_nonext)
        nb_probs_next = jnp.where(
            next_is_nonext, picked[:, 1], nb_ext_sel
        )
        b_probs_next = picked[:, 2] * next_is_nonext
        last_src = picked[:, 3].astype(jnp.int32)
        y_next_last = last_src * next_is_nonext + next_ext * (
            ~next_is_nonext
        )
        # prefix-matrix row pick rides its own dot (same one-hot)
        ip_rows = jnp.einsum(
            "nkj,njc->nkc",
            oh_src_f,
            prev_is_prefix.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, K, Kp) = ip[n, src_k, :], 0/1 f32
        # column pick ip[n, src_k, src_j]: second contraction over Kp
        # (contracting dim minor on both operands)
        next_prefix_is_prefix = (
            jnp.einsum(
                "nKj,nkj->nkK",
                oh_src_f,
                ip_rows,
                precision=jax.lax.Precision.HIGHEST,
            )
            > 0
        )  # (N, K, K')
    else:
        # four per-beam source gathers share the same indices: pack them
        # into one (N, Kp, 4) int32 row (float values as bits) so XLA
        # issues a single gather kernel instead of four (gathers break
        # elementwise fusion)
        packed_src = jnp.concatenate(
            [
                jnp.stack(
                    [
                        y_prev_lens.astype(jnp.int32),
                        jax.lax.bitcast_convert_type(
                            nb_nonext_probs_cand.astype(jnp.float32),
                            jnp.int32,
                        ),
                        jax.lax.bitcast_convert_type(
                            b_nonext_probs_cand.astype(jnp.float32),
                            jnp.int32,
                        ),
                        y_prev_last.astype(jnp.int32),
                    ],
                    2,
                ),
                prev_is_prefix.astype(jnp.int32),  # rides the same gather
            ],
            2,
        )
        picked = jnp.take_along_axis(
            packed_src, next_src[:, :, None], axis=1
        )
        y_next_prefix_lens = picked[..., 0]
        y_next_lens = y_next_prefix_lens + (~next_is_nonext)

        nb_nonext_probs_next = jax.lax.bitcast_convert_type(
            picked[..., 1], jnp.float32
        )
        nb_probs_next = jnp.where(
            next_is_nonext, nb_nonext_probs_next, nb_ext_sel
        )
        b_probs_next = (
            jax.lax.bitcast_convert_type(picked[..., 2], jnp.float32)
            * next_is_nonext
        )
        y_next_last = picked[..., 3] * next_is_nonext + next_ext * (
            ~next_is_nonext
        )

        # row gather ip[n, src_k, :] came packed with the source gather
        # above; only the column gather by src_j remains
        ip_rows = picked[..., 4:] != 0  # (N, K, Kp)
        next_prefix_is_prefix = jnp.take_along_axis(
            ip_rows, next_src[:, None, :], axis=2
        )
    next_len_leq = y_next_lens[:, :, None] <= y_next_lens[:, None, :]
    # next_to_match[n,k,k'] = (new) y[p_k, n, k'], p_k = lens_next_k - 1.
    # The new beam k' is old beam src_k' plus next_ext_k' written at
    # q_k' = prefix_lens_k', so the value is next_ext_k' when p_k == q_k',
    # the zero pad when p_k is past the old buffer, and otherwise the old
    # buffer at [p_k, n, src_k'] -- an O(N K^2) gather instead of the
    # reference's full-buffer transpose+gather.
    p = jnp.clip(y_next_lens - 1, 0, None)  # (N, K)
    q = y_next_prefix_lens  # (N, K)
    if batch_major:
        # beam permute of the whole buffer and the row interrogation are
        # two HIGHEST-precision one-hot contractions (MXU; exact, one
        # nonzero term per dot row) instead of a streaming gather + flat
        # row take: inside the scan the gathers' index plumbing and layout
        # copies dominate, the dots fuse. The (N, K, T) orientation keeps
        # time in the lane dimension (a beam-minor buffer pads 16 -> 128
        # lanes, 8x the bytes on every buffer op) and makes both dots
        # canonical (contracting dim minor on both operands).
        cols = jnp.einsum(
            "nkj,njt->nkt",
            oh_src.astype(jnp.float32),
            y_prev,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, K', T), f32
        # fold the new-token write into the permute's epilogue and read
        # the POST-write buffer for the row interrogation: next_to_match
        # is defined on the NEW buffer (y_next[p_k, n, k']), and the
        # where(p == q, next_ext, old) correction the pre-write read
        # needed IS the post-write value — so the pre-write columns never
        # materialize (one (N, K, T) pass saved per step) and the second
        # dot reads the carry itself. Emitted in the carry's dtype
        # (float16 when the caller enables it: token ids < 2048 are
        # exact; the dot upcasts exactly).
        pos = q if valid is None else jnp.where(valid, q, tm1)
        wmask = (
            jnp.arange(tm1, dtype=pos.dtype)[None, None] == pos[:, :, None]
        )
        y_new = jnp.where(
            wmask, next_ext[:, :, None].astype(jnp.float32), cols
        ).astype(y_prev.dtype)
        oh_p = (
            p[:, :, None] == jnp.arange(tm1, dtype=p.dtype)[None, None]
        ).astype(jnp.float32)  # (N, K, T); rows past tm1 reduce to 0
        next_to_match = jnp.einsum(
            "nkt,njt->nkj",
            oh_p,
            y_new,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, K, K') = y_next[n, k', p_k]
        next_ext_f = next_ext.astype(jnp.float32)
        if valid is None:
            # p_k == tm1 (an exactly-full buffer, reachable only through
            # the standalone core API) interrogates the APPENDED row,
            # which both the write mask and oh_p treat as out-of-range
            # (all-zero row): supply it directly — it holds next_ext_j
            # where beam j wrote there (q_j == tm1), pad 0 otherwise
            # (the pre-write form's where(p == q, ...) correction
            # covered this case). In-loop callers pass `valid` and run
            # the scan contract lens <= T - 1 < tm1, where p < tm1
            # always — the correction is skipped there (it measured
            # ~1.5% of the B=256 serving step as a fused epilogue).
            next_to_match = jnp.where(
                p[:, :, None] >= tm1,
                jnp.where(
                    q[:, None, :] >= tm1, next_ext_f[:, None, :], 0.0
                ),
                next_to_match,
            )
        next_ext_matches = next_to_match == next_ext_f[:, :, None]
        cols = y_new
    else:
        if tm1:
            # out[n,k,k'] = y_prev[p_k, n, src_k'] via a streaming column
            # gather followed by a flat row take: a single two-axis gather
            # with (N,K,K) arbitrary indices lowers to serialized scalar
            # loads on TPU (~6x slower than these two single-axis forms,
            # measured); ``cols`` is also returned so callers maintaining
            # the path buffer reuse it instead of re-gathering the full
            # buffer. (A row-take-then-column-select form — avoiding the
            # O(T N K) cols stream — was measured: take_along_axis columns
            # serialize (~1000x) and the one-hot-einsum column select blows
            # XLA compile time up ~30x.)
            cols = jnp.take_along_axis(y_prev, src_eff[None], axis=2)
            rows_idx = (
                jnp.clip(p, None, tm1 - 1) * N
                + jnp.arange(N, dtype=p.dtype)[:, None]
            )  # (N, K)
            old_val = jnp.take(
                cols.reshape(tm1 * N, K_new), rows_idx, axis=0
            )  # (N, K, K')
            old_val = jnp.where((p >= tm1)[:, :, None], 0, old_val)
        else:
            cols = jnp.zeros((0, N, K_new), y_prev.dtype)
            old_val = jnp.zeros((N, K_new, K_new), y_prev.dtype)
        next_to_match = jnp.where(
            p[:, :, None] == q[:, None, :], next_ext[:, None, :], old_val
        )
        next_ext_matches = next_to_match == next_ext[:, :, None]
    next_is_prefix = (
        next_prefix_is_prefix
        & next_len_leq
        & (next_is_nonext[:, :, None] | next_ext_matches)
    )

    if K < width:
        rem = width - K
        zeros_i = jnp.zeros((N, rem), jnp.int32)
        y_next_prefix_lens = jnp.concatenate(
            [y_next_prefix_lens.astype(jnp.int32), zeros_i], 1
        )
        y_next_last = jnp.concatenate([y_next_last, zeros_i], 1)
        y_next_lens = jnp.concatenate(
            [y_next_lens.astype(jnp.int32), zeros_i], 1
        )
        mass_pad = jnp.full((N, rem), MASS_PAD, nb_probs_next.dtype)
        nb_probs_next = jnp.concatenate([nb_probs_next, mass_pad], 1)
        b_probs_next = jnp.concatenate([b_probs_next, mass_pad], 1)
        false_ = jnp.zeros((N, rem), bool)
        next_is_nonext = jnp.concatenate([next_is_nonext, false_], 1)
        next_is_prefix = jnp.concatenate(
            [next_is_prefix, jnp.zeros((N, K, rem), bool)], 2
        )
        next_is_prefix = jnp.concatenate(
            [next_is_prefix, jnp.zeros((N, rem, width), bool)], 1
        )
        next_src = jnp.concatenate([next_src, zeros_i], 1)
        next_ext = jnp.concatenate([next_ext.astype(jnp.int32), zeros_i], 1)
        if batch_major:
            cols = jnp.concatenate(
                [
                    cols,
                    jnp.broadcast_to(
                        cols[:, :1], (cols.shape[0], rem, cols.shape[2])
                    ),
                ],
                1,
            )
        elif cols.shape[0]:
            cols = jnp.concatenate(
                [cols, jnp.broadcast_to(cols[:, :, :1], cols.shape[:2] + (rem,))],
                2,
            )

    return (
        y_next_prefix_lens.astype(jnp.int32),
        y_next_last.astype(jnp.int32),
        y_next_lens.astype(jnp.int32),
        (nb_probs_next, b_probs_next),
        next_is_prefix,
        next_src.astype(jnp.int32),
        next_ext.astype(jnp.int32),
        next_is_nonext,
        cols,
    )


def _apply_advance_to_buffer(
    y_buf, prefix_lens, next_src, next_ext, valid, cols=None,
    cols_frozen=False,
):
    """Caller-side path-buffer maintenance: reorder columns by `next_src`
    (identity where `valid` is False, freezing those batch rows) and write
    each path's new token at its prefix length (dropped where frozen).
    When the advance core already gathered the buffer columns by
    ``next_src`` (its ``cols`` output over the full buffer), pass them to
    replace this gather with a select; with ``cols_frozen`` the core was
    given ``valid`` too (frozen rows gathered by the identity), so even the
    select disappears."""
    T, N, W = y_buf.shape
    if cols is not None and cols.shape == y_buf.shape:
        y_buf = cols if cols_frozen else jnp.where(valid[None], cols, y_buf)
    else:
        src_eff = jnp.where(
            valid, next_src, jnp.arange(W, dtype=jnp.int32)[None]
        )
        y_buf = jnp.take_along_axis(y_buf, src_eff[None], axis=2)
    pos = jnp.where(valid, prefix_lens, T)  # T -> dropped
    # row-mask select instead of a 3-axis scatter: fuses with the gather
    # into one streaming pass (the scatter lowers to serialized stores)
    mask = jnp.arange(T, dtype=pos.dtype)[:, None, None] == pos[None]
    return jnp.where(mask, next_ext[None].astype(y_buf.dtype), y_buf)


def _apply_advance_to_buffer_nt(prefix_lens, next_ext, valid, cols):
    """Batch-major (``(N, W, T)`` float32, time in lanes) variant of
    :func:`_apply_advance_to_buffer` for the in-loop path: the advance core
    supplies ``cols`` permuted with frozen rows already identity-mapped
    (``valid`` threaded into :func:`_ctc_advance_tail`), so only the token
    write remains — a single elementwise mask that fuses into the permute
    dot's output. The old carry buffer's only in-loop reader is then the
    permute itself (the buffer-wide freeze select this function used to do
    cost a whole extra (N, W, T) read + a relayout copy kernel per decode
    step on TPU)."""
    N, W, T = cols.shape
    pos = jnp.where(valid, prefix_lens, T)  # T -> dropped
    mask = (
        jnp.arange(T, dtype=pos.dtype)[None, None, :] == pos[:, :, None]
    )
    return jnp.where(mask, next_ext[:, :, None].astype(cols.dtype), cols)


class CTCPrefixSearch:
    """Batched CTC prefix beam search with optional shallow LM fusion.

    Parity: reference ``CTCPrefixSearch`` (``_decoding.py:937-1204``): the
    blank is the final vocabulary index of `logits` (``V = logits.shape[2] -
    1``); per-batch length freezing; LM fusion is a beta-weighted product
    (or a convex mixture with ``valid_mixture``).

    Call: ``search(logits, lens=None, initial_state=None)`` with `logits`
    time-major ``(T, N, V + 1)``; returns ``(y, y_lens, y_probs)`` where
    ``y`` is ``(T, N, width)``.
    """

    def __init__(
        self,
        width: int,
        beta: float = 0.2,
        lm: Optional[MixableSequentialLanguageModel] = None,
        valid_mixture: bool = False,
    ):
        from .. import argcheck

        self.width = argcheck.is_posi(width, "width")
        self.beta = argcheck.is_float(beta, "beta")
        self.valid_mixture = argcheck.is_bool(valid_mixture, "valid_mixture")
        self.lm = lm

    def __call__(
        self,
        logits: jax.Array,
        lens: Optional[jax.Array] = None,
        initial_state: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        logits = jnp.asarray(logits)
        if logits.ndim != 3:
            raise RuntimeError("logits must be 3 dimensional")
        T, N, Vp1 = logits.shape
        V = Vp1 - 1
        W = self.width
        lm, beta = self.lm, self.beta
        use_lm = lm is not None and beta != 0
        if lm is not None and lm.vocab_size != V:
            raise RuntimeError(
                f"Expected dim 2 of logits to be {lm.vocab_size + 1}, got {Vp1}"
            )
        if lens is None:
            lens = jnp.full((N,), T, jnp.int32)
        else:
            lens = jnp.asarray(lens)
            if lens.ndim != 1:
                raise RuntimeError("lens must be 1 dimensional")
            if lens.shape[0] != N:
                raise RuntimeError(
                    f"expected dim 0 of lens to be {N}, got {lens.shape[0]}"
                )
        prev = {} if initial_state is None else initial_state

        from ..lm import LookupLanguageModel

        # backoff n-gram LMs expose their sparse structure: score only
        # candidate slots per beam instead of all V fused extensions
        use_sparse = (
            use_lm
            and not self.valid_mixture
            and isinstance(lm, LookupLanguageModel)
            and lm.max_ngram >= 2
            and lm.max_corrections <= config.SPARSE_FUSION_MAX_CORRECTIONS
        )
        # unigram LMs weight every beam identically: the factored advance
        # applies with LM-fused shared scores and a fused/plain split of the
        # last-token probability
        use_uni = (
            use_lm
            and not self.valid_mixture
            and isinstance(lm, LookupLanguageModel)
            and lm.max_ngram == 1
        )
        # paths that never hand the buffer to an LM keep it batch-major
        # (N, W, T) float32 inside the scan: every per-step buffer op is
        # then a one-hot contraction / mask-select instead of a gather
        # (token values < 2**24 are exact in f32)
        stream_buf = not (use_lm and not use_sparse and not use_uni)

        # whole-loop Pallas kernel (state + path buffer resident in VMEM
        # across frames); identical results to the XLA scan below up to f32
        # reduction order. Auto-gated: beam_kernel_preferred() runs a
        # one-time per-device calibration of both paths (config-overridable)
        # and goes LAST so the cheap static checks short-circuit it.
        from .pallas import (
            beam_kernel_preferred, ctc_beam_search_pallas,
            ctc_beam_search_vmem_ok,
        )

        # the whole-loop kernel carries RAW linear masses (the
        # reference's semantics); with DECODE_RENORM on (the default)
        # the scan below is denormal-proof and the kernel is not, so
        # the AUTO gate must not route to it — a calibration flip would
        # make long diffuse decodes silently device-dependent. Forcing
        # USE_PALLAS_BEAM="1" is an explicit opt-in to raw masses (the
        # forced-mode contract in config.py) and still dispatches.
        forced_beam = config.USE_PALLAS_BEAM in (True, 1, "1", "true", "on")
        if (
            not use_lm
            and initial_state is None
            and T >= 2
            and 1 < W <= min(32, V)
            and (forced_beam or not config.DECODE_RENORM)
            and ctc_beam_search_vmem_ok(T, N, V, W)
            and beam_kernel_preferred(T, N, V, W)
        ):
            lg32 = logits.astype(jnp.float32)  # exact; convert fuses
            sm_max = lg32.max(2)  # (T, N)
            sm_den = jnp.exp(lg32 - sm_max[..., None]).sum(2)  # (T, N)
            blank_probs = jnp.exp(lg32[..., V] - sm_max) / sm_den
            nonext_probs = (
                jnp.exp(lg32[..., :V] - sm_max[..., None])
                / sm_den[..., None]
            )
            return ctc_beam_search_pallas(nonext_probs, blank_probs, lens, W)

        if lm is not None:
            prev = lm.update_input(prev, jnp.zeros((0, N), jnp.int32))

        if T == 0:
            y = jnp.zeros((0, N, W), jnp.int32)
            y_lens = jnp.zeros((N, W), jnp.int32)
            y_probs = jnp.full((N, W), NEG_INF).at[:, 0].set(1.0)
            return y, y_lens, y_probs

        if use_lm and not use_sparse and not use_uni:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=2)
            blank_probs = probs[..., V]  # (T, N)
            nonext_probs = probs[..., :V]  # (T, N, V)
        else:
            # probability-space values are only ever needed at the hoisted
            # top-M tokens, the blank, and per-step last-token gathers:
            # normalize those on the fly from raw logits instead of
            # materializing the (T, N, V) softmax (saves a full write+read
            # of the biggest tensor in the decode); the whole prologue
            # (stats + blank + top-M) fuses into ONE pass over the logits
            # when the top-M kernel gate prefers it
            if use_sparse or use_uni:
                uni_dev = jnp.asarray(lm._uni_logp)
                g_bias = beta * uni_dev
            else:
                uni_dev = g_bias = None
            M = min(V, 2 * W + (lm.max_corrections if use_sparse else 0))
            (
                top_lgts, top_inds, sm_max, sm_den, blank_probs,
            ) = _decode_prologue(logits, M, g_bias)

        def lm_ext_probs(y_buf, y_lens_flat, prev_state, nonext_t, blank_t, Kp):
            """Extension probabilities, with or without fusion."""
            if not use_lm:
                return (
                    jnp.broadcast_to(nonext_t[:, None], (N, Kp, V)),
                    prev_state,
                )
            hist = y_buf.reshape(y_buf.shape[0], N * Kp)
            lm_log_probs, in_next = lm.calc_idx_log_probs(
                hist, prev_state, y_lens_flat
            )
            if self.valid_mixture:
                lm_probs = (
                    beta
                    * jax.nn.softmax(lm_log_probs, axis=-1).reshape(N, Kp, V)
                    * (1 - blank_t.reshape(N, 1, 1))
                )
                ext = (1.0 - beta) * nonext_t[:, None] + lm_probs
            else:
                lm_log_probs = jax.nn.log_softmax(lm_log_probs, axis=-1)
                lm_probs = jnp.exp(beta * lm_log_probs).reshape(N, Kp, V)
                ext = lm_probs * nonext_t[:, None]
            return ext, in_next

        def fuse_state(prev_state, in_next, next_src, next_is_nonext, Kp):
            if not use_lm:
                return prev_state
            flat_src = (
                jnp.arange(N, dtype=jnp.int32)[:, None] * Kp + next_src
            ).reshape(-1)
            prev_state = lm.extract_by_src(prev_state, flat_src)
            in_next = lm.extract_by_src(in_next, flat_src)
            return lm.mix_by_mask(
                prev_state, in_next, next_is_nonext.reshape(-1)
            )

        # without per-beam-dense fusion, each beam's top-width extensions
        # come from a hoisted shared top-M plus per-beam slots: one top-M
        # over the vocabulary outside the decode loop, O(N K (M + C)) per
        # step. top_k runs on raw logits (monotone => same tokens) with
        # exp-normalization applied to the M selected values only.
        if not (use_lm and not use_sparse and not use_uni):
            sm_stats = jnp.stack([sm_max, sm_den], 2)  # (T, N, 2)
            iota_vrow = jnp.arange(V, dtype=jnp.int32)

            def am_row(lgts_row, st, toks, uni_tail=None):
                """Acoustic probabilities (and unigram log-probs, when an
                n-gram LM is fused) of `toks` (N, Q) from the step's
                streamed logits row (N, V + 1) + softmax stats row (N, 2).
                With `uni_tail`, unigrams are computed for only the LAST
                ``uni_tail`` tokens (returned ``(N, uni_tail)``): the
                sparse advance needs them at last tokens only, and the
                all-Q unigram reduction wasted ~12 us/step of VPU time at
                the fused-decode shape.

                Two formulations, gated on the one-hot's size
                (``config.AM_ONEHOT_MAX_ELEMS``): for SMALL Q,
                HIGHEST-precision one-hot contractions (bit-exact — one
                nonzero term per dot row, x + 0 == x). For LARGE Q a
                WHERE-REDUCE: the same predicate generated inside the
                reduce's input fusion and never materialized as a dot
                operand. Both read the SAME clamped values, so results
                are bit-identical (the clamp keeps user-masked -inf
                logits from turning 0 * -inf into NaN either way); pinned
                by ``test_fused_am_fetch_formulations_bit_equal``. The
                third formulation, ``take_along_axis`` gathers, LOST the
                r4 on-chip A/B 2.4x (~85 us per large in-loop gather on
                the dev chip — BASELINE.md round-4 notes) and is not
                used. The ``exp(x - max) / den`` sequence bit-matches
                softmax (the Pallas beam kernel's probability inputs), so
                keep it — ``exp(x - log_norm)`` does not. bf16 rows
                upcast exactly here (the stream stays bf16).
                """
                lgts_row = lgts_row.astype(jnp.float32)
                tok_c = jnp.clip(toks, 0, V - 1)
                lg = jnp.maximum(lgts_row[:, :V], -1e30)
                big = (
                    toks.shape[0] * toks.shape[1] * V
                    > config.AM_ONEHOT_MAX_ELEMS
                )
                if big:
                    # where-reduce: the one-hot is generated INSIDE the
                    # reduce fusion and never materialized (one kernel,
                    # HBM traffic = the (N, V) row + outputs). Same
                    # one-nonzero-term exactness as the dot. A/B'd r4 at
                    # (N=32, Q=384, V=1024): one-hot dot 121 us/step (the
                    # 50 MB (N, Q, V) operand write+read IS the step),
                    # take_along_axis 4.3 us/kernel (this chip charges
                    # ~85 us per standalone in-loop gather — see the
                    # canary's gather probe), where-reduce wins.
                    eq = tok_c[:, :, None] == iota_vrow[None, None]
                    raw = jnp.where(eq, lg[:, None, :], 0.0).sum(2)
                else:
                    oh = (
                        tok_c[:, :, None] == iota_vrow[None, None]
                    ).astype(jnp.float32)
                    raw = jnp.einsum(
                        "nqv,nv->nq",
                        oh,
                        lg,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                probs = jnp.exp(raw - st[:, :1]) / st[:, 1:]
                if uni_dev is None:
                    return probs, None
                uni_cl = jnp.maximum(uni_dev, -1e30)
                if uni_tail is not None:
                    eq_t = (
                        tok_c[:, -uni_tail:, None] == iota_vrow[None, None]
                    )
                    uni_raw = jnp.where(
                        eq_t, uni_cl[None, None], 0.0
                    ).sum(2)
                elif big:
                    uni_raw = jnp.where(eq, uni_cl[None, None], 0.0).sum(2)
                else:
                    uni_raw = jnp.einsum(
                        "nqv,v->nq",
                        oh,
                        uni_cl,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                return probs, uni_raw

        # top-M came from the fused prologue above: g = am * exp(beta * uni)
        # orders like logits + beta * uni (per-(t, n) softmax constants
        # don't change within-frame order), normalized at the M winners only
        if use_sparse:
            Csp = lm.max_corrections
            Ng = lm.max_ngram
            M = min(V, 2 * W + Csp)
            bi_dev = (
                lm.order2_values() if config.SPARSE_MEMBERSHIP_GATHER else None
            )
            if bi_dev is not None:
                bi_dev = jnp.asarray(bi_dev)
            top_vals = (
                jnp.exp(top_lgts - sm_max[..., None]) / sm_den[..., None]
            )  # (T, N, M)

            def sparse_at(ctx, Kp):
                return _sparse_at(lm, ctx)

        elif use_uni:
            M = min(V, 2 * W)
            logZ1 = float(np.log(lm._sum_u)) if lm._sum_u > 0 else 0.0
            top_vals = (
                jnp.exp(top_lgts - sm_max[..., None])
                / sm_den[..., None]
                * float(np.exp(-beta * logZ1))
            )

            def p_last_kw(lgts_row, st_row, y_last):
                pl, u_at = am_row(lgts_row, st_row, y_last)
                return dict(
                    p_last=pl,
                    p_last_ext=pl * jnp.exp(beta * (u_at - logZ1)),
                )

        elif not use_lm:
            M = min(V, 2 * W)
            top_vals = (
                jnp.exp(top_lgts - sm_max[..., None]) / sm_den[..., None]
            )  # (T, N, M)

            def p_last_kw(lgts_row, st_row, y_last):
                return dict(p_last=am_row(lgts_row, st_row, y_last)[0])


        # ---- t = 0 (prefix width 1 -> W) ----
        y_buf0 = jnp.zeros((T, N, 1), jnp.int32)
        nb0 = jnp.zeros((N, 1))
        b0 = jnp.ones((N, 1))
        lens0 = jnp.zeros((N, 1), jnp.int32)
        last0 = jnp.zeros((N, 1), jnp.int32)
        is_prefix0 = jnp.ones((N, 1, 1), bool)

        if use_sparse:
            ctx = jnp.full((Ng - 1, N, 1), lm.sos, jnp.int32)
            in_next0 = prev
            advanced0 = _ctc_prefix_search_advance_sparse(
                (top_vals[0], top_inds[0]),
                partial(am_row, logits[0], sm_stats[0]),
                uni_dev,
                blank_probs[0],
                beta,
                sparse_at(ctx, 1),
                W,
                (nb0, b0),
                jnp.zeros((0, N, 1), jnp.int32),
                last0,
                lens0,
                is_prefix0,
                bi=bi_dev,
                c1=ctx[0],
            )
        elif use_lm and not use_uni:
            ext0, in_next0 = lm_ext_probs(
                y_buf0, lens0.reshape(-1), prev, nonext_probs[0],
                blank_probs[0], 1,
            )
            advanced0 = ctc_prefix_search_advance(
                (ext0, nonext_probs[0], blank_probs[0]),
                W,
                (nb0, b0),
                jnp.zeros((0, N, 1), jnp.int32),
                last0,
                lens0,
                is_prefix0,
                return_core=True,
            )
        else:
            in_next0 = prev
            advanced0 = ctc_prefix_search_advance_factored(
                (top_vals[0], top_inds[0]),
                None,
                blank_probs[0],
                W,
                (nb0, b0),
                jnp.zeros((0, N, 1), jnp.int32),
                last0,
                lens0,
                is_prefix0,
                return_core=True,
                vocab_size=V,
                **p_last_kw(logits[0], sm_stats[0], last0),
            )
        (
            prefix_lens0,
            y_last,
            y_lens,
            (nb, b),
            is_prefix,
            next_src,
            next_ext0,
            next_is_nonext,
            _cols0,
        ) = advanced0
        state = fuse_state(prev, in_next0, next_src, next_is_nonext, 1)
        # (int16 tokens were measured neutral-to-slower here: relayouts)
        if stream_buf:
            # build the scan's batch-major float buffer directly: seeding
            # it by transposing a time-major buffer bequeaths a transposed
            # carry layout that costs a whole-buffer relayout copy every
            # scan step (the per-step dot emits row-major). float16 when
            # token ids are exact in it (halves the largest per-step HBM
            # traffic; see config.DECODE_BUF_F16)
            buf_dtype = (
                jnp.float16
                if config.DECODE_BUF_F16 and V <= 2048
                else jnp.float32
            )
            zeros_nt = jnp.zeros((N, W, T), buf_dtype)
            y_buf = _apply_advance_to_buffer_nt(
                prefix_lens0, next_ext0, jnp.ones((N, 1), bool), zeros_nt,
            )
        else:
            y_buf = _apply_advance_to_buffer(
                jnp.zeros((T, N, W), jnp.int32),
                prefix_lens0,
                next_src,
                next_ext0,
                jnp.ones((N, 1), bool),
            )

        # freeze batch elements with lens == 0
        valid0 = (0 < lens)[:, None]  # (N, 1)
        nb_init = jnp.concatenate(
            [nb0, jnp.full((N, W - 1), MASS_PAD)], 1
        ) if W > 1 else nb0
        b_init = jnp.concatenate(
            [b0, jnp.full((N, W - 1), MASS_PAD)], 1
        ) if W > 1 else b0
        y_lens = jnp.where(valid0, y_lens, 0)
        nb = jnp.where(valid0, nb, nb_init)
        b = jnp.where(valid0, b, b_init)

        if use_sparse:
            # beam contexts (order-major, most recent token first) are
            # maintained incrementally instead of gathered from the path
            # buffer
            ctx_src = jnp.take_along_axis(
                ctx,
                jnp.broadcast_to(next_src[None], (Ng - 1, N, W)),
                axis=2,
            )
            ctx_new = jnp.where(
                next_is_nonext[None],
                ctx_src,
                jnp.concatenate(
                    [next_ext0[None].astype(jnp.int32), ctx_src[:-1]], 0
                ),
            )
            ctx = jnp.where(
                valid0[None], ctx_new, jnp.full_like(ctx_new, lm.sos)
            )
        else:
            ctx = jnp.zeros((0,), jnp.int32)

        # int32 accumulator of the power-of-two mass rescales (see
        # config.DECODE_RENORM); exp(ls * ln2) folds back in once at the end
        ls = jnp.zeros((N,), jnp.int32)

        if T > 1:
            def step(carry, xs):
                y_buf, y_lens, y_last, nb, b, is_prefix, state, ctx, ls = (
                    carry
                )
                if use_lm and not use_sparse and not use_uni:
                    nonext_t, blank_t, t = xs
                    valid_mask = (t < lens)[:, None]  # (N, 1)
                else:
                    # ONE packed f32 xs row instead of five: each extra xs
                    # component costs its own dynamic-slice (+ a relayout
                    # copy on some layouts) per scan step; static slices of
                    # the single packed row fuse into their consumers.
                    # Layout: [top_vals (M) | top_inds bits (M) | sm_max |
                    # sm_den | blank | valid].
                    if config.DECODE_PACK_LOGITS:
                        pack_t = xs
                        lgts_t = pack_t[:, 2 * M + 4:]
                    else:
                        # the logits frame is dynamic-sliced from the
                        # loop-INVARIANT logits instead of streaming a
                        # ``logits[1:]`` xs: building that xs copies the
                        # whole (T, N, V+1) tensor per decode (513 MB /
                        # ~1.75 ms at the B=256 serving shape) just to
                        # drop row 0
                        pack_t, t = xs
                        lgts_t = jax.lax.dynamic_slice_in_dim(
                            logits, t, 1, 0
                        )[0]
                    top_vals_t = pack_t[:, :M]
                    top_inds_t = jax.lax.bitcast_convert_type(
                        pack_t[:, M : 2 * M], jnp.int32
                    )
                    st_t = pack_t[:, 2 * M : 2 * M + 2]
                    blank_t = pack_t[:, 2 * M + 2]
                    valid_mask = (pack_t[:, 2 * M + 3] > 0)[:, None]
                if use_sparse:
                    in_next = state
                    advanced = _ctc_prefix_search_advance_sparse(
                        (top_vals_t, top_inds_t),
                        partial(am_row, lgts_t, st_t),
                        uni_dev,
                        blank_t,
                        beta,
                        sparse_at(ctx, W),
                        W,
                        (nb, b),
                        y_buf,
                        y_last,
                        y_lens,
                        is_prefix,
                        bi=bi_dev,
                        c1=ctx[0],
                        batch_major=True,
                        valid=valid_mask,
                    )
                elif use_lm and not use_uni:
                    ext_t, in_next = lm_ext_probs(
                        y_buf, y_lens.reshape(-1), state, nonext_t, blank_t, W
                    )
                    advanced = ctc_prefix_search_advance(
                        (ext_t, nonext_t, blank_t),
                        W,
                        (nb, b),
                        y_buf,
                        y_last,
                        y_lens,
                        is_prefix,
                        return_core=True,
                        valid=valid_mask,
                    )
                else:
                    in_next = state
                    advanced = ctc_prefix_search_advance_factored(
                        (top_vals_t, top_inds_t),
                        None,
                        blank_t,
                        W,
                        (nb, b),
                        y_buf,
                        y_last,
                        y_lens,
                        is_prefix,
                        return_core=True,
                        vocab_size=V,
                        batch_major=True,
                        valid=valid_mask,
                        **p_last_kw(lgts_t, st_t, y_last),
                    )
                (
                    prefix_lens,
                    y_next_last,
                    y_next_lens,
                    (nb_next, b_next),
                    next_is_prefix,
                    next_src,
                    next_ext,
                    next_is_nonext,
                    cols,
                ) = advanced
                state_next = fuse_state(
                    state, in_next, next_src, next_is_nonext, W
                )
                # reorder/extend the path buffer in place (identity for
                # frozen batch rows) instead of rewriting it wholesale
                if stream_buf:
                    # the batch-major tail already folded the token write
                    # into the permute's epilogue (post-write read)
                    y_buf = cols
                else:
                    y_buf = _apply_advance_to_buffer(
                        y_buf, prefix_lens, next_src, next_ext, valid_mask,
                        cols=cols, cols_frozen=True,
                    )
                y_lens = jnp.where(valid_mask, y_next_lens, y_lens)
                nb = jnp.where(valid_mask, nb_next, nb)
                b = jnp.where(valid_mask, b_next, b)
                if config.DECODE_RENORM:
                    # power-of-two mass renormalization (exact — see
                    # config.DECODE_RENORM): rescale the row's beams by
                    # 2**-e, e the exponent of beam 0's total mass, and
                    # accumulate e. Beams come out of the advance sorted
                    # by candidate score, so beam 0's post-absorption
                    # total is within a factor W+1 of the row max — close
                    # enough for exponent extraction, and reading it is a
                    # slice, not a reduce. Frozen rows converge to e == 0
                    # after one rescale. The maximum() re-clamps
                    # dummy-beam masses so scaling can never push them to
                    # -inf; the e >= -126 clamp keeps the factor finite
                    # on backends that keep denormals (CPU tests).
                    # (an equivalent pure-bit-ops formulation — bitcast +
                    # exponent shifts — measured 2589 utt/s vs 2878 here:
                    # the s32 shift/bitcast chain fragmented into 61
                    # kernels/step where frexp/exp2 fuse to 34)
                    best = nb[:, 0] + b[:, 0]
                    e = jnp.maximum(
                        jnp.frexp(jnp.where(best > 0, best, 1.0))[1], -126
                    )
                    fac = jnp.exp2(-e.astype(nb.dtype))[:, None]
                    nb = jnp.maximum(nb * fac, MASS_PAD)
                    b = jnp.maximum(b * fac, MASS_PAD)
                    ls = ls + e
                if use_sparse:
                    # one-hot contraction instead of a per-step gather (see
                    # _ctc_advance_tail docstring); exact (one nonzero term
                    # per dot row, token ids < 2**24)
                    oh_ctx = (
                        next_src[:, :, None]
                        == jnp.arange(W, dtype=next_src.dtype)[None, None]
                    ).astype(jnp.float32)  # (N, K, j)
                    ctx_src = jnp.einsum(
                        "nkj,gnj->gnk",
                        oh_ctx,
                        ctx.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST,
                    ).astype(ctx.dtype)
                    ctx_new = jnp.where(
                        next_is_nonext[None],
                        ctx_src,
                        jnp.concatenate(
                            [next_ext[None].astype(jnp.int32), ctx_src[:-1]],
                            0,
                        ),
                    )
                    ctx = jnp.where(valid_mask[None], ctx_new, ctx)
                    state = state_next
                elif use_lm:
                    vm = jnp.repeat(valid_mask[:, 0], W)
                    state = jax.tree.map(
                        lambda new, old: jnp.where(
                            vm.reshape((N * W,) + (1,) * (new.ndim - 1)),
                            new,
                            old,
                        )
                        if new.ndim and new.shape[0] == N * W
                        else new,
                        state_next,
                        state,
                    )
                else:
                    state = state_next
                y_last = y_next_last
                is_prefix = next_is_prefix
                return (
                    y_buf, y_lens, y_last, nb, b, is_prefix, state, ctx, ls,
                ), None

            carry = (
                y_buf, y_lens, y_last, nb, b, is_prefix, state, ctx, ls,
            )
            if use_lm and not use_sparse and not use_uni:
                xs = (
                    nonext_probs[1:],
                    blank_probs[1:],
                    jnp.arange(1, T, dtype=jnp.int32),
                )
            else:
                # the advance reads its per-token acoustic values straight
                # off the frame via the shared one-hot; the step
                # dynamic-slices each frame from the loop-INVARIANT logits
                # (an xs stream of logits[1:] copied the whole (T, N, V+1)
                # tensor per decode just to drop row 0). Everything else is
                # packed into one f32 xs array plus the frame counter (see
                # step); the valid mask is precomputed as a lane.
                validf = (
                    jnp.arange(1, T)[:, None] < lens[None]
                ).astype(jnp.float32)
                pack = jnp.concatenate(
                    [
                        top_vals[1:],
                        jax.lax.bitcast_convert_type(
                            top_inds[1:].astype(jnp.int32), jnp.float32
                        ),
                        sm_stats[1:],
                        blank_probs[1:, :, None],
                        validf[:, :, None],
                    ],
                    2,
                )  # (T - 1, N, 2M + 4)
                if config.DECODE_PACK_LOGITS:
                    # one xs stream instead of two: the logits row rides
                    # the same packed array (one dynamic-slice per step
                    # instead of two; costs an up-front f32 copy of the
                    # logits and loses the bf16 stream's bandwidth halving
                    # — A/B-gated, default off)
                    pack = jnp.concatenate(
                        [pack, logits[1:].astype(jnp.float32)], 2
                    )
                    xs = pack
                else:
                    xs = (pack, jnp.arange(1, T, dtype=jnp.int32))
            (
                y_buf, y_lens, y_last, nb, b, is_prefix, state, ctx, ls,
            ), _ = jax.lax.scan(
                step, carry, xs, unroll=config.DECODE_SCAN_UNROLL
            )

        if stream_buf:
            # back to the API's time-major int32 layout (values are exact)
            y_buf = jnp.transpose(y_buf, (2, 0, 1)).astype(jnp.int32)
        y_probs = nb + b
        # dummy-beam masses are negative (real prefix masses are sums of
        # probability products >= 0): restore the -inf the API promises.
        # The sign test runs on the RAW masses — ldexp of a dummy's large
        # negative mass by a very negative scale could flush to -0
        if config.DECODE_RENORM:
            # fold the accumulated power-of-two rescales back in; results
            # below the normal f32 floor honestly flush to zero here, but
            # the SEARCH ran at full precision (the reference's linear
            # masses underflow mid-search and corrupt the selection)
            y_probs = jnp.where(
                y_probs < 0, NEG_INF, jnp.ldexp(y_probs, ls[:, None])
            )
        else:
            y_probs = jnp.where(y_probs < 0, NEG_INF, y_probs)
        return y_buf, y_lens, y_probs


class CTCGreedySearch:
    """Module wrapper for :func:`ctc_greedy_search` (reference
    ``_decoding.py:561-633``)."""

    def __init__(
        self,
        blank_idx: int = -1,
        batch_first: bool = False,
        is_probs: bool = False,
    ):
        from .. import argcheck

        self.blank_idx = argcheck.is_int(blank_idx, "blank_idx")
        self.batch_first = argcheck.is_bool(batch_first, "batch_first")
        self.is_probs = argcheck.is_bool(is_probs, "is_probs")

    def __call__(self, logits, in_lens=None):
        return ctc_greedy_search(
            logits, in_lens, self.blank_idx, self.batch_first, self.is_probs
        )


class CTCForcedAligner:
    """Module wrapper for :func:`ctc_forced_align` (TPU-native extra; the
    reference's decoding surface, ``_decoding.py``, stops at search)."""

    def __init__(
        self,
        blank_idx: int = -1,
        batch_first: bool = False,
        is_probs: bool = False,
    ):
        from .. import argcheck

        self.blank_idx = argcheck.is_int(blank_idx, "blank_idx")
        self.batch_first = argcheck.is_bool(batch_first, "batch_first")
        self.is_probs = argcheck.is_bool(is_probs, "is_probs")

    def __call__(self, logits, refs, in_lens=None, ref_lens=None):
        return ctc_forced_align(
            logits, refs, in_lens, ref_lens, self.blank_idx,
            self.batch_first, self.is_probs,
        )


def random_walk_advance(
    key: jax.Array,
    log_probs_t: jax.Array,
    log_probs_prev: jax.Array,
    y_prev: jax.Array,
    y_prev_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One random-walk step: sample a token per batch element.

    Parity: reference ``random_walk_advance`` (``_decoding.py:1207-1283``)
    with an explicit PRNG `key`; ``y_next`` always gains a row.
    """
    log_probs_t = jnp.asarray(log_probs_t)
    if log_probs_t.ndim != 2:
        raise RuntimeError("log_probs_t must be 2-dimensional")
    N, V = log_probs_t.shape
    log_probs_prev = jnp.asarray(log_probs_prev)
    if log_probs_prev.shape != (N,):
        raise RuntimeError(
            f"Expected log_probs_prev to be of shape {(N,)}, got "
            f"{log_probs_prev.shape}"
        )
    y_prev = jnp.asarray(y_prev)
    if y_prev.ndim != 2:
        raise RuntimeError("y_prev must be 2-dimensional")
    if y_prev.shape[1] != N:
        raise RuntimeError(
            f"Expected dim 1 of y_prev to be {N}, got {y_prev.shape[1]}"
        )
    tm1 = y_prev.shape[0]
    y_t = jax.random.categorical(key, log_probs_t, axis=-1).astype(
        y_prev.dtype if tm1 else jnp.int32
    )  # (N,)
    log_probs_next = log_probs_prev + jnp.take_along_axis(
        log_probs_t, y_t[:, None], axis=1
    )[:, 0]
    if tm1:
        y_next = jnp.concatenate([y_prev, y_t[None]], 0)
        if y_prev_lens is not None:
            pos = jnp.arange(tm1 + 1, dtype=jnp.int32)[:, None]
            y_next = jnp.where(pos == y_prev_lens[None], y_t[None], y_next)
    else:
        y_next = y_t[None]
    return y_next, log_probs_next


class RandomWalk:
    """Ancestral sampling from a :class:`SequentialLanguageModel`.

    Parity: reference ``RandomWalk`` (``_decoding.py:1286-1513``) with an
    explicit PRNG `key` and required static ``max_iters``. Returns
    ``(y, y_lens, y_log_probs)`` with ``y`` of shape ``(max_iters, N)``.

    Unlike the beam searches, RandomWalk scores ALL ``V`` tokens per step
    even for backoff n-gram LMs with sparse structure: exact *sampling*
    from the backoff mixture needs either the full conditional mass
    (``jax.random.categorical`` over V) or a rejection loop whose trip
    count is data-dependent — the latter doesn't jit to static control
    flow, so the dense step is the TPU-correct formulation. (Search only
    needs the top-W candidates, which is why BeamSearch/CTCPrefixSearch
    get sparse-slot fast paths and this doesn't.)
    """

    def __init__(self, lm: SequentialLanguageModel, eos: Optional[int] = None):
        if eos is not None:
            if eos < -lm.vocab_size or eos >= lm.vocab_size:
                raise ValueError(
                    f"eos ({eos}) must index a token in the vocabulary"
                )
            eos = (eos + lm.vocab_size) % lm.vocab_size
        self.lm = lm
        self.eos = eos

    def update_log_probs_for_step(
        self, log_probs_prev, log_probs_t, y_prev, y_prev_lens, eos_mask
    ):
        """Subclass hook (reference ``_decoding.py:1393-1435``)."""
        return log_probs_prev, log_probs_t

    def __call__(
        self,
        key: jax.Array,
        initial_state: Optional[Dict[str, Any]] = None,
        batch_size: Optional[int] = None,
        max_iters: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        lm, eos = self.lm, self.eos
        V = lm.vocab_size
        prev = {} if initial_state is None else initial_state
        if max_iters is None:
            raise ValueError("max_iters must be set (static loop bound on TPU)")
        if max_iters < 0:
            raise RuntimeError(f"max_iters must be non-negative, got {max_iters}")
        N = 1 if batch_size is None else batch_size
        S = max_iters
        prev = lm.update_input(prev, jnp.zeros((0, N), jnp.int32))
        if S == 0:
            y = jnp.zeros((0, N), jnp.int32)
            out = (y, jnp.zeros((N,), jnp.int32), jnp.zeros((N,)))
            if batch_size is None:
                return out[0][:, 0], out[1][0], out[2][0]
            return out

        y0 = jnp.zeros((S, N), jnp.int32)

        def cond(carry):
            t, y, y_lens, eos_mask, log_probs, prev, key = carry
            return (t < S) & ~eos_mask.all()

        def body(carry):
            t, y, y_lens, eos_mask, log_probs, prev, key = carry
            key, sub = jax.random.split(key)
            log_probs_t, prev = lm.calc_idx_log_probs(y, prev, t)
            log_probs_t = jax.nn.log_softmax(log_probs_t, axis=-1)
            log_probs, log_probs_t = self.update_log_probs_for_step(
                log_probs, log_probs_t, y, y_lens, eos_mask
            )
            if eos is not None:
                lp = jnp.where(eos_mask[:, None], NEG_INF, log_probs_t)
                eos_vec = jax.nn.one_hot(eos, V, dtype=bool)
                log_probs_t = jnp.where(eos_mask[:, None] & eos_vec, 0.0, lp)
            y_t = jax.random.categorical(sub, log_probs_t, axis=-1).astype(
                jnp.int32
            )
            log_probs = log_probs + jnp.take_along_axis(
                log_probs_t, y_t[:, None], axis=1
            )[:, 0]
            pos = jnp.arange(S, dtype=jnp.int32)[:, None]
            y = jnp.where(pos == y_lens[None], y_t[None], y)
            if eos is not None:
                y_lens = y_lens + (~eos_mask)
                last = jnp.take_along_axis(
                    y, jnp.clip(y_lens - 1, 0, None)[None], axis=0
                )[0]
                eos_mask = (last == eos) & (y_lens > 0)
            else:
                y_lens = y_lens + 1
            return (t + 1, y, y_lens, eos_mask, log_probs, prev, key)

        carry = (
            jnp.asarray(0, jnp.int32),
            y0,
            jnp.zeros((N,), jnp.int32),
            jnp.zeros((N,), bool),
            jnp.zeros((N,)),
            prev,
            key,
        )
        _, y, y_lens, _, log_probs, _, _ = jax.lax.while_loop(cond, body, carry)
        if batch_size is None:
            return y[:, 0], y_lens[0], log_probs[0]
        return y, y_lens, log_probs


def sequence_log_probs(
    logits: jax.Array,
    hyp: jax.Array,
    dim: int = 0,
    eos: Optional[int] = None,
) -> jax.Array:
    """Joint log probability of sequences (sum over steps up to first eos).

    Parity: reference ``sequence_log_probs`` dense path
    (``_decoding.py:1516-1548``). torch's PackedSequence input has no JAX
    analogue — use dense `logits` + `eos`.
    """
    from .string import _lens_from_eos

    logits, hyp = jnp.asarray(logits), jnp.asarray(hyp)
    hyp_dim = hyp.ndim
    if dim < -hyp_dim or dim > hyp_dim - 1:
        raise RuntimeError(
            "Dimension out of range (expected to be in range of [{}, {}], but "
            "got {})".format(-hyp_dim, hyp_dim - 1, dim)
        )
    dim = (hyp_dim + dim) % hyp_dim
    steps = hyp.shape[dim]
    num_classes = logits.shape[-1]
    logits = jax.nn.log_softmax(logits, axis=-1)
    mask = (hyp < 0) | (hyp >= num_classes)
    if eos is not None:
        hyp_lens = _lens_from_eos(hyp, eos, dim) + 1
        arange = jnp.arange(steps)
        shape = [1] * hyp_dim
        shape[dim] = steps
        len_mask = arange.reshape(shape) >= jnp.expand_dims(hyp_lens, dim)
        mask = mask | len_mask
    hyp_safe = jnp.where(mask, 0, hyp)
    gathered = jnp.take_along_axis(logits, hyp_safe[..., None], axis=-1)[..., 0]
    gathered = jnp.where(mask, 0.0, gathered)
    return gathered.sum(dim)


class SequenceLogProbabilities:
    """Module wrapper for :func:`sequence_log_probs` (reference
    ``_decoding.py:1636-1721``)."""

    def __init__(self, dim: int = 0, eos: Optional[int] = None):
        from .. import argcheck

        self.dim = argcheck.is_int(dim, "dim")
        self.eos = argcheck.is_int(eos, "eos", allow_none=True)

    def __call__(self, logits, hyp):
        return sequence_log_probs(logits, hyp, self.dim, self.eos)


class TokenSequenceConstraint:
    """Support constraint for completed token sequences.

    A value is in-support when its tokens lie in ``[0, vocab_size)`` and the
    sequence is completed: its length equals `max_iters`, or it contains an
    `eos` within `max_iters` steps. Parity: reference
    ``TokenSequenceConstraint`` (``_decoding.py:1724-1770``).
    """

    is_discrete = True
    event_dim = 1

    def __init__(self, vocab_size, eos=None, max_iters=None):
        from .. import argcheck

        self.vocab_size = argcheck.is_posi(vocab_size, "vocab_size")
        if eos is None and max_iters is None:
            raise ValueError("At least one of max_iters or eos must be non-none")
        self.eos = argcheck.is_int(eos, "eos", allow_none=True)
        self.max_iters = (
            float("inf") if max_iters is None
            else argcheck.is_nonnegi(max_iters, "max_iters")
        )

    def check(self, value: jax.Array) -> jax.Array:
        value = jnp.asarray(value)
        completed = jnp.full(value.shape[:-1], value.shape[-1] == self.max_iters)
        if self.eos is not None:
            from .string import fill_after_eos

            value = fill_after_eos(value, self.eos, -1)
            completed = (
                (value == self.eos).any(-1) & (value.shape[-1] <= self.max_iters)
            ) | completed
        in_vocab = (
            (value % 1 == 0) & (value >= 0) & (value < self.vocab_size)
        ).all(-1)
        return in_vocab & completed


class SequentialLanguageModelDistribution:
    """A :class:`RandomWalk`'s language model as a distribution over
    token sequences.

    Samples are drawn via the walk (explicit PRNG key); log-probabilities
    come from the LM's full step distributions summed up to the first eos.
    Can be passed to any :class:`pydrobert_tpu.estimators.Estimator`.
    Parity: reference ``SequentialLanguageModelDistribution``
    (``_decoding.py:1773-2029``), with two TPU deviations: `max_iters` is
    required (static shapes; samples are padded to it with `eos`), and
    sample caching is keyed on object identity rather than array equality
    (arrays may be traced).
    """

    def __init__(
        self,
        random_walk: RandomWalk,
        batch_shape: Tuple[int, ...] = (),
        initial_state: Optional[Dict[str, Any]] = None,
        max_iters: Optional[int] = None,
        cache_samples: bool = False,
        validate_args: Optional[bool] = None,
    ):
        from .. import argcheck

        if max_iters is None:
            raise ValueError(
                "max_iters must be set (static sequence bound on TPU)"
            )
        self.random_walk = random_walk
        if len(tuple(batch_shape)) > 1:
            # sample()/log_prob() treat batch_shape[0] as the whole walk
            # batch; reject multi-dim shapes here instead of failing with a
            # reshape error far from the mistake
            raise ValueError(
                f"batch_shape must be scalar or 1-D, got {tuple(batch_shape)}"
            )
        self.batch_shape = tuple(batch_shape)
        self.event_shape = (argcheck.is_nonnegi(max_iters, "max_iters"),)
        self.initial_state = dict() if initial_state is None else initial_state
        self.max_iters = max_iters
        self.cache_samples = argcheck.is_bool(cache_samples, "cache_samples")
        self._samples_cache = None
        self._log_probs_cache = None

    @property
    def support(self) -> TokenSequenceConstraint:
        return TokenSequenceConstraint(
            self.random_walk.lm.vocab_size, self.random_walk.eos, self.max_iters
        )

    def _pad_eos(self, y, y_lens):
        if self.random_walk.eos is None:
            return y
        pos = jnp.arange(y.shape[0], dtype=jnp.int32)[:, None]
        return jnp.where(pos >= y_lens[None], self.random_walk.eos, y)

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        num_samples = 1
        for d in sample_shape:
            num_samples *= d
        if num_samples == 0:
            return jnp.zeros(shape, jnp.int32)
        if len(self.batch_shape):
            batch_size = self.batch_shape[0]
            keys = jax.random.split(key, num_samples)
            samples, log_probs = [], []
            for k in keys:
                y, y_lens, lp = self.random_walk(
                    k, dict(self.initial_state), batch_size, self.max_iters
                )
                samples.append(self._pad_eos(y, y_lens).T)
                log_probs.append(lp)
            samples = jnp.stack(samples)  # (num, batch, S)
            log_probs = jnp.stack(log_probs)
        else:
            y, y_lens, log_probs = self.random_walk(
                key, dict(self.initial_state), num_samples, self.max_iters
            )
            samples = self._pad_eos(y, y_lens).T  # (num, S)
        samples = samples.reshape(shape)
        if self.cache_samples:
            self._samples_cache = samples
            self._log_probs_cache = log_probs.reshape(shape[:-1])
        return samples

    @property
    def has_enumerate_support(self) -> bool:
        return self.max_iters is not None

    def enumerate_support(self, expand: bool = True) -> jax.Array:
        from .combinatorics import enumerate_vocab_sequences

        support = enumerate_vocab_sequences(
            self.max_iters, self.random_walk.lm.vocab_size
        )
        if self.random_walk.eos is not None:
            from .string import fill_after_eos

            support = fill_after_eos(support, self.random_walk.eos, 1)
            support = jnp.asarray(np.unique(np.asarray(support), axis=0))
        if len(self.batch_shape):
            support = support.reshape(
                (-1,) + (1,) * len(self.batch_shape) + support.shape[-1:]
            )
            if expand:
                support = jnp.broadcast_to(
                    support,
                    (support.shape[0],) + self.batch_shape + support.shape[-1:],
                )
        return support

    def clear_cache(self) -> None:
        """Manually clear the sample cache."""
        self._samples_cache = self._log_probs_cache = None

    def log_prob(self, value: jax.Array) -> jax.Array:
        value = jnp.asarray(value)
        if (
            self.cache_samples
            and self._samples_cache is not None
            and self._samples_cache is value
        ):
            return self._log_probs_cache
        lm, eos = self.random_walk.lm, self.random_walk.eos
        shape = value.shape[:-1]
        if len(self.batch_shape):
            flat = value.reshape((-1,) + value.shape[-2:])  # (num, batch, S)
            hists = jnp.swapaxes(flat, 1, 2)  # (num, S, batch)
            log_probs = jnp.stack(
                [
                    lm(h[:-1].astype(jnp.int32), dict(self.initial_state))
                    for h in hists
                ]
            )  # (num, S, batch, V)
            lp = sequence_log_probs(
                jnp.swapaxes(log_probs, 1, 2),
                flat.astype(jnp.int32),
                dim=-1,
                eos=eos,
            )
        else:
            hist = value.reshape(-1, value.shape[-1]).T  # (S, num)
            log_probs = lm(
                hist[:-1].astype(jnp.int32), dict(self.initial_state)
            )  # (S, num, V)
            lp = sequence_log_probs(
                jnp.swapaxes(log_probs, 0, 1),
                value.reshape(-1, value.shape[-1]).astype(jnp.int32),
                dim=-1,
                eos=eos,
            )
        lp = lp.reshape(shape)
        if self.cache_samples:
            self._samples_cache = value
            self._log_probs_cache = lp
        return lp


def ctc_forced_align(
    logits: jax.Array,
    refs: jax.Array,
    in_lens: Optional[jax.Array] = None,
    ref_lens: Optional[jax.Array] = None,
    blank_idx: int = -1,
    batch_first: bool = False,
    is_probs: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Viterbi forced alignment over the CTC lattice.

    Finds, per batch element, the most probable frame-level label sequence
    (tokens and blanks) that collapses to the reference — the maximum-
    probability path through the standard expanded state sequence
    ``blank, r_1, blank, r_2, ..., r_U, blank`` with CTC's stay / advance /
    skip-over-blank transitions. A TPU-native addition (the reference stops
    at search, ``_decoding.py``): it produces exactly the per-frame ``ali/``
    tensors of the SpectDataSet convention from CTC models, connecting to
    ``torch-ali-data-dir-to-torch-token-data-dir`` and the ``ali`` slicing
    policy.

    Parameters mirror :func:`ctc_greedy_search`: `logits` ``(T, N, V)``
    (or batch-first), `refs` ``(N, U)`` (or ``(U, N)`` when not
    `batch_first`) with `ref_lens` marking valid labels (blanks must not
    appear in the valid region). Returns ``(paths, scores)`` where `paths`
    ``(T, N)`` (or ``(N, T)``) holds the aligned label per frame — token id
    or ``blank_idx`` — valid for frames ``< in_lens`` (later frames repeat
    the final state's label; mask them), and `scores` ``(N,)`` is the joint
    log-probability of the best path. A reference longer than its frame
    budget (``2 U_b + 1`` states can't fit in ``T_b`` frames, counting
    mandatory blanks between repeated labels) yields ``scores = -inf`` and
    an arbitrary path.

    The whole computation is one ``lax.scan`` over frames carrying the
    ``(N, S = 2 U + 1)`` Viterbi row (backpointers stacked as the scan
    output) plus a reverse scan for the backtrace.
    """
    logits = jnp.asarray(logits)
    refs = jnp.asarray(refs)
    if logits.ndim != 3:
        raise RuntimeError("logits must be 3-dimensional")
    if refs.ndim != 2:
        raise RuntimeError("refs must be 2-dimensional")
    if not batch_first:
        logits = jnp.swapaxes(logits, 0, 1)
        refs = refs.T
    N, T, V = logits.shape
    U = refs.shape[1]
    if refs.shape[0] != N:
        raise RuntimeError(
            f"batch dim of refs ({refs.shape[0]}) != logits ({N})"
        )
    if blank_idx < -V or blank_idx > (V - 1):
        raise RuntimeError(
            "Blank index out of range (expected to be in the range of "
            f"[-{V},{V-1}], but got {blank_idx})"
        )
    blank_idx = (blank_idx + V) % V
    in_lens = (
        jnp.full((N,), T, jnp.int32)
        if in_lens is None
        else jnp.asarray(in_lens, jnp.int32)
    )
    ref_lens = (
        jnp.full((N,), U, jnp.int32)
        if ref_lens is None
        else jnp.asarray(ref_lens, jnp.int32)
    )
    if logits.dtype == jnp.bfloat16:
        logits = logits.astype(jnp.float32)  # exact; Viterbi math in f32
    # is_probs follows ctc_greedy_search: True = inputs are probabilities
    lp = jnp.log(logits) if is_probs else jax.nn.log_softmax(logits, -1)

    S = 2 * U + 1
    s_idx = jnp.arange(S, dtype=jnp.int32)
    is_tok = (s_idx % 2).astype(bool)  # odd states carry reference tokens
    tok_pos = jnp.clip((s_idx - 1) // 2, 0, max(U - 1, 0))
    z = jnp.where(
        is_tok[None], jnp.take_along_axis(
            jnp.pad(refs, ((0, 0), (0, 1))), jnp.broadcast_to(
                tok_pos[None], (N, S)
            ), 1,
        ), blank_idx,
    ).astype(jnp.int32)  # (N, S) state labels
    valid_s = s_idx[None] < (2 * ref_lens[:, None] + 1)  # (N, S)
    # skip s-2 -> s allowed at token states whose token differs from the
    # previous token state's
    prev_tok = jnp.roll(z, 2, axis=1)
    can_skip = is_tok[None] & (s_idx[None] >= 2) & (z != prev_tok) & valid_s

    # emission log-probs per state, per frame: one-hot contraction
    z_oh = jax.nn.one_hot(z, V, dtype=lp.dtype)  # (N, S, V)
    emit = jnp.einsum("ntv,nsv->nts", lp, z_oh)  # (N, T, S)
    emit = jnp.moveaxis(emit, 1, 0)  # (T, N, S)

    neg = jnp.asarray(NEG_INF, lp.dtype)
    delta0 = jnp.where(
        (s_idx[None] < 2) & valid_s, emit[0], neg
    )  # start states: first blank / first token

    def step(delta, xs):
        emit_t, t = xs
        stay = delta
        adv = jnp.pad(delta[:, :-1], ((0, 0), (1, 0)), constant_values=neg)
        skip = jnp.where(
            can_skip,
            jnp.pad(delta[:, :-2], ((0, 0), (2, 0)), constant_values=neg),
            neg,
        )
        best = jnp.maximum(jnp.maximum(stay, adv), skip)
        bp = jnp.where(
            skip >= best, 2, jnp.where(adv >= best, 1, 0)
        ).astype(jnp.int8)
        new = jnp.where(valid_s, best + emit_t, neg)
        live = (t < in_lens)[:, None]
        return (
            jnp.where(live, new, delta),
            jnp.where(live, bp, jnp.zeros_like(bp)),
        )

    if T > 1:
        delta, bps = jax.lax.scan(
            step, delta0, (emit[1:], jnp.arange(1, T, dtype=jnp.int32))
        )  # bps: (T-1, N, S)
    else:
        delta, bps = delta0, jnp.zeros((0, N, S), jnp.int8)

    # best final state: last blank (2 U_b) or last token (2 U_b - 1)
    end_blank = 2 * ref_lens
    end_tok = jnp.clip(2 * ref_lens - 1, 0, S - 1)
    d_blank = jnp.take_along_axis(delta, end_blank[:, None], 1)[:, 0]
    d_tok = jnp.where(
        ref_lens > 0,
        jnp.take_along_axis(delta, end_tok[:, None], 1)[:, 0],
        neg,
    )
    scores = jnp.maximum(d_blank, d_tok)
    state_T = jnp.where(d_blank >= d_tok, end_blank, end_tok).astype(jnp.int32)

    def back(state, bp_t):
        bp = jnp.take_along_axis(bp_t, state[:, None], 1)[:, 0]
        prev = state - bp
        return prev, state

    state0, states = jax.lax.scan(back, state_T, bps, reverse=True)
    states = jnp.concatenate([state0[None], states], 0)  # (T, N)
    paths = jnp.take_along_axis(z, states.T, 1).T  # (T, N)
    if batch_first:
        paths = paths.T
    return paths, scores


def compress_blank_frames(
    logits: jax.Array,
    in_lens: Optional[jax.Array] = None,
    threshold: float = 0.99,
    max_frames: Optional[int] = None,
    batch_first: bool = False,
    is_probs: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop CTC frames inside blank-dominated runs before decoding.

    Trained CTC posteriors are *spiky*: most frames are near-certain blanks
    that contribute nothing to the transcript but still cost one full decode
    step each — and on TPU the decode scans are step-count-bound. This
    collapses every run of consecutive frames whose blank probability is at
    least `threshold` down to its FIRST frame (one surviving blank keeps
    repeated tokens on either side separated, which outright blank deletion
    would merge), packing the kept frames to the front of the time axis.
    Decode the result with :func:`ctc_greedy_search` /
    :class:`CTCPrefixSearch` at a fraction of the steps. A TPU-native extra
    (the reference decodes every frame); the frame-skipping idea follows the
    public blank-skipping / spike-decoding literature (FlexCTC
    arXiv:2508.07315; Spike Window Decoding arXiv:2501.03257).

    Greedy transcripts are unchanged for any `threshold` > 0.5 (only
    blank-argmax frames are dropped, and each run keeps one blank). Beam
    search results are near-identical at high thresholds: dropped frames
    multiply every prefix's mass by nearly the same near-1 blank factor.

    Parameters follow :func:`ctc_greedy_search`: `logits` ``(T, N, V + 1)``
    (or batch-first) with the blank as the LAST class, `in_lens` masking
    valid frames. `threshold` is a probability (applied to
    ``softmax(logits)`` unless `is_probs`). `max_frames`, if given, is the
    static time length of the output (kept frames past it are cut and
    counted off `new_lens`); otherwise the output keeps length ``T``.
    Returns ``(new_logits, new_lens)`` in the input layout; rows past
    ``new_lens[n]`` are arbitrary (the searches mask by length).
    """
    logits = jnp.asarray(logits)
    if logits.ndim != 3:
        raise RuntimeError("logits must be 3-dimensional")
    if not 0.0 < threshold <= 1.0:
        raise RuntimeError(f"threshold must be in (0, 1], got {threshold}")
    if batch_first:
        logits = jnp.swapaxes(logits, 0, 1)
    T, N, Vp1 = logits.shape
    if in_lens is None:
        in_lens = jnp.full((N,), T, jnp.int32)
    else:
        in_lens = jnp.asarray(in_lens, jnp.int32)
    lp32 = logits[..., -1].astype(jnp.float32)  # blank lane, (T, N)
    if is_probs:
        p_blank = lp32
    else:
        mx = logits.max(2).astype(jnp.float32)
        den = jnp.exp(logits.astype(jnp.float32) - mx[..., None]).sum(2)
        p_blank = jnp.exp(lp32 - mx) / den
    valid = jnp.arange(T, dtype=jnp.int32)[:, None] < in_lens[None]  # (T, N)
    dom = (p_blank >= threshold) & valid
    prev_dom = jnp.pad(dom[:-1], ((1, 0), (0, 0)))
    keep = valid & ~(dom & prev_dom)
    # stable compaction: kept frames keyed by their position, dropped/pad
    # frames pushed past T — one argsort + one full gather, outside any loop
    t_iota = jnp.arange(T, dtype=jnp.int32)[:, None]
    order = jnp.argsort(
        jnp.where(keep, t_iota, T + t_iota), axis=0, stable=True
    )  # (T, N)
    new_lens = keep.sum(0).astype(jnp.int32)
    out = jnp.take_along_axis(logits, order[..., None], axis=0)
    if max_frames is not None and max_frames < T:
        out = out[:max_frames]
        new_lens = jnp.minimum(new_lens, max_frames)
    if batch_first:
        out = jnp.swapaxes(out, 0, 1)
    return out, new_lens
