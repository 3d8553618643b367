"""Online (streaming) recognition sessions for serving.

The model-level streaming functions
(:func:`pydrobert_tpu.models.streaming_transducer_greedy` / ``..._beam`` /
:func:`pydrobert_tpu.models.conformer.streaming_logits`) consume a complete
utterance chunk by chunk. A serving frontend instead receives feature
frames *incrementally* — arbitrary push sizes, many concurrent streams,
streams ending at different times. The session objects here cover both
decode families: :class:`StreamingTransducerRecognizer` (greedy/beam
RNN-T, carry threaded incrementally) and :class:`StreamingCTCRecognizer`
(incremental causal encode, exact CTC prefix re-decode on demand). The
transducer recognizer wraps the init/advance/finalize decode carries in a
session that:

- buffers raw frames and re-encodes exactly the receptive-field margin
  ``R`` each chunk, so hypotheses are *identical* to the one-shot decode
  (same guarantee, and the same causal-encoder requirement, as the
  model-level streaming functions);
- decodes only post-subsample frames that are fully determined by the
  frames pushed so far, deferring each stream's final partial-block frame
  to :meth:`~StreamingTransducerRecognizer.finish`;
- re-chunks internally to a fixed ``chunk`` size so steady-state serving
  reuses ONE compiled encode + one compiled advance program (a few more
  compile at the stream head/tail where window shapes differ).

Batched raggedness: all sessions in a batch share a frame timeline (push
``(N, T_new, F)`` slabs); per-stream ``new_lens`` marks how many of the
new frames are real. A stream may fall behind (its remaining pushes all
zero-length — it has ended) but must not resume: frames are consumed in
order, so data arriving after a gap would decode out of order (an
assertion enforces this).

The reference library has no serving layer (it is a training-side utility
collection); this surface exists because a TPU speech stack is expected
to serve streaming RNN-T (see ``docs/source/tutorials/decoding-and-lm``).
"""

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "StreamingCTCRecognizer",
    "StreamingCTCSession",
    "StreamingSession",
    "StreamingTransducerRecognizer",
]


def _ceil4(x):
    return -(-np.asarray(x) // 4)


@dataclasses.dataclass
class StreamingSession:
    """State of one batch of concurrent streams (see recognizer docs)."""

    carry: Any
    buf: np.ndarray  # (N, kept, F) raw frames from global raw index `base`
    base: int  # global raw index of buf[:, 0]
    pushed: int  # raw frames pushed so far (shared timeline)
    total: np.ndarray  # (N,) per-stream valid raw lengths
    consumed: np.ndarray  # (N,) post-subsample frames decoded per stream
    o0: int  # next global post-subsample frame to decode
    done: bool = False


class StreamingTransducerRecognizer:
    """Streaming RNN-T recognition sessions over a fixed checkpoint.

    ``start(batch_size)`` opens a session; ``push(session, feats,
    new_lens)`` feeds ``(N, T_new, num_filts)`` raw feature frames (any
    ``T_new``) and returns the current partial hypotheses; ``finish``
    decodes each stream's deferred tail frame and returns the final
    result. Hypotheses equal the one-shot ``model.apply(...,
    method="greedy")`` / ``method="beam"`` decode of the concatenated
    pushes (parity-tested).

    `mode` is ``"greedy"`` or ``"beam"`` (then `width`, and optionally
    `lm`/`lm_weight` for shallow fusion, apply). `chunk` is the
    post-subsample encode granularity; `max_frames` bounds each stream's
    total post-subsample length (it sizes the static hypothesis buffer:
    ``max_symbols_per_frame * max_frames``).

    Requires the same causal encoder config as the model-level streaming
    functions: ``attention_context=(L, 0)`` with finite ``L`` and
    ``causal_conv=True``.
    """

    def __init__(
        self,
        model,
        params,
        chunk: int = 8,
        mode: str = "greedy",
        width: int = 4,
        max_symbols_per_frame: int = 4,
        max_frames: int = 1024,
        lm=None,
        lm_weight: float = 0.3,
    ):
        from .models.transducer import _Joint, _Predictor, lookup_lm_fusion

        if mode not in ("greedy", "beam"):
            raise ValueError(f"mode must be 'greedy' or 'beam', got {mode!r}")
        cfg = model.cfg
        ecfg = cfg.encoder
        left, right = ecfg.attention_context
        if left is None or right != 0 or not ecfg.causal_conv:
            raise ValueError(
                "streaming recognition requires a causal encoder config: "
                "attention_context=(L, 0) with finite L and causal_conv="
                f"True (got attention_context={ecfg.attention_context}, "
                f"causal_conv={ecfg.causal_conv})"
            )
        if chunk < 1:
            raise ValueError(f"chunk must be positive, got {chunk}")
        self.model, self.params, self.cfg = model, params, cfg
        self.chunk = int(chunk)
        self.mode = mode
        self.width = int(width)
        self.E = int(max_symbols_per_frame)
        self.max_frames = int(max_frames)
        self.R = ecfg.num_layers * (int(left) + ecfg.conv_kernel - 1)
        self.blank = cfg.vocab_size
        self._pred = _Predictor(cfg, parent=None)
        self._joint = _Joint(cfg, parent=None)
        self._lm_fusion = lookup_lm_fusion  # adapter, resolved in start()
        self._lm, self.lm_weight = lm, float(lm_weight)

        def encode(p, f, l, off):
            return model.apply({"params": p}, f, l, True, off,
                               method="encode")[0]

        self._encode = jax.jit(encode)

        # fixed-size window encode + in-program chunk slice: ONE compiled
        # program for warm-up and steady state alike. A naturally-growing
        # margin window (4*(chunk + min(o0, R + 1)) raw frames) changes
        # shape every push until o0 > R — that's ~R/chunk pushes each
        # paying a full encoder recompile (seconds over a remote-device
        # tunnel; measured 5.9 s/push in BENCH r3 before this fix).
        self.Lw = 4 * (self.chunk + self.R + 1)

        def encode_chunk(p, f, l, off, sl0):
            enc = model.apply({"params": p}, f, l, True, off,
                              method="encode")[0]
            return jax.lax.dynamic_slice_in_dim(enc, sl0, self.chunk, 1)

        self._encode_chunk = jax.jit(encode_chunk)

        def pred_step_of(p):
            def pred_step(tok, state):
                return self._pred.apply(
                    {"params": p["predictor"]}, tok, state, method="step"
                )

            return pred_step

        def joint_fn_of(p):
            def joint_fn(enc_t, pred_out):
                return self._joint.apply({"params": p["joint"]}, enc_t,
                                         pred_out)

            return joint_fn

        self._pred_step_of, self._joint_fn_of = pred_step_of, joint_fn_of

        if mode == "greedy":
            from .ops.transducer import transducer_greedy_advance

            def advance(p, carry, enc_chunk, chunk_lens):
                return transducer_greedy_advance(
                    enc_chunk, chunk_lens, pred_step_of(p), joint_fn_of(p),
                    self.blank, carry, self.E,
                )

        else:
            from .ops.transducer import transducer_beam_advance

            def advance(p, carry, enc_chunk, chunk_lens):
                return transducer_beam_advance(
                    enc_chunk, chunk_lens, pred_step_of(p), joint_fn_of(p),
                    self.blank, carry, self.E,
                    lm_step=self._lm_step, lm_weight=self.lm_weight,
                )

        self._advance = jax.jit(advance)
        self._lm_step = None  # set in start() for beam+lm

    # -- session lifecycle -------------------------------------------------

    def start(self, batch_size: int) -> StreamingSession:
        """Open a session of `batch_size` concurrent streams."""
        N = int(batch_size)
        u_max = self.E * self.max_frames
        pred_step = self._pred_step_of(self.params)
        init_state = self._pred.apply(
            {"params": self.params["predictor"]}, N, method="init_carry"
        )
        if self.mode == "greedy":
            from .ops.transducer import transducer_greedy_init

            carry = transducer_greedy_init(
                N, u_max, pred_step, init_state, self.blank
            )
        else:
            from .ops.transducer import transducer_beam_init

            lm = self._lm
            if lm is not None and not isinstance(lm, tuple):
                if lm.vocab_size != self.cfg.vocab_size:
                    raise RuntimeError(
                        f"fused LM vocab {lm.vocab_size} != model vocab "
                        f"{self.cfg.vocab_size}"
                    )
                lm = self._lm_fusion(lm, N)
            self._lm_step = None if lm is None else lm[0]
            carry = transducer_beam_init(
                N, self.width, u_max, pred_step, init_state, self.blank, lm
            )
        F = self.cfg.encoder.num_filts
        return StreamingSession(
            carry=carry,
            buf=np.zeros((N, 0, F), np.float32),
            base=0,
            pushed=0,
            total=np.zeros((N,), np.int64),
            consumed=np.zeros((N,), np.int64),
            o0=0,
        )

    def push(
        self,
        sess: StreamingSession,
        feats: np.ndarray,
        new_lens: Optional[np.ndarray] = None,
    ):
        """Feed ``(N, T_new, F)`` new frames; decode what they determine.

        `new_lens` (default: all ``T_new``) counts the real frames per
        stream; a stream that has ended keeps pushing zeros here. Returns
        the current partial result (same form as :meth:`finish`, unsorted
        scores for beam)."""
        if sess.done:
            raise RuntimeError("session already finished")
        feats = np.asarray(feats, np.float32)
        N, T_new = feats.shape[:2]
        if N != sess.total.shape[0]:
            raise ValueError(
                f"batch size {N} != session batch {sess.total.shape[0]}"
            )
        new_lens = (
            np.full((N,), T_new, np.int64)
            if new_lens is None
            else np.asarray(new_lens, np.int64)
        )
        if (new_lens < 0).any() or (new_lens > T_new).any():
            raise ValueError("new_lens must lie in [0, T_new]")
        # monotone streams: frames are consumed in order, so a stream that
        # fell behind the shared timeline must not produce new data
        resumed = (sess.total < sess.pushed) & (new_lens > 0)
        if resumed.any():
            raise RuntimeError(
                f"streams {np.nonzero(resumed)[0].tolist()} ended (fell "
                "behind the shared timeline) and cannot resume"
            )
        sess.buf = np.concatenate([sess.buf, feats], 1)
        sess.total = sess.total + new_lens
        sess.pushed += T_new
        if _ceil4(sess.pushed) > self.max_frames:
            raise RuntimeError(
                f"stream exceeds max_frames={self.max_frames} "
                "post-subsample frames"
            )
        # decode fully-determined frames in fixed-size chunks (steady-state
        # serving compiles exactly one encode + one advance program)
        o1_max = sess.pushed // 4
        while o1_max - sess.o0 >= self.chunk:
            self._decode_window(sess, sess.o0 + self.chunk, sess.total // 4)
        return self._partial(sess)

    def finish(self, sess: StreamingSession):
        """Decode everything outstanding; return the final hypotheses.

        Greedy: ``(hyps (N, U_max), hyp_lens (N,))``. Beam: ``(hyps
        (N, W, U_max), hyp_lens (N, W), scores (N, W))`` best-first."""
        if sess.done:
            raise RuntimeError("session already finished")
        out_lens = _ceil4(sess.total)
        o1 = int(out_lens.max(initial=0))
        # remaining globally-aligned frames (streams still on the frontier)
        while sess.o0 < o1:
            self._decode_window(
                sess, min(sess.o0 + self.chunk, o1), out_lens
            )
        # deferred tails: streams whose final partial-block frame fell
        # behind the frontier before it was determined. Encode once, hand
        # each stream ITS tail frame as a length-1 chunk (the advance
        # consumes frames per stream in order, not by global index).
        pending = out_lens - sess.consumed
        assert (pending >= 0).all() and (pending <= 1).all(), pending
        if pending.any():
            tail_o = np.where(pending > 0, out_lens - 1, 0)
            m0 = max(int(tail_o[pending > 0].min()) - self.R - 1, 0)
            i0 = 4 * m0
            f = sess.buf[:, i0 - sess.base :]
            l = np.clip(sess.total - i0, 0, f.shape[1])
            enc = self._encode(
                self.params,
                jnp.asarray(f),
                jnp.asarray(l, jnp.int32),
                jnp.asarray(m0, jnp.int32),
            )
            pick = jnp.asarray(np.clip(tail_o - m0, 0, enc.shape[1] - 1))
            oh = (
                jnp.arange(enc.shape[1])[None] == pick[:, None]
            ).astype(enc.dtype)
            enc_tail = jnp.einsum("nt,ntd->nd", oh, enc)[:, None]
            sess.carry = self._advance(
                self.params,
                sess.carry,
                enc_tail,
                jnp.asarray(pending, jnp.int32),
            )
            sess.consumed = sess.consumed + pending
        sess.done = True
        if self.mode == "greedy":
            _, u, hyps, _, _ = sess.carry
            return hyps, u
        from .ops.transducer import transducer_beam_finalize

        return transducer_beam_finalize(sess.carry)

    # -- internals -----------------------------------------------------------

    def _decode_window(self, sess, o1: int, out_lens: np.ndarray):
        """Advance the decode over global frames ``[sess.o0, o1)``."""
        m0 = max(sess.o0 - self.R - 1, 0)
        i0, i1 = 4 * m0, min(4 * o1, sess.pushed)
        f = sess.buf[:, i0 - sess.base : i1 - sess.base]
        N, Tf, F = f.shape
        if Tf < self.Lw:
            # pad to the fixed window size; padded frames sit beyond every
            # stream's valid length l, so the encoder masks them out
            f = np.concatenate(
                [f, np.zeros((N, self.Lw - Tf, F), f.dtype)], 1
            )
        l = np.clip(sess.total - i0, 0, i1 - i0)
        # rows [o0 - m0, o0 - m0 + chunk) sliced inside the program; when
        # called from finish() with o1 - o0 < chunk the extra rows are
        # ignored (chunk_lens below is clipped to o1 - o0)
        enc_chunk = self._encode_chunk(
            self.params,
            jnp.asarray(f),
            jnp.asarray(l, jnp.int32),
            jnp.asarray(m0, jnp.int32),
            jnp.asarray(sess.o0 - m0, jnp.int32),
        )
        # only frontier streams (consumed == o0) read this globally-aligned
        # window; drained streams' deferred tail frames (behind the
        # frontier) are handled by finish()'s per-stream gather pass
        on_frontier = sess.consumed == sess.o0
        chunk_lens = np.where(
            on_frontier, np.clip(out_lens - sess.o0, 0, o1 - sess.o0), 0
        )
        sess.carry = self._advance(
            self.params,
            sess.carry,
            enc_chunk,
            jnp.asarray(chunk_lens, jnp.int32),
        )
        sess.consumed = sess.consumed + chunk_lens
        sess.o0 = o1
        # drop buffer rows no longer needed: the margin behind the frontier
        # and behind the earliest deferred tail
        tails = sess.consumed[sess.consumed < sess.o0]
        horizon = min([sess.o0] + tails.tolist())
        keep_from = 4 * max(horizon - self.R - 1, 0)
        if keep_from > sess.base:
            sess.buf = sess.buf[:, keep_from - sess.base :]
            sess.base = keep_from

    def _partial(self, sess):
        if self.mode == "greedy":
            _, u, hyps, _, _ = sess.carry
            return hyps, u
        scores, hyps, lens = sess.carry[0], sess.carry[1], sess.carry[2]
        return hyps.astype(jnp.int32), lens, scores


@dataclasses.dataclass
class StreamingCTCSession:
    """State of one batch of concurrent CTC streams."""

    logits: np.ndarray  # (N, o0, V + 1) encoder outputs decoded so far
    buf: np.ndarray  # (N, kept, F) raw frames from global raw index `base`
    base: int
    pushed: int  # raw frames pushed so far (shared timeline)
    total: np.ndarray  # (N,) per-stream valid raw lengths
    o0: int  # post-subsample frames encoded so far
    done: bool = False


class StreamingCTCRecognizer:
    """Streaming CTC recognition sessions over a fixed checkpoint.

    Same session surface as :class:`StreamingTransducerRecognizer`
    (``start``/``push``/``finish``; batched streams, ragged ends via
    per-push ``new_lens``, no resuming after a stream falls behind). The
    *encoder* — where nearly all the FLOPs are — runs incrementally over
    causal chunks exactly like :func:`pydrobert_tpu.models.conformer.
    streaming_logits`; the CTC prefix search re-runs over the accumulated
    logits when results are requested (``push(..., partials=True)`` and
    ``finish``). Re-decoding is the trade-off for supporting every fusion
    variant of :class:`~pydrobert_tpu.ops.decoding.CTCPrefixSearch`
    unchanged: the search is a tiny fraction of encoder cost per frame,
    but requesting partials every push makes total decode work quadratic
    in utterance length — poll partials at the cadence you display them.

    ``finish`` hypotheses equal the one-shot ``search(streaming_logits(
    ...))`` decode (parity-tested). Decode lengths are padded to
    `decode_pad_multiple` so a session compiles O(T / multiple) decode
    programs, not one per length.

    Requires the causal encoder config: ``attention_context=(L, 0)`` with
    finite ``L`` and ``causal_conv=True``.
    """

    def __init__(
        self,
        model,
        params,
        chunk: int = 8,
        width: int = 8,
        beta: float = 0.2,
        lm=None,
        decode_pad_multiple: int = 32,
    ):
        from .ops.decoding import CTCPrefixSearch

        cfg = model.cfg
        left, right = cfg.attention_context
        if left is None or right != 0 or not cfg.causal_conv:
            raise ValueError(
                "streaming recognition requires a causal encoder config: "
                "attention_context=(L, 0) with finite L and causal_conv="
                f"True (got attention_context={cfg.attention_context}, "
                f"causal_conv={cfg.causal_conv})"
            )
        if chunk < 1:
            raise ValueError(f"chunk must be positive, got {chunk}")
        self.model, self.params, self.cfg = model, params, cfg
        self.chunk = int(chunk)
        self.R = cfg.num_layers * (int(left) + cfg.conv_kernel - 1)
        self.decode_pad_multiple = max(1, int(decode_pad_multiple))
        self.search = CTCPrefixSearch(width, beta=beta, lm=lm)

        # fixed-size window encode + in-program row slice: one compiled
        # program for warm-up and steady state alike (see
        # StreamingTransducerRecognizer — a growing margin window recompiles
        # the encoder every push until o0 > R)
        self.Lw = 4 * (self.chunk + self.R + 1)

        def encode_rows(p, f, l, off, sl0):
            lg = model.apply({"params": p}, f, l, True, off)[0]
            return jax.lax.dynamic_slice_in_dim(lg, sl0, self.chunk, 1)

        self._encode_rows = jax.jit(encode_rows)

        def decode(logits, lens):
            return self.search(logits, lens)

        self._decode = jax.jit(decode)

    def start(self, batch_size: int) -> StreamingCTCSession:
        """Open a session of `batch_size` concurrent streams."""
        N = int(batch_size)
        F = self.cfg.num_filts
        return StreamingCTCSession(
            logits=np.zeros((N, 0, self.cfg.vocab_size + 1), np.float32),
            buf=np.zeros((N, 0, F), np.float32),
            base=0,
            pushed=0,
            total=np.zeros((N,), np.int64),
            o0=0,
        )

    def push(
        self,
        sess: StreamingCTCSession,
        feats: np.ndarray,
        new_lens: Optional[np.ndarray] = None,
        partials: bool = False,
    ):
        """Feed ``(N, T_new, F)`` new frames; encode what they determine.

        With ``partials=True`` the accumulated logits are re-decoded and
        ``(y (S, N, W), y_lens (N, W), y_probs (N, W))`` is returned
        (otherwise ``None``)."""
        if sess.done:
            raise RuntimeError("session already finished")
        feats = np.asarray(feats, np.float32)
        N, T_new = feats.shape[:2]
        if N != sess.total.shape[0]:
            raise ValueError(
                f"batch size {N} != session batch {sess.total.shape[0]}"
            )
        new_lens = (
            np.full((N,), T_new, np.int64)
            if new_lens is None
            else np.asarray(new_lens, np.int64)
        )
        if (new_lens < 0).any() or (new_lens > T_new).any():
            raise ValueError("new_lens must lie in [0, T_new]")
        resumed = (sess.total < sess.pushed) & (new_lens > 0)
        if resumed.any():
            raise RuntimeError(
                f"streams {np.nonzero(resumed)[0].tolist()} ended (fell "
                "behind the shared timeline) and cannot resume"
            )
        sess.buf = np.concatenate([sess.buf, feats], 1)
        sess.total = sess.total + new_lens
        sess.pushed += T_new
        while sess.pushed // 4 - sess.o0 >= self.chunk:
            self._encode_window(sess, sess.o0 + self.chunk)
        if not partials:
            return None
        # a stream's frames < ceil4(total) are exact once encoded (the
        # window encode masks by the stream's true valid length)
        lens = np.minimum(_ceil4(sess.total), sess.o0)
        return self._decode_padded(sess.logits, lens)

    def finish(self, sess: StreamingCTCSession):
        """Encode + decode everything outstanding; final hypotheses.

        Returns ``(y (S, N, W), y_lens (N, W), y_probs (N, W))`` — the
        :class:`~pydrobert_tpu.ops.decoding.CTCPrefixSearch` contract."""
        if sess.done:
            raise RuntimeError("session already finished")
        out_lens = _ceil4(sess.total)
        o1 = int(out_lens.max(initial=0))
        while sess.o0 < o1:
            self._encode_window(sess, min(sess.o0 + self.chunk, o1))
        sess.done = True
        return self._decode_padded(sess.logits, out_lens)

    def _encode_window(self, sess, o1: int):
        m0 = max(sess.o0 - self.R - 1, 0)
        i0, i1 = 4 * m0, min(4 * o1, sess.pushed)
        f = sess.buf[:, i0 - sess.base : i1 - sess.base]
        N, Tf, F = f.shape
        if Tf < self.Lw:
            # pad to the fixed window size; padded frames sit beyond every
            # stream's valid length l, so the encoder masks them out
            f = np.concatenate(
                [f, np.zeros((N, self.Lw - Tf, F), f.dtype)], 1
            )
        l = np.clip(sess.total - i0, 0, i1 - i0)
        rows = self._encode_rows(
            self.params,
            jnp.asarray(f),
            jnp.asarray(l, jnp.int32),
            jnp.asarray(m0, jnp.int32),
            jnp.asarray(sess.o0 - m0, jnp.int32),
        )
        # final (finish-time) windows can be shorter than a full chunk
        sess.logits = np.concatenate(
            [sess.logits, np.asarray(rows)[:, : o1 - sess.o0]], 1
        )
        sess.o0 = o1
        keep_from = 4 * max(sess.o0 - self.R - 1, 0)
        if keep_from > sess.base:
            sess.buf = sess.buf[:, keep_from - sess.base :]
            sess.base = keep_from

    def _decode_padded(self, logits: np.ndarray, lens: np.ndarray):
        """Decode time-major logits padded up to the compile-shape grid."""
        N, T = logits.shape[:2]
        m = self.decode_pad_multiple
        Tp = max(-(-max(T, 1) // m) * m, m)
        padded = np.zeros((N, Tp) + logits.shape[2:], logits.dtype)
        padded[:, :T] = logits
        return self._decode(
            jnp.asarray(np.moveaxis(padded, 1, 0)),
            jnp.asarray(lens, jnp.int32),
        )
