"""RNN-Transducer ops, TPU-first.

The transducer (RNN-T, Graves 2012) lattice recurrence is

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + emit[t, u-1])

Along ``u`` (at fixed ``t``) this is a first-order *affine recurrence in the
log semiring* — ``y_u = (y_{u-1} (x) c_u) (+) x_u`` with ``(x) = +`` and
``(+) = logaddexp`` — so instead of a serial Python/scan loop over labels it
runs as a :func:`jax.lax.associative_scan` (log-depth, vectorized over the
batch), inside one :func:`jax.lax.scan` over time. No data-dependent shapes,
no host sync; gradients come from AD through the scans.

The loss consumes *pre-gathered* per-lattice-node blank and emit
log-probabilities rather than the full ``(N, T, U+1, V+1)`` joint tensor:
that tensor is the transducer's memory wall (SURVEY §6 scale: 3+ GB at
serving shapes) and the gather-then-loss form lets callers fuse the
log-softmax + label gather into the joint network's output projection.
:func:`transducer_loss_from_joint` is the convenience wrapper from raw
joint logits.

The reference library stops at CTC-style searches (``_decoding.py``); the
transducer family is part of this package's model-zoo surface (like
:mod:`pydrobert_tpu.models.conformer`), added because a speech stack on TPU
is expected to serve RNN-T.
"""

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "transducer_loss",
    "transducer_loss_from_joint",
    "transducer_greedy_search",
    "transducer_greedy_init",
    "transducer_greedy_advance",
]

_NEG_INF = -1.0e30


def _log_affine_scan(c: jax.Array, x: jax.Array) -> jax.Array:
    """Solve ``y_u = logaddexp(y_{u-1} + c_u, x_u)`` along the last axis.

    Associative composition of affine maps in the (logaddexp, +) semiring:
    ``(a1, b1) o (a2, b2) = (a1 + a2, logaddexp(b1 + a2, b2))``.
    ``y_{-1}`` is -inf (the first element contributes ``x_0`` alone).
    """

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al + ar, jnp.logaddexp(bl + ar, br)

    _, y = jax.lax.associative_scan(combine, (c, x), axis=-1)
    return y


def transducer_loss(
    blank_lp: jax.Array,
    emit_lp: jax.Array,
    logit_lens: Optional[jax.Array] = None,
    ref_lens: Optional[jax.Array] = None,
    reduction: str = "mean",
) -> jax.Array:
    """Negative transducer log-likelihood from node log-probabilities.

    `blank_lp` is ``(N, T, U + 1)``: the log-probability of emitting blank
    at lattice node ``(t, u)`` (``u`` labels consumed). `emit_lp` is
    ``(N, T, U)``: the log-probability of emitting reference label ``u``
    (0-indexed) at frame ``t``. `logit_lens` (``(N,)``, default ``T``) and
    `ref_lens` (``(N,)``, default ``U``) mask padding. `reduction` is
    ``"mean"``, ``"sum"`` or ``"none"``.
    """
    N, T, U1 = blank_lp.shape
    U = U1 - 1
    if emit_lp.shape != (N, T, U):
        raise RuntimeError(
            f"emit_lp must be (N, T, U) = {(N, T, U)}, got {emit_lp.shape}"
        )
    if logit_lens is None:
        logit_lens = jnp.full((N,), T, jnp.int32)
    if ref_lens is None:
        ref_lens = jnp.full((N,), U, jnp.int32)

    # forbid emitting past each ref's length: those lattice columns are
    # unreachable (padding labels must not contribute probability)
    u_idx = jnp.arange(U, dtype=jnp.int32)
    emit_lp = jnp.where(
        u_idx[None, None] < ref_lens[:, None, None], emit_lp, _NEG_INF
    )
    # c[u] = emit score consumed moving into column u (c[0] unused -> -inf)
    c_full = jnp.concatenate(
        [jnp.full((N, T, 1), _NEG_INF), emit_lp], 2
    )  # (N, T, U+1)

    # t = 0 row: alpha[0, u] = prefix-sum of emits (only the emit path
    # reaches (0, u)); the same affine scan with x = [0, -inf, ...]
    x0 = jnp.full((N, U1), _NEG_INF).at[:, 0].set(0.0)
    row0 = _log_affine_scan(c_full[:, 0], x0)

    t_idx = jnp.arange(1, T, dtype=jnp.int32)

    def step(row, inp):
        t, c_t, blank_tm1 = inp
        # x[u] = alpha[t-1, u] + blank[t-1, u]; rows past a batch item's
        # length are frozen so the final read sees alpha[T_b - 1]
        x = row + blank_tm1
        new = _log_affine_scan(c_t, x)
        row = jnp.where((t < logit_lens)[:, None], new, row)
        return row, None

    if T > 1:
        row, _ = jax.lax.scan(
            step,
            row0,
            (
                t_idx,
                jnp.moveaxis(c_full[:, 1:], 1, 0),
                jnp.moveaxis(blank_lp[:, :-1], 1, 0),
            ),
        )
    else:
        row = row0

    # ll = alpha[T_b - 1, U_b] + blank[T_b - 1, U_b]  (final blank)
    u_onehot = (
        jnp.arange(U1, dtype=jnp.int32)[None] == ref_lens[:, None]
    ).astype(blank_lp.dtype)
    t_onehot = (
        jnp.arange(T, dtype=jnp.int32)[None]
        == jnp.clip(logit_lens - 1, 0, T - 1)[:, None]
    ).astype(blank_lp.dtype)
    final_blank = jnp.einsum("nt,ntu,nu->n", t_onehot, blank_lp, u_onehot)
    alpha_final = (row * u_onehot).sum(1)
    ll = alpha_final + final_blank
    loss = -ll
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise RuntimeError(f"unknown reduction {reduction!r}")


def transducer_loss_from_joint(
    joint_logits: jax.Array,
    refs: jax.Array,
    logit_lens: Optional[jax.Array] = None,
    ref_lens: Optional[jax.Array] = None,
    blank_idx: int = -1,
    reduction: str = "mean",
) -> jax.Array:
    """:func:`transducer_loss` from raw joint logits ``(N, T, U + 1, V)``
    and reference labels ``(N, U)``. ``blank_idx`` indexes the logit axis
    (negative values count from the end). Prefer pre-gathering when the
    joint tensor would not fit: this wrapper materializes its log-softmax.
    """
    N, T, U1, V = joint_logits.shape
    U = U1 - 1
    if refs.shape != (N, U):
        raise RuntimeError(f"refs must be (N, U) = {(N, U)}, got {refs.shape}")
    if blank_idx < 0:
        blank_idx += V
    lp = jax.nn.log_softmax(joint_logits, axis=-1)
    blank_lp = lp[..., blank_idx]  # (N, T, U+1)
    # emit[n, t, u] = lp[n, t, u, refs[n, u]] via one-hot contraction
    oh = jax.nn.one_hot(refs, V, dtype=lp.dtype)  # (N, U, V)
    emit_lp = jnp.einsum("ntuv,nuv->ntu", lp[:, :, :U], oh)
    return transducer_loss(blank_lp, emit_lp, logit_lens, ref_lens, reduction)


def transducer_greedy_init(
    batch_size: int,
    u_max: int,
    pred_step: Callable,
    init_state,
    blank_idx: int,
):
    """Fresh carry for :func:`transducer_greedy_advance`.

    Allocates the ``(batch_size, u_max)`` hypothesis buffer (`u_max` must
    cover the WHOLE utterance: ``max_symbols_per_frame x total frames``)
    and primes the prediction network on the blank start token. The carry
    is ``(k, u, hyps, pred_out, state)``: per-element symbols-on-current-
    frame count, emitted length, hypothesis buffer, predictor output and
    state — a pytree of arrays, safe to thread through jitted chunk calls.
    """
    N = batch_size
    hyps0 = jnp.full((N, u_max), blank_idx, jnp.int32)
    pred_out0, state0 = pred_step(
        jnp.full((N,), blank_idx, jnp.int32), init_state
    )
    return (
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N,), jnp.int32),
        hyps0,
        pred_out0,
        state0,
    )


def transducer_greedy_search(
    enc: jax.Array,
    enc_lens: jax.Array,
    pred_step: Callable,
    joint_fn: Callable,
    init_state,
    blank_idx: int,
    max_symbols_per_frame: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Batched greedy RNN-T decoding as one ``lax.while_loop``.

    `enc` is encoder output ``(N, T, D)``; `pred_step(tok, state) ->
    (pred_out, state)`` advances the prediction network one emitted token
    (``tok`` ``(N,)`` int32); ``joint_fn(enc_t, pred_out) -> logits``
    ``(N, V)`` with the blank at `blank_idx`. Each batch element keeps its
    own frame pointer: emitting a non-blank stays on the frame (at most
    `max_symbols_per_frame` times — the standard loop guard), blank
    advances it. Returns ``(hyps (N, U_max), hyp_lens (N,))`` with
    ``U_max = max_symbols_per_frame * T``, padded with ``blank_idx``.

    TPU shape: every iteration is one fused batched joint evaluation — the
    while_loop condition is the only sync point, and the loop bound is
    static (``T * max_symbols_per_frame + T``).

    Streaming serving: the same search runs incrementally over encoder
    chunks via :func:`transducer_greedy_init` +
    :func:`transducer_greedy_advance` (this function is exactly init +
    one advance over the full utterance).
    """
    N, T, _ = enc.shape
    carry = transducer_greedy_init(
        N, int(max_symbols_per_frame) * T, pred_step, init_state, blank_idx
    )
    _, u, hyps, _, _ = transducer_greedy_advance(
        enc, enc_lens, pred_step, joint_fn, blank_idx, carry,
        max_symbols_per_frame,
    )
    return hyps, u


def transducer_greedy_advance(
    enc: jax.Array,
    enc_lens: jax.Array,
    pred_step: Callable,
    joint_fn: Callable,
    blank_idx: int,
    carry,
    max_symbols_per_frame: int = 4,
):
    """Greedy-decode one encoder segment, updating the streaming carry.

    `enc` ``(N, T_chunk, D)`` holds the next `enc_lens` valid frames per
    batch element (chunks partition each utterance's frames in order);
    `carry` comes from :func:`transducer_greedy_init` or a previous
    advance. Returns the updated carry — decoding the segments of an
    utterance one advance at a time emits EXACTLY the one-shot
    :func:`transducer_greedy_search` hypotheses (the per-element frame
    pointer resets per chunk but the symbol cap count, hypothesis buffer,
    and predictor state carry across; a frame advance always resets the
    cap count, so chunk boundaries are invisible to the math).
    """
    N, T, _ = enc.shape
    k0, u0, hyps0, pred_out0, state0 = carry
    U_max = hyps0.shape[1]

    def cond(carry):
        t = carry[0]
        return (t < enc_lens).any()

    def body(carry):
        t, k, u, hyps, pred_out, state = carry
        # frame t (clamped) per batch element, as a one-hot MXU pick
        t_oh = (
            jnp.arange(T, dtype=jnp.int32)[None]
            == jnp.clip(t, 0, T - 1)[:, None]
        ).astype(enc.dtype)
        enc_t = jnp.einsum("nt,ntd->nd", t_oh, enc)
        logits = joint_fn(enc_t, pred_out)
        tok = jnp.argmax(logits, 1).astype(jnp.int32)
        active = t < enc_lens
        emit = active & (tok != blank_idx) & (k < max_symbols_per_frame)
        # write emitted tokens at column u
        write = emit[:, None] & (
            jnp.arange(U_max, dtype=jnp.int32)[None] == u[:, None]
        )
        hyps = jnp.where(write, tok[:, None], hyps)
        u = u + emit.astype(jnp.int32)
        # advance the prediction net only where a token was emitted
        new_pred_out, new_state = pred_step(tok, state)
        pred_out = jnp.where(emit[:, None], new_pred_out, pred_out)
        state = jax.tree.map(
            lambda new, old: jnp.where(
                emit.reshape((N,) + (1,) * (new.ndim - 1)), new, old
            ),
            new_state,
            state,
        )
        # blank (or symbol cap) advances the frame and resets the cap count
        adv = active & ~emit
        t = t + adv.astype(jnp.int32)
        k = jnp.where(adv, 0, k + emit.astype(jnp.int32))
        return t, k, u, hyps, pred_out, state

    t0 = jnp.zeros((N,), jnp.int32)
    _, k, u, hyps, pred_out, state = jax.lax.while_loop(
        cond, body, (t0, k0, u0, hyps0, pred_out0, state0)
    )
    return k, u, hyps, pred_out, state


def transducer_beam_search(
    enc: jax.Array,
    enc_lens: jax.Array,
    pred_step: Callable,
    joint_fn: Callable,
    init_state,
    blank_idx: int,
    width: int,
    max_symbols_per_frame: int = 4,
    lm: Optional[Tuple[Callable, jax.Array, Any]] = None,
    lm_weight: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched time-synchronous RNN-T beam search with fixed expansion.

    The classic transducer beam search (Graves 2012 Alg. 1) grows a
    dynamic hypothesis set per frame — data-dependent shapes TPUs can't
    compile. This is the fixed-expansion, time-synchronous formulation
    (the mAES family): every frame runs exactly ``E =
    max_symbols_per_frame`` expansion rounds, each one batched joint
    evaluation + ``top_k`` over a static candidate pool. In a round, every
    still-*open* hypothesis offers its blank closure (score + blank
    log-prob; it then waits for the next frame) and its ``width`` best
    non-blank extensions (which stay open); already-closed hypotheses
    carry through unchanged. After the rounds, surviving open hypotheses
    are force-closed with their blank log-prob. Equal prefixes are NOT
    merged (the standard batched-search trade-off; scores are per-path).
    With ``width=1`` the emitted token sequence equals
    :func:`transducer_greedy_search`'s.

    Same callables contract as the greedy search: ``pred_step(tok (B,),
    state) -> (pred_out (B, P), state)``, ``joint_fn(enc_t, pred_out) ->
    logits (..., V)`` broadcasting over leading dims. `init_state` must be
    a per-``(N,)``-batch state; it is tiled across beams internally.

    External-LM shallow fusion: pass ``lm = (lm_step, init_lp, init_lm_state)``
    where ``init_lp (N, Vj)`` is the LM's first-token log-prob row aligned
    with the joint's logit indices (``Vj`` = joint vocab incl. blank; the
    blank column is never read) and ``lm_step(tok (B,), lm_state) ->
    (next_lp (B, Vj), lm_state)`` advances on an emitted token. Extension
    candidates are ranked and scored by ``lp_joint + lm_weight * lp_lm``;
    blank closures carry no LM term (standard RNN-T shallow fusion). See
    :func:`pydrobert_tpu.models.transducer.lookup_lm_fusion` for the
    adapter from a :class:`pydrobert_tpu.lm.LookupLanguageModel`.

    Returns ``(hyps (N, W, U_max), hyp_lens (N, W), scores (N, W))``
    sorted best-first (log-probability scores), ``U_max = E * T``, hyps
    padded with `blank_idx`.

    Streaming serving: this function is exactly
    :func:`transducer_beam_init` + one :func:`transducer_beam_advance`
    over the full utterance + :func:`transducer_beam_finalize`; call the
    pieces yourself to consume encoder chunks incrementally.
    """
    N, T, _ = enc.shape
    carry = transducer_beam_init(
        N, width, int(max_symbols_per_frame) * T, pred_step, init_state,
        blank_idx, lm,
    )
    carry = transducer_beam_advance(
        enc, enc_lens, pred_step, joint_fn, blank_idx, carry,
        max_symbols_per_frame,
        lm_step=None if lm is None else lm[0], lm_weight=lm_weight,
    )
    return transducer_beam_finalize(carry)


def transducer_beam_init(
    batch_size: int,
    width: int,
    u_max: int,
    pred_step: Callable,
    init_state,
    blank_idx: int,
    lm: Optional[Tuple[Callable, jax.Array, Any]] = None,
):
    """Fresh carry for :func:`transducer_beam_advance`.

    `u_max` must cover the whole utterance (``max_symbols_per_frame x
    total frames``). `lm` is the same triple :func:`transducer_beam_search`
    takes; only its ``(init_lp, init_lm_state)`` parts are consumed here
    (pass the ``lm_step`` callable to the advance calls)."""
    N, W = batch_size, int(width)

    def tile_beams(a):
        return jnp.broadcast_to(a[:, None], (N, W) + a.shape[1:]).reshape(
            (N * W,) + a.shape[1:]
        )

    # beam 0 is the live seed; the rest start at -inf so the first frame's
    # selection populates them
    scores0 = jnp.full((N, W), _NEG_INF).at[:, 0].set(0.0)
    pred_out0, state0 = pred_step(
        jnp.full((N,), blank_idx, jnp.int32), init_state
    )
    pred_out0 = tile_beams(pred_out0)  # (N*W, P)
    state0 = jax.tree.map(tile_beams, state0)
    hyps0 = jnp.full((N, W, u_max), float(blank_idx), jnp.float32)
    lens0 = jnp.zeros((N, W), jnp.int32)
    if lm is not None:
        _, lm_lp0, lm_state0 = lm
        lm_lp0 = tile_beams(jnp.asarray(lm_lp0, jnp.float32))  # (N*W, Vj)
        lm_state0 = jax.tree.map(tile_beams, lm_state0)
    else:
        lm_lp0, lm_state0 = jnp.zeros((0,)), ()
    return scores0, hyps0, lens0, pred_out0, state0, lm_lp0, lm_state0


def transducer_beam_finalize(carry) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sort a beam carry best-first -> ``(hyps, hyp_lens, scores)``."""
    hp = jax.lax.Precision.HIGHEST
    scores, hyps, lens = carry[0], carry[1], carry[2]
    W = scores.shape[1]
    iota_w = jnp.arange(W, dtype=jnp.int32)
    order_sc, order = jax.lax.top_k(scores, W)
    oh = (order[:, :, None] == iota_w[None, None]).astype(jnp.float32)
    hyps = jnp.einsum("nkj,njs->nks", oh, hyps, precision=hp)
    lens = jnp.einsum(
        "nkj,nj->nk", oh, lens.astype(jnp.float32), precision=hp
    ).astype(jnp.int32)
    return hyps.astype(jnp.int32), lens, order_sc


def transducer_beam_advance(
    enc: jax.Array,
    enc_lens: jax.Array,
    pred_step: Callable,
    joint_fn: Callable,
    blank_idx: int,
    carry,
    max_symbols_per_frame: int = 4,
    lm_step: Optional[Callable] = None,
    lm_weight: float = 1.0,
):
    """Beam-search one encoder segment, updating the streaming carry.

    `enc` ``(N, T_chunk, D)`` holds the next `enc_lens` valid frames per
    batch element (chunks partition each utterance's frames in order);
    `carry` comes from :func:`transducer_beam_init` or a previous advance.
    Chaining advances over an utterance's chunks computes EXACTLY the
    one-shot :func:`transducer_beam_search` scan (every hypothesis closes
    with a blank before the next frame, so beam state never spans a frame
    boundary); call :func:`transducer_beam_finalize` after the last chunk.
    """
    N, T, _ = enc.shape
    W = carry[0].shape[1]
    E = int(max_symbols_per_frame)
    U_max = carry[1].shape[2]
    lm = lm_step  # closures below test `lm is not None` to mean "fused"
    hp = jax.lax.Precision.HIGHEST

    iota_w = jnp.arange(W, dtype=jnp.int32)
    iota_u = jnp.arange(U_max, dtype=jnp.int32)

    def permute_beams(oh, a):
        """Pick per-new-beam sources: (N, W, Wsrc) one-hot x (N*W_src, ...)."""
        flat = a.reshape((N, W) + a.shape[1:])
        lead = "nj" + "abcdefg"[: flat.ndim - 2]
        out = jnp.einsum(
            f"nkj,{lead}->nk{lead[2:]}", oh, flat.astype(jnp.float32),
            precision=hp,
        ).astype(a.dtype)
        return out.reshape((N * W,) + a.shape[1:])

    def frame(carry, xs):
        scores, hyps, lens, pred_out, state, lm_lp, lm_state = carry
        enc_t, active = xs  # (N, D), (N,)
        open_ = jnp.full((N, W), True)

        def round_body(
            scores, hyps, lens, pred_out, state, open_, lm_lp, lm_state
        ):
            lp = jax.nn.log_softmax(
                joint_fn(enc_t[:, None], pred_out.reshape(N, W, -1)), -1
            )  # (N, W, V+1)
            blank_lp = lp[..., blank_idx]
            # width best non-blank extensions per open beam, ranked by the
            # FUSED per-token score when an external LM rides along
            ext_basis = lp
            if lm is not None:
                ext_basis = lp + lm_weight * lm_lp.reshape(N, W, -1)
            ext_lp, ext_tok = jax.lax.top_k(
                jnp.where(
                    jnp.arange(lp.shape[-1]) == blank_idx, _NEG_INF,
                    ext_basis,
                ),
                W,
            )  # (N, W, W)
            can_ext = open_ & (lens < U_max)
            ext_sc = jnp.where(
                can_ext[:, :, None], scores[:, :, None] + ext_lp, _NEG_INF
            )
            close_sc = jnp.where(open_, scores + blank_lp, scores)
            pool = jnp.concatenate(
                [close_sc, ext_sc.reshape(N, W * W)], 1
            )  # (N, W + W*W); slot s < W: close beam s; else ext
            new_sc, pick = jax.lax.top_k(pool, W)
            is_ext = pick >= W
            src = jnp.where(is_ext, (pick - W) // W, pick)  # (N, W)
            tok = jnp.where(is_ext, (pick - W) % W, 0)
            oh_src = (src[:, :, None] == iota_w[None, None]).astype(
                jnp.float32
            )
            # the chosen extension token, via the shared one-hot + a column
            # pick (exact: one nonzero per row)
            tok_oh = (tok[:, :, None] == iota_w[None, None]).astype(
                jnp.float32
            )
            picked_tok = jnp.einsum(
                "nkj,nkj->nk",
                tok_oh,
                jnp.einsum(
                    "nkj,njq->nkq", oh_src, ext_tok.astype(jnp.float32),
                    precision=hp,
                ),
                precision=hp,
            )
            new_lens = jnp.einsum(
                "nkj,nj->nk", oh_src, lens.astype(jnp.float32), precision=hp
            ).astype(jnp.int32)
            new_hyps = jnp.einsum(
                "nkj,njs->nks", oh_src, hyps, precision=hp
            )
            new_hyps = jnp.where(
                is_ext[:, :, None]
                & (iota_u[None, None] == new_lens[:, :, None]),
                picked_tok[:, :, None],
                new_hyps,
            )
            new_lens = new_lens + is_ext.astype(jnp.int32)
            new_open = is_ext  # closed picks wait for the next frame
            # advance the prediction net on the picked tokens; keep the
            # source's outputs where the pick was a closure
            src_pred = permute_beams(oh_src, pred_out)
            src_state = jax.tree.map(
                lambda a: permute_beams(oh_src, a), state
            )
            adv_pred, adv_state = pred_step(
                picked_tok.astype(jnp.int32).reshape(N * W), src_state
            )
            emask = is_ext.reshape(N * W)
            new_pred = jnp.where(emask[:, None], adv_pred, src_pred)
            new_state = jax.tree.map(
                lambda new, old: jnp.where(
                    emask.reshape((N * W,) + (1,) * (new.ndim - 1)), new, old
                ),
                adv_state,
                src_state,
            )
            if lm is not None:
                src_lm_lp = permute_beams(oh_src, lm_lp)
                src_lm_state = jax.tree.map(
                    lambda a: permute_beams(oh_src, a), lm_state
                )
                adv_lm_lp, adv_lm_state = lm_step(
                    picked_tok.astype(jnp.int32).reshape(N * W), src_lm_state
                )
                new_lm_lp = jnp.where(emask[:, None], adv_lm_lp, src_lm_lp)
                new_lm_state = jax.tree.map(
                    lambda new, old: jnp.where(
                        emask.reshape((N * W,) + (1,) * (new.ndim - 1)),
                        new,
                        old,
                    ),
                    adv_lm_state,
                    src_lm_state,
                )
            else:
                new_lm_lp, new_lm_state = lm_lp, lm_state
            return (
                new_sc, new_hyps, new_lens, new_pred, new_state, new_open,
                new_lm_lp, new_lm_state,
            )

        for _ in range(E):
            out = round_body(
                scores, hyps, lens, pred_out, state, open_, lm_lp, lm_state
            )
            am = active[:, None]
            scores = jnp.where(am, out[0], scores)
            hyps = jnp.where(am[..., None], out[1], hyps)
            lens = jnp.where(am, out[2], lens)
            amw = jnp.repeat(active, W)
            pred_out = jnp.where(amw[:, None], out[3], pred_out)
            state = jax.tree.map(
                lambda new, old: jnp.where(
                    amw.reshape((N * W,) + (1,) * (new.ndim - 1)), new, old
                ),
                out[4],
                state,
            )
            open_ = jnp.where(am, out[5], jnp.zeros_like(open_))
            if lm is not None:
                lm_lp = jnp.where(amw[:, None], out[6], lm_lp)
                lm_state = jax.tree.map(
                    lambda new, old: jnp.where(
                        amw.reshape((N * W,) + (1,) * (new.ndim - 1)),
                        new,
                        old,
                    ),
                    out[7],
                    lm_state,
                )
        # force-close survivors with their blank log-prob
        lp = jax.nn.log_softmax(
            joint_fn(enc_t[:, None], pred_out.reshape(N, W, -1)), -1
        )
        scores = jnp.where(
            active[:, None] & open_, scores + lp[..., blank_idx], scores
        )
        return (scores, hyps, lens, pred_out, state, lm_lp, lm_state), None

    active = jnp.arange(T, dtype=jnp.int32)[:, None] < enc_lens[None]  # (T,N)
    carry, _ = jax.lax.scan(
        frame, tuple(carry), (jnp.moveaxis(enc, 1, 0), active.astype(bool))
    )
    return carry


__all__ += [
    "transducer_beam_search",
    "transducer_beam_init",
    "transducer_beam_advance",
    "transducer_beam_finalize",
]
