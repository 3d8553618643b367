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

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "transducer_loss",
    "transducer_loss_from_joint",
    "transducer_greedy_search",
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
    """
    N, T, D = enc.shape
    U_max = int(max_symbols_per_frame) * T
    hyps0 = jnp.full((N, U_max), blank_idx, jnp.int32)
    pred_out0, state0 = pred_step(jnp.full((N,), blank_idx, jnp.int32), init_state)

    def cond(carry):
        t, _, _, _, _, _, _ = carry
        return (t < enc_lens).any()

    def body(carry):
        t, k, u, hyps, pred_out, state, _it = carry
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
        return t, k, u, hyps, pred_out, state, _it + 1

    t0 = jnp.zeros((N,), jnp.int32)
    carry = (
        t0, jnp.zeros((N,), jnp.int32), jnp.zeros((N,), jnp.int32),
        hyps0, pred_out0, state0, jnp.asarray(0, jnp.int32),
    )
    _, _, u, hyps, _, _, _ = jax.lax.while_loop(cond, body, carry)
    return hyps, u
