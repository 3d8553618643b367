"""Attention-based seq2seq ASR model (flax) wired into the decoding stack.

The reference library's documented usage pattern is a user-supplied
autoregressive decoder implementing ``ExtractableSequentialLanguageModel``
driven by :class:`~pydrobert_tpu.ops.decoding.BeamSearch` /
:class:`RandomWalk` (reference ``_attn.py:99-131`` example and the
``_decoding.py`` module docs). This module provides that model family
end-to-end: a GRU encoder over features, a Bahdanau-attention GRU decoder
exposed as a sequential LM (pytree state: decoder hidden + batch-first
encoder context), beam-search decoding, and a minimum-error-rate training
step built on sampled hypotheses (reference ``_string.py:1400-1472``'s
intended use).
"""

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..lm import ExtractableSequentialLanguageModel
from ..ops.attn import ConcatSoftAttention

__all__ = [
    "AttentionSeq2Seq",
    "Seq2SeqConfig",
    "Seq2SeqDecoderLM",
    "make_mer_train_step",
]


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    vocab_size: int = 32  # excludes sos/eos handling; eos must be < vocab
    num_filts: int = 40
    enc_hidden: int = 128
    dec_hidden: int = 128
    embed_dim: int = 64
    attn_hidden: int = 128


class _Encoder(nn.Module):
    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(self, feats, lens):
        cfg = self.cfg
        x = nn.Dense(cfg.enc_hidden, name="proj")(feats)
        x = nn.tanh(x)
        rnn = nn.RNN(nn.GRUCell(cfg.enc_hidden), name="rnn")
        x = rnn(x, seq_lengths=lens)
        mask = jnp.arange(x.shape[1])[None] < lens[:, None]
        return x, mask  # (N, T, H), (N, T)


class _DecoderStep(nn.Module):
    cfg: Seq2SeqConfig

    @nn.compact
    def __call__(self, tok, hidden, enc, enc_mask):
        """One decoder step: embed -> attend -> GRU -> logits.

        tok (N,) int32 in [0, vocab] (vocab = sos slot); hidden (N, H);
        enc (N, T, C); enc_mask (N, T).
        """
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size + 1, cfg.embed_dim, name="embed")(tok)
        attn = ConcatSoftAttention(
            query_size=cfg.dec_hidden,
            key_size=cfg.enc_hidden,
            dim=1,
            hidden_size=cfg.attn_hidden,
            name="attn",
        )
        ctx = attn(hidden, enc, enc, enc_mask)  # (N, C)
        cell = nn.GRUCell(cfg.dec_hidden, name="cell")
        new_hidden, out = cell(hidden, jnp.concatenate([emb, ctx], -1))
        logits = nn.Dense(cfg.vocab_size, name="out")(out)
        return logits, new_hidden


class AttentionSeq2Seq(nn.Module):
    """Encoder + step decoder; use ``method=`` dispatch for each piece."""

    cfg: Seq2SeqConfig

    def setup(self):
        self.encoder = _Encoder(self.cfg)
        self.decoder_step = _DecoderStep(self.cfg)

    def encode(self, feats, lens):
        return self.encoder(feats, lens)

    def step(self, tok, hidden, enc, enc_mask):
        return self.decoder_step(tok, hidden, enc, enc_mask)

    def __call__(self, feats, lens):
        """Init-friendly forward touching both submodules."""
        enc, mask = self.encoder(feats, lens)
        N = feats.shape[0]
        tok = jnp.full((N,), self.cfg.vocab_size, jnp.int32)
        hidden = jnp.zeros((N, self.cfg.dec_hidden), feats.dtype)
        return self.decoder_step(tok, hidden, enc, mask)


class Seq2SeqDecoderLM(ExtractableSequentialLanguageModel):
    """The decoder as a sequential LM for BeamSearch/RandomWalk.

    State pytree: ``{"hidden": (N, H), "enc": (N, T, C), "enc_mask":
    (N, T)}`` — all batch-major so the default ``extract_by_src`` beam
    reordering applies. Seed the state via :func:`initial_state` from the
    encoder outputs; the search replicates it across beams itself.
    """

    def __init__(self, model: AttentionSeq2Seq, params):
        super().__init__(model.cfg.vocab_size)
        self.model = model
        self.params = params
        self.sos_slot = model.cfg.vocab_size

    def initial_state(self, feats, lens) -> Dict[str, Any]:
        enc, mask = self.model.apply(
            self.params, feats, lens, method=AttentionSeq2Seq.encode
        )
        N = feats.shape[0]
        hidden = jnp.zeros((N, self.model.cfg.dec_hidden), enc.dtype)
        return {"hidden": hidden, "enc": enc, "enc_mask": mask}

    def update_input(self, prev, hist):
        if not all(k in prev for k in ("hidden", "enc", "enc_mask")):
            raise RuntimeError(
                "initial state must be built with initial_state(feats, lens)"
            )
        return prev

    def calc_idx_log_probs(self, hist, prev, idx):
        S, N = hist.shape
        idxs = jnp.broadcast_to(jnp.asarray(idx, jnp.int32), (N,))
        if S:
            prev_tok = hist[
                jnp.clip(idxs - 1, 0, S - 1), jnp.arange(N)
            ].astype(jnp.int32)
        else:
            prev_tok = jnp.zeros((N,), jnp.int32)
        # the reference embeds sos for the first step; sos may be any id, so
        # it gets the dedicated final embedding slot
        prev_tok = jnp.where(idxs == 0, self.sos_slot, prev_tok)
        prev_tok = jnp.clip(prev_tok, 0, self.sos_slot)
        logits, hidden = self.model.apply(
            self.params,
            prev_tok,
            prev["hidden"],
            prev["enc"],
            prev["enc_mask"],
            method=AttentionSeq2Seq.step,
        )
        return jax.nn.log_softmax(logits, -1), {**prev, "hidden": hidden}


def make_mer_train_step(model: AttentionSeq2Seq, optimizer, num_samples: int = 4,
                        max_iters: int = 32, eos: Optional[int] = None):
    """Training step minimizing the minimum-error-rate loss over hypotheses
    sampled with :class:`RandomWalk` (reference ``_string.py:1400-1472``).

    ``step(params, opt_state, key, feats, feat_lens, refs, ref_lens) ->
    (params, opt_state, loss)``.
    """
    import optax

    from ..ops.decoding import RandomWalk, sequence_log_probs
    from ..ops.string import minimum_error_rate_loss

    def loss_fn(params, key, feats, feat_lens, refs, ref_lens):
        lm = Seq2SeqDecoderLM(model, params)
        state = lm.initial_state(feats, feat_lens)
        N, M = feats.shape[0], num_samples
        # draw hypotheses: tile the batch across samples
        tiled = jax.tree.map(lambda x: jnp.repeat(x, M, axis=0), state)
        walk = RandomWalk(lm, eos=eos)
        y, y_lens, _ = walk(key, dict(tiled), N * M, max_iters)  # (S, N*M)
        S = y.shape[0]
        hyp_mask = jnp.arange(S)[:, None] < y_lens[None]
        y_m = jnp.where(hyp_mask, y, -1)  # WITH eos: log-probs include it
        # the error rate must not count the terminal eos as a real token
        # (otherwise terminated samples pay an insertion vs eos-free refs
        # and the gradient favors non-termination)
        if eos is not None:
            last = jnp.take_along_axis(
                y, jnp.clip(y_lens - 1, 0, None)[None], 0
            )[0]
            rate_lens = y_lens - ((last == eos) & (y_lens > 0))
        else:
            rate_lens = y_lens
        y_rate = jnp.where(jnp.arange(S)[:, None] < rate_lens[None], y, -1)
        # per-sample joint log probs under the model (differentiable)
        lp_full = lm(y, prev=dict(tiled))  # (S+1, N*M, V)
        log_probs = sequence_log_probs(
            jnp.swapaxes(lp_full[:-1], 0, 1), y_m.T, dim=-1
        ).reshape(N, M)
        refs_t = jnp.where(
            jnp.arange(refs.shape[1])[:, None] < ref_lens[None], refs.T, -1
        )  # (R, N), time-major with padding masked to -1
        loss = minimum_error_rate_loss(
            log_probs,
            refs_t,
            y_rate.reshape(S, N, M),
            eos=-1,  # both paddings are -1, so lengths are inferred exactly
            include_eos=False,
            warn=False,
        )
        return loss

    def step(params, opt_state, key, feats, feat_lens, refs, ref_lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, key, feats, feat_lens, refs, ref_lens
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
