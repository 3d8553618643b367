"""Conformer-Transducer (RNN-T) acoustic model, TPU-first.

Same conformer encoder as :class:`pydrobert_tpu.models.ConformerCTC`, plus
an LSTM prediction network and an additive joint. The transducer's memory
wall — the ``(N, T, U+1, V+1)`` joint tensor (3+ GB at serving shapes) — is
avoided by *streaming the joint over time*: a ``lax.scan`` over encoder
frames evaluates one ``(N, U+1, V+1)`` joint slab per step under
``jax.checkpoint``, reducing it immediately to the ``(N, U+1)`` blank and
``(N, U)`` label log-probabilities that
:func:`pydrobert_tpu.ops.transducer.transducer_loss` consumes (the slab is
rematerialized in the backward pass instead of stored). Greedy decoding
rides :func:`pydrobert_tpu.ops.transducer.transducer_greedy_search` with the
LSTM advanced one emitted token at a time.
"""

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from ..ops.transducer import (
    transducer_beam_search,
    transducer_greedy_search,
    transducer_loss,
)
from .conformer import (
    ConformerConfig,
    _encoder_body,
    _warn_pipeline_dropout,
    pipelined_encoder_forward,
    stack_block_params,
    unstack_block_params,
)

__all__ = [
    "TransducerConfig",
    "ConformerTransducer",
    "lookup_lm_fusion",
    "make_transducer_train_step",
    "make_transducer_pipeline_train_step",
    "streaming_transducer_beam",
    "streaming_transducer_greedy",
    "transducer_partition_rules",
    "transducer_pipeline_partition_rules",
    "transducer_stack_block_params",
    "transducer_unstack_block_params",
]


def lookup_lm_fusion(lm, batch_size: int, vocab_pad: int = 1):
    """Shallow-fusion hooks for :func:`transducer_beam_search` from a
    :class:`pydrobert_tpu.lm.LookupLanguageModel`.

    The LM state is a rolling ``(B, Ng - 1)`` context window (earliest
    first); each emitted token shifts it and one dense
    ``calc_idx_log_probs`` row scores the next position. Returned rows are
    log-softmaxed (the same normalization
    :class:`~pydrobert_tpu.ops.decoding.CTCPrefixSearch` applies before
    fusing) and right-padded with `vocab_pad` columns so they align with a
    joint whose blank sits past the LM vocabulary (the pad is never read).
    Returns ``(lm_step, init_lp, init_state)``.
    """
    import jax.numpy as jnp

    K = max(lm.max_ngram - 1, 1)

    def row(ctx):
        lp, _ = lm.calc_idx_log_probs(ctx.T, {}, jnp.asarray(K, jnp.int32))
        lp = jax.nn.log_softmax(lp, -1)
        return jnp.pad(lp, ((0, 0), (0, vocab_pad)))

    def lm_step(tok, ctx):
        new_ctx = jnp.concatenate([ctx[:, 1:], tok[:, None]], 1)
        return row(new_ctx), new_ctx

    ctx0 = jnp.full((batch_size, K), lm.sos, jnp.int32)
    return lm_step, row(ctx0), ctx0


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    """Hyperparameters for :class:`ConformerTransducer`."""

    encoder: ConformerConfig = ConformerConfig()
    pred_dim: int = 256
    joint_dim: int = 256

    @property
    def vocab_size(self) -> int:
        return self.encoder.vocab_size  # blank = vocab_size (last index)


class _Encoder(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, feats, lens, deterministic: bool = True, pos_offset=0):
        # shared body: one definition of mask/subsample/posemb/blocks
        # (incl. remat and seq-sharding handling) across all models
        x, _, out_lens = _encoder_body(
            self.cfg, feats, lens, deterministic, pos_offset
        )
        return x.astype(jnp.float32), out_lens


class _Predictor(nn.Module):
    """Embedding + unidirectional LSTM over blank-prefixed label history."""

    cfg: TransducerConfig

    def setup(self):
        V = self.cfg.vocab_size
        self.embed = nn.Embed(V + 1, self.cfg.pred_dim, name="embed")
        self.cell = nn.OptimizedLSTMCell(self.cfg.pred_dim, name="lstm")

    def __call__(self, toks):
        """Full-sequence pass for training: `toks` (N, U) -> (N, U+1, P)
        outputs at each prefix (position 0 = blank-only history)."""
        N = toks.shape[0]
        start = jnp.full((N, 1), self.cfg.vocab_size, jnp.int32)  # blank/sos
        x = self.embed(jnp.concatenate([start, toks], 1))  # (N, U+1, P)
        carry = self.cell.initialize_carry(
            jax.random.PRNGKey(0), (N, self.cfg.pred_dim)
        )

        def body(cell, carry, x_t):
            return cell(carry, x_t)

        scan = nn.scan(
            body, variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        _, out = scan(self.cell, carry, x)
        return out  # (N, U+1, P)

    def step(self, tok, carry):
        """One decode step: advance on emitted token `tok` (N,)."""
        x = self.embed(tok)
        carry, out = self.cell(carry, x)
        return out, carry

    def init_carry(self, N):
        return self.cell.initialize_carry(
            jax.random.PRNGKey(0), (N, self.cfg.pred_dim)
        )


class _Joint(nn.Module):
    cfg: TransducerConfig

    @nn.compact
    def __call__(self, enc_t, pred_u):
        """Additive joint: broadcast-sum of projections -> logits (..., V+1).

        `enc_t` ``(..., D)`` and `pred_u` ``(..., P)`` must already be
        broadcast-compatible in their leading dims."""
        h = nn.Dense(self.cfg.joint_dim, name="enc_proj")(enc_t) + nn.Dense(
            self.cfg.joint_dim, name="pred_proj"
        )(pred_u)
        return nn.Dense(self.cfg.vocab_size + 1, name="out")(jnp.tanh(h))


class ConformerTransducer(nn.Module):
    """Conformer encoder + LSTM predictor + additive joint.

    ``apply(vars, feats, lens, refs, ref_lens)`` returns the mean
    transducer loss; ``method="greedy"`` decodes, ``method="encode"``
    exposes the encoder. The blank is index ``vocab_size``.
    """

    cfg: TransducerConfig

    def setup(self):
        self.encoder = _Encoder(self.cfg.encoder)
        self.predictor = _Predictor(self.cfg)
        self.joint = _Joint(self.cfg)

    def __call__(
        self, feats, lens, refs, ref_lens, deterministic: bool = True
    ):
        enc, enc_lens = self.encoder(feats, lens, deterministic)
        pred = self.predictor(refs)  # (N, U+1, P)
        blank_lp, emit_lp = self._node_log_probs(enc, pred, refs)
        return transducer_loss(blank_lp, emit_lp, enc_lens, ref_lens)

    def _node_log_probs(self, enc, pred, refs):
        """Stream the joint over time: one (N, U+1, V+1) slab per frame,
        reduced immediately; slabs recompute in the backward pass."""
        V = self.cfg.vocab_size
        oh = jax.nn.one_hot(refs, V + 1, dtype=jnp.float32)  # (N, U, V+1)

        def reduce_slab(lp):
            """(N, U+1, V+1) joint log-probs -> blank (N, U+1), emit (N, U)."""
            return lp[..., V], jnp.einsum("nuv,nuv->nu", lp[:, :-1], oh)

        if self.is_initializing():
            # one direct slab so every joint param is created without
            # materializing (or scanning) the full lattice
            b0, e0 = reduce_slab(
                jax.nn.log_softmax(self.joint(enc[:, 0][:, None], pred), -1)
            )
            T = enc.shape[1]
            return (
                jnp.broadcast_to(b0[:, None], (b0.shape[0], T, b0.shape[1])),
                jnp.broadcast_to(e0[:, None], (e0.shape[0], T, e0.shape[1])),
            )

        # pure re-applyable joint (bound-module calls can't sit under
        # jax.checkpoint; a functional apply over its captured params can)
        return _streamed_node_log_probs(
            self.cfg, self.joint.variables["params"], enc, pred, refs
        )

    def encode(self, feats, lens, deterministic: bool = True, pos_offset=0):
        return self.encoder(feats, lens, deterministic, pos_offset)

    def greedy(self, feats, lens, max_symbols_per_frame: int = 4):
        """Greedy RNN-T decode: ``(hyps (N, U_max), hyp_lens (N,))``."""
        enc, enc_lens = self.encoder(feats, lens, True)
        N = enc.shape[0]

        def pred_step(tok, carry):
            return self.predictor.step(tok, carry)

        def joint_fn(enc_t, pred_out):
            return self.joint(enc_t, pred_out)

        return transducer_greedy_search(
            enc,
            enc_lens,
            pred_step,
            joint_fn,
            self.predictor.init_carry(N),
            blank_idx=self.cfg.vocab_size,
            max_symbols_per_frame=max_symbols_per_frame,
        )

    def beam(
        self,
        feats,
        lens,
        width: int = 4,
        max_symbols_per_frame: int = 4,
        lm=None,
        lm_weight: float = 0.3,
    ):
        """Time-synchronous RNN-T beam search: ``(hyps (N, W, U_max),
        hyp_lens (N, W), scores (N, W))`` best-first. `lm` optionally
        shallow-fuses an external LM: a
        :class:`~pydrobert_tpu.lm.LookupLanguageModel` (adapted via
        :func:`lookup_lm_fusion`) or a prebuilt ``(lm_step, init_lp,
        init_state)`` triple."""
        enc, enc_lens = self.encoder(feats, lens, True)
        N = enc.shape[0]
        if lm is not None and not isinstance(lm, tuple):
            if lm.vocab_size != self.cfg.vocab_size:
                raise RuntimeError(
                    f"fused LM vocab {lm.vocab_size} != model vocab "
                    f"{self.cfg.vocab_size}"
                )
            lm = lookup_lm_fusion(lm, N)
        return transducer_beam_search(
            enc,
            enc_lens,
            lambda tok, carry: self.predictor.step(tok, carry),
            lambda enc_t, pred_out: self.joint(enc_t, pred_out),
            self.predictor.init_carry(N),
            blank_idx=self.cfg.vocab_size,
            width=width,
            max_symbols_per_frame=max_symbols_per_frame,
            lm=lm,
            lm_weight=lm_weight,
        )


def streaming_transducer_greedy(
    model: "ConformerTransducer",
    params,
    feats: jax.Array,
    lens: jax.Array,
    chunk: int,
    max_symbols_per_frame: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming RNN-T recognition: chunked causal encoding + incremental
    greedy decode — emits EXACTLY the one-shot ``method="greedy"``
    hypotheses, computed `chunk` (post-subsampling) frames at a time.

    The encoder side mirrors
    :func:`pydrobert_tpu.models.conformer.streaming_logits` (same causal
    config requirements — ``attention_context=(L, 0)``, ``causal_conv`` —
    and the same recomputed receptive-field margin ``R``); the decode side
    threads the :func:`pydrobert_tpu.ops.transducer.transducer_greedy_advance`
    carry (hypothesis buffer, predictor LSTM state, per-frame symbol cap)
    across chunks, so per-chunk latency is O(chunk + R) encoder frames plus
    the symbols emitted in the chunk. Returns ``(hyps (N, U_max), hyp_lens
    (N,))`` with ``U_max = max_symbols_per_frame * ceil4(T)``, padded with
    the blank. The host loop compiles one program per distinct chunk shape
    (at most three: first/steady/last).
    """
    from ..ops.transducer import (
        transducer_greedy_advance,
        transducer_greedy_init,
    )

    cfg = model.cfg
    ecfg = cfg.encoder
    left, right = ecfg.attention_context
    if left is None or right != 0 or not ecfg.causal_conv:
        raise ValueError(
            "streaming_transducer_greedy requires a causal encoder config: "
            "attention_context=(L, 0) with finite L and causal_conv=True "
            f"(got attention_context={ecfg.attention_context}, "
            f"causal_conv={ecfg.causal_conv})"
        )
    if chunk < 1:
        raise ValueError(f"chunk must be positive, got {chunk}")
    R = ecfg.num_layers * (int(left) + ecfg.conv_kernel - 1)
    N, T = feats.shape[:2]
    T4 = -(-(-(-T // 2)) // 2)  # ceil-div by 2, twice
    out_lens = -(-(-(-lens // 2)) // 2)

    pred = _Predictor(cfg, parent=None)
    joint = _Joint(cfg, parent=None)

    def make_steps(p):
        def pred_step(tok, state):
            return pred.apply({"params": p["predictor"]}, tok, state,
                              method="step")

        def joint_fn(enc_t, pred_out):
            return joint.apply({"params": p["joint"]}, enc_t, pred_out)

        return pred_step, joint_fn

    pred_step, _ = make_steps(params)
    init_state = pred.apply(
        {"params": params["predictor"]}, N, method="init_carry"
    )
    carry = transducer_greedy_init(
        N, int(max_symbols_per_frame) * T4, pred_step, init_state,
        cfg.vocab_size,
    )

    # params ride as jit ARGUMENTS (not baked-in constants): one compile
    # per chunk shape serves any checkpoint of this architecture
    @jax.jit
    def advance(p, carry, enc_chunk, chunk_lens):
        ps, jf = make_steps(p)
        return transducer_greedy_advance(
            enc_chunk, chunk_lens, ps, jf, cfg.vocab_size,
            carry, max_symbols_per_frame,
        )

    for o0 in range(0, T4, chunk):
        o1 = min(o0 + chunk, T4)
        # +1 margin row: see streaming_logits (same subsampler lookback)
        m0 = max(o0 - R - 1, 0)
        i0, i1 = 4 * m0, min(4 * o1, T)
        f = feats[:, i0:i1]
        l = jnp.clip(lens - i0, 0, i1 - i0)
        enc, _ = model.apply(
            {"params": params}, f, l, True, m0, method="encode"
        )
        enc_chunk = enc[:, o0 - m0 : o1 - m0]
        chunk_lens = jnp.clip(out_lens - o0, 0, o1 - o0)
        carry = advance(params, carry, enc_chunk, chunk_lens)
    _, u, hyps, _, _ = carry
    return hyps, u


def streaming_transducer_beam(
    model: "ConformerTransducer",
    params,
    feats: jax.Array,
    lens: jax.Array,
    chunk: int,
    width: int = 4,
    max_symbols_per_frame: int = 4,
    lm=None,
    lm_weight: float = 0.3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Streaming RNN-T *beam* recognition — the width-`width` analogue of
    :func:`streaming_transducer_greedy` (same causal-config requirements,
    chunked-margin encoding, and exact parity with the one-shot
    ``method="beam"`` search). The beam carry — per-beam scores,
    hypothesis buffers, predictor states, and (optionally) shallow-fusion
    LM states — threads across chunks; every hypothesis closes with a
    blank before each new frame, so chunk boundaries are invisible to the
    search. Returns ``(hyps (N, W, U_max), hyp_lens (N, W), scores
    (N, W))`` best-first."""
    from ..ops.transducer import (
        transducer_beam_advance,
        transducer_beam_finalize,
        transducer_beam_init,
    )

    cfg = model.cfg
    ecfg = cfg.encoder
    left, right = ecfg.attention_context
    if left is None or right != 0 or not ecfg.causal_conv:
        raise ValueError(
            "streaming_transducer_beam requires a causal encoder config: "
            "attention_context=(L, 0) with finite L and causal_conv=True "
            f"(got attention_context={ecfg.attention_context}, "
            f"causal_conv={ecfg.causal_conv})"
        )
    if chunk < 1:
        raise ValueError(f"chunk must be positive, got {chunk}")
    R = ecfg.num_layers * (int(left) + ecfg.conv_kernel - 1)
    N, T = feats.shape[:2]
    T4 = -(-(-(-T // 2)) // 2)
    out_lens = -(-(-(-lens // 2)) // 2)

    pred = _Predictor(cfg, parent=None)
    joint = _Joint(cfg, parent=None)

    def make_steps(p):
        def pred_step(tok, state):
            return pred.apply({"params": p["predictor"]}, tok, state,
                              method="step")

        def joint_fn(enc_t, pred_out):
            return joint.apply({"params": p["joint"]}, enc_t, pred_out)

        return pred_step, joint_fn

    if lm is not None and not isinstance(lm, tuple):
        if lm.vocab_size != cfg.vocab_size:
            raise RuntimeError(
                f"fused LM vocab {lm.vocab_size} != model vocab "
                f"{cfg.vocab_size}"
            )
        lm = lookup_lm_fusion(lm, N)
    lm_step = None if lm is None else lm[0]

    pred_step, _ = make_steps(params)
    init_state = pred.apply(
        {"params": params["predictor"]}, N, method="init_carry"
    )
    carry = transducer_beam_init(
        N, width, int(max_symbols_per_frame) * T4, pred_step, init_state,
        cfg.vocab_size, lm,
    )

    @jax.jit
    def advance(p, carry, enc_chunk, chunk_lens):
        ps, jf = make_steps(p)
        return transducer_beam_advance(
            enc_chunk, chunk_lens, ps, jf, cfg.vocab_size, carry,
            max_symbols_per_frame, lm_step=lm_step, lm_weight=lm_weight,
        )

    for o0 in range(0, T4, chunk):
        o1 = min(o0 + chunk, T4)
        m0 = max(o0 - R - 1, 0)
        i0, i1 = 4 * m0, min(4 * o1, T)
        f = feats[:, i0:i1]
        l = jnp.clip(lens - i0, 0, i1 - i0)
        enc, _ = model.apply(
            {"params": params}, f, l, True, m0, method="encode"
        )
        carry = advance(
            params,
            carry,
            enc[:, o0 - m0 : o1 - m0],
            jnp.clip(out_lens - o0, 0, o1 - o0),
        )
    return transducer_beam_finalize(carry)


def _streamed_node_log_probs(cfg: "TransducerConfig", jparams, enc, pred, refs):
    """Functional streamed-joint core shared by the bound model and the
    pipelined train step: one ``(N, U+1, V+1)`` joint slab per encoder frame
    under ``jax.checkpoint``, reduced immediately to the blank ``(N, T, U+1)``
    and emit ``(N, T, U)`` log-probabilities (the slab rematerializes in the
    backward pass; the full lattice tensor is never held)."""
    V = cfg.vocab_size
    oh = jax.nn.one_hot(refs, V + 1, dtype=jnp.float32)  # (N, U, V+1)
    jdef = _Joint(cfg, parent=None)  # detached: pure apply only

    @jax.checkpoint
    def frame(enc_t):
        lp = jax.nn.log_softmax(
            jdef.apply({"params": jparams}, enc_t[:, None], pred), axis=-1
        )
        return lp[..., V], jnp.einsum("nuv,nuv->nu", lp[:, :-1], oh)

    blank_lp, emit_lp = jax.lax.map(frame, jnp.moveaxis(enc, 1, 0))
    return jnp.moveaxis(blank_lp, 0, 1), jnp.moveaxis(emit_lp, 0, 1)


def transducer_stack_block_params(params, pipeline_parallelism: int):
    """ConformerTransducer params -> pipeline form: the encoder's ``block_i``
    subtrees stack stage-major (:func:`~pydrobert_tpu.models.conformer.
    stack_block_params`); predictor/joint subtrees are unchanged."""
    out = dict(params)
    out["encoder"] = stack_block_params(params["encoder"], pipeline_parallelism)
    return out


def transducer_unstack_block_params(pparams):
    """Inverse of :func:`transducer_stack_block_params`."""
    out = dict(pparams)
    out["encoder"] = unstack_block_params(pparams["encoder"])
    return out


def transducer_pipeline_partition_rules(path, leaf):
    """Partition rules for pipeline-form transducer params: the encoder
    block stack shards its stage dim over ``pipe``; everything else keeps
    :func:`transducer_partition_rules`' tensor-parallel layout."""
    from jax.sharding import PartitionSpec

    names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    if len(names) >= 2 and names[0] == "encoder" and names[1] == "blocks":
        return PartitionSpec("pipe")
    return transducer_partition_rules(path, leaf)


def make_transducer_pipeline_train_step(
    model: "ConformerTransducer",
    optimizer: optax.GradientTransformation,
    mesh,
    n_microbatches: int,
    augment: Optional[Callable] = None,
) -> Callable:
    """Pipeline-parallel variant of :func:`make_transducer_train_step`.

    The conformer encoder's block stack runs as GPipe stages over `mesh`'s
    ``pipe`` axis (:func:`~pydrobert_tpu.models.conformer.
    pipelined_encoder_forward`); the predictor, streamed joint, and
    transducer loss run un-pipelined after it (their tensor-parallel
    shardings still apply). Operates on pipeline-form params
    (:func:`transducer_stack_block_params`); deterministic forward — dropout
    is not applied (regularize via `augment`)."""
    cfg = model.cfg
    _warn_pipeline_dropout(cfg.encoder)

    def loss_fn(pparams, key, feats, feat_lens, refs, ref_lens):
        if augment is not None:
            feats = augment(key, feats, feat_lens)
        x, _, out_lens = pipelined_encoder_forward(
            cfg.encoder, pparams["encoder"], feats, feat_lens,
            mesh, n_microbatches,
        )
        enc = x.astype(jnp.float32)
        pred = _Predictor(cfg, parent=None).apply(
            {"params": pparams["predictor"]}, refs
        )
        blank_lp, emit_lp = _streamed_node_log_probs(
            cfg, pparams["joint"], enc, pred, refs
        )
        return transducer_loss(blank_lp, emit_lp, out_lens, ref_lens)

    def step(pparams, opt_state, key, feats, feat_lens, refs, ref_lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            pparams, key, feats, feat_lens, refs, ref_lens
        )
        updates, opt_state = optimizer.update(grads, opt_state, pparams)
        pparams = optax.apply_updates(pparams, updates)
        return pparams, opt_state, loss

    return step


def transducer_partition_rules(path, leaf):
    """Tensor-parallel PartitionSpec for a ConformerTransducer param path.

    The encoder subtree reuses
    :func:`pydrobert_tpu.models.conformer.conformer_partition_rules`
    (Megatron-style expand/contract splits). In the joint, ``enc_proj`` /
    ``pred_proj`` split their *output* features and ``out`` its *input*
    features over the ``model`` axis (one psum per joint evaluation, which
    XLA derives from the shardings). The embedding and LSTM stay replicated
    (the LSTM's recurrence is serial — sharding its gates would put a
    collective inside every scan step)."""
    from jax.sharding import PartitionSpec

    from .conformer import conformer_partition_rules

    names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    joined = "/".join(names)
    if names and names[0] == "encoder":
        return conformer_partition_rules(path[1:], leaf)
    if leaf.ndim == 2 and names[-1] == "kernel":
        if "enc_proj" in joined or "pred_proj" in joined:
            return PartitionSpec(None, "model")
        if joined.endswith("out/kernel"):
            return PartitionSpec("model", None)
    return PartitionSpec()


def make_transducer_train_step(
    model: ConformerTransducer,
    optimizer: optax.GradientTransformation,
    augment: Optional[Callable] = None,
) -> Callable:
    """``step(params, opt_state, key, feats, feat_lens, refs, ref_lens) ->
    (params, opt_state, loss)`` — jittable, shardable like
    :func:`pydrobert_tpu.models.make_train_step`."""

    moe = model.cfg.encoder.num_experts > 1

    def loss_fn(params, key, feats, feat_lens, refs, ref_lens):
        from .conformer import moe_aux_loss

        k_aug, k_drop = jax.random.split(key)
        if augment is not None:
            feats = augment(k_aug, feats, feat_lens)
        out = model.apply(
            {"params": params},
            feats,
            feat_lens,
            refs,
            ref_lens,
            deterministic=False,
            rngs={"dropout": k_drop},
            mutable=["losses"] if moe else False,
        )
        if moe:
            loss, muts = out
            return loss + model.cfg.encoder.moe_aux_weight * moe_aux_loss(muts)
        return out

    def step(params, opt_state, key, feats, feat_lens, refs, ref_lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, key, feats, feat_lens, refs, ref_lens
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
