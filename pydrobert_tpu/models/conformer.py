"""Conformer CTC acoustic model (flax.linen), TPU-first.

The flagship model family: a convolution-subsampled Conformer encoder with a
CTC head, written for the MXU — big batched matmuls in ``bfloat16`` compute
dtype with ``float32`` params/accumulation, static shapes, mask-based length
handling, and tensor-parallel-ready weight layouts (see
:func:`conformer_partition_rules`).

The reference library has no model zoo; its docs train user models around its
ops. This model exists so the package's benchmarks, training controller, and
decoding stack have a canonical end-to-end consumer (SURVEY.md §7, minimum
end-to-end slice).
"""

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec

__all__ = [
    "ConformerConfig",
    "ConformerCTC",
    "conformer_partition_rules",
    "make_train_step",
    "moe_aux_loss",
    "make_pipelined_forward",
    "make_pipeline_train_step",
    "pipeline_partition_rules",
    "pipelined_encoder_forward",
    "stack_block_params",
    "streaming_logits",
    "unstack_block_params",
]


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    """Hyperparameters for :class:`ConformerCTC`."""

    vocab_size: int = 1024  # excludes the CTC blank (blank = vocab_size)
    num_filts: int = 80
    d_model: int = 256
    num_layers: int = 8
    num_heads: int = 4
    ffn_factor: int = 4
    conv_kernel: int = 15
    subsample_channels: int = 128
    dropout: float = 0.1
    # attention-WEIGHT dropout, separate from `dropout`: a nonzero rate
    # forces the (B, H, T', T') attention-probability tensor to be
    # materialized (and stored for backward) just to mask it — at the
    # flagship shape that is ~640 MB of HBM traffic per layer per step,
    # measured as a large fraction of the training step on TPU. Common
    # conformer recipes regularize with residual/FFN dropout only — e.g.
    # torch's own nn.MultiheadAttention and flax's
    # MultiHeadDotProductAttention both default their attention-weight
    # dropout to 0.0 independently of the model's residual dropout — so
    # the default here is 0.0; set it explicitly if you want
    # attn_dropout == dropout (the r1-r3 behavior; the bench carries a
    # train_step_per_sec_attn_dropout field at 0.1 so the two configs
    # stay comparable).
    attn_dropout: float = 0.0
    dtype: Any = jnp.bfloat16  # compute dtype; params stay float32
    # sequence parallelism: a sharding (e.g. NamedSharding(mesh,
    # PartitionSpec("data", "model")) from
    # :func:`pydrobert_tpu.parallel.sequence_sharding`) constrained onto the
    # (N, T', d_model) activations at every block boundary. The per-position
    # work (layernorms, residuals, dropout) then runs with the time axis
    # sharded over the tensor-parallel chips; XLA inserts the
    # all-gather/reduce-scatter pairs around the attention/FFN matmuls.
    seq_sharding: Any = None
    # limited attention context (left, right) in post-subsampling frames:
    # each query attends keys in [q - left, q + right] only (banded mask).
    # (None, None) = full context. Finite windows bound the receptive
    # field and per-frame lookahead latency (streaming/serving). NOTE:
    # this is a mask over the full (T, T) score matrix — compute/memory
    # remain O(T^2) in one shot; :func:`streaming_logits` is the chunked
    # serving loop that makes the cost actually linear in T for causal
    # configs. The depthwise conv still adds (conv_kernel - 1) // 2
    # frames of lookahead per block unless causal_conv is set, which
    # left-pads instead (no future frames anywhere in the conv path).
    attention_context: Tuple[Optional[int], Optional[int]] = (None, None)
    causal_conv: bool = False
    # gradient checkpointing: rematerialize each block's activations in the
    # backward pass instead of storing them (standard memory-for-FLOPs
    # trade; lets T/N/num_layers scale past HBM on the forward residuals)
    remat: bool = False
    # Mixture-of-Experts: when num_experts > 1, each block's SECOND
    # feed-forward becomes a token-routed expert layer (_MoEFeedForward —
    # GShard-style top-k routing with static per-expert capacity buffers).
    # Expert weights carry a leading (num_experts, ...) dim sharded over
    # the "model" mesh axis (see conformer_partition_rules): expert
    # parallelism, with XLA deriving the dispatch/combine collectives from
    # the shardings. Router aux (load-balance) losses are sown into the
    # "losses" collection; make_train_step adds them with moe_aux_weight.
    num_experts: int = 1
    expert_top_k: int = 2
    expert_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01

    @property
    def subsampling(self) -> int:
        return 4


class _FastDropout(nn.Module):
    """Drop-in for ``nn.Dropout``: keep mask thresholds raw uint8 PRNG
    bits instead of materializing uniform f32s (``random.bernoulli``
    converts bits -> f32 in [0,1) first) — a quarter of the mask-bit HBM
    traffic across the flagship step's 40 activation-sized sites.

    Measured on the d512/L8/B32/T1000 step (TPU v5 lite, same phase):
    uint8 bits 27.5 steps/s vs flax ``nn.Dropout`` 27.0, uint32 bits
    26.5, uint16 25.1; wrapping the apply in ``jax.checkpoint`` to
    regenerate masks in backward LOSES (23.4 — XLA already avoids
    storing the f32 masks, and the remat barrier breaks fusions).

    Drop probability is quantized to 1/256 (|realized - rate| <= 1/512;
    at the default 0.1 the realized rate is 26/256 ~ 0.1016, and rates
    below 1/512 round to no-op), and the inverted scale uses the
    REALIZED keep probability ``(256 - cutoff)/256`` so E[output] == x
    exactly — scaling by ``1/(1 - rate)`` against the quantized mask
    would shrink activations ~0.17%/site at rate 0.1. The realized
    masks differ from ``nn.Dropout``'s, which no API promises.
    """

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        if self.rate >= 1.0:
            return jnp.zeros_like(x)
        cutoff = min(round(float(self.rate) * 256.0), 255)
        if cutoff == 0:
            return x
        key = self.make_rng("dropout")
        scale = 256.0 / (256.0 - cutoff)
        bits = jax.random.bits(key, x.shape, dtype=jnp.uint8)
        return jnp.where(
            bits >= jnp.uint8(cutoff), x * jnp.asarray(scale, x.dtype), 0
        )


def _sinusoidal_pos_emb(T: int, d: int, dtype, offset=0) -> jax.Array:
    # `offset` shifts the absolute positions (streaming chunks encode with
    # their true global positions; int offsets are exact in f32 < 2**24)
    pos = (jnp.arange(T) + offset).astype(jnp.float32)[:, None]
    dim = jnp.arange(0, d, 2, dtype=jnp.float32)[None]
    angles = pos / jnp.power(10000.0, dim / d)
    emb = jnp.zeros((T, d), jnp.float32)
    emb = emb.at[:, 0::2].set(jnp.sin(angles))
    emb = emb.at[:, 1::2].set(jnp.cos(angles[:, : (d // 2)]))
    return emb.astype(dtype)


class _FeedForward(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        cfg = self.cfg
        x = nn.LayerNorm(dtype=cfg.dtype, name="ln")(x)
        x = nn.Dense(cfg.d_model * cfg.ffn_factor, dtype=cfg.dtype, name="wi")(x)
        x = nn.silu(x)
        x = _FastDropout(cfg.dropout, deterministic=deterministic)(x)
        x = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="wo")(x)
        return _FastDropout(cfg.dropout, deterministic=deterministic)(x)


class _MoEFeedForward(nn.Module):
    """Mixture-of-Experts feed-forward: top-k routed experts, GShard-style.

    TPU-first formulation: routing is *dense algebra with static shapes* —
    per-expert capacity buffers of ``C = ceil(S * k * capacity_factor / E)``
    tokens (``S`` tokens in the batch), a ``(S, E, C)`` dispatch one-hot
    built from a cumulative-sum rank (choice-slot-major, so every token's
    first choice outranks any token's second), and three einsums
    (dispatch -> expert FFNs -> combine) that the MXU eats whole. Tokens
    past an expert's capacity are dropped for that choice (the block's
    residual connection passes them through); padded frames never route.
    Expert weights ``wi (E, d, f)`` / ``wo (E, f, d)`` shard their leading
    expert dim over the ``model`` mesh axis — expert parallelism, with XLA
    deriving the all-to-all-equivalent collectives from the shardings.

    The Switch-Transformer load-balance loss ``E * sum_e f_e * P_e`` (f_e:
    fraction of tokens whose top-1 is e; P_e: mean router prob of e) is
    sown into the ``"losses"`` collection; callers that train MoE configs
    must apply with ``mutable=["losses"]`` and add it (handled by
    :func:`make_train_step` / :func:`make_transducer_train_step`).
    """

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool):
        cfg = self.cfg
        E = int(cfg.num_experts)
        k = min(int(cfg.expert_top_k), E)
        d = cfg.d_model
        f = d * cfg.ffn_factor
        N, T, _ = x.shape
        S = N * T
        C = max(1, -(-int(S * k * cfg.expert_capacity_factor) // E))

        y = nn.LayerNorm(dtype=cfg.dtype, name="ln")(x)
        yf = y.reshape(S, d)
        valid = pad_mask.reshape(S).astype(jnp.float32)
        # router in f32: tiny matmul, and softmax/top-k ties are dtype-touchy
        logits = nn.Dense(E, dtype=jnp.float32, name="gate")(
            yf.astype(jnp.float32)
        )
        probs = jax.nn.softmax(logits, -1) * valid[:, None]  # (S, E)
        gvals, gidx = jax.lax.top_k(probs, k)  # (S, k)
        if k > 1:
            # GShard-style renormalization over the chosen experts
            gvals = gvals / jnp.clip(gvals.sum(-1, keepdims=True), 1e-9, None)
            gvals = gvals * valid[:, None]
        # k == 1 keeps the RAW router probability as the gate value
        # (Switch): renormalizing a single choice to 1.0 would cut the
        # router out of the main-loss gradient entirely

        # one-hot expert assignment per choice slot, slot-major so slot 0
        # (every token's best expert) claims capacity before any slot 1
        assign = jax.nn.one_hot(gidx, E, dtype=jnp.float32) * (
            gvals > 0
        ).astype(jnp.float32)[..., None]  # (S, k, E)
        assign_sk = jnp.moveaxis(assign, 1, 0).reshape(k * S, E)
        pos = jnp.cumsum(assign_sk, 0) - assign_sk  # tokens ahead in buffer
        keep = (pos < C) & (assign_sk > 0)
        pos_oh = jax.nn.one_hot(
            pos.astype(jnp.int32), C, dtype=jnp.float32
        ) * keep[..., None].astype(jnp.float32)  # (kS, E, C)
        disp = pos_oh.reshape(k, S, E, C)
        dispatch = disp.sum(0)  # (S, E, C) in {0, 1}
        combine = (disp * jnp.moveaxis(gvals, 1, 0)[..., None, None]).sum(0)

        wi = self.param(
            "wi", nn.initializers.lecun_normal(), (E, d, f), jnp.float32
        ).astype(cfg.dtype)
        bi = self.param("bi", nn.initializers.zeros, (E, f), jnp.float32).astype(
            cfg.dtype
        )
        wo = self.param(
            "wo", nn.initializers.lecun_normal(), (E, f, d), jnp.float32
        ).astype(cfg.dtype)
        bo = self.param("bo", nn.initializers.zeros, (E, d), jnp.float32).astype(
            cfg.dtype
        )
        xe = jnp.einsum(
            "sec,sd->ecd", dispatch.astype(cfg.dtype), yf.astype(cfg.dtype)
        )
        h = nn.silu(jnp.einsum("ecd,edf->ecf", xe, wi) + bi[:, None])
        h = _FastDropout(cfg.dropout, deterministic=deterministic)(h)
        oe = jnp.einsum("ecf,efd->ecd", h, wo) + bo[:, None]
        out = jnp.einsum("sec,ecd->sd", combine.astype(cfg.dtype), oe)

        # Switch load-balance aux loss over valid tokens
        nvalid = jnp.clip(valid.sum(), 1.0, None)
        top1 = jax.nn.one_hot(gidx[:, 0], E, dtype=jnp.float32) * valid[:, None]
        f_e = top1.sum(0) / nvalid
        p_e = probs.sum(0) / nvalid
        self.sow("losses", "moe_aux", E * jnp.sum(f_e * p_e))

        out = out.reshape(N, T, d)
        return _FastDropout(cfg.dropout, deterministic=deterministic)(out)


class _MHSA(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool):
        cfg = self.cfg
        y = nn.LayerNorm(dtype=cfg.dtype, name="ln")(x)
        # (N, 1, 1, T): every query may attend any unpadded key
        attn_mask = pad_mask[:, None, None, :]
        left, right = cfg.attention_context
        if left is not None or right is not None:
            # banded (streaming) attention: static mask, linear-in-T cost
            T = x.shape[1]
            q = jnp.arange(T, dtype=jnp.int32)[:, None]
            k = jnp.arange(T, dtype=jnp.int32)[None]
            band = jnp.ones((T, T), bool)
            if left is not None:
                band = band & (k >= q - int(left))
            if right is not None:
                band = band & (k <= q + int(right))
            attn_mask = attn_mask & band[None, None]
        y = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads,
            dtype=cfg.dtype,
            dropout_rate=cfg.attn_dropout,
            deterministic=deterministic,
            name="attn",
        )(y, y, mask=attn_mask)
        return _FastDropout(cfg.dropout, deterministic=deterministic)(y)


class _DepthwiseConv1D(nn.Module):
    """Depthwise conv as K shifted multiply-adds.

    Equivalent to ``nn.Conv(feature_group_count=C)`` but avoids
    grouped-convolution gradients, which the XLA SPMD partitioner
    miscompiles under batch sharding (verified on the CPU backend); this
    formulation is pure VPU work and partitions trivially.
    """

    kernel_size: int
    dtype: Any
    causal: bool = False

    @nn.compact
    def __call__(self, y):
        K = self.kernel_size
        C = y.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (K, C), jnp.float32
        ).astype(self.dtype)
        b = self.param("bias", nn.initializers.zeros, (C,), jnp.float32).astype(
            self.dtype
        )
        left = K - 1 if self.causal else (K - 1) // 2
        yp = jnp.pad(y, ((0, 0), (left, K - 1 - left), (0, 0)))
        T = y.shape[1]
        out = b
        for k in range(K):
            out = out + yp[:, k : k + T] * w[k]
        return out


class _ConvModule(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool):
        cfg = self.cfg
        y = nn.LayerNorm(dtype=cfg.dtype, name="ln")(x)
        y = nn.Dense(2 * cfg.d_model, dtype=cfg.dtype, name="pw1")(y)
        y = nn.glu(y, axis=-1)
        # zero padded frames so the depthwise conv cannot leak across lengths
        y = y * pad_mask[..., None].astype(y.dtype)
        y = _DepthwiseConv1D(
            cfg.conv_kernel, cfg.dtype, cfg.causal_conv, name="dw"
        )(y)
        # LayerNorm in place of the paper's BatchNorm: per-position, so it
        # jits/shards cleanly (no cross-device or cross-time batch stats)
        y = nn.LayerNorm(dtype=cfg.dtype, name="norm")(y)
        y = nn.silu(y)
        y = nn.Dense(cfg.d_model, dtype=cfg.dtype, name="pw2")(y)
        return _FastDropout(cfg.dropout, deterministic=deterministic)(y)


class _ConformerBlock(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool):
        cfg = self.cfg
        x = x + 0.5 * _FeedForward(cfg, name="ffn1")(x, deterministic)
        x = x + _MHSA(cfg, name="mhsa")(x, pad_mask, deterministic)
        x = x + _ConvModule(cfg, name="conv")(x, pad_mask, deterministic)
        if cfg.num_experts > 1:
            x = x + 0.5 * _MoEFeedForward(cfg, name="moe")(
                x, pad_mask, deterministic
            )
        else:
            x = x + 0.5 * _FeedForward(cfg, name="ffn2")(x, deterministic)
        return nn.LayerNorm(dtype=cfg.dtype, name="ln_out")(x)


class _ConvSubsample(nn.Module):
    """Two stride-2 2-D convs over (time, freq): 4x time reduction.

    Explicit (1, 1) padding instead of SAME: SAME's pad split depends on
    the input length's parity, which shifts every conv window when the
    length changes — with fixed padding, output row ``j`` always reads
    input frames ``[4j - 3, 4j + 3]`` regardless of length, so streaming
    chunks (:func:`streaming_logits`) align exactly with the one-shot
    forward. Output frame count is unchanged (``ceil(T / 4)`` overall).
    """

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, feats):
        cfg = self.cfg
        x = feats[..., None]  # (N, T, F, 1)
        x = nn.Conv(
            cfg.subsample_channels, (3, 3), strides=(2, 2), dtype=cfg.dtype,
            padding=((1, 1), (1, 1)), name="conv1",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            cfg.subsample_channels, (3, 3), strides=(2, 2), dtype=cfg.dtype,
            padding=((1, 1), (1, 1)), name="conv2",
        )(x)
        x = nn.relu(x)
        N, T4, F4, C = x.shape
        x = x.reshape(N, T4, F4 * C)
        return nn.Dense(cfg.d_model, dtype=cfg.dtype, name="proj")(x)


def _encoder_body(
    cfg: ConformerConfig, feats, lens, deterministic: bool, pos_offset=0
):
    """The shared conformer encoder: mask -> subsample -> posemb ->
    dropout -> block stack. Must be called inside an ``nn.compact``
    context; submodule names (``subsample``, ``block_i``) land on the
    CALLER's scope, so every consumer (``ConformerCTC``, the transducer's
    encoder, the pipelined forward's un-pipelined front) shares one
    definition — and one remat/seq-sharding implementation — without
    changing its param tree. Returns ``(x (N, T', d_model), pad_mask,
    out_lens)``."""
    in_mask = jnp.arange(feats.shape[1])[None] < lens[:, None]
    # zero frames past each utterance's length so no garbage leaks through
    # the SAME-padded subsampling convs into the last valid frame
    feats = feats * in_mask[..., None].astype(feats.dtype)
    x = _ConvSubsample(cfg, name="subsample")(feats.astype(cfg.dtype))
    out_lens = -(-(-(-lens // 2)) // 2)  # ceil-div by 2, twice
    T4 = x.shape[1]
    pad_mask = jnp.arange(T4)[None] < out_lens[:, None]  # (N, T')
    x = x + _sinusoidal_pos_emb(T4, cfg.d_model, cfg.dtype, pos_offset)[None]
    x = _FastDropout(cfg.dropout, deterministic=deterministic)(x)
    block_cls = (
        nn.remat(_ConformerBlock, static_argnums=(3,))
        if cfg.remat
        else _ConformerBlock
    )
    for i in range(cfg.num_layers):
        if cfg.seq_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, cfg.seq_sharding)
        x = block_cls(cfg, name=f"block_{i}")(x, pad_mask, deterministic)
    return x, pad_mask, out_lens


class ConformerCTC(nn.Module):
    """Conformer encoder + CTC head.

    Call with batch-major feats ``(N, T, num_filts)`` and lengths ``(N,)``;
    returns ``(logits, out_lens)`` where logits is ``(N, T', vocab_size + 1)``
    float32 with the blank at index ``vocab_size`` (the convention
    :class:`pydrobert_tpu.ops.decoding.CTCPrefixSearch` expects) and
    ``T' = ceil(ceil(T/2)/2)``.
    """

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, feats, lens, deterministic: bool = True, pos_offset=0):
        cfg = self.cfg
        x, _, out_lens = _encoder_body(
            cfg, feats, lens, deterministic, pos_offset
        )
        logits = nn.Dense(
            cfg.vocab_size + 1, dtype=jnp.float32, name="ctc_head"
        )(x.astype(jnp.float32))
        return logits, out_lens


def conformer_partition_rules(
    path: Tuple[Any, ...], leaf: jax.Array
) -> PartitionSpec:
    """Tensor-parallel PartitionSpec for a ConformerCTC param path.

    Layout follows the Megatron pattern XLA shards well: expand projections
    (ffn wi, attention qkv, ctc head) split their *output* features over the
    "model" axis; contract projections (ffn wo, attention out) split their
    *input* features, so each pair needs a single psum on the contract — XLA
    inserts it from these shardings. Everything else (norms, biases, convs)
    is replicated.
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    # expert parallelism: MoE expert weights shard their leading expert dim
    if "moe/" in joined or "/moe" in joined:
        if str(names[-1]) in ("wi", "wo") and leaf.ndim == 3:
            return PartitionSpec("model", None, None)
        if str(names[-1]) in ("bi", "bo") and leaf.ndim == 2:
            return PartitionSpec("model", None)
    if leaf.ndim >= 2 and names and str(names[-1]) == "kernel":
        if "wi/" in joined or joined.endswith("wi/kernel"):
            return PartitionSpec(None, "model")
        if "wo/" in joined or joined.endswith("wo/kernel"):
            return PartitionSpec("model", None)
        if any(f"attn/{w}" in joined for w in ("query", "key", "value")):
            # (embed, heads, head_dim): shard heads
            return PartitionSpec(None, "model", None)
        if "attn/out" in joined:
            return PartitionSpec("model", None, None)
        if "ctc_head" in joined:
            return PartitionSpec(None, "model")
    return PartitionSpec()


def streaming_logits(
    model: "ConformerCTC",
    params,
    feats: jax.Array,
    lens: jax.Array,
    chunk: int,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked (streaming) CTC logits for a *causal* config — equivalent
    output to ``model.apply`` but computed in post-subsampling chunks of
    `chunk` frames, recomputing only each chunk's receptive-field margin.

    Requires ``cfg.attention_context = (L, 0)`` with finite ``L`` and
    ``cfg.causal_conv = True`` (no future frames anywhere past the
    subsampler's fixed <=3-input-frame lookahead, which chunk boundaries
    respect by construction). Per-chunk compute/memory are O(chunk + R)
    where ``R = num_layers * (L + conv_kernel - 1)`` is the stack's total
    lookback — this is the "serving loop" that makes the banded-attention
    config's cost actually linear in T. Matches the one-shot forward to
    attention-softmax reduction order *within each utterance's
    ``out_lens``* (parity-pinned in tests); frames past ``out_lens`` are
    unspecified in both forwards (they are computed from zeroed/padded
    context that legitimately differs between the two).

    The host loop compiles one program per distinct chunk shape (at most
    three: first/steady/last).
    """
    cfg = model.cfg
    left, right = cfg.attention_context
    if left is None or right != 0 or not cfg.causal_conv:
        raise ValueError(
            "streaming_logits requires a causal config: "
            "attention_context=(L, 0) with finite L and causal_conv=True "
            f"(got attention_context={cfg.attention_context}, "
            f"causal_conv={cfg.causal_conv})"
        )
    if chunk < 1:
        raise ValueError(f"chunk must be positive, got {chunk}")
    R = cfg.num_layers * (int(left) + cfg.conv_kernel - 1)
    T = feats.shape[1]
    T4 = -(-(-(-T // 2)) // 2)  # ceil-div by 2, twice
    outs = []
    for o0 in range(0, T4, chunk):
        o1 = min(o0 + chunk, T4)
        # +1 margin row: subsample row m0 reads up to 3 input frames left
        # of the chunk (zero-padded here, real data in the full forward);
        # its error rides the maximal lookback chain exactly R rows
        m0 = max(o0 - R - 1, 0)
        i0, i1 = 4 * m0, min(4 * o1, T)
        f = feats[:, i0:i1]
        l = jnp.clip(lens - i0, 0, i1 - i0)
        logits, _ = model.apply(
            {"params": params}, f, l, True, m0
        )
        outs.append(logits[:, o0 - m0 : o1 - m0])
    logits = jnp.concatenate(outs, 1)
    out_lens = -(-(-(-lens // 2)) // 2)
    return logits, out_lens


# ---------------------------------------------------------------------------
# Pipeline parallelism: the conformer block stack as GPipe stages
# (pydrobert_tpu.parallel.pipeline) with the subsampler/CTC head outside the
# pipeline (where the tensor-parallel rules above still apply).
# ---------------------------------------------------------------------------


def stack_block_params(params, pipeline_parallelism: int):
    """ConformerCTC params -> pipeline form.

    The per-layer ``block_i`` subtrees become one ``blocks`` subtree whose
    leaves carry leading dims ``(pp, layers_per_stage, ...)`` — stage-major,
    ready to shard as ``PartitionSpec("pipe")`` (see
    :func:`pipeline_partition_rules`); all other subtrees are unchanged.
    ``num_layers`` must be divisible by `pipeline_parallelism`.
    """
    pp = pipeline_parallelism
    names = sorted(
        (k for k in params if k.startswith("block_")),
        key=lambda k: int(k.split("_")[1]),
    )
    L = len(names)
    if not L or L % pp:
        raise ValueError(f"num_layers {L} not divisible by pipeline {pp}")
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape((pp, L // pp) + xs[0].shape),
        *(params[k] for k in names),
    )
    out = {k: v for k, v in params.items() if not k.startswith("block_")}
    out["blocks"] = stacked
    return out


def unstack_block_params(pparams):
    """Inverse of :func:`stack_block_params` (back to ``block_i`` subtrees)."""
    out = {k: v for k, v in pparams.items() if k != "blocks"}
    blocks = pparams["blocks"]
    shape = jax.tree_util.tree_leaves(blocks)[0].shape
    L = shape[0] * shape[1]
    flat = jax.tree.map(lambda a: a.reshape((L,) + a.shape[2:]), blocks)
    for i in range(L):
        out[f"block_{i}"] = jax.tree.map(lambda a: a[i], flat)
    return out


def pipeline_partition_rules(
    path: Tuple[Any, ...], leaf: jax.Array
) -> PartitionSpec:
    """Partition rules for pipeline-form params: block stacks shard their
    stage dim over ``pipe``; everything outside the pipelined stack keeps
    the tensor-parallel layout of :func:`conformer_partition_rules`."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if names and str(names[0]) == "blocks":
        return PartitionSpec("pipe")
    return conformer_partition_rules(path, leaf)


def _pipeline_pre(cfg, pparams, feats, lens):
    """Shared (un-pipelined) front: mask, subsample, posemb. Mirrors
    :meth:`ConformerCTC.__call__` exactly (parity-pinned in tests)."""
    in_mask = jnp.arange(feats.shape[1])[None] < lens[:, None]
    feats = feats * in_mask[..., None].astype(feats.dtype)
    x = _ConvSubsample(cfg).apply(
        {"params": pparams["subsample"]}, feats.astype(cfg.dtype)
    )
    out_lens = -(-(-(-lens // 2)) // 2)
    T4 = x.shape[1]
    pad_mask = jnp.arange(T4)[None] < out_lens[:, None]
    x = x + _sinusoidal_pos_emb(T4, cfg.d_model, cfg.dtype)[None]
    return x, pad_mask, out_lens


def _warn_pipeline_dropout(cfg):
    import warnings

    if cfg.dropout:
        warnings.warn(
            "the pipelined forward is deterministic: cfg.dropout="
            f"{cfg.dropout} will NOT be applied (regularize via the augment "
            "hook, or set dropout=0.0 to silence this)",
            stacklevel=3,
        )
    if cfg.num_experts > 1:
        warnings.warn(
            "the pipelined forward routes MoE experts but DROPS the router "
            "load-balance aux loss (sown collections don't cross the "
            "pipeline's shard_map); train MoE configs with the "
            "non-pipelined step or accept unbalanced routing",
            stacklevel=3,
        )


def pipelined_encoder_forward(cfg, enc_pparams, feats, lens, mesh, n_microbatches):
    """Pipeline-form conformer encoder forward: front (mask/subsample/posemb)
    un-pipelined, block stack as GPipe stages over `mesh`'s ``pipe`` axis.

    Shared by the pipelined :class:`ConformerCTC` forward and the
    transducer's pipelined train step. Returns ``(x, pad_mask, out_lens)``
    like :func:`_encoder_body` (deterministic; see
    :func:`_warn_pipeline_dropout`)."""
    from ..parallel.pipeline import pipeline_apply

    def stage_fn(blk_params, x, pad_mask):
        def body(h, p):
            h = _ConformerBlock(cfg).apply({"params": p}, h, pad_mask, True)
            return h, None
        h, _ = jax.lax.scan(body, x, blk_params)
        return h

    x, pad_mask, out_lens = _pipeline_pre(cfg, enc_pparams, feats, lens)
    x = pipeline_apply(
        stage_fn,
        enc_pparams["blocks"],
        x,
        extras=pad_mask,
        mesh=mesh,
        n_microbatches=n_microbatches,
    )
    return x, pad_mask, out_lens


def make_pipelined_forward(model: "ConformerCTC", mesh, n_microbatches: int):
    """Build ``fwd(pparams, feats, lens) -> (logits, out_lens)`` running the
    block stack as a GPipe pipeline over `mesh`'s ``pipe`` axis.

    `pparams` is pipeline-form (:func:`stack_block_params`). The forward is
    deterministic (no dropout — pipelined training regularizes via the data
    augmentation hook instead; see :func:`make_pipeline_train_step`).
    Numerically identical to ``model.apply`` with the unstacked params.
    """
    cfg = model.cfg
    _warn_pipeline_dropout(cfg)

    def fwd(pparams, feats, lens):
        x, _, out_lens = pipelined_encoder_forward(
            cfg, pparams, feats, lens, mesh, n_microbatches
        )
        logits = nn.Dense(cfg.vocab_size + 1, dtype=jnp.float32).apply(
            {"params": pparams["ctc_head"]}, x.astype(jnp.float32)
        )
        return logits, out_lens

    return fwd


def make_pipeline_train_step(
    model: "ConformerCTC",
    optimizer: optax.GradientTransformation,
    mesh,
    n_microbatches: int,
    augment: Optional[Callable] = None,
) -> Callable:
    """Pipeline-parallel variant of :func:`make_train_step`.

    Operates on pipeline-form params (:func:`stack_block_params`); gradients
    run the backward pipeline through the same ``ppermute`` schedule, so one
    jitted call is the full dp x tp x pp training step.
    """
    blank_id = model.cfg.vocab_size

    def loss_fn(pparams, fwd, key, feats, feat_lens, refs, ref_lens):
        if augment is not None:
            feats = augment(key, feats, feat_lens)
        logits, out_lens = fwd(pparams, feats, feat_lens)
        return ctc_loss(logits, out_lens, refs, ref_lens, blank_id)

    fwd = make_pipelined_forward(model, mesh, n_microbatches)

    def step(pparams, opt_state, key, feats, feat_lens, refs, ref_lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            pparams, fwd, key, feats, feat_lens, refs, ref_lens
        )
        updates, opt_state = optimizer.update(grads, opt_state, pparams)
        pparams = optax.apply_updates(pparams, updates)
        return pparams, opt_state, loss

    return step


def moe_aux_loss(mutables) -> jax.Array:
    """Sum the MoE router load-balance losses sown into ``"losses"``.

    `mutables` is the collections dict returned by ``model.apply(...,
    mutable=["losses"])``; each :class:`_MoEFeedForward` sows one scalar
    per call. Returns their sum (0.0 when no MoE layers ran)."""
    leaves = jax.tree_util.tree_leaves(mutables.get("losses", {}))
    if not leaves:
        return jnp.zeros(())
    return sum(jnp.sum(v) for v in leaves)


def ctc_loss(
    logits: jax.Array,
    logit_lens: jax.Array,
    refs: jax.Array,
    ref_lens: jax.Array,
    blank_id: int,
) -> jax.Array:
    """Mean per-utterance CTC loss from batch-major logits and dense refs."""
    N, T, _ = logits.shape
    U = refs.shape[1]
    logit_pad = (jnp.arange(T)[None] >= logit_lens[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(U)[None] >= ref_lens[:, None]).astype(jnp.float32)
    per_utt = optax.ctc_loss(
        logits, logit_pad, refs, label_pad, blank_id=blank_id
    )
    return per_utt.mean()


def make_train_step(
    model: ConformerCTC,
    optimizer: optax.GradientTransformation,
    augment: Optional[Callable[[jax.Array, jax.Array, jax.Array], jax.Array]] = None,
) -> Callable:
    """Build a pure, jittable training step.

    ``step(params, opt_state, key, feats, feat_lens, refs, ref_lens) ->
    (params, opt_state, loss)``. `augment` optionally maps
    ``(key, feats, lens) -> feats`` (e.g. SpecAugment) before the forward.
    Under ``jax.jit`` with sharded params/batch this is the full multi-chip
    training step: XLA inserts the DP grad psum and TP contraction psums
    from the shardings alone.

    Pass an RBG key (``jax.random.key(seed, impl="rbg")``) on TPU: the
    default threefry PRNG generates the dropout masks so slowly that it
    alone cost ~27 ms of a 63 ms flagship training step (measured, r4);
    rbg generates the same-quality masks at a fraction of that. All
    pydrobert_tpu entry points accept either key flavor.
    """
    blank_id = model.cfg.vocab_size
    moe = model.cfg.num_experts > 1

    def loss_fn(params, key, feats, feat_lens, refs, ref_lens):
        k_aug, k_drop = jax.random.split(key)
        if augment is not None:
            feats = augment(k_aug, feats, feat_lens)
        out = model.apply(
            {"params": params},
            feats,
            feat_lens,
            deterministic=False,
            rngs={"dropout": k_drop},
            mutable=["losses"] if moe else False,
        )
        aux = 0.0
        if moe:
            (logits, out_lens), muts = out
            aux = model.cfg.moe_aux_weight * moe_aux_loss(muts)
        else:
            logits, out_lens = out
        return ctc_loss(logits, out_lens, refs, ref_lens, blank_id) + aux

    def step(params, opt_state, key, feats, feat_lens, refs, ref_lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, key, feats, feat_lens, refs, ref_lens
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
