"""Flagship model family + sharding tests (8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pydrobert_tpu.models import (
    ConformerConfig,
    ConformerCTC,
    conformer_partition_rules,
    make_train_step,
)
from pydrobert_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_params,
)

CFG = ConformerConfig(
    vocab_size=32,
    num_filts=8,
    d_model=16,
    num_layers=2,
    num_heads=2,
    subsample_channels=4,
    conv_kernel=5,
    dtype=jnp.float32,
)


def _init(key, N=4, T=32):
    model = ConformerCTC(CFG)
    feats = jnp.asarray(np.random.randn(N, T, CFG.num_filts), jnp.float32)
    lens = jnp.asarray(np.random.randint(T // 2, T + 1, (N,)), jnp.int32)
    params = model.init(key, feats, lens)["params"]
    return model, params, feats, lens


def test_forward_shapes_and_masking(key, jit_fn):
    model, params, feats, lens = _init(key)
    fn = jit_fn(
        lambda p, f, l: model.apply({"params": p}, f, l)
    )
    logits, out_lens = fn(params, feats, lens)
    N, T = feats.shape[:2]
    T4 = -(-(-(-T // 2)) // 2)
    assert logits.shape == (N, T4, CFG.vocab_size + 1)
    assert logits.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(out_lens), -(-(-(-np.asarray(lens) // 2)) // 2)
    )
    # frames past an utterance's length must not influence its outputs
    feats2 = feats.at[0, int(lens[0]):].set(1000.0)
    logits2, _ = fn(params, feats2, lens)
    valid = int(out_lens[0])
    np.testing.assert_allclose(
        np.asarray(logits[0, :valid]),
        np.asarray(logits2[0, :valid]),
        atol=1e-5,
    )


def test_train_step_descends(key):
    model, params, feats, lens = _init(key, N=4, T=32)
    U = 4
    refs = jnp.asarray(np.random.randint(0, CFG.vocab_size, (4, U)), jnp.int32)
    ref_lens = jnp.full((4,), U, jnp.int32)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, optimizer))
    losses = []
    for i in range(5):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(key, i),
            feats, lens, refs, ref_lens,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_train_step_matches_single_device(key):
    model, params, feats, lens = _init(key, N=8, T=64)
    refs = jnp.asarray(np.random.randint(0, CFG.vocab_size, (8, 3)), jnp.int32)
    ref_lens = jnp.full((8,), 3, jnp.int32)
    optimizer = optax.sgd(1e-2)
    step = make_train_step(model, optimizer)

    # single-device oracle
    opt_state = optimizer.init(params)
    p1, _, loss1 = jax.jit(step)(
        params, opt_state, key, feats, lens, refs, ref_lens
    )

    mesh = make_mesh(model_parallelism=2)
    sp = shard_params(params, mesh, conformer_partition_rules)
    sopt = jax.device_put(optimizer.init(sp), replicated_sharding(mesh))
    bs = batch_sharding(mesh)
    sfeats, slens, srefs, sref_lens = (
        jax.device_put(x, bs) for x in (feats, lens, refs, ref_lens)
    )
    skey = jax.device_put(key, replicated_sharding(mesh))
    p8, _, loss8 = jax.jit(step)(
        sp, sopt, skey, sfeats, slens, srefs, sref_lens
    )
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        p1,
        jax.device_get(p8),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sequence_parallel_forward_matches_unsharded(key):
    """seq_sharding (time over the model axis between blocks) is
    numerics-preserving: XLA only inserts collectives."""
    import dataclasses

    from pydrobert_tpu.parallel import sequence_sharding

    model, params, feats, lens = _init(key, N=8, T=64)
    logits_r, lens_r = model.apply({"params": params}, feats, lens)

    mesh = make_mesh(model_parallelism=2)
    cfg_sp = dataclasses.replace(CFG, seq_sharding=sequence_sharding(mesh))
    model_sp = ConformerCTC(cfg_sp)
    sp = shard_params(params, mesh, conformer_partition_rules)
    bs = batch_sharding(mesh)
    sfeats = jax.device_put(feats, bs)
    slens = jax.device_put(lens, bs)
    logits_s, lens_s = jax.jit(
        lambda p, f, l: model_sp.apply({"params": p}, f, l)
    )(sp, sfeats, slens)
    np.testing.assert_array_equal(np.asarray(lens_s), np.asarray(lens_r))
    np.testing.assert_allclose(
        np.asarray(logits_s), np.asarray(logits_r), atol=2e-5
    )


def test_remat_blocks_same_params_forward_and_grads(key):
    """cfg.remat swaps storage for recompute without touching params,
    outputs, or gradients."""
    import dataclasses

    model, params, feats, lens = _init(key)
    model_r = ConformerCTC(dataclasses.replace(CFG, remat=True))
    o0, _ = model.apply({"params": params}, feats, lens)
    o1, _ = model_r.apply({"params": params}, feats, lens)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    g0 = jax.grad(lambda p: model.apply({"params": p}, feats, lens)[0].sum())(
        params
    )
    g1 = jax.grad(
        lambda p: model_r.apply({"params": p}, feats, lens)[0].sum()
    )(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        ),
        g0,
        g1,
    )


def test_limited_attention_context_streaming(key):
    import dataclasses

    model, params, feats, lens = _init(key, N=2, T=64)
    lens = jnp.full_like(lens, 64)  # keep the perturbed frames in-length
    # a window covering the whole sequence == full context, exactly
    cfg_wide = dataclasses.replace(CFG, attention_context=(64, 64))
    out_full, _ = ConformerCTC(CFG).apply({"params": params}, feats, lens)
    out_wide, _ = ConformerCTC(cfg_wide).apply({"params": params}, feats, lens)
    np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_wide))

    # causal config: frame outputs must not depend on far-future inputs
    # (bounded lookahead: banded attention right=0, causal depthwise conv;
    # only the stride-2 SAME subsampling convs peek <= 3 input frames)
    cfg_c = dataclasses.replace(
        CFG, attention_context=(8, 0), causal_conv=True
    )
    model_c = ConformerCTC(cfg_c)
    p_c = model_c.init(key, feats, lens)["params"]
    out1, _ = model_c.apply({"params": p_c}, feats, lens)
    feats2 = feats.at[:, 40:].add(100.0)
    out2, _ = model_c.apply({"params": p_c}, feats2, lens)
    # post-subsampling frame 8 covers input frames <= 35 (< 40)
    np.testing.assert_allclose(
        np.asarray(out1[:, :8]), np.asarray(out2[:, :8]), atol=1e-5
    )
    # sanity: the perturbation does change later frames
    assert not np.allclose(np.asarray(out1[:, 12:]), np.asarray(out2[:, 12:]))


@pytest.mark.parametrize("T,chunk", [(96, 5), (96, 24), (93, 7), (41, 3)])
def test_streaming_logits_match_full_forward(key, T, chunk):
    """Chunked causal encoding == the one-shot forward within out_lens,
    across chunk sizes and input-length parities."""
    import dataclasses

    from pydrobert_tpu.models.conformer import streaming_logits

    cfg = dataclasses.replace(
        CFG, attention_context=(4, 0), causal_conv=True
    )
    model = ConformerCTC(cfg)
    rng = np.random.RandomState(T + chunk)
    N = 3
    feats = jnp.asarray(rng.randn(N, T, CFG.num_filts), jnp.float32)
    lens = jnp.asarray([T, max(T - 20, 3), max(T // 2, 2)], jnp.int32)
    params = model.init(key, feats, lens)["params"]
    full, full_lens = model.apply({"params": params}, feats, lens)
    st, st_lens = streaming_logits(model, params, feats, lens, chunk)
    np.testing.assert_array_equal(np.asarray(st_lens), np.asarray(full_lens))
    assert st.shape == full.shape
    for n in range(N):
        L = int(full_lens[n])
        np.testing.assert_allclose(
            np.asarray(st[n, :L]), np.asarray(full[n, :L]), atol=2e-5
        )


def test_seq2seq_beam_search_and_mer(key):
    import optax

    from pydrobert_tpu.models import (
        AttentionSeq2Seq,
        Seq2SeqConfig,
        Seq2SeqDecoderLM,
        make_mer_train_step,
    )
    from pydrobert_tpu.ops.decoding import BeamSearch, RandomWalk

    cfg = Seq2SeqConfig(
        vocab_size=8, num_filts=5, enc_hidden=12, dec_hidden=12,
        embed_dim=6, attn_hidden=10,
    )
    model = AttentionSeq2Seq(cfg)
    feats = jnp.asarray(np.random.randn(3, 11, 5), jnp.float32)
    lens = jnp.asarray([11, 8, 4], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens)
    lm = Seq2SeqDecoderLM(model, params)
    state = lm.initial_state(feats, lens)
    # LM protocol: normalized distributions, state threading
    lp, state2 = lm(jnp.zeros((0, 3), jnp.int32), dict(state), idx=0)
    assert lp.shape == (3, 8)
    # TPU f32 exp/sum accumulates ~4e-5 error over the vocab; CPU is ~1e-7
    rtol = 1e-4 if jax.devices()[0].platform == "tpu" else 1e-5
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=rtol)
    # beam search end-to-end (jitted)
    search = BeamSearch(lm, width=4, eos=0)
    y, y_lens, y_probs = jax.jit(
        lambda s: search(s, batch_size=3, max_iters=6)
    )(state)
    assert y.shape == (6, 3, 4)
    assert (np.asarray(y_lens) <= 6).all()
    # beams sorted by log prob
    yp = np.asarray(y_probs)
    assert (np.diff(yp, axis=1) <= 1e-6).all()
    # random walk samples differ across keys
    walk = RandomWalk(lm, eos=0)
    s1 = walk(key, dict(state), 3, 6)[0]
    s2 = walk(jax.random.fold_in(key, 1), dict(state), 3, 6)[0]
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))
    # MER training step produces finite loss and nonzero grads
    optimizer = optax.adam(1e-2)
    step = jax.jit(
        make_mer_train_step(model, optimizer, num_samples=3, max_iters=6, eos=0)
    )
    opt_state = optimizer.init(params)
    refs = jnp.asarray(np.random.randint(1, 8, (3, 4)), jnp.int32)
    ref_lens = jnp.asarray([4, 3, 2], jnp.int32)
    p2, opt_state, loss = step(
        params, opt_state, key, feats, lens, refs, ref_lens
    )
    assert np.isfinite(float(loss))
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params, p2,
    )
    assert max(jax.tree.leaves(moved)) > 0


@pytest.mark.parametrize("k", [1, 2])
def test_moe_ffn_matches_python_oracle(key, k):
    """_MoEFeedForward (top-k routing, capacity drops, expert FFNs) vs a
    per-token numpy reimplementation from the same params."""
    import dataclasses

    from pydrobert_tpu.models.conformer import _MoEFeedForward

    cfg = dataclasses.replace(
        CFG, num_experts=4, expert_top_k=k, expert_capacity_factor=0.5,
        dropout=0.0,
    )
    m = _MoEFeedForward(cfg)
    rng = np.random.RandomState(7)
    N, T, d = 2, 9, CFG.d_model
    x = jnp.asarray(rng.randn(N, T, d), jnp.float32)
    pad_mask = jnp.asarray(rng.rand(N, T) > 0.2)
    params = m.init(key, x, pad_mask, True)["params"]
    out, muts = m.apply({"params": params}, x, pad_mask, True,
                        mutable=["losses"])

    # ---- numpy oracle ----
    E = 4
    S = N * T
    C = max(1, int(np.ceil(S * k * 0.5 / E)))
    xf = np.asarray(x, np.float64).reshape(S, d)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ln = (xf - mu) / np.sqrt(var + 1e-6)
    ln = ln * np.asarray(params["ln"]["scale"]) + np.asarray(
        params["ln"]["bias"]
    )
    valid = np.asarray(pad_mask).reshape(S)
    gl = ln @ np.asarray(params["gate"]["kernel"]) + np.asarray(
        params["gate"]["bias"]
    )
    probs = np.exp(gl - gl.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    probs *= valid[:, None]
    order = np.argsort(-probs, -1, kind="stable")[:, :k]
    gv = np.take_along_axis(probs, order, -1)
    if k > 1:  # k == 1 keeps the raw router prob (Switch)
        gv = gv / np.clip(gv.sum(-1, keepdims=True), 1e-9, None)
        gv = gv * valid[:, None]
    # slot-major capacity assignment
    counts = np.zeros(E, np.int64)
    keep = np.zeros((S, k), bool)
    for slot in range(k):
        for s in range(S):
            if gv[s, slot] > 0:
                e = order[s, slot]
                if counts[e] < C:
                    keep[s, slot] = True
                    counts[e] += 1
    wi, bi = np.asarray(params["wi"]), np.asarray(params["bi"])
    wo, bo = np.asarray(params["wo"]), np.asarray(params["bo"])

    def expert(e, v):
        h = v @ wi[e] + bi[e]
        h = h / (1 + np.exp(-h))
        return h @ wo[e] + bo[e]

    want = np.zeros((S, d))
    for s in range(S):
        for slot in range(k):
            if keep[s, slot]:
                want[s] += gv[s, slot] * expert(order[s, slot], ln[s])
    np.testing.assert_allclose(
        np.asarray(out).reshape(S, d), want, atol=1e-4
    )
    # Switch aux loss: E * sum_e f_e * P_e over valid tokens
    nv = max(valid.sum(), 1)
    f_e = np.zeros(E)
    for s in range(S):
        if valid[s]:
            f_e[order[s, 0]] += 1
    f_e /= nv
    p_e = probs.sum(0) / nv
    aux = float(jax.tree_util.tree_leaves(muts["losses"])[0])
    np.testing.assert_allclose(aux, E * (f_e * p_e).sum(), rtol=1e-5)


def test_moe_train_step_descends_with_aux_loss(key):
    import dataclasses

    cfg = dataclasses.replace(CFG, num_experts=4, expert_top_k=2)
    model = ConformerCTC(cfg)
    rng = np.random.RandomState(5)
    N, T, U = 4, 32, 4
    feats = jnp.asarray(rng.randn(N, T, CFG.num_filts), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)), jnp.int32)
    refs = jnp.asarray(rng.randint(0, CFG.vocab_size, (N, U)), jnp.int32)
    ref_lens = jnp.full((N,), U, jnp.int32)
    params = model.init(key, feats, lens)["params"]
    # expert weights exist with the leading expert dim
    assert params["block_0"]["moe"]["wi"].shape[0] == 4
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(model, optimizer))
    losses = []
    for i in range(5):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(key, i),
            feats, lens, refs, ref_lens,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_moe_sharded_train_step_matches_single_device(key):
    """Expert parallelism (expert dims over the model axis) is
    numerics-preserving: dp=4 x tp=2 step == single-device step."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG, num_experts=4, expert_top_k=2, dropout=0.0
    )
    model = ConformerCTC(cfg)
    rng = np.random.RandomState(9)
    N, T = 8, 64
    feats = jnp.asarray(rng.randn(N, T, CFG.num_filts), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)), jnp.int32)
    refs = jnp.asarray(rng.randint(0, CFG.vocab_size, (N, 3)), jnp.int32)
    ref_lens = jnp.full((N,), 3, jnp.int32)
    params = model.init(key, feats, lens)["params"]
    optimizer = optax.sgd(1e-2)
    step = make_train_step(model, optimizer)

    p1, _, loss1 = jax.jit(step)(
        params, optimizer.init(params), key, feats, lens, refs, ref_lens
    )

    mesh = make_mesh(model_parallelism=2)
    sp = shard_params(params, mesh, conformer_partition_rules)
    moe_wi = sp["block_0"]["moe"]["wi"]
    assert "model" in str(moe_wi.sharding.spec)  # experts actually sharded
    sopt = jax.device_put(optimizer.init(sp), replicated_sharding(mesh))
    bs = batch_sharding(mesh)
    sfeats, slens, srefs, sref_lens = (
        jax.device_put(x, bs) for x in (feats, lens, refs, ref_lens)
    )
    skey = jax.device_put(key, replicated_sharding(mesh))
    p8, _, loss8 = jax.jit(step)(
        sp, sopt, skey, sfeats, slens, srefs, sref_lens
    )
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        p1,
        jax.device_get(p8),
    )
