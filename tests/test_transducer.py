"""RNN-Transducer family: loss vs brute-force lattice DP, streamed vs
materialized joint, greedy search vs a per-sample Python oracle, training
descent. (Beyond-reference model family; see models/transducer.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pydrobert_tpu.models.conformer import ConformerConfig
from pydrobert_tpu.models.transducer import (
    ConformerTransducer,
    TransducerConfig,
    make_transducer_train_step,
)
from pydrobert_tpu.ops.transducer import (
    transducer_greedy_search,
    transducer_loss,
    transducer_loss_from_joint,
)


def _oracle_loss(blank, emit, Tl, Ul):
    """Brute-force float64 lattice DP (Graves 2012 eq. for alpha)."""
    T, U1 = blank.shape
    a = np.full((T, U1), -np.inf)
    a[0, 0] = 0.0
    for u in range(1, Ul + 1):
        a[0, u] = a[0, u - 1] + emit[0, u - 1]
    for t in range(1, Tl):
        a[t, 0] = a[t - 1, 0] + blank[t - 1, 0]
        for u in range(1, Ul + 1):
            a[t, u] = np.logaddexp(
                a[t - 1, u] + blank[t - 1, u], a[t, u - 1] + emit[t, u - 1]
            )
    return -(a[Tl - 1, Ul] + blank[Tl - 1, Ul])


def test_transducer_loss_matches_brute_force(jit_fn):
    rng = np.random.RandomState(0)
    N, T, U = 5, 7, 4
    blank = np.log(rng.rand(N, T, U + 1))
    emit = np.log(rng.rand(N, T, U))
    Tl = rng.randint(2, T + 1, N).astype(np.int32)
    Ul = rng.randint(0, U + 1, N).astype(np.int32)
    want = np.array(
        [_oracle_loss(blank[n], emit[n], Tl[n], Ul[n]) for n in range(N)]
    )
    fn = jit_fn(
        lambda b, e, tl, ul: transducer_loss(b, e, tl, ul, reduction="none")
    )
    got = fn(
        jnp.asarray(blank, jnp.float32),
        jnp.asarray(emit, jnp.float32),
        jnp.asarray(Tl),
        jnp.asarray(Ul),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_transducer_loss_from_joint_matches_and_grads(key):
    rng = np.random.RandomState(1)
    N, T, U, V = 4, 6, 3, 11
    jl = jnp.asarray(rng.randn(N, T, U + 1, V), jnp.float32)
    refs = jnp.asarray(rng.randint(0, V - 1, (N, U)), jnp.int32)
    Tl = jnp.asarray(rng.randint(2, T + 1, N), jnp.int32)
    Ul = jnp.asarray(rng.randint(1, U + 1, N), jnp.int32)
    lp = np.asarray(jax.nn.log_softmax(jl, -1), np.float64)
    bl = lp[..., V - 1]
    em = np.take_along_axis(
        lp[:, :, :U], np.asarray(refs)[:, None, :, None], axis=3
    )[..., 0]
    want = np.array(
        [
            _oracle_loss(bl[n], em[n], int(Tl[n]), int(Ul[n]))
            for n in range(N)
        ]
    ).mean()
    got, g = jax.value_and_grad(
        lambda j: transducer_loss_from_joint(j, refs, Tl, Ul, blank_idx=-1)
    )(jl)
    np.testing.assert_allclose(float(got), want, atol=1e-4)
    assert bool(jnp.isfinite(g).all())


def test_transducer_loss_gradients_match_numerical():
    """AD through the associative-scan lattice == finite differences."""
    from jax.test_util import check_grads

    rng = np.random.RandomState(7)
    N, T, U = 2, 4, 3
    blank = jnp.asarray(np.log(rng.rand(N, T, U + 1)), jnp.float32)
    emit = jnp.asarray(np.log(rng.rand(N, T, U)), jnp.float32)
    Tl = jnp.asarray([4, 3], jnp.int32)
    Ul = jnp.asarray([3, 2], jnp.int32)
    check_grads(
        lambda b, e: transducer_loss(b, e, Tl, Ul),
        (blank, emit),
        order=1,
        modes=["rev"],
        atol=1e-2,
        rtol=1e-2,
    )


def test_transducer_greedy_matches_python_oracle(jit_fn):
    rng = np.random.RandomState(2)
    N, T, D, V = 4, 6, 8, 9
    blank = V - 1
    enc = jnp.asarray(rng.randn(N, T, D), jnp.float32)
    enc_lens = jnp.asarray(rng.randint(1, T + 1, N), jnp.int32)
    W1 = jnp.asarray(rng.randn(D, V) * 0.7, jnp.float32)
    W2 = jnp.asarray(rng.randn(V, V) * 0.7, jnp.float32)
    Emb = jnp.asarray(rng.randn(V, V) * 0.7, jnp.float32)

    def pred_step(tok, state):
        new = 0.5 * state + Emb[tok]
        return new, new

    def joint_fn(enc_t, pred_out):
        return jnp.tanh(enc_t @ W1) + jnp.tanh(pred_out @ W2)

    state0 = jnp.zeros((N, V), jnp.float32)
    hyps, lens = jit_fn(
        lambda e, el: transducer_greedy_search(
            e, el, pred_step, joint_fn, state0, blank,
            max_symbols_per_frame=3,
        )
    )(enc, enc_lens)
    for n in range(N):
        st = np.zeros((V,), np.float32)
        po = 0.5 * st + np.asarray(Emb)[blank]
        st = po.copy()
        out, t, k = [], 0, 0
        while t < int(enc_lens[n]):
            lg = np.tanh(np.asarray(enc)[n, t] @ np.asarray(W1)) + np.tanh(
                po @ np.asarray(W2)
            )
            tok = int(lg.argmax())
            if tok != blank and k < 3:
                out.append(tok)
                st = 0.5 * st + np.asarray(Emb)[tok]
                po = st.copy()
                k += 1
            else:
                t += 1
                k = 0
        assert hyps[n, : int(lens[n])].tolist() == out, n


def _toy_searchers(seed=1, N=4, T=6, D=8, V=9):
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(N, T, D), jnp.float32)
    enc_lens = jnp.asarray(rng.randint(1, T + 1, N), jnp.int32)
    W1 = jnp.asarray(rng.randn(D, V) * 0.7, jnp.float32)
    W2 = jnp.asarray(rng.randn(V, V) * 0.7, jnp.float32)
    Emb = jnp.asarray(rng.randn(V, V) * 0.7, jnp.float32)

    def pred_step(tok, state):
        new = 0.5 * state + Emb[tok]
        return new, new

    def joint_fn(enc_t, pred_out):
        return jnp.tanh(enc_t @ W1) + jnp.tanh(pred_out @ W2)

    state0 = jnp.zeros((N, V), jnp.float32)
    return enc, enc_lens, pred_step, joint_fn, state0, (W1, W2, Emb)


def test_transducer_module_wrappers():
    """modules.TransducerLoss/GreedySearch/BeamSearch == the functionals."""
    from pydrobert_tpu.modules import (
        TransducerBeamSearch,
        TransducerGreedySearch,
        TransducerLoss,
    )
    from pydrobert_tpu.ops.transducer import transducer_beam_search

    rng = np.random.RandomState(0)
    N, T, U = 3, 5, 4
    blank_lp = jnp.asarray(np.log(rng.rand(N, T, U + 1)), jnp.float32)
    emit_lp = jnp.asarray(np.log(rng.rand(N, T, U)), jnp.float32)
    want = transducer_loss(blank_lp, emit_lp, reduction="sum")
    got = TransducerLoss(reduction="sum")(blank_lp, emit_lp)
    np.testing.assert_allclose(float(got), float(want))

    enc, enc_lens, pred_step, joint_fn, state0, _ = _toy_searchers()
    gh, gl = TransducerGreedySearch(pred_step, joint_fn, 8, 3)(
        enc, enc_lens, state0
    )
    wh, wl = transducer_greedy_search(
        enc, enc_lens, pred_step, joint_fn, state0, 8, 3
    )
    np.testing.assert_array_equal(np.asarray(gh), np.asarray(wh))
    bh, bl, bs = TransducerBeamSearch(pred_step, joint_fn, 8, 2, 3)(
        enc, enc_lens, state0
    )
    wb = transducer_beam_search(
        enc, enc_lens, pred_step, joint_fn, state0, 8, 2, 3
    )
    for a, b in zip((bh, bl, bs), wb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transducer_beam1_matches_greedy(jit_fn):
    from pydrobert_tpu.ops.transducer import transducer_beam_search

    enc, enc_lens, pred_step, joint_fn, state0, _ = _toy_searchers()
    blank = 8
    gh, gl = jit_fn(
        lambda e, el: transducer_greedy_search(
            e, el, pred_step, joint_fn, state0, blank, 3
        )
    )(enc, enc_lens)
    bh, bl, _ = jit_fn(
        lambda e, el: transducer_beam_search(
            e, el, pred_step, joint_fn, state0, blank, width=1,
            max_symbols_per_frame=3,
        )
    )(enc, enc_lens)
    for n in range(enc.shape[0]):
        assert (
            gh[n, : int(gl[n])].tolist() == bh[n, 0, : int(bl[n, 0])].tolist()
        )


def test_transducer_beam_matches_python_oracle():
    """W=2 fixed-expansion search vs an independent per-sample Python
    implementation of the same rules (tokens AND scores)."""
    from pydrobert_tpu.ops.transducer import transducer_beam_search

    enc, enc_lens, pred_step, joint_fn, state0, (W1, W2, Emb) = (
        _toy_searchers()
    )
    N, V, blank, W, E = enc.shape[0], 9, 8, 2, 3
    bh, bl, bs = jax.jit(
        lambda e, el: transducer_beam_search(
            e, el, pred_step, joint_fn, state0, blank, width=W,
            max_symbols_per_frame=E,
        )
    )(enc, enc_lens)
    W1, W2, Emb, enc_np = map(np.asarray, (W1, W2, Emb, enc))
    for n in range(N):
        beams = _py_beam_oracle(
            enc_np[n], int(enc_lens[n]), W1, W2, Emb, blank, W, E, V
        )
        for w in range(W):
            assert bh[n, w, : int(bl[n, w])].tolist() == beams[w]["toks"], (
                n, w,
            )
            np.testing.assert_allclose(
                float(bs[n, w]), beams[w]["s"], atol=1e-3
            )


def _py_beam_oracle(enc_np, enc_len, W1, W2, Emb, blank, W, E, V):
    """Per-sample Python reference of the fixed-expansion search rules."""

    def logsoft(x):
        x = x - x.max()
        return x - np.log(np.exp(x).sum())

    po0 = 0.5 * np.zeros((V,), np.float32) + Emb[blank]
    beams = [dict(s=0.0, toks=[], po=po0, st=po0.copy())]
    beams += [
        dict(s=-1e30, toks=[], po=po0, st=po0.copy()) for _ in range(W - 1)
    ]
    for t in range(enc_len):
        for b in beams:
            b["open"] = True
        for _ in range(E):
            pool = []
            for j, b in enumerate(beams):
                lp = logsoft(
                    np.tanh(enc_np[t] @ W1) + np.tanh(b["po"] @ W2)
                )
                if b["open"]:
                    pool.append((b["s"] + lp[blank], j, None))
                    nb = sorted(
                        ((lp[v], v) for v in range(V) if v != blank),
                        key=lambda x: (-x[0], x[1]),
                    )
                    pool.extend((b["s"] + lpv, j, v) for lpv, v in nb[:W])
                else:
                    pool.append((b["s"], j, None))
            pool.sort(key=lambda x: -x[0])
            newb = []
            for s, j, v in pool[:W]:
                src = beams[j]
                if v is None:
                    newb.append(
                        dict(s=s, toks=list(src["toks"]), po=src["po"],
                             st=src["st"], open=False)
                    )
                else:
                    st = 0.5 * src["st"] + Emb[v]
                    newb.append(
                        dict(s=s, toks=src["toks"] + [v], po=st.copy(),
                             st=st, open=True)
                    )
            beams = newb
        for b in beams:
            if b["open"]:
                lp = logsoft(
                    np.tanh(enc_np[t] @ W1) + np.tanh(b["po"] @ W2)
                )
                b["s"] += lp[blank]
                b["open"] = False
    beams.sort(key=lambda b: -b["s"])
    return beams


@pytest.mark.slow
@pytest.mark.parametrize("seed,W,E", [(3, 3, 2), (4, 4, 4), (5, 2, 1)])
def test_transducer_beam_fuzz_matches_python_oracle(seed, W, E):
    rng = np.random.RandomState(seed)
    N, T, D, V = int(rng.randint(2, 5)), int(rng.randint(3, 9)), 8, int(
        rng.randint(5, 12)
    )
    blank = V - 1
    enc, enc_lens, pred_step, joint_fn, state0, (W1, W2, Emb) = (
        _toy_searchers(seed=seed, N=N, T=T, D=D, V=V)
    )
    from pydrobert_tpu.ops.transducer import transducer_beam_search

    bh, bl, bs = jax.jit(
        lambda e, el: transducer_beam_search(
            e, el, pred_step, joint_fn, state0, blank, width=W,
            max_symbols_per_frame=E,
        )
    )(enc, enc_lens)
    W1, W2, Emb, enc_np = map(np.asarray, (W1, W2, Emb, enc))
    for n in range(N):
        beams = _py_beam_oracle(
            enc_np[n], int(enc_lens[n]), W1, W2, Emb, blank, W, E, V
        )
        for w in range(W):
            assert bh[n, w, : int(bl[n, w])].tolist() == beams[w]["toks"], (
                seed, n, w,
            )
            np.testing.assert_allclose(
                float(bs[n, w]), beams[w]["s"], atol=2e-3
            )


def test_transducer_beam_lm_fusion_matches_python_oracle():
    """Shallow fusion: weight 0 reproduces the unfused search exactly;
    a toy last-token-table LM matches the extended Python oracle."""
    from pydrobert_tpu.ops.transducer import transducer_beam_search

    enc, enc_lens, pred_step, joint_fn, state0, (W1, W2, Emb) = (
        _toy_searchers()
    )
    N, V, blank, W, E = enc.shape[0], 9, 8, 2, 3
    rng = np.random.RandomState(9)
    Tbl = jnp.asarray(rng.randn(V, V), jnp.float32)  # next_lp by last token

    def lm_step(tok, last):
        return Tbl[tok], tok

    lm0 = (lm_step, jnp.broadcast_to(Tbl[blank - 1], (N, V)),
           jnp.zeros((N,), jnp.int32))

    base = jax.jit(
        lambda e, el: transducer_beam_search(
            e, el, pred_step, joint_fn, state0, blank, width=W,
            max_symbols_per_frame=E,
        )
    )(enc, enc_lens)
    zero = jax.jit(
        lambda e, el: transducer_beam_search(
            e, el, pred_step, joint_fn, state0, blank, width=W,
            max_symbols_per_frame=E, lm=lm0, lm_weight=0.0,
        )
    )(enc, enc_lens)
    for a, b in zip(base, zero):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    wgt = 0.7
    bh, bl, bs = jax.jit(
        lambda e, el: transducer_beam_search(
            e, el, pred_step, joint_fn, state0, blank, width=W,
            max_symbols_per_frame=E, lm=lm0, lm_weight=wgt,
        )
    )(enc, enc_lens)
    W1, W2, Emb, Tbl_np, enc_np = map(np.asarray, (W1, W2, Emb, Tbl, enc))

    def logsoft(x):
        x = x - x.max()
        return x - np.log(np.exp(x).sum())

    for n in range(N):
        po0 = 0.5 * np.zeros((V,), np.float32) + Emb[blank]
        beams = [
            dict(s=0.0, toks=[], po=po0, st=po0.copy(),
                 lm=Tbl_np[blank - 1]),
            dict(s=-1e30, toks=[], po=po0, st=po0.copy(),
                 lm=Tbl_np[blank - 1]),
        ]
        for t in range(int(enc_lens[n])):
            for b in beams:
                b["open"] = True
            for _ in range(E):
                pool = []
                for j, b in enumerate(beams):
                    lp = logsoft(
                        np.tanh(enc_np[n, t] @ W1) + np.tanh(b["po"] @ W2)
                    )
                    if b["open"]:
                        pool.append((b["s"] + lp[blank], j, None))
                        fused = lp + wgt * b["lm"]
                        nb = sorted(
                            ((fused[v], v) for v in range(V) if v != blank),
                            key=lambda x: (-x[0], x[1]),
                        )
                        pool.extend(
                            (b["s"] + fv, j, v) for fv, v in nb[:W]
                        )
                    else:
                        pool.append((b["s"], j, None))
                pool.sort(key=lambda x: -x[0])
                newb = []
                for s, j, v in pool[:W]:
                    src = beams[j]
                    if v is None:
                        newb.append(
                            dict(s=s, toks=list(src["toks"]), po=src["po"],
                                 st=src["st"], lm=src["lm"], open=False)
                        )
                    else:
                        st = 0.5 * src["st"] + Emb[v]
                        newb.append(
                            dict(s=s, toks=src["toks"] + [v], po=st.copy(),
                                 st=st, lm=Tbl_np[v], open=True)
                        )
                beams = newb
            for b in beams:
                if b["open"]:
                    lp = logsoft(
                        np.tanh(enc_np[n, t] @ W1) + np.tanh(b["po"] @ W2)
                    )
                    b["s"] += lp[blank]
                    b["open"] = False
        beams.sort(key=lambda b: -b["s"])
        for w in range(W):
            assert bh[n, w, : int(bl[n, w])].tolist() == beams[w]["toks"], (
                n, w,
            )
            np.testing.assert_allclose(
                float(bs[n, w]), beams[w]["s"], atol=1e-3
            )


_ENC = ConformerConfig(
    vocab_size=16, num_filts=8, d_model=16, num_layers=2, num_heads=2,
    subsample_channels=4, conv_kernel=5, dropout=0.0, dtype=jnp.float32,
)
_CFG = TransducerConfig(encoder=_ENC, pred_dim=12, joint_dim=12)


def _model_setup(seed=0, N=4, T=24, U=5):
    model = ConformerTransducer(_CFG)
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(N, T, 8), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, N), jnp.int32)
    refs = jnp.asarray(rng.randint(0, 16, (N, U)), jnp.int32)
    ref_lens = jnp.asarray(rng.randint(1, U + 1, N), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, lens, refs, ref_lens)
    return model, variables, feats, lens, refs, ref_lens


def test_model_streamed_loss_matches_materialized_joint():
    model, variables, feats, lens, refs, ref_lens = _model_setup()
    loss = model.apply(variables, feats, lens, refs, ref_lens)
    enc, enc_lens = model.apply(variables, feats, lens, method="encode")
    pred = model.apply(variables, refs, method=lambda m, r: m.predictor(r))
    full = model.apply(
        variables, enc[:, :, None, :], pred[:, None],
        method=lambda m, e, p: m.joint(e, p),
    )
    want = transducer_loss_from_joint(
        full, refs, enc_lens, ref_lens, blank_idx=_CFG.vocab_size
    )
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_transducer_train_step_matches_single_device(key):
    from jax.sharding import NamedSharding, PartitionSpec

    from pydrobert_tpu.models import transducer_partition_rules
    from pydrobert_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
        shard_params,
    )

    model, variables, feats, lens, refs, ref_lens = _model_setup(N=8)
    params = variables["params"]
    optimizer = optax.sgd(1e-2)
    step = make_transducer_train_step(model, optimizer)

    p1, _, loss1 = jax.jit(step)(
        params, optimizer.init(params), key, feats, lens, refs, ref_lens
    )

    mesh = make_mesh(model_parallelism=2)
    sp = shard_params(params, mesh, transducer_partition_rules)
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


@pytest.mark.slow
def test_transducer_learns_to_transcribe(key):
    """End-to-end learning check: a tiny ConformerTransducer memorizes two
    utterances and greedy decoding reproduces their transcripts exactly."""
    enc_cfg = ConformerConfig(
        vocab_size=8, num_filts=8, d_model=32, num_layers=2, num_heads=2,
        subsample_channels=4, conv_kernel=5, dropout=0.0, dtype=jnp.float32,
    )
    cfg = TransducerConfig(encoder=enc_cfg, pred_dim=16, joint_dim=16)
    model = ConformerTransducer(cfg)
    rng = np.random.RandomState(0)
    N, T, U = 2, 16, 3
    feats = jnp.asarray(rng.randn(N, T, 8), jnp.float32)
    lens = jnp.full((N,), T, jnp.int32)
    refs = jnp.asarray([[1, 4, 2], [5, 0, 7]], jnp.int32)
    ref_lens = jnp.full((N,), U, jnp.int32)
    params = model.init(key, feats, lens, refs, ref_lens)["params"]
    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(make_transducer_train_step(model, optimizer))
    for i in range(200):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(key, i),
            feats, lens, refs, ref_lens,
        )
    assert float(loss) < 0.5, float(loss)
    hyps, hl = jax.jit(
        lambda p, f, l: model.apply({"params": p}, f, l, 3, method="greedy")
    )(params, feats, lens)
    for n in range(N):
        assert hyps[n, : int(hl[n])].tolist() == refs[n].tolist()


def test_model_train_step_descends_and_greedy_decodes(key):
    model, variables, feats, lens, refs, ref_lens = _model_setup()
    optimizer = optax.adam(5e-3)
    params = variables["params"]
    opt_state = optimizer.init(params)
    step = jax.jit(make_transducer_train_step(model, optimizer))
    losses = []
    for i in range(5):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(key, i),
            feats, lens, refs, ref_lens,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    hyps, hyp_lens = jax.jit(
        lambda p, f, l: model.apply({"params": p}, f, l, method="greedy")
    )(params, feats, lens)
    N, T = feats.shape[:2]
    T4 = -(-(-(-T // 2)) // 2)
    assert hyps.shape == (N, 4 * T4)
    assert bool((hyp_lens >= 0).all()) and bool(
        (hyp_lens <= 4 * T4).all()
    )
    # decoded tokens within the vocab (padding = blank)
    assert bool((hyps >= 0).all()) and bool((hyps <= _CFG.vocab_size).all())
    # beam search through the same model: runs, sorted, beam-1 == greedy
    bh, bl, bsc = jax.jit(
        lambda p, f, l: model.apply(
            {"params": p}, f, l, 2, 4, method="beam"
        )
    )(params, feats, lens)
    assert bh.shape[:2] == (N, 2) and bool(
        (bsc[:, 0] >= bsc[:, 1]).all()
    )
    # shallow fusion with a LookupLanguageModel: weight 0 == unfused
    from pydrobert_tpu.lm import LookupLanguageModel

    rng = np.random.RandomState(11)
    V = _CFG.vocab_size
    uni = {w: (float(-rng.rand() * 4 - 0.1), float(-rng.rand()))
           for w in range(V)}
    uni[V] = (float("-inf"), float(-rng.rand()))
    bi = {
        (int(rng.randint(V + 1)), int(rng.randint(V))):
            float(-rng.rand() * 4 - 0.1)
        for _ in range(60)
    }
    lm = LookupLanguageModel(V, sos=V, prob_dicts=[uni, bi])
    fh, fl, fsc = jax.jit(
        lambda p, f, l: model.apply(
            {"params": p}, f, l, 2, 4, lm, 0.0, method="beam"
        )
    )(params, feats, lens)
    np.testing.assert_array_equal(np.asarray(fh), np.asarray(bh))
    np.testing.assert_allclose(np.asarray(fsc), np.asarray(bsc), atol=1e-5)
    # nonzero weight runs and yields finite sorted scores
    fh, fl, fsc = jax.jit(
        lambda p, f, l: model.apply(
            {"params": p}, f, l, 2, 4, lm, 0.4, method="beam"
        )
    )(params, feats, lens)
    assert bool(np.isfinite(np.asarray(fsc)[:, 0]).all())


@pytest.mark.parametrize("T,chunk", [(41, 3), (48, 6)])
def test_streaming_transducer_greedy_matches_one_shot(key, T, chunk):
    """Chunked causal encode + carried decode state == one-shot greedy."""
    import dataclasses

    from pydrobert_tpu.models import streaming_transducer_greedy

    enc_cfg = dataclasses.replace(
        _ENC, attention_context=(4, 0), causal_conv=True
    )
    cfg = TransducerConfig(encoder=enc_cfg, pred_dim=12, joint_dim=12)
    model = ConformerTransducer(cfg)
    rng = np.random.RandomState(T + chunk)
    N = 3
    feats = jnp.asarray(rng.randn(N, T, 8), jnp.float32)
    lens = jnp.asarray([T, max(T - 9, 3), max(T // 2, 2)], jnp.int32)
    refs = jnp.asarray(rng.randint(0, 16, (N, 4)), jnp.int32)
    ref_lens = jnp.full((N,), 4, jnp.int32)
    params = model.init(key, feats, lens, refs, ref_lens)["params"]

    hyps, hyp_lens = model.apply(
        {"params": params}, feats, lens, 3, method="greedy"
    )
    sh, sl = streaming_transducer_greedy(
        model, params, feats, lens, chunk, max_symbols_per_frame=3
    )
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(hyp_lens))
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(hyps))


def test_streaming_transducer_beam_matches_one_shot(key):
    """Chunked causal encode + carried beam state == one-shot beam search,
    with and without LM shallow fusion."""
    import dataclasses

    from pydrobert_tpu.lm import LookupLanguageModel
    from pydrobert_tpu.models import streaming_transducer_beam

    enc_cfg = dataclasses.replace(
        _ENC, attention_context=(4, 0), causal_conv=True
    )
    cfg = TransducerConfig(encoder=enc_cfg, pred_dim=12, joint_dim=12)
    model = ConformerTransducer(cfg)
    T, N = 44, 3
    rng = np.random.RandomState(T)
    feats = jnp.asarray(rng.randn(N, T, 8), jnp.float32)
    lens = jnp.asarray([T, T - 9, T // 2], jnp.int32)
    refs = jnp.asarray(rng.randint(0, 16, (N, 4)), jnp.int32)
    ref_lens = jnp.full((N,), 4, jnp.int32)
    params = model.init(key, feats, lens, refs, ref_lens)["params"]

    bh, bl, bs = model.apply(
        {"params": params}, feats, lens, 3, 2, method="beam"
    )
    sh, sl, ss = streaming_transducer_beam(
        model, params, feats, lens, 5, width=3, max_symbols_per_frame=2
    )
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(bh))
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(bl))
    np.testing.assert_allclose(np.asarray(ss), np.asarray(bs), atol=1e-5)

    # with a shallow-fused n-gram LM the carried LM state must also chunk
    V = cfg.vocab_size
    uni = {w: (float(-rng.rand() * 4 - 0.1), float(-rng.rand()))
           for w in range(V)}
    uni[V] = (float("-inf"), float(-rng.rand()))
    bi = {
        (int(rng.randint(V + 1)), int(rng.randint(V))):
            float(-rng.rand() * 4 - 0.1)
        for _ in range(60)
    }
    lm = LookupLanguageModel(V, sos=V, prob_dicts=[uni, bi])
    fh, fl, fs = model.apply(
        {"params": params}, feats, lens, 3, 2, lm, 0.4, method="beam"
    )
    gh, gl, gs = streaming_transducer_beam(
        model, params, feats, lens, 5, width=3, max_symbols_per_frame=2,
        lm=lm, lm_weight=0.4,
    )
    np.testing.assert_array_equal(np.asarray(gh), np.asarray(fh))
    np.testing.assert_array_equal(np.asarray(gl), np.asarray(fl))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(fs), atol=1e-5)
