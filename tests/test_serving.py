"""Streaming recognition sessions (pydrobert_tpu.serving): arbitrary-size
pushes with ragged stream ends must reproduce the one-shot decode exactly."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from pydrobert_tpu.models.conformer import ConformerConfig
from pydrobert_tpu.models.transducer import ConformerTransducer, TransducerConfig
from pydrobert_tpu.serving import StreamingTransducerRecognizer

_ENC = ConformerConfig(
    vocab_size=16, num_filts=8, d_model=16, num_layers=2, num_heads=2,
    subsample_channels=4, conv_kernel=5, dropout=0.0, dtype=jnp.float32,
    attention_context=(4, 0), causal_conv=True,
)
_CFG = TransducerConfig(encoder=_ENC, pred_dim=12, joint_dim=12)


def _setup(key, T=45, N=3, seed=0):
    model = ConformerTransducer(_CFG)
    rng = np.random.RandomState(seed)
    feats = rng.randn(N, T, 8).astype(np.float32)
    lens = np.asarray([T, T - 10, (T // 2) + 1], np.int64)[:N]
    refs = jnp.asarray(rng.randint(0, 16, (N, 4)), jnp.int32)
    params = model.init(
        key, jnp.asarray(feats), jnp.asarray(lens, jnp.int32), refs,
        jnp.full((N,), 4, jnp.int32),
    )["params"]
    return model, params, feats, lens


def _push_all(rec, feats, lens, pieces, partials=False):
    """Feed `feats` in the given piece sizes; new_lens clips per stream."""
    sess = rec.start(feats.shape[0])
    t = 0
    for size in pieces:
        chunk = feats[:, t : t + size]
        new_lens = np.clip(lens - t, 0, chunk.shape[1])
        out = rec.push(sess, chunk, new_lens)
        if partials:
            assert all(np.asarray(x).shape[0] == feats.shape[0] for x in out)
        t += chunk.shape[1]
    assert t == feats.shape[1]
    return rec.finish(sess)


@pytest.mark.parametrize("pieces", [[45], [7, 20, 18], [1] * 45, [44, 1]])
def test_streaming_session_greedy_matches_one_shot(key, pieces):
    model, params, feats, lens = _setup(key)
    hyps, hyp_lens = model.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(lens, jnp.int32),
        3, method="greedy",
    )
    rec = StreamingTransducerRecognizer(
        model, params, chunk=4, mode="greedy", max_symbols_per_frame=3,
        max_frames=32,
    )
    sh, sl = _push_all(rec, feats, lens, pieces, partials=True)
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(hyp_lens))
    U = min(sh.shape[1], hyps.shape[1])
    np.testing.assert_array_equal(
        np.asarray(sh)[:, :U], np.asarray(hyps)[:, :U]
    )
    # reusing a finished session is an error
    sess = rec.start(3)
    rec.finish(sess)
    with pytest.raises(RuntimeError, match="finished"):
        rec.finish(sess)
    with pytest.raises(RuntimeError, match="finished"):
        rec.push(sess, feats[:, :1])


def test_streaming_session_beam_matches_one_shot(key):
    model, params, feats, lens = _setup(key, seed=3)
    bh, bl, bs = model.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(lens, jnp.int32),
        3, 2, method="beam",
    )
    rec = StreamingTransducerRecognizer(
        model, params, chunk=5, mode="beam", width=3,
        max_symbols_per_frame=2, max_frames=32,
    )
    sh, sl, ss = _push_all(rec, feats, lens, [9, 1, 25, 10])
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(bl))
    U = min(sh.shape[2], bh.shape[2])
    np.testing.assert_array_equal(
        np.asarray(sh)[:, :, :U], np.asarray(bh)[:, :, :U]
    )
    np.testing.assert_allclose(np.asarray(ss), np.asarray(bs), atol=1e-5)


def test_streaming_session_rejects_resume_and_noncausal(key):
    model, params, feats, lens = _setup(key)
    rec = StreamingTransducerRecognizer(
        model, params, chunk=4, max_frames=32
    )
    sess = rec.start(3)
    rec.push(sess, feats[:, :8], np.asarray([8, 2, 8]))
    with pytest.raises(RuntimeError, match="resume"):
        rec.push(sess, feats[:, 8:16], np.asarray([8, 8, 8]))
    # non-causal configs are rejected up front
    enc = dataclasses.replace(_ENC, attention_context=(None, None))
    model2 = ConformerTransducer(
        TransducerConfig(encoder=enc, pred_dim=12, joint_dim=12)
    )
    with pytest.raises(ValueError, match="causal"):
        StreamingTransducerRecognizer(model2, params)


def _ctc_setup(key, T=45, N=3, seed=5):
    from pydrobert_tpu.models import ConformerCTC

    cfg = dataclasses.replace(_ENC, vocab_size=12)
    model = ConformerCTC(cfg)
    rng = np.random.RandomState(seed)
    feats = rng.randn(N, T, 8).astype(np.float32)
    lens = np.asarray([T, T - 10, (T // 2) + 1], np.int64)[:N]
    params = model.init(
        key, jnp.asarray(feats), jnp.asarray(lens, jnp.int32)
    )["params"]
    return model, params, feats, lens


@pytest.mark.parametrize("pieces", [[45], [3, 30, 12], [44, 1]])
def test_streaming_ctc_session_matches_one_shot(key, pieces):
    from pydrobert_tpu.ops.decoding import CTCPrefixSearch
    from pydrobert_tpu.serving import StreamingCTCRecognizer

    model, params, feats, lens = _ctc_setup(key)
    logits, out_lens = model.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(lens, jnp.int32)
    )
    search = CTCPrefixSearch(4)
    y, y_lens, y_probs = search(jnp.swapaxes(logits, 0, 1), out_lens)

    rec = StreamingCTCRecognizer(
        model, params, chunk=4, width=4, decode_pad_multiple=16
    )
    sess = rec.start(3)
    t = 0
    for size in pieces:
        chunk = feats[:, t : t + size]
        out = rec.push(sess, chunk, np.clip(lens - t, 0, size), partials=True)
        assert out is not None and np.asarray(out[1]).shape == (3, 4)
        t += size
    sy, sy_lens, sy_probs = rec.finish(sess)
    np.testing.assert_array_equal(np.asarray(sy_lens), np.asarray(y_lens))
    np.testing.assert_allclose(
        np.asarray(sy_probs), np.asarray(y_probs), atol=1e-5
    )
    S = min(sy.shape[0], y.shape[0])
    # compare emitted tokens (positions < y_lens); padding is unspecified
    sy, y = np.asarray(sy)[:S], np.asarray(y)[:S]
    mask = np.arange(S)[:, None, None] < np.asarray(y_lens)[None]
    np.testing.assert_array_equal(np.where(mask, sy, -1), np.where(mask, y, -1))


def test_streaming_ctc_session_with_lm_fusion(key):
    from pydrobert_tpu.lm import LookupLanguageModel
    from pydrobert_tpu.ops.decoding import CTCPrefixSearch
    from pydrobert_tpu.serving import StreamingCTCRecognizer

    model, params, feats, lens = _ctc_setup(key, seed=9)
    V = 12
    rng = np.random.RandomState(2)
    uni = {w: (float(-rng.rand() * 4 - 0.1), float(-rng.rand()))
           for w in range(V)}
    uni[V] = (float("-inf"), float(-rng.rand()))
    bi = {
        (int(rng.randint(V + 1)), int(rng.randint(V))):
            float(-rng.rand() * 4 - 0.1)
        for _ in range(40)
    }
    lm = LookupLanguageModel(V, sos=V, prob_dicts=[uni, bi])
    logits, out_lens = model.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(lens, jnp.int32)
    )
    search = CTCPrefixSearch(3, beta=0.4, lm=lm)
    y, y_lens, y_probs = search(jnp.swapaxes(logits, 0, 1), out_lens)

    rec = StreamingCTCRecognizer(
        model, params, chunk=6, width=3, beta=0.4, lm=lm,
        decode_pad_multiple=16,
    )
    sess = rec.start(3)
    rec.push(sess, feats[:, :20], np.clip(lens, 0, 20))
    rec.push(sess, feats[:, 20:], np.clip(lens - 20, 0, 25))
    sy, sy_lens, sy_probs = rec.finish(sess)
    np.testing.assert_array_equal(np.asarray(sy_lens), np.asarray(y_lens))
    np.testing.assert_allclose(
        np.asarray(sy_probs), np.asarray(y_probs), atol=1e-5
    )


def test_streaming_session_compiles_one_encode_program(key):
    """Warm-up and steady-state pushes must share ONE compiled encode
    program: the margin window used to grow with the frontier for the
    first ~R/chunk pushes, recompiling the encoder every push (measured
    5.9 s/push over the remote-device tunnel, BENCH r3)."""
    model, params, feats, lens = _setup(key, T=60)
    rec = StreamingTransducerRecognizer(
        model, params, chunk=2, mode="greedy", max_symbols_per_frame=3,
        max_frames=32,
    )
    # R = num_layers * (left + conv_kernel - 1) = 2 * (4 + 4) = 16 post-
    # subsample frames; with chunk=2 the growing-window formulation would
    # compile ~8 distinct encode shapes over these pushes. Count TRACES
    # via a trace-time side effect (the wrapper body runs once per
    # distinct input signature) — `_cache_size()` proved flaky under the
    # full suite, where unrelated global cache churn empties it.
    import jax

    enc_traces, adv_traces = [], []
    enc_fn, adv_fn = rec._encode_chunk.__wrapped__, rec._advance.__wrapped__

    def enc_counting(*args):
        enc_traces.append(1)
        return enc_fn(*args)

    def adv_counting(*args):
        adv_traces.append(1)
        return adv_fn(*args)

    rec._encode_chunk = jax.jit(enc_counting)
    rec._advance = jax.jit(adv_counting)
    sess = rec.start(feats.shape[0])
    for t in range(0, 56, 8):
        rec.push(sess, feats[:, t : t + 8], np.clip(lens - t, 0, 8))
    assert len(enc_traces) == 1, len(enc_traces)
    assert len(adv_traces) == 1, len(adv_traces)
