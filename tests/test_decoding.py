import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pydrobert_tpu.ops import decoding as D
from pydrobert_tpu import lm as L


def _to_t(x):
    import torch

    return torch.tensor(np.asarray(x))


class TableLM(L.MixableSequentialLanguageModel):
    """log-probs depend only on the previous token (row 0 = start)."""

    def __init__(self, table):
        super().__init__(table.shape[1])
        self.table = jnp.asarray(table)

    def calc_idx_log_probs(self, hist, prev, idx):
        S, N = hist.shape
        idxs = jnp.broadcast_to(jnp.asarray(idx, jnp.int32), (N,))
        if S:
            prev_tok = jnp.take_along_axis(
                hist, jnp.clip(idxs - 1, 0, None)[None], axis=0
            )[0]
            prev_tok = jnp.where(idxs > 0, prev_tok, -1)
        else:
            prev_tok = jnp.full((N,), -1, jnp.int32)
        return self.table[prev_tok + 1], prev

    def extract_by_src(self, prev, src):
        return prev

    def mix_by_mask(self, a, b, mask):
        return a


def make_ref_table_lm(ref_torch, table):
    import sys

    sys.path.insert(0, "/root/reference/src")
    import torch
    from pydrobert.torch.modules import MixableSequentialLanguageModel

    class RefTableLM(MixableSequentialLanguageModel):
        def __init__(self, table):
            super().__init__(table.shape[1])
            self.register_buffer("table", table)

        def calc_idx_log_probs(self, hist, prev, idx):
            S, N = hist.shape
            if idx.dim() == 0:
                idxs = idx.expand(N)
            else:
                idxs = idx
            if S:
                prev_tok = hist.gather(
                    0, (idxs - 1).clamp(min=0).unsqueeze(0)
                ).squeeze(0)
                prev_tok = torch.where(
                    idxs > 0, prev_tok, torch.full_like(prev_tok, -1)
                )
            else:
                prev_tok = torch.full((N,), -1, dtype=torch.long)
            return self.table[prev_tok + 1], prev

        def extract_by_src(self, prev, src):
            return prev

        def mix_by_mask(self, a, b, mask):
            return a

    return RefTableLM(_to_t(table))


def _rand_table(V, seed=None):
    t = np.random.randn(V + 1, V).astype(np.float32)
    return t - np.log(np.exp(t).sum(-1, keepdims=True))


def test_beam_search_advance_parity(ref_torch):
    N, Kp, V, S, width = 4, 3, 7, 5, 5
    log_probs_t = np.log(
        np.random.dirichlet(np.ones(V), (N, Kp)).astype(np.float32)
    )
    log_probs_prev = np.random.randn(N, Kp).astype(np.float32)
    y_prev = np.random.randint(0, V, (S, N, Kp))
    y_prev_lens = np.random.randint(0, S + 1, (N, Kp))
    exp = ref_torch.functional.beam_search_advance(
        _to_t(log_probs_t), width, _to_t(log_probs_prev), _to_t(y_prev),
        _to_t(y_prev_lens),
    )
    act = D.beam_search_advance(
        log_probs_t, width, log_probs_prev, y_prev, y_prev_lens
    )
    exp_y, exp_lens, exp_lp, exp_src = (e.numpy() for e in exp)
    act_y, act_lens, act_lp, act_src = (np.asarray(a) for a in act)
    np.testing.assert_array_equal(act_lens, exp_lens)
    np.testing.assert_allclose(act_lp, exp_lp, rtol=1e-5)
    np.testing.assert_array_equal(act_src, exp_src)
    for n in range(N):
        for k in range(width):
            ln = act_lens[n, k]
            np.testing.assert_array_equal(
                act_y[:ln, n, k], exp_y[:ln, n, k], err_msg=f"n={n} k={k}"
            )


@pytest.mark.parametrize("eos", [None, 0])
@pytest.mark.parametrize("finish_all", [False, True])
@pytest.mark.parametrize("width", [1, 4])
def test_beam_search_parity(ref_torch, eos, finish_all, width):
    import sys

    sys.path.insert(0, "/root/reference/src")
    from pydrobert.torch.modules import BeamSearch as RefBeamSearch

    V, N, max_iters = 6, 5, 12
    table = _rand_table(V)
    ref_lm = make_ref_table_lm(ref_torch, table)
    ref_bs = RefBeamSearch(
        ref_lm, width, eos=eos, finish_all_paths=finish_all
    )
    exp_y, exp_lens, exp_lp = (
        e.numpy() for e in ref_bs(batch_size=N, max_iters=max_iters)
    )
    bs = D.BeamSearch(TableLM(table), width, eos=eos, finish_all_paths=finish_all)
    act_y, act_lens, act_lp = (
        np.asarray(a)
        for a in bs(batch_size=N, max_iters=max_iters)
    )
    np.testing.assert_array_equal(act_lens, exp_lens)
    np.testing.assert_allclose(act_lp, exp_lp, rtol=1e-4, atol=1e-5)
    for n in range(N):
        for k in range(width):
            ln = act_lens[n, k]
            np.testing.assert_array_equal(
                act_y[:ln, n, k], exp_y[:ln, n, k], err_msg=f"n={n} k={k}"
            )


def test_beam_search_width1_is_greedy():
    V, N, max_iters = 8, 4, 6
    table = _rand_table(V)
    bs = D.BeamSearch(TableLM(table), 1)
    y, lens, lp = bs(batch_size=N, max_iters=max_iters)
    y = np.asarray(y)[:, :, 0]
    # greedy rollout by hand
    for n in range(N):
        prev = -1
        for t in range(max_iters):
            exp_tok = int(np.argmax(table[prev + 1]))
            assert y[t, n] == exp_tok
            prev = exp_tok


@pytest.mark.parametrize("batch_first", [False, True])
@pytest.mark.parametrize("is_probs", [False, True])
@pytest.mark.parametrize("use_lens", [False, True])
def test_ctc_greedy_search_parity(ref_torch, batch_first, is_probs, use_lens):
    T, N, V = 11, 5, 6
    logits = np.random.randn(T, N, V).astype(np.float32)
    if is_probs:
        logits = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    if batch_first:
        logits = logits.transpose(1, 0, 2)
    in_lens = np.random.randint(1, T + 1, (N,)) if use_lens else None
    exp = ref_torch.functional.ctc_greedy_search(
        _to_t(logits),
        None if in_lens is None else _to_t(in_lens),
        batch_first=batch_first,
        is_probs=is_probs,
    )
    act = D.ctc_greedy_search(
        logits, in_lens, batch_first=batch_first, is_probs=is_probs
    )
    exp_max, exp_paths, exp_lens = (e.numpy() for e in exp)
    act_max, act_paths, act_lens = (np.asarray(a) for a in act)
    np.testing.assert_array_equal(act_lens, exp_lens)
    np.testing.assert_allclose(act_max, exp_max, rtol=1e-4, atol=1e-5)
    if not batch_first:
        exp_paths, act_paths = exp_paths.T, act_paths.T
    for n in range(N):
        np.testing.assert_array_equal(
            act_paths[n, : act_lens[n]], exp_paths[n, : exp_lens[n]]
        )


@pytest.mark.parametrize("width", [1, 2, 8])
@pytest.mark.parametrize("use_lens", [False, True])
def test_ctc_prefix_search_parity_no_lm(ref_torch, width, use_lens):
    import sys

    sys.path.insert(0, "/root/reference/src")
    from pydrobert.torch.modules import CTCPrefixSearch as RefCTC

    T, N, V = 9, 4, 5
    logits = np.random.randn(T, N, V + 1).astype(np.float32)
    lens = np.random.randint(0, T + 1, (N,)) if use_lens else None
    ref_search = RefCTC(width)
    exp_y, exp_lens, exp_p = (
        e.numpy()
        for e in ref_search(
            _to_t(logits), None if lens is None else _to_t(lens)
        )
    )
    search = D.CTCPrefixSearch(width)
    act_y, act_lens, act_p = (
        np.asarray(a)
        for a in search(logits, None if lens is None else lens)
    )
    np.testing.assert_array_equal(act_lens, exp_lens)
    np.testing.assert_allclose(act_p, exp_p, rtol=1e-4, atol=1e-6)
    for n in range(N):
        for k in range(width):
            ln = act_lens[n, k]
            np.testing.assert_array_equal(
                act_y[:ln, n, k], exp_y[:ln, n, k], err_msg=f"n={n} k={k}"
            )


@pytest.mark.parametrize("beta", [0.3, 1.0])
@pytest.mark.parametrize("valid_mixture", [False, True])
def test_ctc_prefix_search_parity_fused(ref_torch, beta, valid_mixture):
    import sys

    sys.path.insert(0, "/root/reference/src")
    from pydrobert.torch.modules import CTCPrefixSearch as RefCTC

    T, N, V, width = 7, 3, 5, 4
    logits = np.random.randn(T, N, V + 1).astype(np.float32)
    lens = np.random.randint(1, T + 1, (N,))
    table = _rand_table(V)
    ref_lm = make_ref_table_lm(ref_torch, table)
    ref_search = RefCTC(width, beta, ref_lm, valid_mixture=valid_mixture)
    exp_y, exp_lens, exp_p = (
        e.numpy() for e in ref_search(_to_t(logits), _to_t(lens))
    )
    search = D.CTCPrefixSearch(
        width, beta, TableLM(table), valid_mixture=valid_mixture
    )
    act_y, act_lens, act_p = (np.asarray(a) for a in search(logits, lens))
    np.testing.assert_array_equal(act_lens, exp_lens)
    np.testing.assert_allclose(act_p, exp_p, rtol=1e-4, atol=1e-6)
    for n in range(N):
        for k in range(width):
            ln = act_lens[n, k]
            np.testing.assert_array_equal(
                act_y[:ln, n, k], exp_y[:ln, n, k], err_msg=f"n={n} k={k}"
            )


def _midscale_logits(T, N, V, seed):
    """CTC-shaped logits at mid scale: strongly blank-dominated frames
    (blank prob ~0.95) with sparse token spikes. The concentration is
    load-bearing: with diffuse frames, prefix masses decay into f32
    DENORMAL range by ~frame 45 at V=256, where torch (keeps denormals)
    and XLA (flushes to zero) genuinely diverge — a float-environment
    difference, not an algorithm one. Keeping per-frame winner mass ~0.9
    keeps every beam's mass in normal f32 range across all T frames."""
    rng = np.random.RandomState(seed)
    logits = rng.randn(T, N, V + 1).astype(np.float32)
    logits[..., V] += 9.0  # blank prob ~ e^9 / (e^9 + V e^.5) ~ 0.95
    for n in range(N):
        idx = rng.choice(T, size=T // 4, replace=False)
        logits[idx, n, rng.randint(V, size=T // 4)] += 12.0
    return logits


@pytest.mark.slow
@pytest.mark.parametrize("fused", [False, True])
def test_ctc_prefix_search_parity_midscale(ref_torch, fused):
    """Hypothesis parity vs the imported PyTorch reference at a MID-SCALE
    shape (VERDICT r3 #6: toy-shape parity doesn't stretch the hoisted
    top-M with V/M ~ 16, the MASS_PAD sentinels, or the bucket-gated
    kernel paths). T=100, N=8, V=256, W=8 => M = 2W = 16, V/M = 16.
    Exact length/hypothesis match, probs to 1e-4, no-LM and beta-fused.
    (Reference anchor: /root/reference/tests/test_decoding.py:505-700.)"""
    import sys

    sys.path.insert(0, "/root/reference/src")
    from pydrobert.torch.modules import CTCPrefixSearch as RefCTC

    T, N, V, width = 100, 8, 256, 8
    logits = _midscale_logits(T, N, V, seed=2024 + fused)
    lens = np.random.RandomState(7).randint(T // 2, T + 1, (N,))
    if fused:
        table = _rand_table(V)
        ref_search = RefCTC(width, 0.4, make_ref_table_lm(ref_torch, table))
        search = D.CTCPrefixSearch(width, 0.4, TableLM(table))
    else:
        ref_search = RefCTC(width)
        search = D.CTCPrefixSearch(width)
    exp_y, exp_lens, exp_p = (
        e.numpy() for e in ref_search(_to_t(logits), _to_t(lens))
    )
    act_y, act_lens, act_p = (np.asarray(a) for a in search(logits, lens))
    np.testing.assert_array_equal(act_lens, exp_lens)
    np.testing.assert_allclose(act_p, exp_p, rtol=1e-4, atol=1e-12)
    for n in range(N):
        for k in range(width):
            ln = act_lens[n, k]
            np.testing.assert_array_equal(
                act_y[:ln, n, k], exp_y[:ln, n, k], err_msg=f"n={n} k={k}"
            )


@pytest.mark.slow
def test_ctc_beam_kernel_interpret_matches_reference_midscale(ref_torch):
    """The EXACT whole-loop kernel body (batch-tiled grid) in Pallas
    interpret mode vs the imported PyTorch reference at the same mid-scale
    shape as above — pins the kernel path itself, not just the XLA scan,
    beyond toy shapes."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    from pydrobert.torch.modules import CTCPrefixSearch as RefCTC

    from pydrobert_tpu.ops.pallas import ctc_beam_search_pallas

    T, N, V, width = 100, 8, 256, 8
    logits = _midscale_logits(T, N, V, seed=4048)
    lens = np.random.RandomState(9).randint(T // 2, T + 1, (N,))
    exp_y, exp_lens, exp_p = (
        e.numpy() for e in RefCTC(width)(_to_t(logits), _to_t(lens))
    )
    probs = jax.nn.softmax(jnp.asarray(logits), 2)
    act_y, act_lens, act_p = (
        np.asarray(a)
        for a in ctc_beam_search_pallas(
            probs[..., :V], probs[..., V], jnp.asarray(lens, jnp.int32),
            width, interpret=True,
        )
    )
    np.testing.assert_array_equal(act_lens, exp_lens)
    fin = np.isfinite(exp_p)
    assert (np.isfinite(act_p) == fin).all()
    np.testing.assert_allclose(
        np.where(fin, act_p, 0), np.where(fin, exp_p, 0), rtol=1e-4,
        atol=1e-12,
    )
    for n in range(N):
        for k in range(width):
            ln = act_lens[n, k]
            np.testing.assert_array_equal(
                act_y[:ln, n, k], exp_y[:ln, n, k], err_msg=f"n={n} k={k}"
            )


def test_fused_am_fetch_formulations_bit_equal(monkeypatch):
    """The in-loop acoustic fetch's two formulations — one-hot contraction
    (small shapes) and where-reduce (above AM_ONEHOT_MAX_ELEMS, the
    one-hot predicate generated inside the reduce's input fusion, never
    materialized) — produce BIT-IDENTICAL search results: both read the
    same clamped operands with one nonzero term per reduction row."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(23)
    T, N, V, W = 6, 4, 16, 4
    logits = rng.randn(T, N, V + 1).astype(np.float32)
    lens = rng.randint(1, T + 1, (N,))
    lm = _random_fused_lm(V, 3, seed=5)
    search = D.CTCPrefixSearch(W, beta=0.5, lm=lm)
    monkeypatch.setattr(tpu_config, "AM_ONEHOT_MAX_ELEMS", 1 << 40)
    y1, l1, p1 = (np.asarray(a) for a in search(logits, lens))
    monkeypatch.setattr(tpu_config, "AM_ONEHOT_MAX_ELEMS", 0)
    y2, l2, p2 = (np.asarray(a) for a in search(logits, lens))
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_array_equal(p1, p2)


@pytest.mark.parametrize("unroll", [2, 3])
def test_ctc_prefix_search_unroll_invariant(monkeypatch, unroll):
    """DECODE_SCAN_UNROLL must not change results — including factors that
    don't divide T - 1 (XLA compiles a remainder epilogue body)."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(100 + unroll)
    T, N, V, W = 8, 3, 6, 4  # T - 1 = 7: prime, never divisible
    logits = rng.randn(T, N, V + 1).astype(np.float32)
    lens = rng.randint(1, T + 1, (N,))
    lm = _random_fused_lm(V, 3, seed=unroll)
    for search in (
        D.CTCPrefixSearch(W),
        D.CTCPrefixSearch(W, beta=0.5, lm=lm),
    ):
        monkeypatch.setattr(tpu_config, "DECODE_SCAN_UNROLL", 1)
        y1, l1, p1 = (np.asarray(a) for a in search(logits, lens))
        monkeypatch.setattr(tpu_config, "DECODE_SCAN_UNROLL", unroll)
        yu, lu, pu = (np.asarray(a) for a in search(logits, lens))
        np.testing.assert_array_equal(l1, lu)
        np.testing.assert_array_equal(p1, pu)
        np.testing.assert_array_equal(y1, yu)


def test_ctc_prefix_width1_matches_greedyish():
    # sanity: the width-1 top path has probability <= 1 and valid tokens
    T, N, V = 8, 3, 4
    logits = np.random.randn(T, N, V + 1).astype(np.float32)
    y, lens, p = D.CTCPrefixSearch(1)(logits)
    assert (np.asarray(p) <= 1 + 1e-5).all()
    assert (np.asarray(y) < V).all() and (np.asarray(y) >= 0).all()


def test_random_walk_distribution(key):
    # unigram LM: empirical token frequencies should match the table
    V, N = 4, 2000
    probs = np.random.dirichlet(np.ones(V) * 5)
    table = np.log(np.tile(probs, (V + 1, 1))).astype(np.float32)
    walk = D.RandomWalk(TableLM(table))
    y, lens, lp = walk(key, batch_size=N, max_iters=3)
    y = np.asarray(y)
    assert (np.asarray(lens) == 3).all()
    freq = np.bincount(y.ravel(), minlength=V) / y.size
    np.testing.assert_allclose(freq, probs, atol=0.05)
    # log probs should equal the sum of the per-token table entries
    exp_lp = sum(
        table[(np.concatenate([[-1] * N]) if t == 0 else y[t - 1]) + 1, y[t]]
        for t in range(3)
    )
    np.testing.assert_allclose(np.asarray(lp), exp_lp, rtol=1e-4, atol=1e-4)


def test_random_walk_eos(key):
    V, N = 4, 300
    table = _rand_table(V)
    walk = D.RandomWalk(TableLM(table), eos=0)
    y, lens, lp = walk(key, batch_size=N, max_iters=20)
    y, lens = np.asarray(y), np.asarray(lens)
    for n in range(min(N, 50)):
        seq = y[: lens[n], n]
        assert (seq[:-1] != 0).all()
        if lens[n] < 20:
            assert seq[-1] == 0


def test_random_walk_advance_parity_shapes(key):
    N, V, S = 5, 6, 4
    log_probs_t = np.log(
        np.random.dirichlet(np.ones(V), N).astype(np.float32)
    )
    log_probs_prev = np.random.randn(N).astype(np.float32)
    y_prev = np.random.randint(0, V, (S, N))
    y_prev_lens = np.random.randint(0, S + 1, (N,))
    y_next, lp_next = D.random_walk_advance(
        key, log_probs_t, log_probs_prev, y_prev, y_prev_lens
    )
    y_next, lp_next = np.asarray(y_next), np.asarray(lp_next)
    assert y_next.shape == (S + 1, N)
    for n in range(N):
        ln = y_prev_lens[n]
        np.testing.assert_array_equal(y_next[:ln, n], y_prev[:ln, n])
        tok = y_next[ln, n]
        np.testing.assert_allclose(
            lp_next[n], log_probs_prev[n] + log_probs_t[n, tok], rtol=1e-5
        )


@pytest.mark.parametrize("dim", [0, 1])
@pytest.mark.parametrize("eos", [None, 0])
def test_sequence_log_probs_parity(ref_torch, dim, eos):
    S, N, V = 8, 5, 7
    logits = np.random.randn(S, N, V).astype(np.float32)
    hyp = np.random.randint(0, V, (S, N))
    if dim == 1:
        logits = logits.transpose(1, 0, 2)
        hyp = hyp.T
    exp = ref_torch.functional.sequence_log_probs(
        _to_t(logits), _to_t(hyp), dim=dim, eos=eos
    ).numpy()
    act = np.asarray(D.sequence_log_probs(logits, hyp, dim=dim, eos=eos))
    np.testing.assert_allclose(act, exp, rtol=1e-4, atol=1e-5)


def test_searches_jit(key):
    # entire searches compile under jit with static widths
    V, N, W, T = 5, 3, 3, 6
    table = _rand_table(V)
    bs = D.BeamSearch(TableLM(table), W, eos=0)

    @jax.jit
    def run_beam():
        return bs(batch_size=N, max_iters=T)

    y, lens, lp = run_beam()
    assert y.shape == (T, N, W)

    search = D.CTCPrefixSearch(W)

    @jax.jit
    def run_ctc(logits):
        return search(logits)

    logits = jnp.asarray(np.random.randn(T, N, V + 1).astype(np.float32))
    y, lens, p = run_ctc(logits)
    assert y.shape == (T, N, W)


def test_ctc_prefix_search_tiny_vocab_wide_beam(ref_torch, seeded, jit_fn):
    """Factored fast path with V < 2W and width > V (K capping)."""
    import torch

    T, N, V, W = 7, 3, 3, 8
    logits = np.random.randn(T, N, V + 1).astype(np.float32)
    lens = np.random.randint(1, T + 1, (N,)).astype(np.int64)
    ours = __import__(
        "pydrobert_tpu.ops.decoding", fromlist=["CTCPrefixSearch"]
    ).CTCPrefixSearch(W)
    y_a, lens_a, probs_a = jit_fn(lambda l, n: ours(l, n))(
        jnp.asarray(logits), jnp.asarray(lens, jnp.int32)
    )
    ref = ref_torch.modules.CTCPrefixSearch(W)
    y_e, lens_e, probs_e = ref(
        torch.as_tensor(logits), torch.as_tensor(lens)
    )
    lens_a, lens_e = np.asarray(lens_a), lens_e.numpy()
    np.testing.assert_array_equal(lens_a, lens_e)
    np.testing.assert_allclose(
        np.asarray(probs_a), probs_e.numpy(), atol=1e-5
    )
    y_a, y_e = np.asarray(y_a), y_e.numpy()
    for n in range(N):
        for k in range(W):
            L = lens_a[n, k]
            np.testing.assert_array_equal(
                y_a[:L, n, k], y_e[:L, n, k], err_msg=f"n={n} k={k}"
            )


def test_beam_kernel_gate_modes(monkeypatch):
    """beam_kernel_preferred honors forced modes — but forced-on is still a
    no-op off TPU (the kernel can't lower there; an exported
    USE_PALLAS_BEAM=1 from a TPU job script must not crash a CPU box) —
    and is a cheap False on non-TPU backends under 'auto' (no calibration
    attempted)."""
    from pydrobert_tpu import config
    from pydrobert_tpu.ops import pallas

    on_tpu = pallas.tpu_available()
    monkeypatch.setattr(config, "USE_PALLAS_BEAM", "1")
    assert pallas.beam_kernel_preferred() is on_tpu
    monkeypatch.setattr(config, "USE_PALLAS_BEAM", True)
    assert pallas.beam_kernel_preferred() is on_tpu
    monkeypatch.setattr(config, "USE_PALLAS_BEAM", "0")
    assert pallas.beam_kernel_preferred() is False
    monkeypatch.setattr(config, "USE_PALLAS_BEAM", "auto")
    if not on_tpu:
        assert pallas.beam_kernel_preferred() is False
        # the forced path must also leave the search usable end-to-end
        monkeypatch.setattr(config, "USE_PALLAS_BEAM", "1")
        logits = np.random.randn(6, 2, 5).astype(np.float32)
        y, lens, probs = D.CTCPrefixSearch(2)(logits)
        assert np.isfinite(np.asarray(probs)).all()


@pytest.mark.parametrize("shape", [(12, 4, 16, 4), (20, 3, 32, 8), (15, 5, 8, 4)])
def test_ctc_beam_kernel_simulator_matches_search(shape):
    """The Pallas whole-loop beam kernel's step math (pure-XLA simulator)
    matches CTCPrefixSearch bitwise, including frozen/zero-length rows."""
    from pydrobert_tpu.ops.pallas import ctc_beam_search_reference

    T, N, V, W = shape
    rng = np.random.RandomState(T + N + V)
    logits = jnp.asarray(rng.randn(T, N, V + 1) * 2, jnp.float32)
    lens = jnp.asarray(rng.randint(0, T + 1, (N,)), jnp.int32)
    lens = lens.at[0].set(T)
    probs = jax.nn.softmax(logits, 2)
    y1, l1, p1 = ctc_beam_search_reference(
        probs[..., :V], probs[..., V], lens, W
    )
    y0, l0, p0 = D.CTCPrefixSearch(W)(logits, lens)
    y0, l0, p0, y1, l1, p1 = map(np.asarray, (y0, l0, p0, y1, l1, p1))
    assert (l0 == l1).all()
    assert (np.isfinite(p0) == np.isfinite(p1)).all()
    fin = np.isfinite(p0)
    assert (np.where(fin, p0 - p1, 0) == 0).all()
    assert all(
        (y0[: l0[n, w], n, w] == y1[: l0[n, w], n, w]).all()
        for n in range(N)
        for w in range(W)
    )


def _advance_both(probs, W, state):
    """Run the general and factored advances on identical inputs/state."""
    nonext, blank = probs
    N, V = nonext.shape
    ext = jnp.broadcast_to(nonext[:, None], (N,) + state["last"].shape[1:] + (V,))
    Kp = state["last"].shape[1]
    ext = jnp.broadcast_to(nonext[:, None], (N, Kp, V))
    gen = D.ctc_prefix_search_advance(
        (ext, nonext, blank), W, (state["nb"], state["b"]),
        state["y"], state["last"], state["lens"], state["ip"],
    )
    M = min(V, 2 * W)
    tv, ti = jax.lax.top_k(nonext, M)
    fac = D.ctc_prefix_search_advance_factored(
        (tv, ti), nonext, blank, W, (state["nb"], state["b"]),
        state["y"], state["last"], state["lens"], state["ip"],
    )
    return gen, fac


def _state_from(out, prev_y):
    y, last, lens, (nb, b), ip, src, is_nonext = out
    return dict(y=y, last=last, lens=lens, nb=nb, b=b, ip=ip)


@pytest.mark.parametrize("trial", range(4))
@pytest.mark.slow
def test_factored_advance_fuzz_continuous(trial):
    """With continuous random probabilities (no ties), the factored advance
    equals the general advance exactly at every step."""
    rng = np.random.RandomState(1000 + trial)
    N, V, W, T = 3, 24, 6, 8
    state = dict(
        y=jnp.zeros((0, N, 1), jnp.int32),
        last=jnp.zeros((N, 1), jnp.int32),
        lens=jnp.zeros((N, 1), jnp.int32),
        nb=jnp.zeros((N, 1)),
        b=jnp.ones((N, 1)),
        ip=jnp.ones((N, 1, 1), bool),
    )
    for t in range(T):
        p = jax.nn.softmax(jnp.asarray(rng.randn(N, V + 1) * 2), -1)
        gen, fac = _advance_both((p[:, :V], p[:, V]), W, state)
        for g, f, name in zip(gen, fac, ("y", "last", "lens", "probs", "ip", "src", "nonext")):
            if name == "probs":
                np.testing.assert_allclose(
                    np.asarray(g[0]), np.asarray(f[0]), rtol=1e-6, atol=1e-30,
                    err_msg=f"t={t} nb",
                )
                np.testing.assert_allclose(
                    np.asarray(g[1]), np.asarray(f[1]), rtol=1e-6, atol=1e-30,
                    err_msg=f"t={t} b",
                )
            elif name == "y":
                # buffer rows past each beam's length are scratch (the two
                # paths write different placeholder tokens there); compare
                # the semantic region only
                yl = np.asarray(gen[2])
                yg, yf = np.asarray(g), np.asarray(f)
                for n in range(yl.shape[0]):
                    for w in range(yl.shape[1]):
                        np.testing.assert_array_equal(
                            yg[: yl[n, w], n, w],
                            yf[: yl[n, w], n, w],
                            err_msg=f"t={t} y[{n},{w}]",
                        )
            else:
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(f), err_msg=f"t={t} {name}"
                )
        state = _state_from(gen, state["y"])


@pytest.mark.parametrize("trial", range(4))
@pytest.mark.slow
def test_factored_advance_fuzz_ties(trial):
    """Under adversarial ties (probabilities quantized to a handful of
    values), both advances must select the same multiset of candidate
    scores, even if tie-breaking picks different equal-scoring prefixes."""
    rng = np.random.RandomState(2000 + trial)
    N, V, W, T = 3, 16, 6, 6
    state = dict(
        y=jnp.zeros((0, N, 1), jnp.int32),
        last=jnp.zeros((N, 1), jnp.int32),
        lens=jnp.zeros((N, 1), jnp.int32),
        nb=jnp.zeros((N, 1)),
        b=jnp.ones((N, 1)),
        ip=jnp.ones((N, 1, 1), bool),
    )
    # warm up two continuous steps so the beam is full, then a tied step
    for t in range(2):
        p = jax.nn.softmax(jnp.asarray(rng.randn(N, V + 1) * 2), -1)
        gen, _ = _advance_both((p[:, :V], p[:, V]), W, state)
        state = _state_from(gen, state["y"])
    # heavy ties: only 3 distinct probability values across the vocab
    q = rng.choice([0.2, 0.3, 0.5], size=(N, V + 1))
    q = jnp.asarray(q / q.sum(-1, keepdims=True))
    gen, fac = _advance_both((q[:, :V], q[:, V]), W, state)
    tot_g = np.sort(np.asarray(gen[3][0] + gen[3][1]), -1)
    tot_f = np.sort(np.asarray(fac[3][0] + fac[3][1]), -1)
    np.testing.assert_allclose(tot_g, tot_f, rtol=1e-6, atol=1e-30)
    np.testing.assert_array_equal(
        np.sort(np.asarray(gen[2]), -1), np.sort(np.asarray(fac[2]), -1)
    )


def _random_fused_lm(V, Ngram, seed, density=60):
    from pydrobert_tpu.lm import LookupLanguageModel

    rng = np.random.RandomState(seed)
    sos = V
    uni = {
        w: (float(-rng.rand() * 5 - 0.1), float(-rng.rand())) for w in range(V)
    }
    uni[sos] = (float("-inf"), float(-rng.rand()))
    dicts = [uni]
    ctx_pool = list(range(V)) + [sos]
    for n in range(2, Ngram + 1):
        d = {}
        for _ in range(density):
            key = tuple(
                int(rng.choice(ctx_pool)) for _ in range(n - 1)
            ) + (int(rng.randint(V)),)
            val = float(-rng.rand() * 5 - 0.1)
            d[key] = val if n == Ngram else (val, float(-rng.rand()))
        dicts.append(d)
    return LookupLanguageModel(V, sos=sos, prob_dicts=dicts)


@pytest.mark.parametrize("trial", range(4))
def test_ctc_fused_sparse_matches_dense_advance(trial):
    """The sparse-slot fused advance (shared top-M + per-beam n-gram
    corrections) returns the same hypotheses and probabilities as the dense
    per-beam-V fused advance, up to ties."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(4000 + trial)
    V = int(rng.randint(4, 40))
    Ngram = int(rng.randint(2, 5))
    W = int(rng.randint(1, 9))
    T = int(rng.randint(1, 12))
    N = int(rng.randint(1, 4))
    lm = _random_fused_lm(V, Ngram, 5000 + trial, density=int(rng.randint(1, 200)))
    beta = float(rng.rand() * 2)
    logits = jnp.asarray(rng.randn(T, N, V + 1), np.float32)
    lens = jnp.asarray(rng.randint(0, T + 1, (N,)).astype(np.int32))
    old = tpu_config.SPARSE_FUSION_MAX_CORRECTIONS
    try:
        tpu_config.SPARSE_FUSION_MAX_CORRECTIONS = -1
        dy, dlens, dprobs = D.CTCPrefixSearch(W, beta=beta, lm=lm)(logits, lens)
        tpu_config.SPARSE_FUSION_MAX_CORRECTIONS = 10**9
        sy, slens, sprobs = D.CTCPrefixSearch(W, beta=beta, lm=lm)(logits, lens)
    finally:
        tpu_config.SPARSE_FUSION_MAX_CORRECTIONS = old
    dy, dlens, dprobs = (np.asarray(x) for x in (dy, dlens, dprobs))
    sy, slens, sprobs = (np.asarray(x) for x in (sy, slens, sprobs))
    np.testing.assert_allclose(
        np.sort(dprobs, -1), np.sort(sprobs, -1), rtol=3e-5, atol=1e-7
    )
    for n in range(N):
        for k in range(W):
            if np.isinf(dprobs[n, k]):
                continue  # padding beam: token content unconstrained
            L = dlens[n, k]
            ok = any(
                slens[n, kk] == L and (sy[:L, n, kk] == dy[:L, n, k]).all()
                for kk in range(W)
                if abs(sprobs[n, kk] - dprobs[n, k])
                < 1e-4 * max(1, abs(dprobs[n, k]))
            )
            assert ok, (trial, n, k, dy[:L, n, k], dprobs[n, k], sprobs[n])


@pytest.mark.parametrize("trial", range(4))
def test_ctc_fused_gather_membership_matches_compare(trial, monkeypatch):
    """The gather-based n-gram membership path (SPARSE_MEMBERSHIP_GATHER,
    dense bigram table + short high-order tail) returns the same results
    as the default compare-based sparse advance, up to ties."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(4100 + trial)
    V = int(rng.randint(4, 40))
    Ngram = int(rng.randint(2, 5))
    W = int(rng.randint(1, 9))
    T = int(rng.randint(1, 12))
    N = int(rng.randint(1, 4))
    lm = _random_fused_lm(V, Ngram, 5100 + trial, density=int(rng.randint(1, 200)))
    beta = float(rng.rand() * 2)
    logits = jnp.asarray(rng.randn(T, N, V + 1), np.float32)
    lens = jnp.asarray(rng.randint(0, T + 1, (N,)).astype(np.int32))
    monkeypatch.setattr(tpu_config, "SPARSE_MEMBERSHIP_GATHER", False)
    dy, dlens, dprobs = D.CTCPrefixSearch(W, beta=beta, lm=lm)(logits, lens)
    monkeypatch.setattr(tpu_config, "SPARSE_MEMBERSHIP_GATHER", True)
    assert lm.order2_values() is not None
    sy, slens, sprobs = D.CTCPrefixSearch(W, beta=beta, lm=lm)(logits, lens)
    dy, dlens, dprobs = (np.asarray(x) for x in (dy, dlens, dprobs))
    sy, slens, sprobs = (np.asarray(x) for x in (sy, slens, sprobs))
    np.testing.assert_allclose(
        np.sort(dprobs, -1), np.sort(sprobs, -1), rtol=3e-5, atol=1e-7
    )
    for n in range(N):
        for k in range(W):
            if np.isinf(dprobs[n, k]):
                continue
            L = dlens[n, k]
            ok = any(
                slens[n, kk] == L and (sy[:L, n, kk] == dy[:L, n, k]).all()
                for kk in range(W)
                if abs(sprobs[n, kk] - dprobs[n, k])
                < 1e-4 * max(1, abs(dprobs[n, k]))
            )
            assert ok, (trial, n, k, dy[:L, n, k], dprobs[n, k], sprobs[n])


@pytest.mark.parametrize("trial", range(4))
def test_beam_search_sparse_matches_dense(trial):
    """BeamSearch over a LookupLanguageModel via static-top-M + per-beam
    correction slots equals the dense V-wide scoring, up to f32-rounding
    ties at the beam-cut boundary."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(6000 + trial)
    V = int(rng.randint(4, 30))
    Ngram = int(rng.randint(2, 5))
    W = int(rng.randint(1, 7))
    N = int(rng.randint(1, 4))
    S = int(rng.randint(1, 10))
    eos = int(rng.randint(V)) if rng.rand() < 0.7 else None
    fap = bool(rng.rand() < 0.5)
    lm = _random_fused_lm(V, Ngram, 7000 + trial, density=int(rng.randint(1, 150)))
    kw = dict(eos=eos, finish_all_paths=fap) if eos is not None else {}
    old = tpu_config.SPARSE_FUSION_MAX_CORRECTIONS
    try:
        tpu_config.SPARSE_FUSION_MAX_CORRECTIONS = -1
        d_y, d_lens, d_lp = D.BeamSearch(lm, W, **kw)(batch_size=N, max_iters=S)
        tpu_config.SPARSE_FUSION_MAX_CORRECTIONS = 10**9
        s_y, s_lens, s_lp = D.BeamSearch(lm, W, **kw)(batch_size=N, max_iters=S)
    finally:
        tpu_config.SPARSE_FUSION_MAX_CORRECTIONS = old
    d_y, d_lens, d_lp = (np.asarray(x) for x in (d_y, d_lens, d_lp))
    s_y, s_lens, s_lp = (np.asarray(x) for x in (s_y, s_lens, s_lp))
    np.testing.assert_allclose(
        np.sort(d_lp, -1), np.sort(s_lp, -1), rtol=2e-5, atol=1e-4
    )
    for n in range(N):
        cut = d_lp[n, W - 1]
        for k in range(W):
            if np.isinf(d_lp[n, k]):
                continue
            if d_lp[n, k] <= cut + 1e-4 * max(1, abs(cut)) and k != 0:
                continue  # rounding can flip membership at the cut boundary
            L = d_lens[n, k]
            ok = any(
                s_lens[n, kk] == L and (s_y[:L, n, kk] == d_y[:L, n, k]).all()
                for kk in range(W)
                if abs(s_lp[n, kk] - d_lp[n, k])
                < 1e-4 * max(1, abs(d_lp[n, k]))
            )
            assert ok, (trial, n, k, d_y[:L, n, k], d_lp[n, k], s_lp[n])


@pytest.mark.parametrize("trial", range(3))
def test_ctc_fused_unigram_matches_dense_advance(trial):
    """Unigram-LM fusion through the factored advance (beam-independent LM
    weights; fused/plain last-token split) equals the dense fused advance."""
    from pydrobert_tpu import config as tpu_config
    from pydrobert_tpu.lm import LookupLanguageModel

    rng = np.random.RandomState(8000 + trial)
    V = int(rng.randint(4, 30))
    W = int(rng.randint(1, 8))
    T = int(rng.randint(1, 12))
    N = int(rng.randint(1, 4))
    uni = {w: float(-rng.rand() * 5 - 0.1) for w in range(V)}
    lm = LookupLanguageModel(V, sos=V, prob_dicts=[uni])
    beta = float(rng.rand() * 2)
    logits = jnp.asarray(rng.randn(T, N, V + 1), np.float32)
    lens = jnp.asarray(rng.randint(0, T + 1, (N,)).astype(np.int32))
    # dense oracle: hide the LookupLanguageModel behind a plain wrapper so
    # the isinstance-based fast-path gate does not engage
    from pydrobert_tpu.lm import MixableSequentialLanguageModel

    class _Wrap(MixableSequentialLanguageModel):
        def __init__(self, inner):
            super().__init__(inner.vocab_size)
            self.inner = inner

        def calc_idx_log_probs(self, hist, prev, idx):
            return self.inner.calc_idx_log_probs(hist, prev, idx)

    dy, dlens, dprobs = D.CTCPrefixSearch(W, beta=beta, lm=_Wrap(lm))(
        logits, lens
    )
    sy, slens, sprobs = D.CTCPrefixSearch(W, beta=beta, lm=lm)(logits, lens)
    dy, dlens, dprobs = (np.asarray(x) for x in (dy, dlens, dprobs))
    sy, slens, sprobs = (np.asarray(x) for x in (sy, slens, sprobs))
    np.testing.assert_allclose(
        np.sort(dprobs, -1), np.sort(sprobs, -1), rtol=3e-5, atol=1e-7
    )
    for n in range(N):
        cut = dprobs[n, W - 1]
        for k in range(W):
            if np.isinf(dprobs[n, k]):
                continue
            if dprobs[n, k] <= cut + 1e-5 * max(1, abs(cut)) and k != 0:
                continue
            L = dlens[n, k]
            ok = any(
                slens[n, kk] == L and (sy[:L, n, kk] == dy[:L, n, k]).all()
                for kk in range(W)
                if abs(sprobs[n, kk] - dprobs[n, k])
                < 1e-4 * max(1, abs(dprobs[n, k]))
            )
            assert ok, (trial, n, k, dy[:L, n, k], dprobs[n, k], sprobs[n])


def test_ctc_fused_sparse_decode_sharded_matches_local():
    """The sparse-slot fused decode runs under a data-sharded mesh (gathers
    from replicated LM tables, per-shard beams) and matches the unsharded
    result."""
    from jax.sharding import NamedSharding, PartitionSpec

    from pydrobert_tpu.parallel import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    rng = np.random.RandomState(31)
    V, W, T = 12, 4, 10
    N = 2 * len(jax.devices())
    lm = _random_fused_lm(V, 3, 31, density=80)
    logits = jnp.asarray(rng.randn(T, N, V + 1), np.float32)
    lens = jnp.asarray(rng.randint(1, T + 1, (N,)).astype(np.int32))
    search = D.CTCPrefixSearch(W, beta=0.7, lm=lm)
    y0, l0, p0 = jax.jit(search)(logits, lens)

    mesh = make_mesh()
    sh = NamedSharding(mesh, PartitionSpec(None, "data"))
    logits_s = jax.device_put(logits, sh)
    lens_s = jax.device_put(lens, NamedSharding(mesh, PartitionSpec("data")))
    y1, l1, p1 = jax.jit(search)(logits_s, lens_s)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_allclose(
        np.asarray(p0), np.asarray(p1), rtol=1e-6, atol=1e-7
    )
    for n in range(N):
        for k in range(W):
            L = int(np.asarray(l0)[n, k])
            np.testing.assert_array_equal(
                np.asarray(y0)[:L, n, k], np.asarray(y1)[:L, n, k]
            )


def test_ctc_prefix_search_wide_beam_no_nan():
    """Width-padded beams must not poison results with NaN: probability
    masses stay finite internally (-inf * 0 = NaN would outrank every real
    candidate in top_k), and dummy beams report -inf probabilities."""
    from pydrobert_tpu import config as tpu_config
    from pydrobert_tpu.lm import LookupLanguageModel

    rng = np.random.RandomState(0)
    V, W, T, N = 3, 8, 6, 2
    logits = jnp.asarray(rng.randn(T, N, V + 1), np.float32)
    lm = LookupLanguageModel(V, sos=V)  # uniform unigram
    old = tpu_config.SPARSE_FUSION_MAX_CORRECTIONS
    try:
        for maxc in (-1, 10**9):
            tpu_config.SPARSE_FUSION_MAX_CORRECTIONS = maxc
            y, lens, probs = D.CTCPrefixSearch(W, beta=0.5, lm=lm)(logits)
            p = np.asarray(probs)
            assert not np.isnan(p).any(), p
            assert np.isfinite(p[:, 0]).all()
    finally:
        tpu_config.SPARSE_FUSION_MAX_CORRECTIONS = old
    # no-LM with exact-zero frame probabilities
    y, lens, probs = D.CTCPrefixSearch(W)(logits.at[:, :, 1].set(-np.inf))
    assert not np.isnan(np.asarray(probs)).any()


@pytest.mark.parametrize("shape,k", [((7, 33), 5), ((3, 4, 129), 16), ((50, 2, 64), 64)])
def test_exact_top_k_matches_lax_top_k(seeded, shape, k):
    """exact_top_k == lax.top_k bit-for-bit, including lowest-index-first
    tie order (quantized values force heavy ties)."""
    from pydrobert_tpu.ops.topk import exact_top_k

    x = jnp.asarray(np.random.randn(*shape), jnp.float32)
    # the rounded case mixes -0.0/+0.0: TopK's total order ranks +0.0 first
    for arr in (x, jnp.round(x * 2) / 2, jnp.zeros_like(x)):
        wv, wi = jax.lax.top_k(arr, k)
        gv, gi = jax.jit(exact_top_k, static_argnums=1)(arr, k)
        assert (gv == wv).all()
        assert (gi == wi).all()


def test_exact_top_k_neg_inf_rows(seeded):
    """-inf-padded rows (masked logits) keep top_k's ordering."""
    from pydrobert_tpu.ops.topk import exact_top_k

    x = jnp.asarray(np.random.randn(4, 32), jnp.float32)
    x = x.at[:, 20:].set(-jnp.inf)
    wv, wi = jax.lax.top_k(x, 24)
    gv, gi = jax.jit(exact_top_k, static_argnums=1)(x, 24)
    assert (gv == wv).all()
    assert (gi == wi).all()


@pytest.mark.parametrize(
    "shape,k", [((5, 300), 7), ((3, 4, 257), 16), ((37, 1024), 32)]
)
def test_top_m_pallas_interpret_matches_lax_top_k(seeded, shape, k):
    """The Pallas top-M selection kernel (interpret mode) == lax.top_k
    bit-for-bit, including tie order, -inf-masked lanes, and non-multiple
    row/lane counts."""
    from pydrobert_tpu.ops.pallas import top_m_pallas

    x = jnp.asarray(np.random.randn(*shape), jnp.float32)
    V = shape[-1]
    for arr in (
        x,
        jnp.round(x * 2) / 2,  # heavy ties incl. -0.0/+0.0 total order
        x.at[..., V - V // 4:].set(-jnp.inf),
        jnp.zeros_like(x),
    ):
        wv, wi = jax.lax.top_k(arr, k)
        gv, gi = top_m_pallas(arr, k, block_rows=16, interpret=True)
        assert (np.asarray(gv) == np.asarray(wv)).all()
        assert (np.asarray(gi) == np.asarray(wi)).all()


@pytest.mark.parametrize("with_bias", [False, True])
def test_decode_prologue_pallas_interpret_matches_xla(seeded, with_bias):
    """The fused prologue kernel (interpret mode) == the XLA prologue:
    top values/indices bit-exact, softmax stats to reduction-order ulp."""
    from pydrobert_tpu.ops.pallas import decode_prologue_pallas
    from pydrobert_tpu.ops.topk import exact_top_k

    T, N, V, M = 5, 3, 300, 16
    logits = jnp.asarray(np.random.randn(T, N, V + 1), jnp.float32)
    logits = logits.at[:, :, 5].set(-jnp.inf)  # masked token
    g_bias = (
        jnp.asarray(np.random.randn(V), jnp.float32) if with_bias else None
    )
    tl, ti, mx, den, blank = decode_prologue_pallas(
        logits, M, g_bias, block_rows=8, interpret=True
    )
    g = logits[..., :V] if g_bias is None else logits[..., :V] + g_bias
    wl, wi = exact_top_k(g, M)
    assert (np.asarray(tl) == np.asarray(wl)).all()
    assert (np.asarray(ti) == np.asarray(wi)).all()
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(logits.max(2)))
    np.testing.assert_allclose(
        np.asarray(den),
        np.asarray(jnp.exp(logits - logits.max(2)[..., None]).sum(2)),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(blank), np.asarray(logits[..., V])
    )


def test_hoisted_top_k_dispatch(seeded, monkeypatch):
    """hoisted_top_k prefers the kernel exactly when the gate says so (and
    never off-TPU via topm_kernel_preferred's platform check)."""
    from pydrobert_tpu.ops import pallas, topk

    x = jnp.asarray(np.random.randn(6, 512), jnp.float32)
    calls = []
    monkeypatch.setattr(
        pallas, "top_m_pallas",
        lambda a, k_, **kw: (calls.append(k_), jax.lax.top_k(a, k_))[1],
    )
    monkeypatch.setattr(pallas, "topm_kernel_preferred", lambda: True)
    wv, wi = jax.lax.top_k(x, 8)
    gv, gi = topk.hoisted_top_k(x, 8)
    assert calls == [8] and (gv == wv).all() and (gi == wi).all()
    monkeypatch.setattr(pallas, "topm_kernel_preferred", lambda: False)
    gv, gi = topk.hoisted_top_k(x, 8)
    assert calls == [8]  # kernel not called again
    assert (gv == wv).all() and (gi == wi).all()


@pytest.mark.slow
def test_decode_scan_body_kernel_budget():
    """Tripwire on the decode scans' per-step op counts (CPU optimized
    HLO). The transferable perf quantity is kernels/step (TODO.md); a
    reintroduced in-loop gather/relayout cascade shows up here as several
    extra ops per step. Budgets carry ~60% headroom over measured counts
    (no-LM 24, fused 42 on CPU at these shapes)."""
    from pydrobert_tpu.lm import LookupLanguageModel
    from pydrobert_tpu.utils.hlostats import count_body_kernels

    rng = np.random.RandomState(0)
    V = 64
    logits = jnp.asarray(rng.randn(20, 4, V + 1), jnp.float32)
    lens = jnp.asarray(rng.randint(10, 21, (4,)).astype(np.int32))

    def body_kernels(search):
        txt = (
            jax.jit(lambda l, n: search(l, n))
            .lower(logits, lens)
            .compile()
            .as_text()
        )
        bodies = count_body_kernels(txt)
        assert bodies, "no while body found in compiled HLO"
        return max(b["kernels"] for b in bodies.values())

    assert body_kernels(D.CTCPrefixSearch(8)) <= 40
    uni = {
        w: (float(-rng.rand() * 5 - 0.1), float(-rng.rand()))
        for w in range(V)
    }
    uni[V] = (float("-inf"), -0.5)
    bi = {
        (int(rng.randint(V + 1)), int(rng.randint(V))): (
            float(-rng.rand() * 3 - 0.1), float(-rng.rand())
        )
        for _ in range(300)
    }
    tri = {
        (
            int(rng.randint(V + 1)), int(rng.randint(V)), int(rng.randint(V))
        ): float(-rng.rand() * 3 - 0.1)
        for _ in range(400)
    }
    lm = LookupLanguageModel(V, sos=V, prob_dicts=[uni, bi, tri])
    assert body_kernels(D.CTCPrefixSearch(8, beta=0.5, lm=lm)) <= 70


@pytest.mark.parametrize("W,S", [(1, 3), (2, 1), (3, 7), (5, 3), (8, 20), (16, 34)])
def test_rank_top_w_matches_exact_topk_semantics(W, S):
    """The kernel's two-level rank-based top-W must match lax.top_k tie
    semantics (lowest flat index first) exactly — fuzzed with heavy ties
    and -inf padding, odd widths, and S < W."""
    import functools

    from pydrobert_tpu.ops.pallas import _rank_top_w

    fn = jax.jit(functools.partial(_rank_top_w, W=W, S=S))
    rng = np.random.RandomState(7000 + W * 100 + S)
    for _ in range(8):
        N = 4
        vals = rng.choice(
            [-np.inf, -1e30, 0.0, 0.25, 0.5, 1.0], size=(N, W, S)
        ).astype(np.float32)
        out_v, out_i = fn(jnp.asarray(vals))
        out_v, out_i = np.asarray(out_v), np.asarray(out_i)
        flat = vals.reshape(N, W * S)
        for n in range(N):
            order = np.lexsort((np.arange(W * S), -flat[n]))[:W]
            np.testing.assert_array_equal(
                out_i[n], order, err_msg=f"W={W} S={S} n={n}"
            )
            np.testing.assert_array_equal(out_v[n], flat[n][order])


def test_beam_gate_calibration_survives_kernel_failure(monkeypatch, tmp_path):
    """A Mosaic lowering/compile failure inside auto-calibration must pick
    the XLA scan, not crash the user's decode."""
    from pydrobert_tpu.ops import pallas

    # the kernel path is compiled/timed in a deadline-guarded subprocess;
    # a compile failure (or deadline miss) surfaces as (inf, error)
    monkeypatch.setattr(
        pallas, "_time_beam_kernel_subprocess",
        lambda *a, **k: (float("inf"), "RuntimeError: mosaic says no"),
    )
    monkeypatch.setattr(pallas, "tpu_available", lambda: True)
    monkeypatch.setattr(
        pallas, "_beam_gate_path",
        lambda: str(tmp_path / "gate.json"),
    )
    assert pallas._calibrate_beam_kernel("test:fake:rev") is False
    import json as _json

    with open(tmp_path / "gate.json") as f:
        rec = _json.load(f)["test:fake:rev"]
    assert rec["use_pallas"] is False and "error" in rec


def test_beam_gate_defers_calibration_under_ambient_trace(monkeypatch, tmp_path):
    """The gate is usually first consulted while the user's decode step is
    being TRACED (inside jit/scan). Calibration times real device runs,
    which is impossible under a trace (probes become tracers — observed
    TracerArrayConversionError on-TPU from bench.py's scan body; and
    ensure_compile_time_eval can't execute pallas_call). Under tracing the
    gate must pick the XLA path WITHOUT calibrating or caching, so a later
    eager consult still performs the real calibration."""
    from pydrobert_tpu.ops import pallas

    monkeypatch.setattr(pallas, "tpu_available", lambda: True)
    monkeypatch.setattr(
        pallas, "_beam_gate_path", lambda: str(tmp_path / "gate.json")
    )

    calls = []

    def fake_calibrate(key, *shape):
        # what the real calibration does: jitted probe + host materialize
        out = jax.jit(lambda x: x * 2)(jnp.ones(3))
        np.asarray(out)  # crashes if `out` is a tracer
        calls.append(key)
        return True

    monkeypatch.setattr(pallas, "_calibrate_beam_kernel", fake_calibrate)
    monkeypatch.setattr(pallas, "_calibrate_topm", fake_calibrate)
    pallas._BEAM_GATE_CACHE.clear()
    pallas._TOPM_GATE_CACHE.clear()

    def traced(x):
        assert pallas.beam_kernel_preferred() is False
        assert pallas.topm_kernel_preferred() is False
        return x + 1

    jax.jit(traced)(jnp.ones(2))  # must not raise
    assert calls == []  # deferred, nothing cached
    assert not pallas._BEAM_GATE_CACHE and not pallas._TOPM_GATE_CACHE
    # eager consult afterwards performs the real calibration and caches it
    assert pallas.beam_kernel_preferred() is True
    assert pallas.topm_kernel_preferred() is True
    assert len(calls) == 2
    pallas._BEAM_GATE_CACHE.clear()
    pallas._TOPM_GATE_CACHE.clear()


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(12, 3, 9, 4), (7, 2, 3, 8)])
def test_ctc_beam_kernel_interpret_matches_search(shape):
    """The EXACT kernel body (not just the shared math) in Pallas
    interpret mode vs CTCPrefixSearch — CPU-testable kernel parity so
    kernel edits can't only be validated on a TPU."""
    from pydrobert_tpu.ops.pallas import ctc_beam_search_pallas

    T, N, V, W = shape
    rng = np.random.RandomState(sum(shape))
    logits = jnp.asarray(rng.randn(T, N, V + 1), jnp.float32)
    lens = jnp.asarray(rng.randint(1, T + 1, (N,)).astype(np.int32))
    probs = jax.nn.softmax(logits, 2)
    y1, l1, p1 = ctc_beam_search_pallas(
        probs[..., :V], probs[..., V], lens, W, interpret=True
    )
    y0, l0, p0 = D.CTCPrefixSearch(W)(logits, lens)
    y0, l0, p0, y1, l1, p1 = map(np.asarray, (y0, l0, p0, y1, l1, p1))
    np.testing.assert_array_equal(l0, l1)
    fin = np.isfinite(p0)
    assert (np.isfinite(p1) == fin).all()
    np.testing.assert_allclose(
        np.where(fin, p0, 0), np.where(fin, p1, 0), rtol=1e-6
    )
    for n in range(N):
        for w in range(W):
            L = l0[n, w]
            np.testing.assert_array_equal(y0[:L, n, w], y1[:L, n, w])


def _collapse_ctc(path, blank):
    """Standard CTC collapse: merge repeats, then drop blanks."""
    out, prev = [], None
    for p in path:
        if p != prev and p != blank:
            out.append(p)
        prev = p
    return out


def test_ctc_forced_align_bruteforce():
    """Exhaustive path enumeration oracle on tiny shapes.

    For each batch element, enumerate every frame-level labelling of
    length in_lens[n] over V labels, keep those that CTC-collapse to the
    reference, and take the max-probability one. ctc_forced_align must
    return that score, and its path must achieve it.
    """
    import itertools

    T, N, V = 5, 6, 3
    blank = V - 1
    logits = np.random.randn(T, N, V).astype(np.float32)
    lp = np.log(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    )
    in_lens = np.array([T, T, T - 1, T, 2, T], dtype=np.int32)
    U = 3
    refs = np.random.randint(0, V - 1, (N, U)).astype(np.int32)
    ref_lens = np.array([1, 2, 3, 3, 2, 0], dtype=np.int32)
    # make one element have a repeated label (exercises the no-skip rule)
    refs[3] = [1, 1, 0]

    paths, scores = D.ctc_forced_align(
        jnp.asarray(logits.transpose(1, 0, 2)),
        jnp.asarray(refs),
        jnp.asarray(in_lens),
        jnp.asarray(ref_lens),
        blank_idx=blank,
        batch_first=True,
    )
    paths, scores = np.asarray(paths), np.asarray(scores)
    assert paths.shape == (N, T)

    for n in range(N):
        Tn, Un = int(in_lens[n]), int(ref_lens[n])
        ref = list(refs[n, :Un])
        best = -np.inf
        for cand in itertools.product(range(V), repeat=Tn):
            if _collapse_ctc(cand, blank) != ref:
                continue
            best = max(best, sum(lp[t, n, cand[t]] for t in range(Tn)))
        if best == -np.inf:
            assert scores[n] < -1e30, f"n={n}: expected -inf"
            continue
        np.testing.assert_allclose(scores[n], best, rtol=1e-5, err_msg=f"n={n}")
        # the returned path must itself achieve the score
        got = paths[n, :Tn]
        assert _collapse_ctc(list(got), blank) == ref, f"n={n}: {got} !~ {ref}"
        np.testing.assert_allclose(
            sum(lp[t, n, got[t]] for t in range(Tn)), best, rtol=1e-5,
            err_msg=f"n={n}",
        )


@pytest.mark.parametrize("batch_first", [False, True])
@pytest.mark.parametrize("is_probs", [False, True])
def test_ctc_forced_align_properties(jit_fn, batch_first, is_probs):
    """Larger random shapes: the path collapses to the ref, the score is
    the path's joint log-prob, and infeasible refs give -inf."""
    T, N, V, U = 23, 5, 11, 7
    blank = 0
    logits = np.random.randn(T, N, V).astype(np.float32)
    x = (
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        if is_probs
        else logits
    )
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    in_lens = np.random.randint(U * 2 + 1, T + 1, (N,)).astype(np.int32)
    refs = np.random.randint(1, V, (N, U)).astype(np.int32)
    ref_lens = np.random.randint(0, U + 1, (N,)).astype(np.int32)
    # force an infeasible element: U tokens in < U frames
    in_lens[2], ref_lens[2] = U - 1, U

    xin = np.ascontiguousarray(x.transpose(1, 0, 2) if batch_first else x)
    rin = np.ascontiguousarray(refs if batch_first else refs.T)
    fn = jit_fn(
        lambda a, b, c, d: D.ctc_forced_align(
            a, b, c, d, blank_idx=blank, batch_first=batch_first,
            is_probs=is_probs,
        )
    )
    paths, scores = fn(
        jnp.asarray(xin), jnp.asarray(rin), jnp.asarray(in_lens),
        jnp.asarray(ref_lens),
    )
    paths, scores = np.asarray(paths), np.asarray(scores)
    if not batch_first:
        paths = paths.T
    assert paths.shape == (N, T)
    for n in range(N):
        Tn, Un = int(in_lens[n]), int(ref_lens[n])
        ref = list(refs[n, :Un])
        if n == 2:
            assert scores[n] < -1e30
            continue
        got = list(paths[n, :Tn])
        assert _collapse_ctc(got, blank) == ref, f"n={n}"
        np.testing.assert_allclose(
            scores[n], sum(lp[t, n, got[t]] for t in range(Tn)), rtol=1e-4,
            err_msg=f"n={n}",
        )


def test_ctc_forced_align_beats_greedy_when_feasible():
    """Viterbi-aligned score >= any other collapsing path's score; in
    particular, aligning to the greedy transcript scores at least the
    greedy path (its own frame labelling collapses to it)."""
    T, N, V = 17, 4, 6
    logits = np.random.randn(T, N, V).astype(np.float32)
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    blank = V - 1
    greedy = lp.argmax(-1)  # (T, N)
    max_u = 0
    refs_l, lens_l = [], []
    for n in range(N):
        c = _collapse_ctc(list(greedy[:, n]), blank)
        refs_l.append(c)
        lens_l.append(len(c))
        max_u = max(max_u, len(c))
    refs = np.zeros((N, max(max_u, 1)), np.int32)
    for n, c in enumerate(refs_l):
        refs[n, : len(c)] = c
    _, scores = D.ctc_forced_align(
        jnp.asarray(logits.transpose(1, 0, 2)), jnp.asarray(refs), None,
        jnp.asarray(lens_l, dtype=jnp.int32), blank_idx=blank,
        batch_first=True,
    )
    greedy_score = lp.max(-1).sum(0)  # (N,)
    assert (np.asarray(scores) >= greedy_score - 1e-5).all()


def test_ctc_prefix_search_bf16_matches_f32():
    """bf16 logits stream half the bytes through the decode prologue; the
    math upcasts exactly to f32, so results must be IDENTICAL to running
    the search on the f32 upcast of the same bf16 array."""
    T, N, V, W = 20, 4, 64, 8
    rng = np.random.RandomState(3)
    lg16 = jnp.asarray(rng.randn(T, N, V + 1), jnp.bfloat16)
    lens = jnp.asarray(rng.randint(1, T + 1, (N,)).astype(np.int32))
    search = D.CTCPrefixSearch(W)
    y16, l16, p16 = search(lg16, lens)
    y32, l32, p32 = search(lg16.astype(jnp.float32), lens)
    np.testing.assert_array_equal(np.asarray(l16), np.asarray(l32))
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y32))
    assert p16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(p16), np.asarray(p32), rtol=1e-6, atol=0
    )


def test_ctc_prefix_search_bf16_fused_matches_f32():
    from pydrobert_tpu.lm import LookupLanguageModel

    T, N, V, W = 12, 3, 32, 4
    rng = np.random.RandomState(5)
    uni = {w: (float(-rng.rand() * 4 - 0.1), float(-rng.rand()))
           for w in range(V)}
    uni[V] = (float("-inf"), float(-rng.rand()))
    bi = {}
    for _ in range(200):
        bi[(int(rng.randint(V + 1)), int(rng.randint(V)))] = (
            float(-rng.rand() * 4 - 0.1), float(-rng.rand())
        )
    lm = LookupLanguageModel(V, sos=V, prob_dicts=[uni, bi])
    search = D.CTCPrefixSearch(W, beta=0.4, lm=lm)
    lg16 = jnp.asarray(rng.randn(T, N, V + 1), jnp.bfloat16)
    lens = jnp.asarray(rng.randint(1, T + 1, (N,)).astype(np.int32))
    y16, l16, p16 = search(lg16, lens)
    y32, l32, p32 = search(lg16.astype(jnp.float32), lens)
    np.testing.assert_array_equal(np.asarray(l16), np.asarray(l32))
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y32))
    np.testing.assert_allclose(
        np.asarray(p16), np.asarray(p32), rtol=1e-6, atol=0
    )


def test_ctc_greedy_and_forced_align_bf16():
    T, N, V = 15, 4, 9
    rng = np.random.RandomState(7)
    lg16 = jnp.asarray(rng.randn(T, N, V), jnp.bfloat16)
    lens = jnp.asarray(rng.randint(1, T + 1, (N,)).astype(np.int32))
    m16 = D.ctc_greedy_search(lg16, lens)
    m32 = D.ctc_greedy_search(lg16.astype(jnp.float32), lens)
    for a, b in zip(m16, m32):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    refs = jnp.asarray(rng.randint(0, V - 1, (N, 3)), jnp.int32)
    pa16, s16 = D.ctc_forced_align(lg16, refs.T, lens, batch_first=False)
    pa32, s32 = D.ctc_forced_align(
        lg16.astype(jnp.float32), refs.T, lens, batch_first=False
    )
    np.testing.assert_array_equal(np.asarray(pa16), np.asarray(pa32))
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), rtol=1e-6)


def test_top_m_pallas_bf16_interpret_matches_f32_upcast(seeded):
    """bf16 inputs: the kernel upcasts in VMEM, so values/indices/ties must
    match lax.top_k on the f32 upcast of the same bf16 array, with f32
    output values."""
    from pydrobert_tpu.ops.pallas import top_m_pallas

    x16 = jnp.asarray(np.random.randn(6, 150), jnp.bfloat16)
    for arr in (x16, jnp.round(x16 * 2) / 2):
        arr = arr.astype(jnp.bfloat16)
        wv, wi = jax.lax.top_k(arr.astype(jnp.float32), 9)
        gv, gi = top_m_pallas(arr, 9, block_rows=8, interpret=True)
        assert gv.dtype == jnp.float32
        assert (np.asarray(gv) == np.asarray(wv)).all()
        assert (np.asarray(gi) == np.asarray(wi)).all()


def test_decode_prologue_pallas_bf16_interpret(seeded):
    from pydrobert_tpu.ops.pallas import decode_prologue_pallas
    from pydrobert_tpu.ops.topk import exact_top_k

    T, N, V, M = 4, 2, 200, 8
    lg16 = jnp.asarray(np.random.randn(T, N, V + 1), jnp.bfloat16)
    g_bias = jnp.asarray(np.random.randn(V), jnp.float32)
    tl, ti, mx, den, blank = decode_prologue_pallas(
        lg16, M, g_bias, block_rows=8, interpret=True
    )
    lg32 = lg16.astype(jnp.float32)
    wl, wi = exact_top_k(lg32[..., :V] + g_bias, M)
    assert tl.dtype == jnp.float32
    assert (np.asarray(tl) == np.asarray(wl)).all()
    assert (np.asarray(ti) == np.asarray(wi)).all()
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(lg32.max(2)))
    np.testing.assert_allclose(
        np.asarray(den),
        np.asarray(jnp.exp(lg32 - lg32.max(2)[..., None]).sum(2)),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(np.asarray(blank), np.asarray(lg32[..., V]))


def _spiky_logits(rng, T, N, V, scale=9.0):
    """CTC-like spiky posteriors: mostly near-certain blanks with scattered
    token spikes (blank = last class)."""
    logits = rng.randn(T, N, V + 1).astype(np.float32)
    logits[..., V] += scale  # blank-dominated by default
    for n in range(N):
        for t in rng.choice(T, size=max(2, T // 6), replace=False):
            logits[t, n, rng.randint(V)] += 2 * scale  # token spike
    return logits


@pytest.mark.parametrize("batch_first", [False, True])
def test_compress_blank_frames_greedy_invariant(jit_fn, batch_first):
    """Greedy transcripts are unchanged by blank-run compression (each run
    keeps one blank, so repeated tokens stay separated), while the frame
    count drops substantially on spiky posteriors."""
    T, N, V = 48, 5, 7
    rng = np.random.RandomState(13)
    logits = _spiky_logits(rng, T, N, V)
    # force a repeated token straddling a blank run (the merge hazard)
    logits[10, 0, :] = 0.0
    logits[10, 0, 2] = 20.0
    logits[14, 0, :] = 0.0
    logits[14, 0, 2] = 20.0
    in_lens = rng.randint(T // 2, T + 1, (N,)).astype(np.int32)
    lg = logits.transpose(1, 0, 2) if batch_first else logits
    fn = jit_fn(
        lambda x, l: D.compress_blank_frames(
            x, l, threshold=0.9, batch_first=batch_first
        )
    )
    new_lg, new_lens = fn(jnp.asarray(lg), jnp.asarray(in_lens))
    assert np.asarray(new_lens).max() < T // 2  # actually compresses
    _, y0, l0 = D.ctc_greedy_search(
        jnp.asarray(lg), jnp.asarray(in_lens), batch_first=batch_first
    )
    _, y1, l1 = D.ctc_greedy_search(new_lg, new_lens, batch_first=batch_first)
    y0, l0, y1, l1 = map(np.asarray, (y0, l0, y1, l1))
    np.testing.assert_array_equal(l0, l1)
    if not batch_first:
        y0, y1 = y0.T, y1.T
    for n in range(N):
        np.testing.assert_array_equal(
            y0[n, : l0[n]], y1[n, : l1[n]], err_msg=f"n={n}"
        )


def test_compress_blank_frames_beam_search_near_exact():
    """At high thresholds the dropped frames multiply every prefix by the
    same near-1 blank factor: beam-16 transcripts match and masses agree
    to the dropped mass tolerance."""
    T, N, V, W = 60, 4, 9, 16
    rng = np.random.RandomState(29)
    logits = _spiky_logits(rng, T, N, V, scale=12.0)
    lens = jnp.full((N,), T, jnp.int32)
    search = D.CTCPrefixSearch(W)
    new_lg, new_lens = D.compress_blank_frames(
        jnp.asarray(logits), lens, threshold=0.999
    )
    y0, l0, p0 = search(jnp.asarray(logits), lens)
    y1, l1, p1 = search(new_lg, new_lens)
    y0, l0, p0, y1, l1, p1 = map(np.asarray, (y0, l0, p0, y1, l1, p1))
    # top transcript identical
    np.testing.assert_array_equal(l0[:, 0], l1[:, 0])
    for n in range(N):
        np.testing.assert_array_equal(
            y0[: l0[n, 0], n, 0], y1[: l1[n, 0], n, 0], err_msg=f"n={n}"
        )
    np.testing.assert_allclose(p0[:, 0], p1[:, 0], rtol=0.05)


def test_compress_blank_frames_properties():
    T, N, V = 20, 3, 4
    rng = np.random.RandomState(3)
    logits = rng.randn(T, N, V + 1).astype(np.float32)
    # threshold 1.0 + non-saturated probs: nothing dropped
    out, lens = D.compress_blank_frames(jnp.asarray(logits), threshold=1.0)
    np.testing.assert_array_equal(np.asarray(lens), [T] * N)
    np.testing.assert_array_equal(np.asarray(out), logits)
    # is_probs path + max_frames clipping
    probs = np.zeros((T, N, V + 1), np.float32)
    probs[..., V] = 1.0  # all blank: each column collapses to ONE frame
    probs[0, :, V] = 0.2
    probs[0, :, 0] = 0.8  # non-blank first frame survives
    out, lens = D.compress_blank_frames(
        jnp.asarray(probs), threshold=0.5, is_probs=True
    )
    np.testing.assert_array_equal(np.asarray(lens), [2] * N)  # spike + 1 blank
    out, lens = D.compress_blank_frames(
        jnp.asarray(probs), threshold=0.5, is_probs=True, max_frames=8
    )
    assert out.shape == (8, N, V + 1)
    np.testing.assert_array_equal(np.asarray(lens), [2] * N)
    with pytest.raises(RuntimeError):
        D.compress_blank_frames(jnp.asarray(probs), threshold=0.0)


def test_count_body_kernels_trip_counts():
    """The hottest loop for kernels-per-step metrics is the one with the
    largest TRIP COUNT — an outer repeat wrapper contains the whole program
    (more ops) but few trips; picking by op count over-reported the decode
    scan body 2x in BENCH r3 (63 vs the real 33)."""
    from pydrobert_tpu.utils.hlostats import count_body_kernels

    def f(x):
        def outer(c, _):
            def inner(c2, _):
                return c2 * 1.0001 + 1.0, None
            c2, _ = jax.lax.scan(inner, c, None, length=37)
            return c2 * 0.999, None
        out, _ = jax.lax.scan(outer, x, None, length=5)
        return out

    txt = jax.jit(f).lower(jnp.ones((4,))).compile().as_text()
    bodies = count_body_kernels(txt)
    trips = sorted(b["trip_count"] for b in bodies.values())
    assert trips == [5, 37], bodies
    hot = max(bodies.values(), key=lambda b: (b["trip_count"], b["kernels"]))
    assert hot["trip_count"] == 37


def _compact_topk_case(rng, N, Kp, M, quantize=False):
    """Random (vals3, shared_is_last, removed) satisfying the factored
    advance's structural invariants (see _topk_candidates_compact)."""
    if quantize:
        v = rng.choice([0.0, 0.25, 0.5, 1.0], size=(N, M))
    else:
        v = rng.rand(N, M)
    v = np.sort(v, axis=1)[:, ::-1]  # desc, ties adjacent
    tot = rng.rand(N, Kp) * np.where(rng.rand(N, Kp) < 0.1, 0.0, 1.0)
    b = tot * rng.rand(N, Kp)
    if quantize:
        b = np.where(rng.rand(N, Kp) < 0.5, tot, b)  # b == tot ties
    shared = tot[:, :, None] * v[:, None, :]
    # at most one dip per beam
    has_dip = rng.rand(N, Kp) < 0.7
    s_d = rng.randint(0, M, (N, Kp))
    shared_is_last = np.zeros((N, Kp, M), bool)
    for n in range(N):
        for k in range(Kp):
            if has_dip[n, k]:
                shared_is_last[n, k, s_d[n, k]] = True
                shared[n, k, s_d[n, k]] = b[n, k] * v[n, s_d[n, k]]
    removed = rng.rand(N, Kp, M + 1) < 0.15
    last = b * rng.rand(N, Kp)
    last = np.where(rng.rand(N, Kp) < 0.2, -np.inf, last)
    nonext = rng.rand(N, Kp)
    if quantize:
        nonext = rng.choice([0.0, 0.25, 0.5], size=(N, Kp))
    vals3 = np.concatenate(
        [shared, last[:, :, None], nonext[:, :, None]], axis=2
    ).astype(np.float32)
    vals3[:, :, : M + 1] = np.where(
        removed, -np.inf, vals3[:, :, : M + 1]
    )
    return (
        jnp.asarray(vals3),
        jnp.asarray(shared_is_last),
        jnp.asarray(removed),
    )


@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize("trial", range(3))
def test_topk_candidates_compact_exact(trial, quantize):
    """The rank-compaction candidate top-K is bit-exact against the flat
    ``lax.top_k`` — values AND indices, including adversarial value ties
    (quantized probabilities, b == tot coefficient ties, zero masses,
    -inf removals)."""
    rng = np.random.RandomState(31000 + trial)
    N, Kp, M, K = 8, 16, 32, 16
    vals3, sil, removed = _compact_topk_case(rng, N, Kp, M, quantize)
    S = M + 2
    rv, ri = jax.lax.top_k(vals3.reshape(N, Kp * S), K)
    cv, ci = jax.jit(D._topk_candidates_compact, static_argnums=3)(
        vals3, sil, removed, K
    )
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(cv))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(ci))


@pytest.mark.parametrize("trial", range(2))
def test_ctc_prefix_search_topk_compact_invariant(trial, monkeypatch):
    """End-to-end: the batch-gated compact selection leaves the full
    no-LM search's outputs bit-identical (same tokens, lengths, masses)."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(31100 + trial)
    T, N, V, W = 12, 4, 50, 16
    logits = jnp.asarray(rng.randn(T, N, V + 1).astype(np.float32))
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)).astype(np.int32))
    search = D.CTCPrefixSearch(W)
    monkeypatch.setattr(tpu_config, "TOPK_COMPACT_MIN_BATCH", 10**9)
    y0, l0, p0 = jax.jit(search)(logits, lens)
    monkeypatch.setattr(tpu_config, "TOPK_COMPACT_MIN_BATCH", 1)
    y1, l1, p1 = jax.jit(search)(logits, lens)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    yl = np.asarray(l0)
    y0, y1 = np.asarray(y0), np.asarray(y1)
    for n in range(N):
        for w in range(W):
            np.testing.assert_array_equal(
                y0[: yl[n, w], n, w], y1[: yl[n, w], n, w]
            )


@pytest.mark.parametrize("trial", range(2))
def test_ctc_prefix_search_buf_f16_invariant(trial, monkeypatch):
    """The float16 path-buffer carry is bit-exact vs float32 (token ids
    < 2048 are exact in f16; the permute/interrogation dots upcast)."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(31200 + trial)
    T, N, V, W = 14, 3, 60, 8
    logits = jnp.asarray(rng.randn(T, N, V + 1).astype(np.float32))
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)).astype(np.int32))
    search = D.CTCPrefixSearch(W)
    monkeypatch.setattr(tpu_config, "DECODE_BUF_F16", False)
    y0, l0, p0 = jax.jit(search)(logits, lens)
    monkeypatch.setattr(tpu_config, "DECODE_BUF_F16", True)
    y1, l1, p1 = jax.jit(search)(logits, lens)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    yl = np.asarray(l0)
    y0, y1 = np.asarray(y0), np.asarray(y1)
    for n in range(N):
        for w in range(W):
            np.testing.assert_array_equal(
                y0[: yl[n, w], n, w], y1[: yl[n, w], n, w]
            )


@pytest.mark.parametrize("trial", range(3))
@pytest.mark.parametrize("fused", [False, True])
def test_ctc_prefix_search_renorm_invariant(trial, fused, monkeypatch):
    """Power-of-two mass renormalization (config.DECODE_RENORM) is
    bit-exact vs the raw linear-mass carry wherever the raw trajectory
    stays in normal f32 range: scaling by 2**-e is exact, every candidate
    product/sum/comparison aligns identically, and ldexp undoes the
    accumulated scale exactly."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(52000 + trial)
    T, N, V, W = 16, 3, 48, 6
    logits = jnp.asarray(rng.randn(T, N, V + 1).astype(np.float32))
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)).astype(np.int32))
    if fused:
        table = np.log(
            rng.dirichlet(np.ones(V), V + 1).astype(np.float32)
        )
        search = D.CTCPrefixSearch(W, 0.3, TableLM(jnp.asarray(table)))
    else:
        search = D.CTCPrefixSearch(W)
    monkeypatch.setattr(tpu_config, "DECODE_RENORM", False)
    y0, l0, p0 = jax.jit(search)(logits, lens)
    monkeypatch.setattr(tpu_config, "DECODE_RENORM", True)
    y1, l1, p1 = jax.jit(search)(logits, lens)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    yl = np.asarray(l0)
    y0, y1 = np.asarray(y0), np.asarray(y1)
    for n in range(N):
        for w in range(W):
            np.testing.assert_array_equal(
                y0[: yl[n, w], n, w], y1[: yl[n, w], n, w]
            )


@pytest.mark.slow
def test_ctc_prefix_search_diffuse_long_parity_f64_oracle(ref_torch):
    """T=200 DIFFUSE-logits parity (VERDICT r4 #4): with high-entropy
    acoustics the per-frame winner probability is ~0.1, so beam masses
    reach ~1e-180 by frame 200 — far below the f32 normal floor
    (~1.2e-38). The reference's linear f32 masses underflow mid-search
    (denormals to ~1e-45, then exactly zero), after which its selection
    is arbitrary — so the honest oracle is the SAME reference run in
    float64, which this test asserts the torch f32 run genuinely diverges
    from. Our f32 search with power-of-two renormalization (the default)
    must match the f64 oracle's lengths and hypotheses exactly; final
    probabilities are below f32 range and flush to zero on both sides of
    the comparison (asserted against the oracle's within atol).
    (Reference mass carry: /root/reference/src/pydrobert/torch/
    _decoding.py:636-934.)"""
    import sys

    sys.path.insert(0, "/root/reference/src")
    import torch
    from pydrobert.torch.modules import CTCPrefixSearch as RefCTC

    T, N, V, width = 200, 6, 256, 8
    rng = np.random.RandomState(60200)
    logits = rng.randn(T, N, V + 1).astype(np.float64)
    logits[..., V] += 4.0  # blank prob ~0.1: diffuse, decay ~10x/frame
    lens = rng.randint(3 * T // 4, T + 1, (N,))

    ref = RefCTC(width)
    exp_y, exp_lens, exp_p = (
        e.numpy() for e in ref(torch.tensor(logits), torch.tensor(lens))
    )
    # the f64 masses must themselves be far from underflow for the oracle
    # to be trustworthy
    assert np.isfinite(exp_p).all() and (exp_p > 0).all()
    assert exp_p.min() < 1e-60  # genuinely below any f32 representation

    # the reference in f32 diverges from its own f64 run: underflowed
    # masses make the selection arbitrary. This is the defect renorm fixes
    f32_y, f32_lens, f32_p = (
        e.numpy()
        for e in ref(
            torch.tensor(logits.astype(np.float32)), torch.tensor(lens)
        )
    )
    assert (np.asarray(f32_p) == 0).all()  # all masses underflowed
    f32_matches = all(
        f32_lens[n, k] == exp_lens[n, k]
        and (f32_y[: exp_lens[n, k], n, k] == exp_y[: exp_lens[n, k], n, k]).all()
        for n in range(N)
        for k in range(width)
    )
    assert not f32_matches, "expected the f32 reference to diverge"

    search = D.CTCPrefixSearch(width)
    act_y, act_lens, act_p = (
        np.asarray(a)
        for a in search(logits.astype(np.float32), lens)
    )
    np.testing.assert_array_equal(act_lens, exp_lens)
    np.testing.assert_allclose(act_p, exp_p, rtol=1e-3, atol=1e-37)
    for n in range(N):
        for k in range(width):
            ln = act_lens[n, k]
            np.testing.assert_array_equal(
                act_y[:ln, n, k], exp_y[:ln, n, k], err_msg=f"n={n} k={k}"
            )


@pytest.mark.parametrize("trial", range(2))
def test_fused_topk_twostage_invariant(trial, monkeypatch):
    """The (default-off, A/B-rejected on TPU v5 lite — see
    config.FUSED_TOPK_TWOSTAGE) two-stage fused top-K selects
    bit-identically to the flat form, ties included."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(71000 + trial)
    T, N, V, W = 12, 3, 48, 6
    logits = rng.randn(T, N, V + 1).astype(np.float32)
    # adversarial ties: quantize logits so repeated values collide
    logits = np.round(logits * 2) / 2
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)).astype(np.int32))
    table = np.log(rng.dirichlet(np.ones(V), V + 1).astype(np.float32))
    search = D.CTCPrefixSearch(W, 0.4, TableLM(jnp.asarray(table)))
    monkeypatch.setattr(tpu_config, "FUSED_TOPK_TWOSTAGE", False)
    y0, l0, p0 = jax.jit(search)(jnp.asarray(logits), lens)
    monkeypatch.setattr(tpu_config, "FUSED_TOPK_TWOSTAGE", True)
    y1, l1, p1 = jax.jit(search)(jnp.asarray(logits), lens)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    yl = np.asarray(l0)
    y0, y1 = np.asarray(y0), np.asarray(y1)
    for n in range(N):
        for w in range(W):
            np.testing.assert_array_equal(
                y0[: yl[n, w], n, w], y1[: yl[n, w], n, w]
            )


@pytest.mark.parametrize("trial", range(3))
def test_ctc_prefix_search_small_vocab_compact_gate(trial, monkeypatch):
    """Candidate-scarcity guard on the rank-compaction top-K: with
    V < 2*width every beam can run out of live candidates (heavy
    absorption removal), where the compaction would emit phantom
    (0.0, slot 0) entries that the flat sort correctly ranks as the
    removed slots' NEG_INF values. The gate now requires M >= 2*width;
    this pins batch-gated == flat at a small vocab where the old gate
    engaged the compact path."""
    from pydrobert_tpu import config as tpu_config

    rng = np.random.RandomState(83000 + trial)
    T, N, V, W = 24, 6, 20, 16
    logits = jnp.asarray(rng.randn(T, N, V + 1).astype(np.float32))
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)).astype(np.int32))
    search = D.CTCPrefixSearch(W)
    monkeypatch.setattr(tpu_config, "TOPK_COMPACT_MIN_BATCH", 1 << 30)
    y0, l0, p0 = jax.jit(search)(logits, lens)
    monkeypatch.setattr(tpu_config, "TOPK_COMPACT_MIN_BATCH", 2)
    y1, l1, p1 = jax.jit(search)(logits, lens)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    yl = np.asarray(l0)
    y0, y1 = np.asarray(y0), np.asarray(y1)
    for n in range(N):
        for w in range(W):
            np.testing.assert_array_equal(
                y0[: yl[n, w], n, w], y1[: yl[n, w], n, w]
            )
