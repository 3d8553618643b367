"""Pallas kernel parity tests (run on TPU; skipped on CPU hosts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydrobert_tpu.ops.pallas import edit_distance_kernel, tpu_available

pytestmark = pytest.mark.skipif(
    not tpu_available(), reason="pallas kernels require a TPU backend"
)


def _lev(r, h, ic, dc, sc):
    row = [i * dc for i in range(len(r) + 1)]
    for tok in h:
        new = [row[0] + ic]
        for i, rt in enumerate(r):
            new.append(
                min(
                    row[i + 1] + ic,
                    row[i] + (sc if rt != tok else 0),
                    new[i] + dc,
                )
            )
        row = new
    return row[len(r)]


@pytest.mark.parametrize("costs", [(1.0, 1.0, 1.0), (3.0, 3.0, 4.0)])
@pytest.mark.parametrize("shape", [(11, 13, 50), (40, 3, 200), (1, 1, 1)])
def test_edit_distance_kernel_matches_oracle(seeded, costs, shape):
    R, H, N = shape
    ref = jnp.asarray(np.random.randint(0, 5, (R, N)), jnp.int32)
    hyp = jnp.asarray(np.random.randint(0, 5, (H, N)), jnp.int32)
    ref_lens = jnp.asarray(np.random.randint(0, R + 1, (N,)), jnp.int32)
    hyp_lens = jnp.asarray(np.random.randint(0, H + 1, (N,)), jnp.int32)
    out = edit_distance_kernel(ref, hyp, ref_lens, hyp_lens, *costs)
    exp = [
        _lev(
            list(np.asarray(ref)[: ref_lens[n], n]),
            list(np.asarray(hyp)[: hyp_lens[n], n]),
            *costs,
        )
        for n in range(N)
    ]
    np.testing.assert_allclose(np.asarray(out), exp)


def test_public_error_rate_uses_kernel_and_matches(seeded, monkeypatch):
    """The gated public path on TPU equals the pure-XLA fallback."""
    from pydrobert_tpu import config
    from pydrobert_tpu.ops.string import error_rate

    ref = jnp.asarray(np.random.randint(0, 8, (20, 33)), jnp.int32)
    hyp = jnp.asarray(np.random.randint(0, 8, (24, 33)), jnp.int32)
    fast = error_rate(ref, hyp, norm=True)
    monkeypatch.setattr(config, "USE_PALLAS", False)
    slow = error_rate(ref, hyp, norm=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-6)


def _beam_outputs_equal(a, b):
    """Semantic equality of (y, y_lens, y_probs) triples: lengths exact,
    probs within a relative tolerance (f32 reduction order differs between
    the kernel's one-hot sums and XLA's gathers, compounding over T steps),
    token paths exact up to each returned length."""
    y0, l0, p0 = (np.asarray(x) for x in a)
    y1, l1, p1 = (np.asarray(x) for x in b)
    if not (l0 == l1).all():
        return False
    if not (np.isfinite(p0) == np.isfinite(p1)).all():
        return False
    fin = np.isfinite(p0)
    if not np.allclose(
        np.where(fin, p0, 0), np.where(fin, p1, 0), rtol=1e-4, atol=1e-12
    ):
        return False
    N, W = l0.shape
    return all(
        (y0[: l0[n, w], n, w] == y1[: l0[n, w], n, w]).all()
        for n in range(N)
        for w in range(W)
    )


@pytest.mark.parametrize("shape", [(64, 8, 128, 8), (32, 4, 64, 4)])
def test_ctc_beam_search_kernel_matches_search(seeded, shape, monkeypatch):
    from pydrobert_tpu import config
    from pydrobert_tpu.ops.decoding import CTCPrefixSearch
    from pydrobert_tpu.ops.pallas import ctc_beam_search_pallas

    T, N, V, W = shape
    # the (gated-off, measured-loser) whole-loop kernel carries RAW
    # linear masses — the reference's semantics. The XLA scan has
    # renormalized (denormal-proof) by default since r5, which is MORE
    # accurate on TPU once masses decay below normal f32 (by ~frame 55
    # here): pin the kernel against the raw-carry scan it implements
    monkeypatch.setattr(config, "DECODE_RENORM", False)
    logits = jnp.asarray(np.random.randn(T, N, V + 1) * 2, jnp.float32)
    lens = jnp.asarray(np.random.randint(0, T + 1, (N,)), jnp.int32)
    lens = lens.at[0].set(T)
    probs = jax.nn.softmax(logits, 2)
    got = jax.jit(ctc_beam_search_pallas, static_argnums=3)(
        probs[..., :V], probs[..., V], lens, W
    )
    want = jax.jit(lambda l, ln: CTCPrefixSearch(W)(l, ln))(logits, lens)
    assert _beam_outputs_equal(want, got)


def test_ctc_prefix_search_beam_gate(seeded, monkeypatch):
    """CTCPrefixSearch with USE_PALLAS_BEAM routes through the kernel and
    matches the pure-XLA scan."""
    from pydrobert_tpu import config
    from pydrobert_tpu.ops import decoding as D

    T, N, V, W = 48, 4, 128, 8
    # raw-carry baseline: the kernel implements the unrenormalized
    # reference semantics (see test_ctc_beam_search_kernel_matches_search)
    monkeypatch.setattr(config, "DECODE_RENORM", False)
    logits = jnp.asarray(np.random.randn(T, N, V + 1) * 2, jnp.float32)
    lens = jnp.asarray(np.random.randint(1, T + 1, (N,)), jnp.int32)
    search = D.CTCPrefixSearch(W)
    base = jax.jit(lambda l, ln: search(l, ln))(logits, lens)
    monkeypatch.setattr(config, "USE_PALLAS_BEAM", True)
    gated = jax.jit(lambda l, ln: search(l, ln))(logits, lens)
    assert _beam_outputs_equal(base, gated)



@pytest.mark.parametrize("shape,k", [((500 * 4, 1024), 32), ((37, 300), 7)])
def test_top_m_pallas_matches_lax_top_k_on_tpu(seeded, shape, k):
    from pydrobert_tpu.ops.pallas import top_m_pallas

    x = jnp.asarray(np.random.randn(*shape), jnp.float32)
    for arr in (x, jnp.round(x * 2) / 2):
        wv, wi = jax.lax.top_k(arr, k)
        gv, gi = top_m_pallas(arr, k)
        assert (np.asarray(gv) == np.asarray(wv)).all()
        assert (np.asarray(gi) == np.asarray(wi)).all()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("with_bias", [False, True])
def test_decode_prologue_kernel_matches_xla_on_tpu(seeded, dtype, with_bias):
    """Fused decode prologue on REAL hardware == the XLA prologue: top-M
    values/indices/tie order bit-exact, softmax stats within reduction
    tolerance. Interpret-mode parity proved insufficient in round 2 (a
    kernel that passed interpret failed to compile on the chip), so this
    pins the actual device behavior."""
    from pydrobert_tpu.ops.decoding import _decode_prologue
    from pydrobert_tpu.ops.pallas import decode_prologue_pallas
    from pydrobert_tpu.ops.topk import hoisted_top_k

    T, N, V, M = 40, 8, 1024, 64
    logits = jnp.asarray(np.random.randn(T, N, V + 1) * 3, dtype)
    g_bias = (
        jnp.asarray(np.random.randn(V), jnp.float32) if with_bias else None
    )
    tl, ti, mx, den, blank = jax.jit(
        decode_prologue_pallas, static_argnums=1
    )(logits, M, g_bias)
    lf = logits.astype(jnp.float32)
    sm_max = lf.max(2)
    sm_den = jnp.exp(lf - sm_max[..., None]).sum(2)
    want_blank = jnp.exp(lf[..., V] - sm_max) / sm_den
    g = lf[..., :V] if g_bias is None else lf[..., :V] + g_bias[None, None]
    wtl, wti = hoisted_top_k(g, M)
    assert (np.asarray(ti) == np.asarray(wti)).all()
    np.testing.assert_allclose(np.asarray(tl), np.asarray(wtl), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(sm_max), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(den), np.asarray(sm_den), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(blank - mx) / den),
        np.asarray(want_blank),
        rtol=1e-5,
        atol=1e-7,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_spec_augment_apply_kernel_matches_xla_on_tpu(
    seeded, dtype, monkeypatch
):
    """Gated fused SpecAugment apply on REAL hardware == the separable-warp
    XLA path on the same drawn parameters."""
    from pydrobert_tpu import config
    from pydrobert_tpu.ops.img import (
        spec_augment_apply_parameters,
        spec_augment_draw_parameters,
    )

    N, T, F = 4, 200, 80
    feats = jnp.asarray(np.random.randn(N, T, F), dtype)
    lengths = jnp.asarray(
        np.random.randint(T // 2, T + 1, (N,)), jnp.float32
    )
    params = spec_augment_draw_parameters(
        jax.random.PRNGKey(3),
        feats,
        max_time_warp=40.0,
        max_freq_warp=0.0,
        max_time_mask=30,
        max_freq_mask=20,
        max_time_mask_proportion=1.0,
        num_time_mask=4,
        num_time_mask_proportion=0.04,
        num_freq_mask=2,
        lengths=lengths,
    )
    fast = spec_augment_apply_parameters(feats, params, lengths=lengths)
    monkeypatch.setattr(config, "USE_PALLAS", False)
    slow = spec_augment_apply_parameters(feats, params, lengths=lengths)
    assert fast.dtype == slow.dtype == feats.dtype
    np.testing.assert_allclose(
        np.asarray(fast, np.float32),
        np.asarray(slow, np.float32),
        rtol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
        atol=2e-2 if dtype == jnp.bfloat16 else 1e-5,
    )
