import numpy as np
import pytest
import jax.numpy as jnp

from pydrobert_tpu.ops import string as S


def _rand_batch(N=8, R=11, H=13, V=6, eos=None):
    ref = np.random.randint(0, V, (R, N))
    hyp = np.random.randint(0, V, (H, N))
    if eos is not None:
        # insert eos at random positions in some sequences
        for arr, L in ((ref, R), (hyp, H)):
            for n in range(N):
                if np.random.rand() < 0.8:
                    pos = np.random.randint(0, L)
                    arr[pos, n] = eos
    return ref, hyp


def _to_t(x):
    import torch

    return torch.tensor(np.asarray(x))


@pytest.mark.parametrize("eos", [None, 0])
@pytest.mark.parametrize("include_eos", [False, True])
@pytest.mark.parametrize("norm", [False, True])
@pytest.mark.parametrize("batch_first", [False, True])
def test_error_rate_parity(ref_torch, eos, include_eos, norm, batch_first):
    ref, hyp = _rand_batch(eos=eos)
    if batch_first:
        ref, hyp = ref.T, hyp.T
    exp = ref_torch.functional.error_rate(
        _to_t(ref), _to_t(hyp), eos=eos, include_eos=include_eos, norm=norm,
        batch_first=batch_first, warn=False,
    ).numpy()
    act = S.error_rate(
        ref, hyp, eos=eos, include_eos=include_eos, norm=norm,
        batch_first=batch_first, warn=False,
    )
    np.testing.assert_allclose(np.asarray(act), exp, rtol=1e-5)


@pytest.mark.parametrize("costs", [(1.0, 1.0, 1.0), (2.0, 2.0, 2.0), (1.0, 2.0, 3.0), (0.5, 1.3, 0.9)])
@pytest.mark.parametrize("fn", ["edit_distance", "error_rate"])
@pytest.mark.parametrize("norm", [False, True])
def test_costs_parity(ref_torch, costs, fn, norm):
    ins, dele, sub = costs
    ref, hyp = _rand_batch(N=6, R=9, H=10, V=4)
    exp = getattr(ref_torch.functional, fn)(
        _to_t(ref), _to_t(hyp), norm=norm, ins_cost=ins, del_cost=dele,
        sub_cost=sub, warn=False,
    ).numpy()
    act = getattr(S, fn)(
        ref, hyp, norm=norm, ins_cost=ins, del_cost=dele, sub_cost=sub,
        warn=False,
    )
    np.testing.assert_allclose(np.asarray(act), exp, rtol=1e-5)


@pytest.mark.parametrize("fn", ["prefix_error_rates", "prefix_edit_distances"])
@pytest.mark.parametrize("eos", [None, 0])
@pytest.mark.parametrize("norm", [False, True])
@pytest.mark.parametrize("exclude_last", [False, True])
@pytest.mark.parametrize("batch_first", [False, True])
def test_prefix_parity(ref_torch, fn, eos, norm, exclude_last, batch_first):
    ref, hyp = _rand_batch(eos=eos)
    if batch_first:
        ref, hyp = ref.T, hyp.T
    exp = getattr(ref_torch.functional, fn)(
        _to_t(ref), _to_t(hyp), eos=eos, norm=norm, exclude_last=exclude_last,
        batch_first=batch_first, warn=False,
    ).numpy()
    act = getattr(S, fn)(
        ref, hyp, eos=eos, norm=norm, exclude_last=exclude_last,
        batch_first=batch_first, warn=False,
    )
    np.testing.assert_allclose(np.asarray(act), exp, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("eos", [None, 0])
@pytest.mark.parametrize("exclude_last", [False, True])
@pytest.mark.parametrize("batch_first", [False, True])
def test_optimal_completion_parity(ref_torch, eos, exclude_last, batch_first):
    ref, hyp = _rand_batch(N=6, R=8, H=9, V=5, eos=eos)
    if batch_first:
        ref, hyp = ref.T, hyp.T
    exp = ref_torch.functional.optimal_completion(
        _to_t(ref), _to_t(hyp), eos=eos, exclude_last=exclude_last,
        batch_first=batch_first, warn=False,
    ).numpy()
    act = np.asarray(
        S.optimal_completion(
            ref, hyp, eos=eos, exclude_last=exclude_last,
            batch_first=batch_first, warn=False,
        )
    )
    # ours is padded out to C=R columns; reference uses the tight width
    C = exp.shape[-1]
    assert act.shape[:-1] == exp.shape[:-1]
    assert (act[..., C:] == -100).all()
    act = act[..., :C]
    np.testing.assert_array_equal(np.sort(act, -1), np.sort(exp, -1))


def test_fill_after_eos(ref_torch):
    tokens = np.random.randint(0, 4, (7, 5))
    exp = ref_torch.functional.fill_after_eos(_to_t(tokens), 1, dim=0, fill=-3).numpy()
    act = S.fill_after_eos(tokens, 1, axis=0, fill=-3)
    np.testing.assert_array_equal(np.asarray(act), exp)
    # value variant with broadcast
    logits = np.random.randn(7, 5).astype(np.float32)
    exp = ref_torch.functional.fill_after_eos(
        _to_t(tokens), 2, dim=0, fill=0.0, value=_to_t(logits)
    ).numpy()
    act = S.fill_after_eos(tokens, 2, axis=0, fill=0.0, value=logits)
    np.testing.assert_allclose(np.asarray(act), exp)


@pytest.mark.parametrize("reduction", ["mean", "sum", "none"])
@pytest.mark.parametrize("batch_first", [False, True])
def test_hard_ocd_loss_parity(ref_torch, reduction, batch_first):
    import torch

    N, R, H, V = 5, 6, 7, 8
    ref = np.random.randint(0, V, (R, N))
    hyp = np.random.randint(0, V, (H, N))
    logits = np.random.randn(H, N, V).astype(np.float32)
    if batch_first:
        ref, hyp, logits = ref.T, hyp.T, logits.transpose(1, 0, 2)
    exp = ref_torch.functional.hard_optimal_completion_distillation_loss(
        _to_t(logits), _to_t(ref), _to_t(hyp), reduction=reduction,
        batch_first=batch_first, warn=False,
    ).numpy()
    act = S.hard_optimal_completion_distillation_loss(
        logits, ref, hyp, reduction=reduction, batch_first=batch_first,
        warn=False,
    )
    np.testing.assert_allclose(np.asarray(act), exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduction", ["mean", "none"])
@pytest.mark.parametrize("sub_avg", [False, True])
@pytest.mark.parametrize("batch_first", [False, True])
def test_mer_loss_parity(ref_torch, reduction, sub_avg, batch_first):
    N, M, R, H, V = 4, 3, 6, 7, 8
    ref = np.random.randint(0, V, (R, N))
    hyp = np.random.randint(0, V, (H, N, M))
    log_probs = np.random.randn(N, M).astype(np.float32)
    if batch_first:
        ref = ref.T
        hyp = hyp.transpose(1, 2, 0)
    exp = ref_torch.functional.minimum_error_rate_loss(
        _to_t(log_probs), _to_t(ref), _to_t(hyp), sub_avg=sub_avg,
        reduction=reduction, batch_first=batch_first, warn=False,
    ).numpy()
    act = S.minimum_error_rate_loss(
        log_probs, ref, hyp, sub_avg=sub_avg, reduction=reduction,
        batch_first=batch_first, warn=False,
    )
    np.testing.assert_allclose(np.asarray(act), exp, rtol=1e-4, atol=1e-5)


def test_edit_distance_known_values():
    # kitten -> sitting = 3
    ref = np.array([[11, 9, 20, 20, 5, 14]]).T  # k i t t e n
    hyp = np.array([[19, 9, 20, 20, 9, 14, 7]]).T  # s i t t i n g
    d = S.edit_distance(ref, hyp)
    assert float(d[0]) == 3.0
    assert float(S.error_rate(ref, hyp)[0]) == pytest.approx(0.5)


def test_jit_consistency(jit_fn):
    import jax

    ref, hyp = _rand_batch(N=4, R=7, H=8)
    fn = jit_fn(lambda r, h: S.error_rate(r, h, warn=False))
    out = fn(jnp.asarray(ref), jnp.asarray(hyp))
    out2 = S.error_rate(ref, hyp, warn=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_edit_distance_empty_hyp(ref_torch):
    """Zero hypothesis steps (H == 0) must not crash and must match the
    reference (pure deletions)."""
    import torch

    ref = np.array([[1, 2], [3, 4], [0, 0]])
    ref_lens = np.array([3, 2])
    hyp = np.zeros((0, 2), np.int64)
    hyp_lens = np.zeros((2,), np.int64)
    exp = ref_torch.functional.edit_distance(
        torch.tensor(ref), torch.tensor(hyp)
    ).numpy()
    act = np.asarray(S.edit_distance(ref, hyp))
    np.testing.assert_allclose(act, exp)
    # error_rate + prefix variants on the same degenerate input
    np.testing.assert_allclose(
        np.asarray(S.error_rate(ref, hyp)),
        ref_torch.functional.error_rate(
            torch.tensor(ref), torch.tensor(hyp)
        ).numpy(),
    )
    np.testing.assert_allclose(
        np.asarray(S.prefix_error_rates(ref, hyp)),
        ref_torch.functional.prefix_error_rates(
            torch.tensor(ref), torch.tensor(hyp)
        ).numpy(),
    )
    oc = S.optimal_completion(ref, hyp)
    assert oc.shape[0] == 1
