import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pydrobert_tpu.ops import combinatorics as C
from pydrobert_tpu.ops import feats as FT
from pydrobert_tpu.ops import pad as P
from pydrobert_tpu.ops import rl as RL


def _to_t(x):
    import torch

    return torch.tensor(np.asarray(x))


@pytest.mark.parametrize("mode", ["constant", "reflect", "replicate"])
def test_pad_variable_parity(ref_torch, mode):
    N, T, F = 5, 9, 3
    x = np.random.randn(N, T, F).astype(np.float32)
    lens = np.random.randint(2, T + 1, (N,))
    pad = np.random.randint(0, 2 if mode == "reflect" else 4, (2, N))
    if mode == "reflect":
        pad = np.minimum(pad, lens[None] - 1)
    exp = ref_torch.functional.pad_variable(
        _to_t(x), _to_t(lens), _to_t(pad), mode=mode, value=-1.5
    ).numpy()
    act = np.asarray(P.pad_variable(x, lens, pad, mode=mode, value=-1.5))
    assert act.shape == exp.shape
    # only positions within each padded sequence are defined by contract
    new_lens = lens + pad.sum(0)
    for n in range(N):
        np.testing.assert_allclose(act[n, : new_lens[n]], exp[n, : new_lens[n]])


def test_pad_variable_2d(ref_torch):
    x = np.arange(10).reshape(2, 5).astype(np.float32)
    lens = np.array([3, 4])
    pad = np.array([[0, 1], [2, 3]])
    exp = ref_torch.functional.pad_variable(
        _to_t(x), _to_t(lens), _to_t(pad), mode="reflect"
    ).numpy()
    act = np.asarray(P.pad_variable(x, lens, pad, mode="reflect"))
    new_lens = lens + pad.sum(0)
    for n in range(2):
        np.testing.assert_allclose(act[n, : new_lens[n]], exp[n, : new_lens[n]])


@pytest.mark.parametrize("batch_first", [True, False])
def test_pad_masked_sequence_parity(ref_torch, batch_first):
    x = np.random.randn(6, 7, 2).astype(np.float32)
    mask = np.random.rand(6, 7) < 0.5
    exp_x, exp_lens = ref_torch.functional.pad_masked_sequence(
        _to_t(x), _to_t(mask), batch_first=batch_first, padding_value=-1.0
    )
    act_x, act_lens = P.pad_masked_sequence(
        x, mask, batch_first=batch_first, padding_value=-1.0
    )
    np.testing.assert_allclose(np.asarray(act_x), exp_x.numpy())
    np.testing.assert_array_equal(np.asarray(act_lens), exp_lens.numpy())


@pytest.mark.parametrize("mode", ["constant", "reflect", "replicate"])
def test_chunk_by_slices_parity(ref_torch, mode):
    N, T, F = 6, 8, 2
    x = np.random.randn(N, T, F).astype(np.float32)
    lens = np.random.randint(3, T + 1, (N,))
    starts = np.random.randint(-2, T - 1, (N,))
    ends = starts + np.random.randint(0, 4, (N,))
    if mode == "reflect":
        # keep paddings < lens as the reference requires
        starts = np.clip(starts, -(lens - 1), None)
        ends = np.minimum(ends, lens + lens - 1)
    slices = np.stack([starts, ends], 1)
    exp_x, exp_lens = ref_torch.functional.chunk_by_slices(
        _to_t(x), _to_t(slices), _to_t(lens), mode=mode, value=-2.0
    )
    exp_x, exp_lens = exp_x.numpy(), exp_lens.numpy()
    act_x, act_lens = P.chunk_by_slices(
        x, slices, lens, mode=mode, value=-2.0
    )
    act_x = np.asarray(act_x)
    np.testing.assert_array_equal(np.asarray(act_lens), exp_lens)
    for n in range(N):
        np.testing.assert_allclose(
            act_x[n, : exp_lens[n]], exp_x[n, : exp_lens[n]], err_msg=f"n={n}"
        )


def test_mean_var_norm_parity(ref_torch):
    x = np.random.randn(4, 10, 5).astype(np.float32) * 3 + 1
    for dim in (-1, 0, 1, 2):
        exp = ref_torch.functional.mean_var_norm(_to_t(x), dim=dim).numpy()
        act = np.asarray(FT.mean_var_norm(x, dim=dim))
        np.testing.assert_allclose(act, exp, rtol=1e-4, atol=1e-5)
    mean = np.random.randn(5).astype(np.float32)
    std = np.random.rand(5).astype(np.float32) + 0.5
    exp = ref_torch.functional.mean_var_norm(
        _to_t(x), dim=2, mean=_to_t(mean), std=_to_t(std)
    ).numpy()
    act = np.asarray(FT.mean_var_norm(x, dim=2, mean=mean, std=std))
    np.testing.assert_allclose(act, exp, rtol=1e-5)


@pytest.mark.parametrize("order,width", [(0, 2), (1, 2), (2, 2), (2, 3)])
def test_feat_delta_filters_parity(ref_torch, order, width):
    import sys

    sys.path.insert(0, "/root/reference/src")
    from pydrobert.torch._feats import _feat_delta_filters

    exp = _feat_delta_filters(order, width).numpy()
    act = FT.feat_delta_filters(order, width)
    np.testing.assert_allclose(act, exp, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("concatenate", [True, False])
@pytest.mark.parametrize("pad_mode", ["replicate", "constant", "reflect"])
def test_feat_deltas_parity(ref_torch, concatenate, pad_mode):
    x = np.random.randn(4, 9, 5).astype(np.float32)
    exp = ref_torch.functional.feat_deltas(
        _to_t(x), concatenate=concatenate, pad_mode=pad_mode
    ).numpy()
    act = np.asarray(FT.feat_deltas(x, concatenate=concatenate, pad_mode=pad_mode))
    np.testing.assert_allclose(act, exp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("policy", ["fixed", "ali", "ref"])
@pytest.mark.parametrize("window_type", ["symmetric", "causal", "future"])
@pytest.mark.parametrize("valid_only", [True, False])
@pytest.mark.parametrize("lobe_size", [0, 2])
def test_slice_spect_data_parity(
    ref_torch, policy, window_type, valid_only, lobe_size
):
    N, T = 5, 12
    if policy == "fixed":
        inp = np.random.randn(N, T, 4).astype(np.float32)
        in_lens = np.random.randint(1, T + 1, (N,))
        other = None
    elif policy == "ali":
        inp = np.random.randint(0, 3, (N, T))
        # the reference crashes when in_lens == T (_feats.py:517-518), so
        # parity can only be checked for in_lens < T
        in_lens = np.random.randint(1, T, (N,))
        other = None
    else:
        R = 6
        toks = np.random.randint(0, 9, (N, R))
        starts = np.random.randint(-1, 8, (N, R))
        ends = starts + np.random.randint(-1, 4, (N, R))
        inp = np.stack([toks, starts, ends], 2)
        in_lens = np.random.randint(0, R + 1, (N,))
        other = np.random.randint(4, 12, (N,))
    exp_s, exp_src = ref_torch.functional.slice_spect_data(
        _to_t(inp),
        _to_t(in_lens),
        None if other is None else _to_t(other),
        policy=policy,
        window_type=window_type,
        valid_only=valid_only,
        lobe_size=lobe_size,
    )
    act_s, act_src = FT.slice_spect_data(
        inp, in_lens, other, policy=policy, window_type=window_type,
        valid_only=valid_only, lobe_size=lobe_size,
    )
    np.testing.assert_array_equal(act_s, exp_s.numpy())
    np.testing.assert_array_equal(act_src, exp_src.numpy())


@pytest.mark.parametrize("partial", [True, False])
@pytest.mark.parametrize("retain", [True, False])
def test_chunk_token_sequences_parity(ref_torch, partial, retain):
    N, R = 6, 7
    toks = np.random.randint(0, 9, (N, R))
    starts = np.random.randint(-1, 8, (N, R))
    ends = starts + np.random.randint(-1, 4, (N, R))
    refs = np.stack([toks, starts, ends], 2)
    ref_lens = np.random.randint(0, R + 1, (N,))
    s0 = np.random.randint(-1, 6, (N,))
    slices = np.stack([s0, s0 + np.random.randint(1, 6, (N,))], 1)
    exp_c, exp_l = ref_torch.functional.chunk_token_sequences_by_slices(
        _to_t(refs), _to_t(slices), _to_t(ref_lens), partial, retain
    )
    act_c, act_l = FT.chunk_token_sequences_by_slices(
        refs, slices, ref_lens, partial, retain
    )
    exp_c, exp_l = exp_c.numpy(), exp_l.numpy()
    act_c, act_l = np.asarray(act_c), np.asarray(act_l)
    np.testing.assert_array_equal(act_l, exp_l)
    for n in range(N):
        np.testing.assert_array_equal(act_c[n, : act_l[n]], exp_c[n, : exp_l[n]])


def test_binomial_coefficient_parity(ref_torch):
    import sys

    sys.path.insert(0, "/root/reference/src")
    from pydrobert.torch.functional import binomial_coefficient as ref_bc

    for hi in (10, 30):
        length = np.random.randint(0, hi, (8,))
        count = np.random.randint(0, hi // 2, (8,))
        exp = ref_bc(_to_t(length), _to_t(count)).numpy()
        act = np.asarray(C.binomial_coefficient(length, count))
        np.testing.assert_array_equal(act, exp)


def test_enumerate_parity(ref_torch):
    from pydrobert.torch.functional import (
        enumerate_binary_sequences_with_cardinality as ref_ec,
        enumerate_vocab_sequences as ref_ev,
    )

    exp = ref_ev(3, 4).numpy()
    np.testing.assert_array_equal(np.asarray(C.enumerate_vocab_sequences(3, 4)), exp)
    exp = ref_ec(5, 2).numpy()
    np.testing.assert_array_equal(
        np.asarray(C.enumerate_binary_sequences_with_cardinality(5, 2)), exp
    )
    length = np.array([3, 5])
    count = np.array([2, 2])
    exp_s, exp_b = ref_ec(_to_t(length), _to_t(count))
    act_s, act_b = C.enumerate_binary_sequences_with_cardinality(length, count)
    np.testing.assert_array_equal(np.asarray(act_b), exp_b.numpy())
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(act_s)[i, : act_b[i]], exp_s[i, : exp_b[i]].numpy()
        )


def test_srswor_properties(key):
    total = jnp.array([4, 7, 7, 2])
    given = jnp.array([2, 3, 0, 2])
    b = C.simple_random_sampling_without_replacement(key, total, given, 8)
    assert b.shape == (4, 8)
    b = np.asarray(b)
    assert ((b == 0) | (b == 1)).all()
    for n in range(4):
        assert b[n, int(total[n]):].sum() == 0
        assert b[n].sum() == int(given[n])
    # uniformity: each position within total_count equally likely
    keys = jax.random.split(key, 300)
    draws = jax.vmap(
        lambda k: C.simple_random_sampling_without_replacement(
            k, jnp.array(5), jnp.array(2), 5
        )
    )(keys)
    freq = np.asarray(draws).mean(0)
    np.testing.assert_allclose(freq, 0.4, atol=0.1)


@pytest.mark.parametrize("gamma", [0.0, 0.9])
@pytest.mark.parametrize("batch_first", [True, False])
def test_time_distributed_return_parity(ref_torch, gamma, batch_first):
    r = np.random.randn(7, 5).astype(np.float32)
    exp = ref_torch.functional.time_distributed_return(
        _to_t(r), gamma, batch_first=batch_first
    ).numpy()
    act = np.asarray(RL.time_distributed_return(r, gamma, batch_first=batch_first))
    np.testing.assert_allclose(act, exp, rtol=1e-4, atol=1e-5)


def test_slice_spect_data_ali_docstring_examples():
    # from the reference's SliceSpectData notes (_feats.py:702-710); these
    # include segments ending at T, which the reference code itself cannot
    # produce (it crashes when in_lens == T) but its docs require
    from pydrobert_tpu.ops.feats import slice_spect_data

    ali = np.array([[1] * 4 + [2] * 3 + [1] + [5] * 2])
    cases = [
        ("symmetric", True, [[0, 8], [4, 10]]),
        ("causal", True, [[0, 7], [4, 8], [7, 10]]),
        ("symmetric", False, [[0, 7], [0, 8], [4, 10], [7, 10]]),
        ("causal", False, [[0, 4], [0, 7], [4, 8], [7, 10]]),
        ("future", False, [[0, 7], [4, 8], [7, 10], [8, 10]]),
    ]
    for wt, vo, exp in cases:
        s, src = slice_spect_data(
            ali, policy="ali", window_type=wt, valid_only=vo, lobe_size=1
        )
        assert s.tolist() == exp, (wt, vo)
        assert (src == 0).all()


def test_slice_spect_data_fixed_docstring_examples():
    # reference _feats.py:680-684 (T=8, lobe_size=2)
    from pydrobert_tpu.ops.feats import slice_spect_data

    x = np.zeros((1, 8, 1))
    cases = [
        ("symmetric", True, [[0, 5], [3, 8]]),
        ("causal", True, [[0, 3], [3, 6]]),
        ("symmetric", False, [[-1, 4], [2, 7], [5, 10]]),
        ("causal", False, [[-2, 1], [1, 4], [4, 7]]),
        ("future", False, [[0, 3], [3, 6], [6, 9]]),
    ]
    for wt, vo, exp in cases:
        s, _ = slice_spect_data(
            x, policy="fixed", window_type=wt, valid_only=vo, lobe_size=2
        )
        assert s.tolist() == exp, (wt, vo)
