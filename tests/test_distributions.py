"""Distribution parity tests vs the reference (same inputs, same math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydrobert_tpu.distributions import (
    ConditionalStraightThrough,
    Density,
    GumbelOneHotCategorical,
    LogisticBernoulli,
    SequentialLanguageModelDistribution,
    SimpleRandomSamplingWithoutReplacement,
    StraightThrough,
)


@pytest.fixture(scope="session")
def ref_st(ref_torch):
    import pydrobert.torch._straight_through as mod

    return mod


def test_logistic_bernoulli_matches_reference(ref_st, seeded, key):
    import torch

    logits = np.random.randn(4, 5).astype(np.float32)
    ours = LogisticBernoulli(logits=logits)
    ref = ref_st.LogisticBernoulli(logits=torch.as_tensor(logits))
    assert isinstance(ours, StraightThrough)
    assert isinstance(ours, ConditionalStraightThrough)
    assert isinstance(ours, Density)
    z = np.asarray(ours.rsample(key, (7,)))
    assert z.shape == (7, 4, 5)
    # same z -> same densities
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(z)),
        ref.log_prob(torch.as_tensor(z)).numpy(),
        atol=1e-5,
    )
    b = np.asarray(ours.threshold(z))
    np.testing.assert_array_equal(
        b, ref.threshold(torch.as_tensor(z)).numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours.tlog_prob(b)),
        ref.tlog_prob(torch.as_tensor(b)).numpy(),
        atol=1e-5,
    )
    zcond = np.asarray(ours.csample(jax.random.fold_in(key, 1), b))
    # conditional samples must threshold back to b
    np.testing.assert_array_equal(np.asarray(ours.threshold(zcond)), b)
    np.testing.assert_allclose(
        np.asarray(ours.clog_prob(zcond, b)),
        ref.clog_prob(torch.as_tensor(zcond), torch.as_tensor(b)).numpy(),
        atol=1e-4,
    )
    # thresholded sample statistics match Bernoulli(p)
    many = np.asarray(
        ours.threshold(ours.rsample(jax.random.fold_in(key, 2), (20000,)))
    )
    np.testing.assert_allclose(
        many.mean(0), jax.nn.sigmoid(logits), atol=0.02
    )
    np.testing.assert_allclose(
        np.asarray(ours.mean), ref.mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours.stddev), ref.stddev.numpy(), atol=1e-6
    )


def test_gumbel_one_hot_matches_reference(ref_st, seeded, key):
    import torch

    logits = np.random.randn(3, 6).astype(np.float32)
    ours = GumbelOneHotCategorical(logits=logits)
    ref = ref_st.GumbelOneHotCategorical(logits=torch.as_tensor(logits))
    assert isinstance(ours, ConditionalStraightThrough)
    z = np.asarray(ours.rsample(key, (5,)))
    assert z.shape == (5, 3, 6)
    np.testing.assert_allclose(
        np.asarray(ours.log_prob(z)),
        ref.log_prob(torch.as_tensor(z)).numpy(),
        atol=1e-4,
    )
    b = np.asarray(ours.threshold(z))
    np.testing.assert_array_equal(
        b, ref.threshold(torch.as_tensor(z)).numpy()
    )
    np.testing.assert_allclose(
        np.asarray(ours.tlog_prob(b)),
        ref.tlog_prob(torch.as_tensor(b)).numpy(),
        atol=1e-5,
    )
    zcond = np.asarray(ours.csample(jax.random.fold_in(key, 1), b))
    np.testing.assert_array_equal(np.asarray(ours.threshold(zcond)), b)
    np.testing.assert_allclose(
        np.asarray(ours.clog_prob(zcond, b)),
        ref.clog_prob(torch.as_tensor(zcond), torch.as_tensor(b)).numpy(),
        atol=1e-4,
    )
    # categorical statistics
    many = np.asarray(
        ours.threshold(ours.rsample(jax.random.fold_in(key, 2), (20000,)))
    )
    np.testing.assert_allclose(
        many.mean(0), np.asarray(jax.nn.softmax(jnp.asarray(logits), -1)),
        atol=0.02,
    )


def test_srswor_distribution(seeded, key):
    d = SimpleRandomSamplingWithoutReplacement(2, 4)
    sup = np.asarray(d.enumerate_support())
    assert sup.shape == (6, 4)
    assert (sup.sum(-1) == 2).all()
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(sup))), np.full(6, -np.log(6)),
        rtol=1e-5,
    )
    b = d.sample(key, (1000,))
    assert (np.asarray(b).sum(-1) == 2).all()
    # batched with ragged totals
    d2 = SimpleRandomSamplingWithoutReplacement([1, 2], [3, 5])
    b2 = np.asarray(d2.sample(jax.random.fold_in(key, 1), (100,)))
    assert b2.shape == (100, 2, 5)
    assert (b2[:, 0, 3:] == 0).all()
    assert (b2[:, 0].sum(-1) == 1).all()
    assert (b2[:, 1].sum(-1) == 2).all()
    np.testing.assert_allclose(
        np.asarray(d2.log_partition), [np.log(3), np.log(10)], rtol=1e-5
    )


def test_lm_distribution_sample_and_log_prob(seeded, key):
    from pydrobert_tpu.lm import LookupLanguageModel
    from pydrobert_tpu.ops.decoding import RandomWalk

    V, S = 4, 5
    lm = LookupLanguageModel(V, sos=V)  # uniform unigram
    walk = RandomWalk(lm, eos=0)
    dist = SequentialLanguageModelDistribution(walk, max_iters=S)
    samples = dist.sample(key, (8,))
    assert samples.shape == (8, S)
    assert bool(dist.support.check(samples).all())
    lp = np.asarray(dist.log_prob(samples))
    # uniform LM: log prob = len * log(1/V), len = tokens up to + incl eos
    arr = np.asarray(samples)
    for i in range(8):
        eos_pos = np.where(arr[i] == 0)[0]
        n_tok = (eos_pos[0] + 1) if len(eos_pos) else S
        np.testing.assert_allclose(lp[i], -n_tok * np.log(V), rtol=1e-5)
    sup = dist.enumerate_support()
    assert bool(dist.support.check(sup).all())
    total = np.asarray(dist.log_prob(sup))
    np.testing.assert_allclose(np.exp(total).sum(), 1.0, rtol=1e-4)
