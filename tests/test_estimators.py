"""Estimator correctness tests: closed forms, unbiasedness, gradients.

Mirrors the reference's strategy (``tests/test_mc.py:54-209``): check each
estimator's mean against the exact expectation and its gradient against the
analytic/enumerated gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydrobert_tpu.distributions import (
    GumbelOneHotCategorical,
    LogisticBernoulli,
    SequentialLanguageModelDistribution,
    SimpleRandomSamplingWithoutReplacement,
)
from pydrobert_tpu.estimators import (
    DirectEstimator,
    EnumerateEstimator,
    ImportanceSamplingEstimator,
    IndependentMetropolisHastingsEstimator,
    RelaxEstimator,
    ReparameterizationEstimator,
    StraightThroughEstimator,
    relax_variance_loss,
)
from pydrobert_tpu.modules import GumbelOneHotCategoricalRebarControlVariate

V = 4
W = np.asarray([0.5, -1.0, 2.0, 0.25], np.float32)


def _f(b):
    return (b * W).sum(-1)


def _exact(logits):
    p = jax.nn.softmax(jnp.asarray(logits), -1)
    return (p * W).sum(-1)


class _OneHotCategorical:
    """Discrete one-hot categorical built from the Gumbel relaxation
    (sample -> thresholded; log_prob -> thresholded log prob)."""

    def __init__(self, logits):
        self._g = GumbelOneHotCategorical(logits=logits)

    def sample(self, key, shape=()):
        return self._g.threshold(self._g.rsample(key, shape))

    def log_prob(self, b):
        return self._g.tlog_prob(b)


def test_enumerate_estimator_exact(seeded):
    d = SimpleRandomSamplingWithoutReplacement(2, V)
    est = EnumerateEstimator(d, _f)
    v = est()
    sup = np.asarray(d.enumerate_support())
    exp = (_f(sup) / sup.shape[0]).sum()
    np.testing.assert_allclose(float(v), float(exp), rtol=1e-5)
    # log-space agrees on a positive function
    est_log = EnumerateEstimator(d, lambda b: jnp.log(_f(b) + 5.0), is_log=True)
    exp_log = np.log(np.mean(_f(sup) + 5.0))
    np.testing.assert_allclose(float(est_log()), exp_log, rtol=1e-5)


def test_direct_estimator_mean_and_grad(seeded, key):
    logits = jnp.asarray(np.random.randn(3, V), jnp.float32)

    def value(logits, key):
        d = _OneHotCategorical(logits)
        return DirectEstimator(d, _f, 4096)(key).sum()

    v, g = jax.value_and_grad(value)(logits, key)
    np.testing.assert_allclose(
        float(v), float(_exact(logits).sum()), atol=0.15
    )
    exact_g = jax.grad(lambda l: _exact(l).sum())(logits)
    np.testing.assert_allclose(np.asarray(g), np.asarray(exact_g), atol=0.15)
    # with a constant-baseline control variate (keeps the estimate unbiased)
    def value_cv(logits, key):
        d = _OneHotCategorical(logits)
        return DirectEstimator(
            d, _f, 4096, cv=lambda b: jnp.full(b.shape[:-1], 1.7),
            cv_mean=jnp.asarray(1.7),
        )(key).sum()

    v2, g2 = jax.value_and_grad(value_cv)(logits, jax.random.fold_in(key, 1))
    np.testing.assert_allclose(float(v2), float(_exact(logits).sum()), atol=0.1)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(exact_g), atol=0.1)


def test_reparameterization_estimator(seeded, key):
    logits = jnp.asarray(np.random.randn(5), jnp.float32)

    def value(logits, key):
        d = LogisticBernoulli(logits=logits)
        return ReparameterizationEstimator(d, lambda z: z, 8192)(key).sum()

    v, g = jax.value_and_grad(value)(logits, key)
    # E[z] = logits (logistic noise is zero-mean); dE/dlogits = 1
    np.testing.assert_allclose(float(v), float(logits.sum()), atol=0.1)
    np.testing.assert_allclose(np.asarray(g), np.ones(5), atol=1e-5)


def test_straight_through_estimator(seeded, key):
    logits = jnp.asarray(np.random.randn(3, V), jnp.float32)

    def value(logits, key):
        d = GumbelOneHotCategorical(logits=logits)
        return StraightThroughEstimator(d, _f, 4096)(key).sum()

    v, g = jax.value_and_grad(value)(logits, key)
    np.testing.assert_allclose(float(v), float(_exact(logits).sum()), atol=0.15)
    assert np.abs(np.asarray(g)).sum() > 0  # biased but nonzero


def test_importance_sampling_estimator(seeded, key):
    p_logits = jnp.asarray(np.random.randn(2, V), jnp.float32)
    q_logits = jnp.asarray(np.random.randn(2, V), jnp.float32)

    for self_normalize in (False, True):
        def value(p_logits, key):
            return ImportanceSamplingEstimator(
                _OneHotCategorical(q_logits),
                _f,
                8192,
                _OneHotCategorical(p_logits),
                self_normalize=self_normalize,
            )(key).sum()

        v, g = jax.value_and_grad(value)(p_logits, key)
        np.testing.assert_allclose(
            float(v), float(_exact(p_logits).sum()), atol=0.2
        )
        exact_g = jax.grad(lambda l: _exact(l).sum())(p_logits)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(exact_g), atol=0.2
        )


def test_relax_estimator_and_variance_loss(seeded, key):
    logits0 = jnp.asarray(np.random.randn(2, V), jnp.float32)
    cv_mod = GumbelOneHotCategoricalRebarControlVariate(func=_f)
    cv_params = cv_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, V)))

    def value(logits, cv_params, key):
        d = GumbelOneHotCategorical(logits=logits)
        est = RelaxEstimator(
            d, _f, 2048, cv=lambda z: cv_mod.apply(cv_params, z)
        )
        return est(key).sum()

    v, g = jax.value_and_grad(value)(logits0, cv_params, key)
    np.testing.assert_allclose(float(v), float(_exact(logits0).sum()), atol=0.2)
    exact_g = jax.grad(lambda l: _exact(l).sum())(logits0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(exact_g), atol=0.2)

    # variance-minimizing objective differentiates wrt cv params
    def build(pp, cvp):
        d = GumbelOneHotCategorical(logits=pp)
        return RelaxEstimator(d, _f, 64, cv=lambda z: cv_mod.apply(cvp, z))

    loss = relax_variance_loss(build, logits0, cv_params, key)
    assert np.isfinite(float(loss))
    g_cv = jax.grad(
        lambda cvp: relax_variance_loss(build, logits0, cvp, key)
    )(cv_params)
    flat = jax.tree_util.tree_leaves(g_cv)
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in flat)


def test_metropolis_hastings_estimator(seeded, key):
    p_logits = jnp.asarray(np.random.randn(V), jnp.float32)
    q = GumbelOneHotCategorical(logits=jnp.zeros((V,)))
    p = GumbelOneHotCategorical(logits=p_logits)

    class _Q:
        batch_shape = ()
        event_shape = (V,)

        def sample(self, key, shape):
            return q.threshold(q.rsample(key, shape))

        def log_prob(self, b):
            return q.tlog_prob(b)

    class _P:
        def log_prob(self, b):
            return p.tlog_prob(b)

    est = IndependentMetropolisHastingsEstimator(
        _Q(), _f, 4096, _P(), burn_in=256
    )
    v = est(key)
    np.testing.assert_allclose(float(v), float(_exact(p_logits)), atol=0.2)


def test_enumerate_estimator_over_lm_distribution(seeded, key):
    from pydrobert_tpu.lm import LookupLanguageModel
    from pydrobert_tpu.ops.decoding import RandomWalk

    Vlm, S = 3, 3
    lm = LookupLanguageModel(Vlm, sos=Vlm)
    walk = RandomWalk(lm, eos=0)
    dist = SequentialLanguageModelDistribution(walk, max_iters=S)
    func = lambda b: b.sum(-1).astype(jnp.float32)
    exact = EnumerateEstimator(dist, func)()
    # MC check via the walk itself
    mc = []
    for i in range(64):
        s = dist.sample(jax.random.fold_in(key, i), (8,))
        mc.append(np.asarray(func(s)))
    np.testing.assert_allclose(float(exact), np.mean(mc), atol=0.1)


def test_deprecated_v03_functional_interface(seeded, key):
    """to_z/to_b/reinforce/relax warn and produce sane gradients
    (reference estimators.py:54-471)."""
    import warnings

    from pydrobert_tpu import estimators as E

    logits = jnp.asarray(np.random.randn(512, V), jnp.float32)
    with pytest.warns(DeprecationWarning):
        z = E.to_z(key, logits, "onehot")
    with pytest.warns(DeprecationWarning):
        b = E.to_b(z, "onehot")
    assert np.asarray(b).sum(-1).max() == 1
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fb = _f(b)
        g = E.reinforce(fb, b, logits, "onehot")
        # REINFORCE estimate averages to the exact gradient
        exact_g = jax.grad(lambda l: _exact(l).sum())(logits)
        np.testing.assert_allclose(
            np.asarray(g).mean(0), np.asarray(exact_g).mean(0), atol=0.2
        )
        g2 = E.relax(
            fb, b, logits, z, lambda zz: 0.3 * _f(jax.nn.softmax(zz, -1)),
            "onehot", jax.random.fold_in(key, 1),
        )
        assert g2.shape == logits.shape
        np.testing.assert_allclose(
            np.asarray(g2).mean(0), np.asarray(exact_g).mean(0), atol=0.2
        )
        # bernoulli branch
        zb = E.to_z(key, logits[:, 0], "bern")
        bb = E.to_b(zb, "bern")
        gb = E.reinforce(bb, bb, logits[:, 0], "bern")
        assert gb.shape == logits[:, 0].shape


@pytest.mark.skipif(
    not __import__("os").environ.get("DO_MC_BENCHMARK"),
    reason="opt-in benchmark (set DO_MC_BENCHMARK=1)",
)
def test_benchmark(seeded, key, capsys):
    """Opt-in estimator-convergence benchmark, mirroring the reference's
    ``tests/test_mc.py:290-404``: optimize 10 Bernoulli params to a target
    with each estimator; report iterations and wall time to convergence."""
    import time

    import optax

    from pydrobert_tpu.estimators import RelaxEstimator
    from pydrobert_tpu.modules import LogisticBernoulliRebarControlVariate

    target = jnp.asarray(np.random.randint(0, 2, (10,)), jnp.float32)

    def func(b):
        return -((b - target) ** 2)

    class Bern:
        def __init__(self, logits):
            self._d = LogisticBernoulli(logits=logits)

        def sample(self, key, shape=()):
            return self._d.threshold(self._d.rsample(key, shape))

        def log_prob(self, b):
            return self._d.tlog_prob(b)

    def direct_loss(logits, k):
        return -DirectEstimator(Bern(logits), func, 32)(k).sum()

    def st_loss(logits, k):
        return -StraightThroughEstimator(
            LogisticBernoulli(logits=logits), func, 32
        )(k).sum()

    cv_mod = LogisticBernoulliRebarControlVariate(func=func)
    cv_params = cv_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))

    def rebar_loss(logits, k):
        est = RelaxEstimator(
            LogisticBernoulli(logits=logits), func, 32,
            cv=lambda z: cv_mod.apply(cv_params, z),
        )
        return -est(k).sum()

    report = []
    for name, loss in [
        ("direct", direct_loss), ("st", st_loss), ("rebar", rebar_loss),
    ]:
        logits = jnp.zeros(10)
        opt = optax.adam(0.1)
        state = opt.init(logits)
        gfn = jax.jit(jax.grad(loss))
        t0 = time.perf_counter()
        iters = 0
        for i in range(2000):
            g = gfn(logits, jax.random.fold_in(key, i))
            upd, state = opt.update(g, state)
            logits = optax.apply_updates(logits, upd)
            iters = i + 1
            probs = np.asarray(jax.nn.sigmoid(logits))
            if ((probs > 0.5) == np.asarray(target, bool)).all() and (
                np.abs(probs - np.asarray(target)) < 0.2
            ).all():
                break
        dt = time.perf_counter() - t0
        report.append((name, iters, dt))
        assert iters < 2000, name
    with capsys.disabled():
        for name, iters, dt in report:
            print(f"\n{name}: converged in {iters} iters, {dt:.1f}s", end="")
