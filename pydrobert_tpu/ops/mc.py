"""Expectation estimators over (discrete) random variables.

Capability parity with the reference's estimator stack: the
:class:`Estimator` ABC (``_estimators.py:27-106``), exact
:class:`EnumerateEstimator` (``_enumerate_estimator.py:20-77``), and the
Monte Carlo family (``_mc.py``): REINFORCE/direct, reparameterization,
straight-through, importance sampling (optionally self-normalized),
RELAX/REBAR, and independent Metropolis-Hastings, plus the REBAR control
variates (``_mc.py:751-840``).

TPU-first design differences:

- Sampling estimators take an explicit PRNG ``key`` when called.
- Gradients are delivered through the same surrogate-value trick as the
  reference (``v = fb + deriv - stop_gradient(deriv)``), which composes with
  ``jax.grad``/``jax.value_and_grad`` — construct the proposal from traced
  parameters inside the differentiated function.
- The RELAX variance-minimizing control-variate objective is the explicit
  (and cleanly higher-order-differentiable) :func:`relax_variance_loss`
  instead of the reference's gradient-hook surgery (``_attach_grad``,
  ``_mc.py:741-748``).
- The Metropolis-Hastings chain runs as a ``lax.scan``.
"""

import abc
import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import config
from .straight_through import ConditionalStraightThrough, StraightThrough

__all__ = [
    "DirectEstimator",
    "EnumerateEstimator",
    "Estimator",
    "GumbelOneHotCategoricalRebarControlVariate",
    "ImportanceSamplingEstimator",
    "IndependentMetropolisHastingsEstimator",
    "LogisticBernoulliRebarControlVariate",
    "MonteCarloEstimator",
    "RelaxEstimator",
    "ReparameterizationEstimator",
    "StraightThroughEstimator",
    "relax_variance_loss",
]

FunctionOnSample = Callable[[jax.Array], jax.Array]

_F32_MIN_HALF = jnp.finfo(jnp.float32).min / 2
_F32_MAX_HALF = jnp.finfo(jnp.float32).max / 2


class Estimator(abc.ABC):
    r"""Computes an estimate of :math:`v = E_{b \sim P}[f(b)]`.

    `func` maps samples of shape ``(num_samples,) + batch_shape +
    event_shape`` to values ``(num_samples,) + batch_shape``. With `is_log`,
    `func` computes :math:`\log f` and the estimate is of :math:`\log v`.
    Sampling estimators require a PRNG `key` when called.
    """

    def __init__(self, proposal, func: FunctionOnSample, is_log: bool = False):
        from .. import argcheck

        self.proposal = proposal
        self.func = func
        self.is_log = argcheck.is_bool(is_log, "is_log")

    @abc.abstractmethod
    def __call__(self, key: Optional[jax.Array] = None) -> jax.Array:
        ...


class EnumerateEstimator(Estimator):
    """Exact expectation by enumerating the proposal's support.

    Parity: reference ``EnumerateEstimator``
    (``_enumerate_estimator.py:20-77``). Needs no PRNG key.
    """

    def __init__(self, proposal, func, is_log: bool = False):
        if not getattr(proposal, "has_enumerate_support", False):
            raise ValueError(
                "proposal must be able to enumerate its support "
                "(proposal.has_enumerate_support == True)"
            )
        super().__init__(proposal, func, is_log)

    def __call__(self, key: Optional[jax.Array] = None) -> jax.Array:
        b = self.proposal.enumerate_support()
        log_pb = self.proposal.log_prob(b)
        fb = self.func(b)
        if self.is_log:
            return jax.nn.logsumexp(fb + log_pb, 0)
        return (fb * jnp.exp(log_pb)).sum(0)


class MonteCarloEstimator(Estimator, metaclass=abc.ABCMeta):
    """Base for estimators drawing `mc_samples` from the proposal.

    Parity: reference ``MonteCarloEstimator`` (``_mc.py:27-79``).
    """

    def __init__(self, proposal, func, mc_samples: int, is_log: bool = False):
        from .. import argcheck

        super().__init__(proposal, func, is_log)
        self.mc_samples = argcheck.is_posi(mc_samples, "mc_samples")


class DirectEstimator(MonteCarloEstimator):
    """Sample average with a REINFORCE surrogate gradient.

    Optional control variate `cv` with known mean `cv_mean`. Parity:
    reference ``DirectEstimator`` (``_mc.py:82-173``), including the
    log-space stabilization.
    """

    def __init__(
        self,
        proposal,
        func,
        mc_samples: int,
        cv: Optional[FunctionOnSample] = None,
        cv_mean: Optional[jax.Array] = None,
        is_log: bool = False,
    ):
        super().__init__(proposal, func, mc_samples, is_log)
        self.cv, self.cv_mean = cv, cv_mean

    def __call__(self, key: jax.Array) -> jax.Array:
        b = jax.lax.stop_gradient(
            self.proposal.sample(key, (self.mc_samples,))
        )
        fb = self.func(b)
        if self.is_log:
            fb_lmax = jnp.clip(
                jax.lax.stop_gradient(fb).max(0, keepdims=True),
                _F32_MIN_HALF,
                _F32_MAX_HALF,
            )
            fb = jnp.exp(jnp.clip(fb - fb_lmax, config.EPS_NINF, config.EPS_INF))
        if self.cv is not None:
            c = jnp.asarray(self.cv_mean)
            cvb = self.cv(b)
            if self.is_log:
                c = jnp.exp(
                    jnp.clip(c[None] - fb_lmax, config.EPS_NINF, config.EPS_INF)
                )
                cvb = jnp.exp(
                    jnp.clip(cvb - fb_lmax, config.EPS_NINF, config.EPS_INF)
                )
            fb = fb - cvb + c
        log_pb = self.proposal.log_prob(b)
        deriv = (jax.lax.stop_gradient(fb) * log_pb).mean(0)
        fb = fb.mean(0)
        if self.is_log:
            fb = jnp.clip(fb, math.exp(config.EPS_NINF), None)
            deriv = deriv / jax.lax.stop_gradient(fb)
            return (
                jnp.log(fb)
                + deriv
                - jax.lax.stop_gradient(deriv)
                + fb_lmax.squeeze(0)
            )
        return fb + deriv - jax.lax.stop_gradient(deriv)


class ReparameterizationEstimator(MonteCarloEstimator):
    """Sample average through differentiable (reparameterized) samples.

    Parity: reference ``ReparameterizationEstimator`` (``_mc.py:176-233``).
    """

    def __init__(self, proposal, func, mc_samples: int, is_log: bool = False):
        if not hasattr(proposal, "rsample"):
            raise ValueError("proposal must implement rsample")
        super().__init__(proposal, func, mc_samples, is_log)

    def __call__(self, key: jax.Array) -> jax.Array:
        z = self.proposal.rsample(key, (self.mc_samples,))
        fz = self.func(z)
        if self.is_log:
            return jax.nn.logsumexp(fz, 0) - math.log(fz.shape[0])
        return fz.mean(0)


class StraightThroughEstimator(MonteCarloEstimator):
    """Reparameterization through thresholded relaxed samples.

    Parity: reference ``StraightThroughEstimator`` (``_mc.py:236-301``).
    """

    def __init__(self, proposal, func, mc_samples: int, is_log: bool = False):
        from .. import argcheck

        proposal = argcheck.is_a(proposal, "proposal", cls=StraightThrough)
        super().__init__(proposal, func, mc_samples, is_log)

    def __call__(self, key: jax.Array) -> jax.Array:
        z = self.proposal.rsample(key, (self.mc_samples,))
        b = self.proposal.threshold(z, True)
        fb = self.func(b)
        if self.is_log:
            return jax.nn.logsumexp(fb, 0) - math.log(fb.shape[0])
        return fb.mean(0)


class ImportanceSamplingEstimator(MonteCarloEstimator):
    """Likelihood-ratio-weighted sample average, optionally self-normalized.

    `proposal` has density :math:`Q`; `density` is :math:`P` (may be
    unnormalized). Parity: reference ``ImportanceSamplingEstimator``
    (``_mc.py:304-404``): gradients w.r.t. the proposal's parameters are
    zero; gradients flow through `density`.
    """

    def __init__(
        self,
        proposal,
        func,
        mc_samples: int,
        density,
        self_normalize: bool = False,
        is_log: bool = False,
    ):
        from .. import argcheck

        self_normalize = argcheck.is_bool(self_normalize, "self_normalize")
        super().__init__(proposal, func, mc_samples, is_log)
        self.density = density
        self.self_normalize = self_normalize

    def __call__(self, key: jax.Array) -> jax.Array:
        b = jax.lax.stop_gradient(
            self.proposal.sample(key, (self.mc_samples,))
        )
        lpb = self.density.log_prob(b)
        lqb = jax.lax.stop_gradient(self.proposal.log_prob(b))
        fb = self.func(b)
        if self.self_normalize:
            llr = jax.nn.log_softmax(lpb - lqb, 0)
        else:
            llr = lpb - lqb - math.log(self.mc_samples)
        if self.is_log:
            return jax.nn.logsumexp(fb + llr, 0)
        return (fb * jnp.exp(llr)).sum(0)


class RelaxEstimator(MonteCarloEstimator):
    """RELAX estimator [grathwohl2017]; with a REBAR control variate it is
    the REBAR estimator [tucker2017].

    `proposal` must implement :class:`ConditionalStraightThrough`. The
    returned value carries REINFORCE-style surrogate gradients for all
    parameters. For the variance-minimizing control-variate objective, see
    :func:`relax_variance_loss`. Parity: reference ``RelaxEstimator``
    (``_mc.py:407-564``).
    """

    def __init__(
        self,
        proposal,
        func,
        mc_samples: int,
        cv: FunctionOnSample,
        is_log: bool = False,
    ):
        from .. import argcheck

        proposal = argcheck.is_a(
            proposal, "proposal", cls=ConditionalStraightThrough
        )
        super().__init__(proposal, func, mc_samples, is_log)
        self.cv = cv

    def __call__(self, key: jax.Array) -> jax.Array:
        k_z, k_cond = jax.random.split(key)
        z = self.proposal.rsample(k_z, (self.mc_samples,))
        b = self.proposal.threshold(z)
        zcond = self.proposal.csample(k_cond, b)
        log_pb = self.proposal.tlog_prob(b)
        fb = self.func(b)
        cvz = self.cv(z)
        cvzcond = self.cv(zcond)
        if self.is_log:
            fb_lmax = jnp.clip(
                jax.lax.stop_gradient(fb).max(0, keepdims=True),
                _F32_MIN_HALF,
                _F32_MAX_HALF,
            )
            fb = jnp.exp(jnp.clip(fb - fb_lmax, config.EPS_NINF, config.EPS_INF))
            cvz = jnp.exp(
                jnp.clip(cvz - fb_lmax, config.EPS_NINF, config.EPS_INF)
            )
            cvzcond = jnp.exp(
                jnp.clip(cvzcond - fb_lmax, config.EPS_NINF, config.EPS_INF)
            )
        fb_cvzcond = fb - cvzcond
        deriv = jax.lax.stop_gradient(fb_cvzcond) * log_pb
        v = (fb_cvzcond + cvz).mean(0)
        if self.is_log:
            v = jnp.clip(v, math.exp(config.EPS_NINF), None)
            deriv = deriv / jax.lax.stop_gradient(v)
            out = (
                jnp.log(v)
                + deriv
                - jax.lax.stop_gradient(deriv)
                + fb_lmax
            )
        else:
            out = v + deriv - jax.lax.stop_gradient(deriv)
        return out.mean(0)


def relax_variance_loss(
    est_builder: Callable[[Any, Any], RelaxEstimator],
    proposal_params: Any,
    cv_params: Any,
    key: jax.Array,
) -> jax.Array:
    r"""Variance-minimizing control-variate objective for RELAX/REBAR.

    ``est_builder(proposal_params, cv_params)`` must (re)construct the
    :class:`RelaxEstimator` from the two parameter pytrees. The returned
    scalar's gradient w.r.t. `cv_params` matches the reference's
    hook-attached gradients (``_mc.py:520-544``): the sum over proposal
    parameters of the 2-norms of their REINFORCE gradient estimates,
    :math:`\sum_k \|g_{\theta_k}\|_2`, differentiated through the
    second-order graph. Use as an auxiliary loss on `cv_params` only (e.g.
    via ``jax.grad(relax_variance_loss, argnums=2)``).
    """

    def v_sum(pp):
        return est_builder(pp, cv_params)(key).sum()

    gs = jax.grad(v_sum)(proposal_params)
    return sum(
        jnp.sqrt(jnp.sum(jnp.square(g))) for g in jax.tree_util.tree_leaves(gs)
    )


class IndependentMetropolisHastingsEstimator(MonteCarloEstimator):
    """Independent Metropolis-Hastings MCMC estimate (no gradient).

    The chain runs as a ``lax.scan`` over `mc_samples` steps; burn-in
    samples are dropped from the average. Parity: reference
    ``IndependentMetropolisHastingsEstimator`` (``_mc.py:567-738``).
    """

    def __init__(
        self,
        proposal,
        func,
        mc_samples: int,
        density,
        burn_in: int = 0,
        initial_sample: Optional[jax.Array] = None,
        initial_sample_tries: int = 1000,
        is_log: bool = False,
    ):
        from .. import argcheck

        burn_in = argcheck.is_nonnegi(burn_in, "burn_in")
        mc_samples = argcheck.is_posi(mc_samples, "mc_samples")
        argcheck.is_lt(burn_in, mc_samples, "burn_in")
        super().__init__(proposal, func, mc_samples, is_log)
        if initial_sample is not None:
            initial_sample = jnp.asarray(initial_sample)
            sample_shape = tuple(proposal.batch_shape) + tuple(
                proposal.event_shape
            )
            if initial_sample.shape == sample_shape:
                initial_sample = initial_sample[None]
            elif initial_sample.shape != (1,) + sample_shape:
                raise ValueError(
                    f"Expected initial_sample to have shape "
                    f"{(1,) + sample_shape} or {sample_shape}"
                )
            if not bool(
                jnp.isfinite(density.log_prob(initial_sample)).all()
            ):
                raise ValueError(
                    "all values in initial_sample must lie in the support of "
                    "density"
                )
        elif initial_sample_tries < 1:
            raise ValueError(
                "initial_sample_tries must be positive when initial_sample "
                "is None"
            )
        self.density, self.initial_sample = density, initial_sample
        self.initial_sample_tries, self.burn_in = initial_sample_tries, burn_in

    def find_initial_sample(
        self, key: jax.Array, tries: Optional[int] = None
    ) -> jax.Array:
        """Find an in-support starting sample by repeated proposal draws."""
        if tries is None:
            tries = self.initial_sample_tries
        if tries < 1:
            raise ValueError("tries must be positive")
        keys = jax.random.split(key, tries)
        sample = jax.lax.stop_gradient(self.proposal.sample(keys[0], (1,)))
        keep = jnp.isfinite(self.density.log_prob(sample))
        if bool(keep.all()):
            return sample
        for k in keys[1:]:
            cur = jax.lax.stop_gradient(self.proposal.sample(k, (1,)))
            keep_e = keep.reshape(keep.shape + (1,) * (cur.ndim - keep.ndim))
            sample = jnp.where(keep_e, sample, cur)
            keep = jnp.isfinite(self.density.log_prob(sample))
            if bool(keep.all()):
                return sample
        raise RuntimeError(
            f"Unable to find initial sample in {tries} draws. Either specify "
            "initial_sample on instantiation or increase initial_sample_tries."
        )

    def __call__(self, key: jax.Array) -> jax.Array:
        k_init, k_chain, k_u = jax.random.split(key, 3)
        if self.initial_sample is None:
            last = self.find_initial_sample(k_init)
        else:
            last = self.initial_sample
        # keep the proposal's own dtype: casting to f32 would corrupt
        # integer-valued samples handed to func (and downcast f64 densities)
        last = jax.lax.stop_gradient(jnp.asarray(last))
        last_ratio = jax.lax.stop_gradient(
            self.density.log_prob(last) - self.proposal.log_prob(last)
        )
        batch_shape = last_ratio.shape[1:]
        log_us = jnp.log(
            jax.random.uniform(k_u, (self.mc_samples,) + tuple(batch_shape))
        )
        keys = jax.random.split(k_chain, self.mc_samples)

        def step(carry, inp):
            last, last_ratio = carry
            k, log_u = inp
            cur = jax.lax.stop_gradient(self.proposal.sample(k, (1,)))
            cur_ratio = jax.lax.stop_gradient(
                self.density.log_prob(cur) - self.proposal.log_prob(cur)
            )
            accept = (cur_ratio - last_ratio)[0] > log_u
            cur_ratio = jnp.where(accept[None], cur_ratio, last_ratio)
            accept_e = accept.reshape(
                (1,) + accept.shape + (1,) * (cur.ndim - accept.ndim - 1)
            )
            cur = jnp.where(accept_e, cur, last)
            fb = self.func(cur)[0]
            return (cur, cur_ratio), fb

        _, fbs = jax.lax.scan(step, (last, last_ratio), (keys, log_us))
        kept = fbs[self.burn_in :]
        num_kept = self.mc_samples - self.burn_in
        if self.is_log:
            return jax.nn.logsumexp(kept, 0) - math.log(num_kept)
        return kept.mean(0)


class _RebarControlVariate(nn.Module):
    r"""``c(z) = eta * f(sigma(z / exp(log_temp)))`` with learnable
    ``log_temp`` and ``eta`` (reference ``_mc.py:751-840``)."""

    func: FunctionOnSample = None
    start_temp: float = 0.1
    start_eta: float = 1.0

    def _squash(self, z):
        raise NotImplementedError

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        if self.start_temp <= 0:
            raise ValueError("start_temp must be positive")
        log_temp = self.param(
            "log_temp",
            lambda _: jnp.log(jnp.full((1,), self.start_temp, jnp.float32)),
        )
        eta = self.param(
            "eta", lambda _: jnp.full((1,), self.start_eta, jnp.float32)
        )
        return eta * self.func(self._squash(z / jnp.exp(log_temp)))


class LogisticBernoulliRebarControlVariate(_RebarControlVariate):
    """REBAR control variate for :class:`LogisticBernoulli` (sigmoid)."""

    def _squash(self, z):
        return jax.nn.sigmoid(z)


class GumbelOneHotCategoricalRebarControlVariate(_RebarControlVariate):
    """REBAR control variate for :class:`GumbelOneHotCategorical` (softmax)."""

    def _squash(self, z):
        return jax.nn.softmax(z, -1)
