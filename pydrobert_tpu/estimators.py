"""Public estimators interface.

Mirrors the reference's ``pydrobert.torch.estimators``
(``estimators.py:40-51``): exact enumeration plus the Monte Carlo family.
Sampling estimators take an explicit PRNG key when called; see
:mod:`pydrobert_tpu.ops.mc` for the JAX-native RELAX variance-minimizing
objective (:func:`relax_variance_loss`).
"""

from .ops.mc import (  # noqa: F401
    DirectEstimator,
    EnumerateEstimator,
    Estimator,
    ImportanceSamplingEstimator,
    IndependentMetropolisHastingsEstimator,
    MonteCarloEstimator,
    RelaxEstimator,
    ReparameterizationEstimator,
    StraightThroughEstimator,
    relax_variance_loss,
)

__all__ = [
    "DirectEstimator",
    "EnumerateEstimator",
    "Estimator",
    "ImportanceSamplingEstimator",
    "IndependentMetropolisHastingsEstimator",
    "MonteCarloEstimator",
    "RelaxEstimator",
    "ReparameterizationEstimator",
    "StraightThroughEstimator",
    "relax_variance_loss",
]


# ---------------------------------------------------------------------------
# Deprecated v0.3-era functional interface (reference estimators.py:54-471).
# Each function warns and forwards to the modern machinery; sampling
# functions take an explicit PRNG key and gradient-returning functions
# compute their gradients internally with jax.grad (the reference used
# autograd.grad on live graphs).
# ---------------------------------------------------------------------------

import warnings as _warnings

import jax as _jax
import jax.numpy as _jnp

BERNOULLI_SYNONYMS = {"bern", "Bern", "bernoulli", "Bernoulli"}
CATEGORICAL_SYNONYMS = {"cat", "Cat", "categorical", "Categorical"}
ONEHOT_SYNONYMS = {"onehot", "OneHotCategorical"}

_EPS = 1.1920928955078125e-07


def _deprecate():
    _warnings.warn(
        "the functional interface for estimators is deprecated. See "
        "pydrobert_tpu.estimators.Estimator for the new interface.",
        DeprecationWarning,
        stacklevel=3,
    )


def _clamp_probs(p):
    return _jnp.clip(p, _EPS, 1 - _EPS)


def _relaxed_from_uniform(logits, u, dist):
    if dist in BERNOULLI_SYNONYMS:
        return logits + _jnp.log(u) - _jnp.log1p(-u)
    elif dist in CATEGORICAL_SYNONYMS | ONEHOT_SYNONYMS:
        return _jax.nn.log_softmax(logits, -1) - _jnp.log(-_jnp.log(u))
    raise RuntimeError(f"Unknown distribution {dist}")


def to_z(key, logits, dist):
    """Sample a continuous relaxation of `dist` parameterized by `logits`
    (deprecated; reference ``estimators.py:90-124``)."""
    _deprecate()
    u = _clamp_probs(_jax.random.uniform(key, _jnp.shape(logits)))
    return _relaxed_from_uniform(_jnp.asarray(logits), u, dist)


def to_b(z, dist):
    """Threshold a relaxed sample to a discrete one (deprecated;
    reference ``estimators.py:126-148``)."""
    _deprecate()
    z = _jnp.asarray(z)
    if dist in BERNOULLI_SYNONYMS:
        return (z > 0.0).astype(z.dtype)
    elif dist in CATEGORICAL_SYNONYMS:
        return _jnp.argmax(z, -1).astype(z.dtype)
    elif dist in ONEHOT_SYNONYMS:
        return _jax.nn.one_hot(_jnp.argmax(z, -1), z.shape[-1], dtype=z.dtype)
    raise RuntimeError(f"Unknown distribution {dist}")


def to_fb(f, b, **kwargs):
    """Simply call ``f(b)`` (deprecated)."""
    _deprecate()
    return f(b, **kwargs)


def _log_pb(b, logits, dist):
    if dist in BERNOULLI_SYNONYMS:
        return b * logits - _jax.nn.softplus(logits)
    elif dist in CATEGORICAL_SYNONYMS:
        lsm = _jax.nn.log_softmax(logits, -1)
        return _jnp.take_along_axis(
            lsm, b.astype(_jnp.int32)[..., None], -1
        )[..., 0]
    elif dist in ONEHOT_SYNONYMS:
        return (_jax.nn.log_softmax(logits, -1) * b).sum(-1)
    raise RuntimeError(f"Unknown distribution {dist}")


def reinforce(fb, b, logits, dist):
    """Single-sample REINFORCE gradient estimate
    ``g = f(b) d log Pr(b; logits) / d logits``
    (deprecated; reference ``estimators.py:156-218``)."""
    _deprecate()
    fb, b, logits = _jnp.asarray(fb), _jnp.asarray(b), _jnp.asarray(logits)
    dlog_pb = _jax.grad(lambda l: _log_pb(b, l, dist).sum())(logits)
    if dist not in BERNOULLI_SYNONYMS:
        fb = fb[..., None]
    return fb * dlog_pb


def _to_z_tilde(key, logits, b, dist):
    v = _clamp_probs(_jax.random.uniform(key, _jnp.shape(logits)))
    if dist in BERNOULLI_SYNONYMS:
        om_theta = _jax.nn.sigmoid(-logits)
        v_prime = b * (v * (1 - om_theta) + om_theta) + (1.0 - b) * v * om_theta
        return logits + _jnp.log(v_prime) - _jnp.log1p(-v_prime)
    log_v = _jnp.log(v)
    theta = _jax.nn.softmax(logits, -1)
    if dist in CATEGORICAL_SYNONYMS:
        idx = b.astype(_jnp.int32)[..., None]
        mask = (
            _jnp.arange(logits.shape[-1]) == idx
        )
    elif dist in ONEHOT_SYNONYMS:
        idx = _jnp.argmax(b, -1, keepdims=True)
        mask = b.astype(bool)
    else:
        raise RuntimeError(f"Unknown distribution {dist}")
    log_v_b = _jnp.take_along_axis(log_v, idx, -1)
    return _jnp.where(
        mask, -_jnp.log(-log_v), -_jnp.log(-log_v / theta - log_v_b)
    )


def relax(fb, b, logits, z, c, dist, key, components=False, **kwargs):
    """RELAX gradient estimate w.r.t. `logits` (deprecated; reference
    ``estimators.py:220-326``). `key` draws the conditional relaxation.

    Returns ``g`` (same shape as `logits`) or, with `components`, the tuple
    ``(diff, dlog_pb, dc_z, dc_z_tilde)`` with
    ``g = diff * dlog_pb + dc_z - dc_z_tilde``. The derivative terms remain
    differentiable w.r.t. any parameters closed over by `c` (the control
    variate), enabling the variance-minimizing objective.
    """
    _deprecate()
    fb, b = _jnp.asarray(fb), _jnp.asarray(b)
    logits = _jax.lax.stop_gradient(_jnp.asarray(logits))
    z = _jax.lax.stop_gradient(_jnp.asarray(z))

    def z_of_logits(l):
        # reattach z to fresh logits (reference estimators.py:429-440)
        if dist in BERNOULLI_SYNONYMS:
            return z + l - _jax.lax.stop_gradient(l)
        lsm = _jax.nn.log_softmax(l, -1)
        return z + lsm - _jax.lax.stop_gradient(lsm)

    def z_tilde_of_logits(l):
        return _to_z_tilde(key, l, b, dist)

    c_z_tilde = c(z_tilde_of_logits(logits), **kwargs)
    diff = fb - c_z_tilde
    if dist not in BERNOULLI_SYNONYMS:
        diff = diff[..., None]
    dlog_pb = _jax.grad(lambda l: _log_pb(b, l, dist).sum())(logits)
    dc_z = _jax.grad(lambda l: c(z_of_logits(l), **kwargs).sum())(logits)
    dc_z_tilde = _jax.grad(
        lambda l: c(z_tilde_of_logits(l), **kwargs).sum()
    )(logits)
    if components:
        return diff, dlog_pb, dc_z, dc_z_tilde
    return diff * dlog_pb + dc_z - dc_z_tilde
