"""Relaxed distributions and straight-through protocols.

Capability parity with the reference's ``_straight_through.py``: the
duck-typed :class:`Density` / :class:`StraightThrough` /
:class:`ConditionalStraightThrough` interfaces (``_straight_through.py:46-248``)
and the :class:`LogisticBernoulli` (``:251-412``) and
:class:`GumbelOneHotCategorical` (``:415-598``) relaxations, including the
conditional ("REBAR") sampling math.

TPU-first design: distributions are lightweight pytree-friendly objects with
**explicit PRNG keys** on every sampling method (``rsample(key, shape)``,
``csample(key, b)``), no global RNG state. Parameter arrays may be traced, so
distributions can be constructed inside jitted/`grad`-ed functions; the
straight-through trick uses ``jax.lax.stop_gradient``.
"""

import abc
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EULER_GAMMA = float(np.euler_gamma)

__all__ = [
    "ConditionalStraightThrough",
    "Density",
    "GumbelOneHotCategorical",
    "LogisticBernoulli",
    "StraightThrough",
]

_EPS = 1.1920928955078125e-07  # float32 machine epsilon, as torch clamp_probs


def _check_methods(C, *methods):
    mro = C.__mro__
    for method in methods:
        for B in mro:
            if method in B.__dict__:
                if B.__dict__[method] is None:
                    return NotImplemented
                break
        else:
            return NotImplemented
    return True


def _clamp_probs(p: jax.Array) -> jax.Array:
    return jnp.clip(p, _EPS, 1 - _EPS)


class Density(abc.ABC):
    """Interface for an object assigning (maybe unnormalized) log-densities.

    Duck-typed: any class with a ``log_prob`` method registers as a virtual
    subclass (reference ``_straight_through.py:226-248``).
    """

    @abc.abstractmethod
    def log_prob(self, value: jax.Array) -> jax.Array:
        ...

    @classmethod
    def __subclasshook__(cls, C):
        if cls is Density:
            return _check_methods(C, "log_prob")
        return NotImplemented


class StraightThrough(abc.ABC):
    """Interface for distributions with relaxed samples + a threshold.

    Requires ``rsample(key, sample_shape)``, ``threshold(z,
    straight_through=False)``, and ``tlog_prob(b)`` (reference
    ``_straight_through.py:46-153``).
    """

    @abc.abstractmethod
    def rsample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()):
        ...

    @abc.abstractmethod
    def threshold(self, z: jax.Array, straight_through: bool = False):
        ...

    @abc.abstractmethod
    def tlog_prob(self, b: jax.Array) -> jax.Array:
        ...

    @classmethod
    def __subclasshook__(cls, C):
        if cls is StraightThrough:
            return _check_methods(C, "rsample", "threshold", "tlog_prob")
        return NotImplemented


class ConditionalStraightThrough(StraightThrough):
    """StraightThrough plus conditional relaxed sampling ``z | b``.

    Adds ``csample(key, b)`` and ``clog_prob(zcond, b)`` (reference
    ``_straight_through.py:156-223``), as needed by RELAX/REBAR.
    """

    @abc.abstractmethod
    def csample(self, key: jax.Array, b: jax.Array) -> jax.Array:
        ...

    @abc.abstractmethod
    def clog_prob(self, zcond: jax.Array, b: jax.Array) -> jax.Array:
        ...

    @classmethod
    def __subclasshook__(cls, C):
        if cls is ConditionalStraightThrough:
            return _check_methods(
                C, "rsample", "threshold", "tlog_prob", "csample", "clog_prob"
            )
        return NotImplemented


class LogisticBernoulli:
    r"""Logistic relaxation of the Bernoulli: ``z = logits + logit(u)``.

    Thresholding at 0 recovers Bernoulli samples: ``b = I[z >= 0]``.
    Implements :class:`ConditionalStraightThrough`. Parity: reference
    ``LogisticBernoulli`` (``_straight_through.py:251-412``), with explicit
    PRNG keys.
    """

    def __init__(
        self,
        probs: Optional[jax.Array] = None,
        logits: Optional[jax.Array] = None,
    ):
        if (probs is None) == (logits is None):
            raise ValueError("Either probs or logits must be specified, not both")
        if probs is not None:
            self._probs = jnp.asarray(probs)
            self._logits = None
        else:
            self._logits = jnp.asarray(logits)
            self._probs = None

    @property
    def logits(self) -> jax.Array:
        if self._logits is None:
            p = _clamp_probs(self._probs)
            return jnp.log(p) - jnp.log1p(-p)
        return self._logits

    @property
    def probs(self) -> jax.Array:
        if self._probs is None:
            return jax.nn.sigmoid(self._logits)
        return self._probs

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return (self._probs if self._logits is None else self._logits).shape

    event_shape: Tuple[int, ...] = ()

    @property
    def mean(self) -> jax.Array:
        return self.logits

    @property
    def stddev(self) -> jax.Array:
        return jnp.full(self.batch_shape, math.pi / math.sqrt(3))

    @property
    def variance(self) -> jax.Array:
        return self.stddev**2

    def entropy(self) -> jax.Array:
        return jnp.full(self.batch_shape, 2.0)

    def rsample(
        self, key: jax.Array, sample_shape: Tuple[int, ...] = ()
    ) -> jax.Array:
        logits = self.logits
        shape = tuple(sample_shape) + self.batch_shape
        u = _clamp_probs(jax.random.uniform(key, shape, logits.dtype))
        return logits + jnp.log(u) - jnp.log1p(-u)

    sample = rsample

    def log_prob(self, z: jax.Array) -> jax.Array:
        # logistic density: g(z) = exp(G^{-1}) (1 + exp(G^{-1}))^{-2}
        Ginv = self.logits - z
        return Ginv - 2 * jax.nn.softplus(Ginv)

    def threshold(
        self, z: jax.Array, straight_through: bool = False
    ) -> jax.Array:
        b = (z >= 0.0).astype(z.dtype)
        b = jax.lax.stop_gradient(b)
        if straight_through:
            b = b + z - jax.lax.stop_gradient(z)
        return b

    def tlog_prob(self, b: jax.Array) -> jax.Array:
        logits, b = jnp.broadcast_arrays(self.logits, b)
        return b * logits - jax.nn.softplus(logits)

    def csample(self, key: jax.Array, b: jax.Array) -> jax.Array:
        v = _clamp_probs(jax.random.uniform(key, b.shape, jnp.result_type(b)))
        probs = _clamp_probs(self.probs)
        zcond = v / ((1 - v) * ((1 - b) * probs + b * (1 - probs))) + 1
        zcond = (2 * b - 1) * jnp.log(zcond)
        return zcond + b * _EPS

    def clog_prob(self, zcond: jax.Array, b: jax.Array) -> jax.Array:
        bcond = self.threshold(zcond)
        zero_prob = bcond != b
        logits = self.logits
        lp = (
            -zcond
            + (1 - b) * logits
            + jax.nn.softplus(logits)
            - 2 * jax.nn.softplus(logits - zcond)
        )
        return jnp.where(zero_prob, -jnp.inf, lp)


class GumbelOneHotCategorical:
    r"""Gumbel relaxation of the one-hot categorical.

    ``z = logits + Gumbel`` elementwise over the final axis; thresholding
    takes the one-hot argmax. Implements :class:`ConditionalStraightThrough`.
    Parity: reference ``GumbelOneHotCategorical``
    (``_straight_through.py:415-598``), with explicit PRNG keys.
    """

    def __init__(
        self,
        logits: Optional[jax.Array] = None,
        probs: Optional[jax.Array] = None,
    ):
        if (probs is None) == (logits is None):
            raise ValueError("Either probs or logits must be specified, not both")
        if probs is not None:
            probs = jnp.asarray(probs)
            if probs.ndim < 1:
                raise ValueError("probs must be at least 1 dimensional")
            self._probs = probs / probs.sum(-1, keepdims=True)
            self._logits = None
        else:
            logits = jnp.asarray(logits)
            if logits.ndim < 1:
                raise ValueError("logits must be at least 1 dimensional")
            self._logits = jax.nn.log_softmax(logits, -1)
            self._probs = None

    @property
    def logits(self) -> jax.Array:
        if self._logits is None:
            return jnp.log(_clamp_probs(self._probs))
        return self._logits

    @property
    def probs(self) -> jax.Array:
        if self._probs is None:
            return jnp.exp(self._logits)
        return self._probs

    @property
    def _param(self):
        return self._probs if self._logits is None else self._logits

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self._param.shape[:-1]

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return self._param.shape[-1:]

    @property
    def mean(self) -> jax.Array:
        return self.logits + _EULER_GAMMA

    @property
    def stddev(self) -> jax.Array:
        return jnp.full(self._param.shape, math.pi / math.sqrt(6))

    @property
    def variance(self) -> jax.Array:
        return self.stddev**2

    def entropy(self) -> jax.Array:
        return jnp.full(
            self.batch_shape, self.event_shape[0] * (1 + _EULER_GAMMA)
        )

    def rsample(
        self, key: jax.Array, sample_shape: Tuple[int, ...] = ()
    ) -> jax.Array:
        logits = self.logits
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        u = _clamp_probs(jax.random.uniform(key, shape, logits.dtype))
        return logits - jnp.log(-jnp.log(u))

    sample = rsample

    def log_prob(self, z: jax.Array) -> jax.Array:
        g = self.logits - z
        return (g - jnp.exp(g)).sum(-1)

    def threshold(
        self, z: jax.Array, straight_through: bool = False
    ) -> jax.Array:
        b = jax.nn.one_hot(
            jnp.argmax(z, -1), z.shape[-1], dtype=jnp.result_type(z)
        )
        b = jax.lax.stop_gradient(b)
        if straight_through:
            b = b + z - jax.lax.stop_gradient(z)
        return b

    def tlog_prob(self, b: jax.Array) -> jax.Array:
        return jnp.where(b.astype(bool), self.logits, 0.0).sum(-1)

    def csample(self, key: jax.Array, b: jax.Array) -> jax.Array:
        probs = _clamp_probs(self.probs)
        log_v = jnp.log(
            _clamp_probs(jax.random.uniform(key, b.shape, jnp.result_type(b)))
        )
        zcond_match = -jnp.log(-log_v) * b
        zcond_match_k = zcond_match.sum(-1, keepdims=True)
        zcond_nomatch = -jnp.log(
            -log_v / probs - (log_v * b).sum(-1, keepdims=True)
        )
        # the reparameterization is unstable: keep conditionals strictly
        # below the matched maximum (reference _straight_through.py:544-548)
        zcond_nomatch = jnp.minimum(zcond_match_k - _EPS, zcond_nomatch) * (
            1 - b
        )
        return zcond_match + zcond_nomatch

    def clog_prob(self, zcond: jax.Array, b: jax.Array) -> jax.Array:
        bcond = self.threshold(zcond)
        zero_prob = (bcond != b).any(-1)
        neg_b = 1 - b
        logits = self.logits * neg_b
        g = logits - zcond
        g = g - jnp.exp(g)
        z_k = (zcond * b).sum(-1, keepdims=True)
        G = logits - z_k
        G = -jnp.exp(G) * neg_b
        log_prob = (g - G).sum(-1)
        return jnp.where(zero_prob, -jnp.inf, log_prob)
