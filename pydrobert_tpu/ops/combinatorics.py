"""Combinatoric ops: support enumeration, binomial coefficients, SRSWOR.

Capability parity with the reference's ``_combinatorics.py`` functional ops
(``simple_random_sampling_without_replacement`` ``_combinatorics.py:26-85``,
``binomial_coefficient`` ``_combinatorics.py:122-189``, enumeration fns
``_combinatorics.py:207-412``).

Enumeration and exact integer binomials are host-side (numpy): their output
shapes depend on the data and they sit on eager/setup paths. The SRSWOR
sampler is a jitted ``lax.scan`` drawing Fan et al. (1962) sequential
Bernoullis with explicit PRNG keys.
"""

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "binomial_coefficient",
    "enumerate_binary_sequences",
    "enumerate_binary_sequences_with_cardinality",
    "enumerate_vocab_sequences",
    "simple_random_sampling_without_replacement",
]


@partial(jax.jit, static_argnames=("out_size",))
def _srswor(key, total_count, given_count, out_size):
    shape = jnp.broadcast_shapes(total_count.shape, given_count.shape)
    total_count = jnp.broadcast_to(total_count, shape).astype(jnp.float32)
    given_count = jnp.broadcast_to(given_count, shape).astype(jnp.float32)

    def step(carry, key_t):
        rem_ell, rem_t = carry
        p = rem_ell / rem_t
        b_t = (jax.random.uniform(key_t, shape) < p).astype(jnp.float32)
        return (rem_ell - b_t, jnp.clip(rem_t - 1, 1, None)), b_t

    keys = jax.random.split(key, out_size) if out_size else jnp.zeros((0, 2), jnp.uint32)
    (_, _), b = jax.lax.scan(
        step, (given_count, jnp.clip(total_count, 1, None)), keys
    )
    return jnp.moveaxis(b, 0, -1)


def simple_random_sampling_without_replacement(
    key: jax.Array,
    total_count: jax.Array,
    given_count: jax.Array,
    out_size: Optional[int] = None,
) -> jax.Array:
    """Uniform binary vectors of fixed cardinality (Fan 1962 draws).

    Returns floats of shape ``broadcast(total_count, given_count) +
    (out_size,)`` with ``b[..., :total][...].sum() == given``. Parity:
    reference ``simple_random_sampling_without_replacement``
    (``_combinatorics.py:26-85``), with an explicit PRNG `key`.
    """
    total_count = jnp.asarray(total_count)
    given_count = jnp.asarray(given_count)
    if out_size is None:
        if isinstance(total_count, jax.core.Tracer):
            raise ValueError("out_size must be static when tracing")
        out_size = int(np.max(np.asarray(total_count)))
    if not isinstance(given_count, jax.core.Tracer) and not isinstance(
        total_count, jax.core.Tracer
    ):
        if np.any(np.asarray(given_count) > np.asarray(total_count)):
            raise RuntimeError("given_count cannot exceed total_count")
        if out_size < int(np.max(np.asarray(total_count), initial=0)):
            raise RuntimeError(
                f"out_size ({out_size}) must not be less than max of "
                f"total_count ({int(np.max(np.asarray(total_count)))})"
            )
    return _srswor(key, total_count, given_count, int(out_size))


def binomial_coefficient(
    length: Union[jax.Array, np.ndarray], count: Union[jax.Array, np.ndarray]
) -> jnp.ndarray:
    """Exact integer (length choose count), elementwise with broadcasting.

    Host-side exact int64 computation (Pascal recursion above length 20,
    factorial division below). Parity: reference ``binomial_coefficient``
    (``_combinatorics.py:122-189``).
    """
    length = np.asarray(length)
    count = np.asarray(count)
    if ((count < 0) | (length < 0)).any():
        raise RuntimeError("length and count must be non-negative")
    length, count = np.broadcast_arrays(length, count)
    length_ = int(length.max(initial=0))
    if length_ > 20:
        count_ = int(count.max(initial=0))
        binom = np.zeros((count_ + 1, length_ + 1), np.int64)
        binom[0] = 1
        for c in range(1, count_ + 1):
            binom[c, 1:] = binom[c - 1, :-1].cumsum(0)
        out = binom[count, length]
    else:
        fact = np.ones(length_ + 2, np.int64)
        fact[1:] = np.arange(1, length_ + 2)
        fact = np.cumprod(fact)
        lmc = np.clip(length - count, -1, None)
        cnt = np.minimum(count, length_)
        out = fact[length] // (fact[cnt] * fact[np.clip(lmc, 0, None)])
        out = np.where(lmc == -1, 0, out)
    return _exact_int_array(out)


def _exact_int_array(out):
    """jnp.asarray, unless 64-bit ints would be silently truncated to int32
    (x64 disabled): exact counts then stay host-side numpy int64 (the
    reference guarantees exactness up to length 66)."""
    out = np.asarray(out)
    if (
        out.size
        and np.abs(out).max() > np.iinfo(np.int32).max
        and not jax.config.jax_enable_x64
    ):
        return out
    return jnp.asarray(out)


def enumerate_vocab_sequences(
    length: int, vocab_size: int, dtype=jnp.int32
) -> jax.Array:
    """All ``vocab_size ** length`` sequences, counting fastest in early steps.

    Parity: reference ``enumerate_vocab_sequences``
    (``_combinatorics.py:207-251``) including ordering (sequence ``s`` has
    token ``(s // vocab_size**t) % vocab_size`` at step ``t``).
    """
    if length < 0:
        raise RuntimeError(f"length must be non-negative, got {length}")
    if vocab_size <= 0:
        raise RuntimeError(f"vocab_size must be positive, got {vocab_size}")
    s = np.arange(int(vocab_size) ** int(length), dtype=np.int64)
    support = np.stack(
        [(s // vocab_size**t) % vocab_size for t in range(length)], 1
    ) if length else np.zeros((1, 0), np.int64)
    return jnp.asarray(support, dtype=dtype)


def enumerate_binary_sequences(length: int, dtype=jnp.int32) -> jax.Array:
    """All ``2 ** length`` binary sequences (see enumerate_vocab_sequences)."""
    return enumerate_vocab_sequences(length, 2, dtype)


def enumerate_binary_sequences_with_cardinality(
    length: Union[int, jax.Array],
    count: Union[int, jax.Array],
    dtype=jnp.int32,
):
    """Binary sequences of fixed sum; batched variant right-pads to binom max.

    Parity: reference ``enumerate_binary_sequences_with_cardinality``
    (``_combinatorics.py:324-412``). With int args, returns ``(binom(length,
    count), length)``; with array args, returns ``(support, binom)`` where
    ``support`` is ``B* + (binom_max, length_max)`` (padding rows after
    ``binom[b]`` are arbitrary) and ``binom`` has the broadcast shape.
    """
    if isinstance(length, (int, np.integer)) and isinstance(count, (int, np.integer)):
        support = np.asarray(enumerate_binary_sequences(int(length), dtype))
        return jnp.asarray(support[support.sum(1) == int(count)], dtype=dtype)
    length = np.asarray(length)
    count = np.asarray(count)
    length, count = np.broadcast_arrays(length, count)
    binom = np.asarray(binomial_coefficient(length, count))
    length_ = int(length.max(initial=0))
    binom_ = int(binom.max(initial=0))
    base = np.asarray(enumerate_binary_sequences(length_, dtype))  # (2**L, L)
    sums = base.sum(1)
    out = np.zeros(binom.shape + (binom_, length_), dtype=base.dtype)
    it = np.ndindex(*binom.shape) if binom.shape else [()]
    for b in it:
        keep = base[
            (np.arange(len(base)) < 2 ** length[b]) & (sums == count[b])
        ]
        out[b][: len(keep)] = keep
    return jnp.asarray(out), _exact_int_array(binom)


class SimpleRandomSamplingWithoutReplacement:
    r"""Uniform distribution over fixed-cardinality binary vectors.

    Supports highly-parallel sampling (Fan 1962 sequential draws via
    ``lax.scan``), exact log-probabilities, and support enumeration. Parity:
    reference ``SimpleRandomSamplingWithoutReplacement``
    (``_combinatorics.py:415-597``), with explicit PRNG keys.
    """

    def __init__(self, given_count, total_count, out_size=None):
        total_count = jnp.asarray(total_count)
        given_count = jnp.asarray(given_count)
        total_count, given_count = jnp.broadcast_arrays(
            total_count, given_count
        )
        if out_size is None:
            out_size = int(np.max(np.asarray(total_count)))
        self.total_count, self.given_count = total_count, given_count
        self.out_size = int(out_size)

    @property
    def batch_shape(self):
        return self.given_count.shape

    @property
    def event_shape(self):
        return (self.out_size,)

    @property
    def has_enumerate_support(self) -> bool:
        tc = np.asarray(self.total_count).ravel()
        gc = np.asarray(self.given_count).ravel()
        return bool((tc == tc[0]).all() and (gc == gc[0]).all())

    def enumerate_support(self, expand: bool = True) -> jax.Array:
        if not self.has_enumerate_support:
            raise NotImplementedError(
                "total_count must all be equal and given_count must all be "
                "equal to enumerate support"
            )
        total = int(np.asarray(self.total_count).ravel()[0])
        given = int(np.asarray(self.given_count).ravel()[0])
        support = enumerate_binary_sequences_with_cardinality(
            total, given
        ).astype(jnp.float32)
        if self.out_size != total:
            support = jnp.pad(
                support, ((0, 0), (0, self.out_size - total))
            )
        support = support.reshape(
            (-1,) + (1,) * len(self.batch_shape) + (self.out_size,)
        )
        if expand:
            support = jnp.broadcast_to(
                support, (support.shape[0],) + self.batch_shape + (self.out_size,)
            )
        return support

    @property
    def log_partition(self) -> jax.Array:
        """log C(total_count, given_count), batched."""
        log_factorial = jnp.cumsum(
            jnp.log(jnp.arange(1, self.out_size + 1, dtype=jnp.float32)), 0
        )
        tc = self.total_count.astype(jnp.int32)
        gc = self.given_count.astype(jnp.int32)
        t_idx = jnp.clip(tc - 1, 0, None)
        g_idx = jnp.clip(gc - 1, 0, None)
        tmg_idx = jnp.clip(tc - gc - 1, 0, None)
        return (
            log_factorial[t_idx]
            - log_factorial[g_idx]
            - log_factorial[tmg_idx]
        )

    @property
    def mean(self) -> jax.Array:
        len_mask = self.total_count[..., None] <= jnp.arange(self.out_size)
        m = (
            self.given_count / jnp.clip(self.total_count, 1, None)
        )[..., None]
        return jnp.where(len_mask, 0.0, jnp.broadcast_to(
            m, self.batch_shape + (self.out_size,)
        ))

    @property
    def variance(self) -> jax.Array:
        return self.mean * (1 - self.mean)

    def sample(self, key: jax.Array, sample_shape=()) -> jax.Array:
        shape = tuple(sample_shape) + self.batch_shape
        total_count = jnp.broadcast_to(self.total_count, shape)
        given_count = jnp.broadcast_to(self.given_count, shape)
        return simple_random_sampling_without_replacement(
            key, total_count, given_count, self.out_size
        )

    def log_prob(self, value: jax.Array) -> jax.Array:
        return jnp.broadcast_to(-self.log_partition, value.shape[:-1])
