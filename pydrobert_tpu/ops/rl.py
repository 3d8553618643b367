"""Reinforcement-learning return ops.

Parity with the reference's ``_rl.py`` (``time_distributed_return``
``_rl.py:24-41``): the discounted return is a single triangular-matrix
matmul, which XLA places on the MXU.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["time_distributed_return"]


@partial(jax.jit, static_argnames=("gamma", "batch_first"))
def _tdr(r, gamma, batch_first):
    T = r.shape[1] if batch_first else r.shape[0]
    exp = jnp.arange(T, dtype=r.dtype)
    # gamma^(t' - t) computed on the index DIFFERENCE: the reference's
    # gamma^i / gamma^j form underflows to 0/0 = NaN inside the kept
    # triangle once gamma^t underflows (T ~ 2000 at f32, ~150 at f16)
    diff = exp[None, :] - exp[:, None]  # (t, t')
    pow_ = jnp.power(jnp.asarray(gamma, r.dtype), jnp.abs(diff))
    # full-precision MXU accumulation: returns are a numerical-fidelity
    # quantity and the discount matmul is tiny
    hp = jax.lax.Precision.HIGHEST
    if batch_first:
        mat = jnp.tril(pow_.T)
        return jnp.matmul(
            r, mat, preferred_element_type=r.dtype, precision=hp
        )
    mat = jnp.triu(pow_)
    return jnp.matmul(mat, r, preferred_element_type=r.dtype, precision=hp)


def time_distributed_return(
    r: jax.Array, gamma: float, batch_first: bool = False
) -> jax.Array:
    """Sum of discounted future rewards at every step.

    ``R[t] = sum_{t' >= t} gamma^(t' - t) r[t']``. Parity: reference
    ``time_distributed_return`` (``_rl.py:24-41``).
    """
    r = jnp.asarray(r)
    if r.ndim != 2:
        raise RuntimeError("r must be 2 dimensional")
    if not gamma:
        return r
    return _tdr(r, float(gamma), batch_first)
