"""Pytree utilities for sequential-model state.

The reference library threads language-model state through search loops as
``Dict[str, Tensor]`` and requires each LM to implement ``extract_by_src`` /
``mix_by_mask`` by hand (reference ``_lm.py:291-400``). Because JAX state is
a pytree, these become generic one-liners here, shared by every LM and search.
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "broadcast_shapes",
    "extract_by_src",
    "lengths_to_mask",
    "mix_by_mask",
]


def extract_by_src(state: Any, src: jax.Array) -> Any:
    """Index every leaf of `state` along its first axis by `src`.

    Used to reorder per-beam LM state after a beam-search shuffle (reference
    ``ExtractableSequentialLanguageModel.extract_by_src``, ``_lm.py:291-338``).
    Leaves without a batch axis (scalars) are left untouched.
    """

    def gather(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim == 0:
            return leaf
        return jnp.take(leaf, src, axis=0)

    return jax.tree.map(gather, state)


def mix_by_mask(state_true: Any, state_false: Any, mask: jax.Array) -> Any:
    """Per-batch-element select between two identically-structured states.

    Used for CTC shallow fusion where some prefixes extend and others do not
    (reference ``MixableSequentialLanguageModel.mix_by_mask``,
    ``_lm.py:341-400``). `mask` has shape ``(N,)``; leaves are selected along
    their first axis.
    """

    def select(a, b):
        a, b = jnp.asarray(a), jnp.asarray(b)
        if a.ndim == 0:
            return a
        m = mask.reshape(mask.shape + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)

    return jax.tree.map(select, state_true, state_false)


def lengths_to_mask(lens: jax.Array, max_len: int, axis: int = -1) -> jax.Array:
    """Boolean mask of shape ``lens.shape + (max_len,)`` (True = in-sequence)."""
    arange = jnp.arange(max_len, dtype=lens.dtype)
    mask = jnp.expand_dims(lens, -1) > arange
    if axis != -1:
        mask = jnp.moveaxis(mask, -1, axis)
    return mask


def broadcast_shapes(a: Sequence[int], b: Sequence[int]) -> Tuple[int, ...]:
    """Numpy-style broadcast of two shapes (reference ``_compat.py:350-355``)."""
    return jnp.broadcast_shapes(tuple(a), tuple(b))
