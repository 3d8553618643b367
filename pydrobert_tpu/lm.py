"""Sequential language model protocol and shallow fusion.

Capability parity with the reference's ``_lm.py`` LM abstractions:
``SequentialLanguageModel`` (``_lm.py:45-288``),
``ExtractableSequentialLanguageModel`` (``_lm.py:291-338``),
``MixableSequentialLanguageModel`` (``_lm.py:341-400``), and the
``ShallowFusionLanguageModel`` family (``_lm.py:1113-1345``).

TPU-first design: LM state is an arbitrary **pytree** (typically a dict of
arrays) rather than a ``Dict[str, Tensor]``, so ``extract_by_src`` (beam
reordering) and ``mix_by_mask`` (CTC fusion selection) have generic default
implementations via ``jax.tree`` — LMs only override them for exotic state.
All methods must be pure and jittable: ``hist`` is an int array ``(S, N)``,
``idx`` a scalar or ``(N,)`` int array, and parameters live wherever the
implementer keeps them (e.g. closed-over flax variables or attributes that
are jit-constant).
"""

import abc
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .utils import pytree as _pytree

__all__ = [
    "ExtractableSequentialLanguageModel",
    "ExtractableShallowFusionLanguageModel",
    "MixableSequentialLanguageModel",
    "MixableShallowFusionLanguageModel",
    "SequentialLanguageModel",
    "ShallowFusionLanguageModel",
]

StateDict = Dict[str, Any]


class SequentialLanguageModel(abc.ABC):
    """Distribution over the next token in a sequence.

    Subclasses implement :func:`calc_idx_log_probs`; the default
    :func:`calc_full_log_probs` iterates it. Calling the model mirrors the
    reference's ``forward`` (``_lm.py:253-288``): with ``idx`` set, returns
    ``(log_probs_idx, next_state)``; with ``idx=None``, returns the stacked
    ``(S + 1, N, vocab_size)`` log probabilities.
    """

    vocab_size: int

    def __init__(self, vocab_size: int):
        from . import argcheck

        self.vocab_size = argcheck.is_posi(vocab_size, "vocab_size")

    def update_input(self, prev: StateDict, hist: jax.Array) -> StateDict:
        """Populate the initial state before any log-probability queries.

        Must be idempotent (reference ``_lm.py:140-167``).
        """
        return prev

    @abc.abstractmethod
    def calc_idx_log_probs(
        self, hist: jax.Array, prev: StateDict, idx: jax.Array
    ) -> Tuple[jax.Array, StateDict]:
        """Log probs ``(N, vocab_size)`` over token ``idx`` given ``hist[:idx]``.

        `idx` is a scalar or ``(N,)`` int array in ``[0, hist.shape[0]]``;
        `prev` is the state after ``idx - 1`` and the returned state is the
        state after `idx`.
        """
        ...

    def calc_full_log_probs(self, hist: jax.Array, prev: StateDict) -> jax.Array:
        """Stacked log probs over all ``S + 1`` prefixes of `hist`."""
        log_probs = []
        for idx in range(hist.shape[0] + 1):
            log_probs_idx, prev = self.calc_idx_log_probs(
                hist, prev, jnp.asarray(idx, jnp.int32)
            )
            log_probs.append(log_probs_idx)
        return jnp.stack(log_probs, 0)

    def __call__(
        self,
        hist: jax.Array,
        prev: Optional[StateDict] = None,
        idx: Optional[Union[int, jax.Array]] = None,
    ):
        prev = {} if prev is None else prev
        hist = jnp.asarray(hist)
        if hist.ndim != 2:
            raise RuntimeError("hist must be 2 dimensional")
        S, N = hist.shape
        prev = self.update_input(prev, hist)
        if idx is None:
            return self.calc_full_log_probs(hist, prev)
        idx_ = jnp.asarray(idx, jnp.int32)
        if idx_.ndim == 1 and idx_.shape[0] == 1:
            idx_ = idx_[0]
        elif idx_.ndim == 1 and idx_.shape[0] != N:
            raise RuntimeError(
                f"Expected dim 0 of idx to be of size {N}, got {idx_.shape[0]}"
            )
        idx_ = (idx_ + S + 1) % (S + 1)
        return self.calc_idx_log_probs(hist, prev, idx_)


class ExtractableSequentialLanguageModel(SequentialLanguageModel):
    """An LM whose state can be reordered/subsampled along the batch axis.

    Needed by searches that shuffle beams (reference ``_lm.py:291-338``).
    The default implementation indexes every state leaf's first axis; LMs
    with batch-independent state leaves should override.
    """

    def extract_by_src(self, prev: StateDict, src: jax.Array) -> StateDict:
        return _pytree.extract_by_src(prev, src)


class MixableSequentialLanguageModel(ExtractableSequentialLanguageModel):
    """An LM whose states can be mixed elementwise along the batch axis.

    Needed by :class:`CTCPrefixSearch` shallow fusion (reference
    ``_lm.py:341-400``).
    """

    def mix_by_mask(
        self, prev_true: StateDict, prev_false: StateDict, mask: jax.Array
    ) -> StateDict:
        return _pytree.mix_by_mask(prev_true, prev_false, mask)


class ShallowFusionLanguageModel(SequentialLanguageModel):
    """Log-linear combination of two LMs: ``first + beta * second``.

    States of the two sub-models are kept in a single dict under key
    prefixes (``first_prefix``/``second_prefix``), as in the reference
    (``_lm.py:1113-1259``).
    """

    def __init__(
        self,
        first: SequentialLanguageModel,
        second: SequentialLanguageModel,
        beta: float = 0.0,
        first_prefix: str = "first.",
        second_prefix: str = "second.",
    ):
        from . import argcheck

        if first.vocab_size != second.vocab_size:
            raise ValueError(
                "first and second vocab_size must match, got "
                f"{first.vocab_size} and {second.vocab_size}"
            )
        if first_prefix == second_prefix:
            raise ValueError("first_prefix and second_prefix cannot match")
        super().__init__(first.vocab_size)
        self.first, self.second = first, second
        self.beta = argcheck.is_float(beta, "beta")
        self.first_prefix = argcheck.is_str(first_prefix, "first_prefix")
        self.second_prefix = argcheck.is_str(second_prefix, "second_prefix")

    def split_dicts(self, prev: StateDict) -> Tuple[StateDict, StateDict]:
        prev_first, prev_second = {}, {}
        for k, v in prev.items():
            if k.startswith(self.first_prefix):
                prev_first[k[len(self.first_prefix):]] = v
            elif k.startswith(self.second_prefix):
                prev_second[k[len(self.second_prefix):]] = v
            else:
                raise RuntimeError(
                    f"key '{k}' from prev does not start with first_prefix "
                    f"'{self.first_prefix}' nor second_prefix "
                    f"'{self.second_prefix}'"
                )
        return prev_first, prev_second

    def merge_dicts(
        self, prev_first: StateDict, prev_second: StateDict
    ) -> StateDict:
        prev = {self.first_prefix + k: v for k, v in prev_first.items()}
        prev.update(
            (self.second_prefix + k, v) for k, v in prev_second.items()
        )
        return prev

    def update_input(self, prev: StateDict, hist: jax.Array) -> StateDict:
        a, b = self.split_dicts(prev)
        return self.merge_dicts(
            self.first.update_input(a, hist), self.second.update_input(b, hist)
        )

    def calc_idx_log_probs(self, hist, prev, idx):
        a, b = self.split_dicts(prev)
        lp_a, cur_a = self.first.calc_idx_log_probs(hist, a, idx)
        lp_b, cur_b = self.second.calc_idx_log_probs(hist, b, idx)
        return lp_a + self.beta * lp_b, self.merge_dicts(cur_a, cur_b)

    def calc_full_log_probs(self, hist, prev):
        a, b = self.split_dicts(prev)
        return self.first.calc_full_log_probs(
            hist, a
        ) + self.beta * self.second.calc_full_log_probs(hist, b)


class ExtractableShallowFusionLanguageModel(
    ShallowFusionLanguageModel, ExtractableSequentialLanguageModel
):
    """Shallow fusion of two extractable LMs (reference ``_lm.py:1262-1302``)."""

    def extract_by_src(self, prev: StateDict, src: jax.Array) -> StateDict:
        a, b = self.split_dicts(prev)
        return self.merge_dicts(
            self.first.extract_by_src(a, src), self.second.extract_by_src(b, src)
        )


class MixableShallowFusionLanguageModel(
    ExtractableShallowFusionLanguageModel, MixableSequentialLanguageModel
):
    """Shallow fusion of two mixable LMs (reference ``_lm.py:1305-1345``)."""

    def mix_by_mask(
        self, prev_true: StateDict, prev_false: StateDict, mask: jax.Array
    ) -> StateDict:
        at, bt = self.split_dicts(prev_true)
        af, bf = self.split_dicts(prev_false)
        return self.merge_dicts(
            self.first.mix_by_mask(at, af, mask),
            self.second.mix_by_mask(bt, bf, mask),
        )
