"""Global soft attention mechanisms (flax.linen).

Capability parity with the reference's ``_attn.py``: the
``GlobalSoftAttention`` broadcast contract (``_attn.py:26-226``) — `query`
``(A*, query_size)``, `key` ``(B*, T, C*, key_size)``, `value`
``(B*, T, C*, D*)``, boolean `mask` ``(B*, T, C*)``, with the sequence axis
at an arbitrary `dim` — plus the dot-product (``_attn.py:229-283``),
generalized dot-product (``_attn.py:286-343``), concat/Bahdanau
(``_attn.py:346-441``), and multi-headed (``_attn.py:444-674``) score
functions. Parameterized variants are flax modules; masking uses ``-inf``
fill before the softmax, so fully-masked rows yield NaN exactly as the
reference does.
"""

import abc
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "ConcatSoftAttention",
    "DotProductSoftAttention",
    "GeneralizedDotProductSoftAttention",
    "GlobalSoftAttention",
    "MultiHeadedAttention",
]


class GlobalSoftAttention(nn.Module, metaclass=abc.ABCMeta):
    """Base class: softmax over scores along `dim`, weighted sum of values.

    Subclasses implement :func:`score`. See the module docstring for the
    shape contract; `dim` indexes the sequence axis of `key` and may not be
    the last axis.
    """

    query_size: int = 0
    key_size: int = 0
    dim: int = 0

    @abc.abstractmethod
    def score(self, query: jax.Array, key: jax.Array) -> jax.Array:
        """Scores ``(E*, T, F*)`` from query ``(A*, qs)`` / key ``(B*, T, C*, ks)``."""
        ...

    def check_input(self, query, key, value, mask=None) -> None:
        key_dim = key.ndim
        if query.ndim != key_dim - 1:
            raise ValueError("query must have one fewer dimension than key")
        if key_dim != value.ndim:
            raise ValueError("key must have same number of dimensions as value")
        if query.shape[-1] != self.query_size:
            raise ValueError("Last dimension of query must match query_size")
        if key.shape[-1] != self.key_size:
            raise ValueError("Last dimension of key must match key_size")
        # dim == -1 would put the attended axis on the feature axis; the
        # reference's guard compares key_dim == -1 (never true) by mistake
        if self.dim > key_dim - 2 or self.dim == -1 or self.dim < -key_dim + 1:
            raise ValueError(
                f"dim must be in the range [{-key_dim + 1}, {key_dim - 2}] "
                "and not -1"
            )
        e_shape = jnp.broadcast_shapes(
            jnp.expand_dims(query, self.dim).shape[:-1], key.shape[:-1]
        )
        if mask is not None:
            jnp.broadcast_shapes(e_shape, mask.shape)
        jnp.broadcast_shapes(tuple(e_shape) + (1,), value.shape)

    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        self.check_input(query, key, value, mask)
        e = self.score(query, key)
        if mask is not None:
            e = jnp.where(mask, e, -jnp.inf)
        a = jax.nn.softmax(e, self.dim)
        return (a[..., None] * value).sum(self.dim)


class DotProductSoftAttention(GlobalSoftAttention):
    """``e = scale_factor * <query, key>`` [luong2015].

    `size` sets both ``query_size`` and ``key_size`` (they must match), as
    in the reference (``_attn.py:229-283``).
    """

    size: Optional[int] = None
    scale_factor: float = 1.0

    def __post_init__(self):
        if self.size is not None:
            object.__setattr__(self, "query_size", self.size)
            object.__setattr__(self, "key_size", self.size)
        super().__post_init__()

    def score(self, query, key):
        query = jnp.expand_dims(query, self.dim)
        return (query * key).sum(-1) * self.scale_factor


class GeneralizedDotProductSoftAttention(GlobalSoftAttention):
    """``e = query^T W key (+ query^T b)`` [luong2015]'s "general" score."""

    use_bias: bool = False

    @nn.compact
    def score(self, query, key):
        Wkey = nn.Dense(
            self.query_size, use_bias=self.use_bias, name="linear"
        )(key)
        query = jnp.expand_dims(query, self.dim)
        return (query * Wkey).sum(-1)


class ConcatSoftAttention(GlobalSoftAttention):
    """Bahdanau-style: ``e = v^T tanh(W [query; key])`` [bahdanau2015]."""

    use_bias: bool = False
    hidden_size: int = 1000

    @nn.compact
    def score(self, query, key):
        query = jnp.expand_dims(query, self.dim)
        shape = jnp.broadcast_shapes(query.shape[:-1], key.shape[:-1])
        query = jnp.broadcast_to(query, tuple(shape) + (query.shape[-1],))
        key = jnp.broadcast_to(key, tuple(shape) + (key.shape[-1],))
        cat = jnp.concatenate([query, key], -1)
        Wcat = nn.Dense(
            self.hidden_size, use_bias=self.use_bias, name="linear"
        )(cat)
        v = self.param(
            "v", nn.initializers.normal(1.0), (self.hidden_size,), jnp.float32
        )
        return jnp.tanh(Wcat) @ v


class MultiHeadedAttention(GlobalSoftAttention):
    """Project q/k/v into `num_heads` heads, run `single_head_attention`
    per head (head axis rides the broadcast contract), concatenate, project.

    Parity: reference ``MultiHeadedAttention`` (``_attn.py:444-674``),
    including ``d_v = max(1, value_size // num_heads)`` and bias flags.
    """

    value_size: int = 0
    num_heads: int = 1
    single_head_attention: Optional[GlobalSoftAttention] = None
    out_size: Optional[int] = None
    d_v: Optional[int] = None
    bias_WQ: bool = False
    bias_WK: bool = False
    bias_WV: bool = False
    bias_WC: bool = False

    def __post_init__(self):
        if self.single_head_attention is not None:
            if self.single_head_attention.dim < 0:
                raise ValueError(
                    "Negative dimensions are ambiguous for multi-headed "
                    "attention"
                )
            object.__setattr__(self, "dim", self.single_head_attention.dim)
        super().__post_init__()

    def score(self, query, key):
        raise NotImplementedError(
            "In MultiHeadedAttention, score() is handled by "
            "single_head_attention"
        )

    def check_input(self, query, key, value, mask=None):
        key_dim = key.ndim
        if query.ndim != key_dim - 1:
            raise ValueError("query must have one fewer dimension than key")
        if key_dim != value.ndim:
            raise ValueError("key must have same number of dimensions as value")
        if query.shape[-1] != self.query_size:
            raise ValueError("Last dimension of query must match query_size")
        if key.shape[-1] != self.key_size:
            raise ValueError("Last dimension of key must match key_size")
        # dim == -1 would put the attended axis on the feature axis; the
        # reference's guard compares key_dim == -1 (never true) by mistake
        if self.dim > key_dim - 2 or self.dim == -1 or self.dim < -key_dim + 1:
            raise ValueError(
                f"dim must be in the range [{-key_dim + 1}, {key_dim - 2}] "
                "and not -1"
            )
        e_shape = jnp.broadcast_shapes(
            jnp.expand_dims(query, self.dim).shape[:-1], key.shape[:-1]
        )
        if mask is not None:
            jnp.broadcast_shapes(e_shape, mask.shape)
        jnp.broadcast_shapes(tuple(e_shape) + (1,), value.shape)
        if value.shape[-1] != self.value_size:
            raise ValueError("Last dimension of value must match value_size")

    @nn.compact
    def __call__(self, query, key, value, mask=None):
        self.check_input(query, key, value, mask)
        sha = self.single_head_attention
        d_q, d_k = sha.query_size, sha.key_size
        d_v = (
            max(1, self.value_size // self.num_heads)
            if self.d_v is None
            else self.d_v
        )
        out_size = self.value_size if self.out_size is None else self.out_size
        nh = self.num_heads
        q = nn.Dense(nh * d_q, use_bias=self.bias_WQ, name="WQ")(query)
        q = q.reshape(q.shape[:-1] + (nh, d_q))
        k = nn.Dense(nh * d_k, use_bias=self.bias_WK, name="WK")(key)
        k = k.reshape(k.shape[:-1] + (nh, d_k))
        v = nn.Dense(nh * d_v, use_bias=self.bias_WV, name="WV")(value)
        v = v.reshape(v.shape[:-1] + (nh, d_v))
        if mask is not None:
            mask = jnp.expand_dims(mask, -1)
        cat = sha(q, k, v, mask)
        cat = cat.reshape(cat.shape[:-2] + (nh * d_v,))
        return nn.Dense(out_size, use_bias=self.bias_WC, name="WC")(cat)
