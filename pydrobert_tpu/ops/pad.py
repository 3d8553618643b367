"""Padding and chunking ops.

Capability parity with the reference's ``_pad.py`` (``pad_variable``
``_pad.py:108-149``, ``pad_masked_sequence`` ``_pad.py:257-279``,
``chunk_by_slices`` ``_pad.py:383-463``), redesigned for XLA: instead of the
reference's masked_select/masked_scatter buffer shuffles, every output
position computes its source index directly and a single batched gather
produces the result. Reflect/replicate padding becomes index arithmetic
(``g < 0 -> -g``; ``g >= len -> 2*len - 2 - g``; clamping), which also
subsumes the reference's slice-inside-right-padding special case
(``_pad.py:440-461``) with no extra code path.

XLA requires static output lengths. Each function that the reference sizes
dynamically accepts an optional static ``out_len``; when omitted, it is
computed eagerly from concrete inputs (host sync) — an error under tracing.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config

__all__ = [
    "chunk_by_slices",
    "pad_masked_sequence",
    "pad_variable",
]

_PAD_MODES = ("constant", "reflect", "replicate")


def _static_max(x, what: str):
    if isinstance(x, jax.core.Tracer):
        raise ValueError(
            f"{what} must be passed explicitly (static) when tracing: the "
            "output length cannot be computed from traced values"
        )
    return int(np.max(np.asarray(x))) if np.asarray(x).size else 0


def _map_index(g, lens, mode: str):
    """Map a (possibly out-of-range) gather index into [0, lens) per mode."""
    if mode == "reflect":
        src = jnp.where(g < 0, -g, g)
        src = jnp.where(src >= lens, 2 * lens - 2 - src, src)
    elif mode == "replicate":
        src = jnp.clip(g, 0, lens - 1)
    else:
        src = g
    return jnp.clip(src, 0, None)


@partial(jax.jit, static_argnames=("mode", "value", "out_len"))
def _pad_variable(x, lens, pad, mode, value, out_len):
    N, T = x.shape[:2]
    rest = x.shape[2:]
    x2 = x.reshape(N, T, -1)
    lens = lens.astype(jnp.int32)
    left, right = pad[0].astype(jnp.int32), pad[1].astype(jnp.int32)
    t = jnp.arange(out_len, dtype=jnp.int32)[None]  # (1, Tp)
    g = t - left[:, None]  # source index into the sequence
    new_lens = (lens + left + right)[:, None]
    in_seq = t < new_lens
    src = _map_index(g, lens[:, None], mode)
    src = jnp.clip(src, 0, T - 1)
    gathered = jnp.take_along_axis(x2, src[..., None], axis=1)
    if mode == "constant":
        valid = in_seq & (g >= 0) & (g < lens[:, None])
    else:
        valid = in_seq
    out = jnp.where(valid[..., None], gathered, jnp.asarray(value, x.dtype))
    return out.reshape((N, out_len) + rest)


def pad_variable(
    x: jax.Array,
    lens: jax.Array,
    pad: jax.Array,
    mode: str = "constant",
    value: float = config.DEFT_PAD_VALUE,
    out_len: Optional[int] = None,
) -> jax.Array:
    """Pad variable-length sequences by variable amounts on each side.

    ``padded[n]`` is ``pad[0, n]`` padding values, then ``x[n, :lens[n]]``,
    then ``pad[1, n]`` padding values, right-filled with `value` up to
    `out_len` (default: the largest padded length). Parity: reference
    ``pad_variable`` (``_pad.py:108-149``).
    """
    x = jnp.asarray(x)
    if x.ndim < 2:
        raise ValueError("Expected x to be at least two dimensional")
    N, T = x.shape[:2]
    lens, pad = jnp.asarray(lens), jnp.asarray(pad)
    if lens.shape != (N,):
        raise ValueError(
            f"For x of shape {x.shape}, lens should have shape ({N},) but got"
            f"{lens.shape}"
        )
    if pad.shape != (2, N):
        raise ValueError(
            f"For x of shape {x.shape}, pad should have shape (2, {N}), but "
            f"got {pad.shape}"
        )
    if mode not in _PAD_MODES:
        raise ValueError(
            f"mode must be one of 'constant', 'reflect', 'replicate', got "
            f"'{mode}'"
        )
    if mode == "reflect" and not isinstance(pad, jax.core.Tracer):
        if np.any(np.asarray(pad) >= np.asarray(lens)[None]):
            raise NotImplementedError(
                "For reflect padding, all padding lengths must be less than "
                "the sequence length"
            )
    if mode == "replicate" and not isinstance(lens, jax.core.Tracer):
        if np.any(np.asarray(lens) < 1):
            raise RuntimeError("For replicate padding, all lens must be > 0")
    if out_len is None:
        out_len = _static_max(
            np.asarray(lens) + np.asarray(pad).sum(0), "out_len"
        )
    return _pad_variable(x, lens, pad, mode, float(value), int(out_len))


@partial(jax.jit, static_argnames=("batch_first", "padding_value"))
def _pad_masked_sequence(x, mask, batch_first, padding_value):
    if not batch_first:
        x = jnp.swapaxes(x, 0, 1)
        mask = jnp.swapaxes(mask, 0, 1)
    N, T = mask.shape
    lens = mask.sum(1)
    # stable sort pushing unmasked elements to the front, preserving order
    order = jnp.argsort(~mask, axis=1, stable=True)  # (N, T)
    x2 = x.reshape(N, T, -1)
    packed = jnp.take_along_axis(x2, order[..., None], axis=1)
    valid = jnp.arange(T, dtype=lens.dtype)[None] < lens[:, None]
    out = jnp.where(
        valid[..., None], packed, jnp.asarray(padding_value, x.dtype)
    ).reshape(x.shape)
    if not batch_first:
        out = jnp.swapaxes(out, 0, 1)
    return out, lens


def pad_masked_sequence(
    x: jax.Array,
    mask: jax.Array,
    batch_first: bool = False,
    padding_value: float = config.DEFT_PAD_VALUE,
) -> Tuple[jax.Array, jax.Array]:
    """Select masked elements, left-pack them into right-padded sequences.

    Parity: reference ``pad_masked_sequence`` (``_pad.py:257-279``), via a
    stable argsort instead of masked_select/masked_scatter. Fully jittable
    (output shape matches input).
    """
    x, mask = jnp.asarray(x), jnp.asarray(mask)
    if x.ndim < 2:
        raise RuntimeError(
            f"expected x to be at least two-dimensional, got {x.ndim}"
        )
    if mask.ndim != 2:
        raise RuntimeError(f"expected mask to be two-dimensional, got {mask.ndim}")
    return _pad_masked_sequence(x, mask, batch_first, float(padding_value))


@partial(jax.jit, static_argnames=("mode", "value", "out_len"))
def _chunk_by_slices(x, slices, lens, mode, value, out_len):
    N, T = x.shape[:2]
    rest = x.shape[2:]
    x2 = x.reshape(N, T, -1)
    lens = lens.astype(jnp.int32)
    start = slices[..., 0].astype(jnp.int32)
    end = slices[..., 1].astype(jnp.int32)
    chunk_lens = jnp.clip(end - start, 0, None)
    t = jnp.arange(out_len, dtype=jnp.int32)[None]  # (1, Tp)
    g = start[:, None] + t
    src = _map_index(g, lens[:, None], mode)
    src = jnp.clip(src, 0, T - 1)
    gathered = jnp.take_along_axis(x2, src[..., None], axis=1)
    in_chunk = t < chunk_lens[:, None]
    if mode == "constant":
        valid = in_chunk & (g >= 0) & (g < lens[:, None])
    else:
        valid = in_chunk
    out = jnp.where(valid[..., None], gathered, jnp.asarray(value, x.dtype))
    return out.reshape((N, out_len) + rest), chunk_lens


def chunk_by_slices(
    x: jax.Array,
    slices: jax.Array,
    lens: Optional[jax.Array] = None,
    mode: str = "constant",
    value: float = config.DEFT_PAD_VALUE,
    out_len: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Extract per-sequence slices of `x`, padding out-of-bounds regions.

    Negative starts index padding left of the sequence (not Python-style
    wraparound). Parity: reference ``chunk_by_slices`` (``_pad.py:383-463``),
    including the slice-fully-inside-right-padding reflect behavior, via
    direct reflective index arithmetic.
    """
    x = jnp.asarray(x)
    if x.ndim < 2:
        raise RuntimeError(f"Expected x to be at least 2-dimensional; got {x.ndim}")
    N, T = x.shape[:2]
    slices = jnp.asarray(slices)
    if N * T == 0:
        return jnp.empty_like(x), jnp.zeros((N,), jnp.int32)
    if lens is None:
        lens = jnp.full((N,), T, jnp.int32)
    else:
        lens = jnp.asarray(lens)
        if lens.shape != (N,):
            raise RuntimeError(
                f"Expected lens to be of shape ({N},); got {lens.shape}"
            )
    if mode not in _PAD_MODES:
        raise ValueError(
            f"mode must be one of 'constant', 'reflect', 'replicate', got "
            f"'{mode}'"
        )
    if (
        mode == "reflect"
        and not isinstance(slices, jax.core.Tracer)
        and not isinstance(lens, jax.core.Tracer)
        and N
    ):
        # reflection is single-fold: overhangs >= the sequence length have
        # no well-defined image (the reference raises the same way,
        # _pad.py:56-61); under jit the check cannot run and out-of-range
        # positions clamp instead
        start_np = np.asarray(slices)[..., 0]
        end_np = np.asarray(slices)[..., 1]
        lens_chk = np.asarray(lens)
        nonempty = (end_np - start_np) > 0
        if np.any(
            nonempty
            & (
                (np.clip(-start_np, 0, None) >= lens_chk)
                | (np.clip(end_np - lens_chk, 0, None) >= lens_chk)
            )
        ):
            raise NotImplementedError(
                "For reflect padding, all padding lengths must be less than "
                "the sequence length"
            )
    if out_len is None:
        start = np.asarray(slices)[..., 0]
        end = np.asarray(slices)[..., 1]
        lens_np = np.asarray(lens)
        chunk_lens = np.clip(end - start, 0, None)
        empty = chunk_lens == 0
        left_pad = np.where(empty, 0, np.clip(-start, 0, None))
        right_pad = np.where(empty, 0, np.clip(end - lens_np, 0, None))
        out_len = int(
            max(left_pad.max(), chunk_lens.max(), right_pad.max())
        ) if N else 0
    return _chunk_by_slices(x, slices, lens, mode, float(value), int(out_len))
