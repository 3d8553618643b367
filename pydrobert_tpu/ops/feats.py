"""Feature transforms: MVN, deltas, slicing policies, token chunking.

Capability parity with the reference's ``_feats.py``: ``mean_var_norm``
(``_feats.py:29-52``), ``feat_deltas`` (``_feats.py:232-297``),
``slice_spect_data`` (``_feats.py:430-588``), and
``chunk_token_sequences_by_slices`` (``_feats.py:790-837``).

Design notes (TPU-first):

- ``feat_deltas`` builds its filters on host with numpy (they are static
  hyperparameters) and applies them as a single grouped 1-D convolution the
  XLA fuser handles well.
- ``slice_spect_data`` produces a data-dependent number of slices, so it is a
  host-side (numpy) op by design — it sits on the data-prep path, matching
  its role in the reference's CLI/chunking pipeline.
- ``chunk_token_sequences_by_slices`` is fully jittable (static shapes), with
  the left-packing done by a stable argsort.
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config

__all__ = [
    "chunk_token_sequences_by_slices",
    "feat_delta_filters",
    "feat_deltas",
    "mean_var_norm",
    "slice_spect_data",
]


def mean_var_norm(
    x: jax.Array,
    dim: int = -1,
    mean: Optional[jax.Array] = None,
    std: Optional[jax.Array] = None,
    eps: float = config.TINY,
) -> jax.Array:
    """Normalize a dimension of `x` by (given or sample) mean and std.

    Parity: reference ``mean_var_norm`` (``_feats.py:29-52``); statistics are
    estimated biased when not provided.
    """
    x = jnp.asarray(x)
    D = x.ndim
    if dim < -D or dim > D - 1:
        raise IndexError(
            f"Dimension out of range (expected to be in the range of "
            f"[{-D},{D - 1}], got {dim})"
        )
    dim = (dim + D) % D
    dtype = x.dtype
    axes = tuple(a for a in range(D) if a != dim)
    shape = [1] * D
    shape[dim] = x.shape[dim]
    if mean is None:
        mean = x.mean(axes)
    x = x - jnp.asarray(mean, dtype).reshape(shape)
    if std is None:
        std = jnp.sqrt((x.astype(jnp.float32) ** 2).mean(axes))
    std = jnp.clip(jnp.asarray(std, dtype).reshape(shape), eps, None)
    return (x / std).astype(dtype)


def feat_delta_filters(order: int, width: int) -> np.ndarray:
    """The (order + 1, 1 + 2*width*order) delta filter bank, built on host.

    Parity: reference ``_feat_delta_filters`` (``_feats.py:232-249``): filter
    ``k`` is the regression kernel convolved with itself ``k`` times.
    """
    if order < 0:
        raise RuntimeError(f"order must be non-negative, got {order}")
    if width < 1:
        raise RuntimeError(f"width must be positive, got {width}")
    span = 1 + (2 * width) * order
    last = np.zeros(span, np.float32)
    last[width * order] = 1
    filts = [last]
    if order == 0:
        return np.stack(filts)
    kernel = np.arange(width, -width - 1, -1, dtype=np.float32)
    kernel /= np.square(kernel).sum()
    for _ in range(order):
        # 'same' correlation with the regression kernel
        last = np.convolve(last, kernel[::-1], mode="same")
        filts.append(last.astype(np.float32))
    return np.stack(filts)


@partial(
    jax.jit,
    static_argnames=(
        "dim", "time_dim", "concatenate", "order", "width", "pad_mode", "value"
    ),
)
def _feat_deltas(x, filters, dim, time_dim, concatenate, order, width, pad_mode, value):
    D = x.ndim
    time_dim = (time_dim + D) % D
    if not concatenate:
        D += 1
    dim = (dim + D) % D

    x = jnp.swapaxes(x, time_dim, -1)
    shape = x.shape
    T = shape[-1]
    flat = x.reshape(-1, 1, T)  # (B, 1, T)
    if width:
        p = width * order
        if pad_mode == "constant":
            flat = jnp.pad(
                flat, ((0, 0), (0, 0), (p, p)), constant_values=value
            )
        else:
            jmode = {"replicate": "edge", "reflect": "reflect", "circular": "wrap"}[
                pad_mode
            ]
            flat = jnp.pad(flat, ((0, 0), (0, 0), (p, p)), mode=jmode)
    out = jax.lax.conv_general_dilated(
        flat,
        filters[:, None, :].astype(x.dtype),  # (order+1, 1, K)
        window_strides=(1,),
        padding="VALID",
        precision=jax.lax.Precision.HIGHEST,  # exact f32 delta filters
    )  # (B, order+1, T)
    out = out.reshape(shape[:-1] + (order + 1, T))
    out = jnp.swapaxes(out, -2, -1)  # (..., T, order+1)
    out = jnp.swapaxes(out, time_dim, -2)  # time axis back in place
    out = jnp.moveaxis(out, -1, dim)  # order axis to `dim`
    if concatenate:
        out = out.reshape(out.shape[:dim] + (-1,) + out.shape[dim + 2:])
    return out


def feat_deltas(
    x: jax.Array,
    dim: int = -1,
    time_dim: int = -2,
    concatenate: bool = True,
    order: int = 2,
    width: int = 2,
    pad_mode: str = "replicate",
    value: float = config.DEFT_PAD_VALUE,
) -> jax.Array:
    """Compute deltas (and delta-deltas, ...) of features along `time_dim`.

    Parity: reference ``feat_deltas`` (``_feats.py:252-297``). The order-k
    output occupies the `dim` axis (concatenated with the features when
    `concatenate`).
    """
    x = jnp.asarray(x)
    D = x.ndim
    if time_dim < -D or time_dim >= D:
        raise RuntimeError(
            f"Expected dimension 'time_dim' to be in [{-D}, {D-1}], got "
            f"{time_dim}"
        )
    D_out = D if concatenate else D + 1
    if dim < -D_out or dim >= D_out:
        raise RuntimeError(
            f"Expected dimension 'dim' to be in [{-D_out}, {D_out-1}], got {dim}"
        )
    if pad_mode not in ("replicate", "constant", "reflect", "circular"):
        raise ValueError(f"unknown pad_mode '{pad_mode}'")
    filters = jnp.asarray(feat_delta_filters(order, width))
    return _feat_deltas(
        x, filters, dim, time_dim, concatenate, order, width, pad_mode,
        float(value),
    )


def slice_spect_data(
    input: jax.Array,
    in_lens: Optional[jax.Array] = None,
    other_lens: Optional[jax.Array] = None,
    policy: str = "fixed",
    window_type: str = "symmetric",
    valid_only: bool = True,
    lobe_size: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Slices of feature chunks under 'fixed'/'ali'/'ref' policies.

    Host-side op (numpy): the number of slices is data-dependent, so this
    runs eagerly on concrete inputs, as on the reference's data-prep path.
    Returns ``slices (M, 2)`` and ``sources (M,)`` int64 arrays. Parity:
    reference ``slice_spect_data`` (``_feats.py:430-588``).
    """
    input = np.asarray(input)
    if input.ndim < 2:
        raise RuntimeError(
            f"Expected input to be at least 2-dimensional; got {input.ndim}"
        )
    N, T = input.shape[:2]
    if not T:
        return np.empty((0, 2), np.int64), np.empty((0,), np.int64)
    if lobe_size < 0:
        raise RuntimeError(f"Expected non-negative lobe_size, got {lobe_size}")
    if window_type not in ("symmetric", "causal", "future"):
        raise RuntimeError(
            "expected window_type to be one of 'symmetric', 'causal', or "
            f"'future', got '{window_type}'"
        )
    if in_lens is not None:
        in_lens = np.asarray(in_lens)
    if policy == "fixed":
        shift = lobe_size + 1
        if valid_only and window_type == "symmetric":
            window_size = 2 * lobe_size + 1
            starts = np.arange(0, max(T - window_size + 1, 0), shift)
            ends = starts + window_size
            mids = ends - 1
        elif window_type == "symmetric":
            window_size = 2 * lobe_size + 1
            half_shift = shift // 2
            TT = (T + half_shift) // shift
            mids = np.arange(TT) * shift + half_shift
            starts = mids - window_size // 2
            ends = starts + window_size
        elif valid_only:
            starts = np.arange(0, max(T - lobe_size, 0), shift)
            ends = starts + shift
            mids = ends - 1
        elif window_type == "causal":
            starts = np.arange(-lobe_size, T - lobe_size, shift)
            ends = starts + shift
            mids = ends - 1
        else:  # future
            starts = mids = np.arange(0, T, shift)
            ends = starts + shift
        TT = len(starts)
        slices = np.stack(
            [np.tile(starts, N), np.tile(ends, N)], 1
        ).reshape(N * TT, 2)
        sources = np.repeat(np.arange(N), TT)
        if in_lens is not None:
            if in_lens.shape != (N,):
                raise RuntimeError(
                    f"Expected in_lens to be of shape ({N},); got {in_lens.shape}"
                )
            mask = (in_lens[:, None] > mids[None]).flatten()
            slices, sources = slices[mask], sources[mask]
    elif policy == "ali":
        if input.ndim != 2:
            raise RuntimeError("expected tensor of dimension 2 with policy 'ali'")
        change = input[:, :-1] != input[:, 1:]
        arange = np.arange(T)
        if in_lens is not None:
            if in_lens.shape != (N,):
                raise RuntimeError(
                    f"Expected in_lens to be of shape ({N},); got {in_lens.shape}"
                )
            change = change & (in_lens[:, None] > arange[None, 1:])
        else:
            in_lens = np.full((N,), T)
        nonempty = (in_lens > 0)[:, None]
        start_mask = np.concatenate([nonempty, change], 1)
        starts_nz = np.argwhere(start_mask)
        # end markers live on a width-(T+1) grid so a segment may end at T;
        # the reference's width-T mask (_feats.py:517-518) crashes whenever
        # in_lens == T — this implements the documented intent instead
        end_mask = np.concatenate(
            [np.zeros_like(nonempty), change, np.zeros_like(nonempty)], 1
        )
        end_mask[nonempty[:, 0], in_lens[nonempty[:, 0]]] = True
        ends_nz = np.argwhere(end_mask)
        sources = starts_nz[:, 0]
        starts, ends = starts_nz[:, 1], ends_nz[:, 1]
        if lobe_size:
            NN = len(starts)
            do_left = window_type in ("symmetric", "causal")
            do_right = window_type in ("symmetric", "future")
            if valid_only:
                offs = (int(do_left) + int(do_right)) * lobe_size
                is_same = sources[: NN - offs] == sources[offs:] if NN - offs > 0 else np.zeros(0, bool)
                starts = starts[: NN - offs][is_same]
                ends = ends[offs:][is_same]
                sources = sources[: NN - offs][is_same]
            else:
                start_idx = np.arange(NN)
                end_idx = np.arange(NN)
                for n in range(1, lobe_size + 1):
                    offs = (sources[n:] == sources[: NN - n]).astype(np.int64)
                    if do_left:
                        start_idx[n:] -= offs
                    if do_right:
                        end_idx[: NN - n] += offs
                starts = starts[start_idx]
                ends = ends[end_idx]
        slices = np.stack([starts, ends], 1)
    elif policy == "ref":
        if input.ndim != 3:
            raise RuntimeError(
                f"Expected input to be 3-dimensional, got {input.ndim}"
            )
        if input.shape[2] != 3:
            raise RuntimeError(
                f"Expected 3rd dimension of input to be of size 3, got "
                f"{input.shape[2]}"
            )
        starts = input[..., 1].copy()
        ends = input[..., 2].copy()
        if in_lens is None:
            in_lens = np.full((N,), T)
        if other_lens is None:
            # default: the final valid segment's end time (the reference's
            # expression at _feats.py:556-562 errors on this path; this
            # implements its documented intent)
            idx = np.clip(in_lens - 1, 0, None)
            other_lens = np.where(
                in_lens == 0, 0, ends[np.arange(N), idx]
            )
        else:
            other_lens = np.asarray(other_lens)
            if other_lens.shape != (N,):
                raise RuntimeError(
                    f"Expected other_lens to have shape ({N},); got "
                    f"{other_lens.shape}"
                )
        mask = in_lens[:, None] > np.arange(T)[None]
        mask = mask & (input[..., 1:] >= 0).all(2)
        if window_type in ("symmetric", "causal"):
            starts = starts - lobe_size
        if window_type in ("symmetric", "future"):
            ends = ends + lobe_size
        if valid_only:
            mask = mask & (starts >= 0) & (ends <= other_lens[:, None])
        else:
            mask = mask & (ends > 0) & (starts < other_lens[:, None])
        mask = mask & (starts < ends)
        mask = mask.flatten()
        sources = np.repeat(np.arange(N), T)[mask]
        slices = np.stack([starts.flatten()[mask], ends.flatten()[mask]], 1)
    else:
        raise RuntimeError(
            f"Expected policy to be one of 'fixed', 'ali', or 'ref'; got "
            f"'{policy}'"
        )
    return slices.astype(np.int64), sources.astype(np.int64)


@partial(jax.jit, static_argnames=("partial_", "retain"))
def _chunk_token_sequences_by_slices(refs, slices, ref_lens, partial_, retain):
    N, R = refs.shape[:2]
    arange = jnp.arange(R, dtype=jnp.int32)
    mask = ref_lens[:, None] > arange[None]
    mask = mask & (refs[..., 1:] >= 0).all(2) & (refs[..., 2] >= refs[..., 1])
    if partial_:
        mask = (
            mask
            & (slices[..., :1] < refs[..., 2])
            & (slices[..., 1:] > refs[..., 1])
        )
    else:
        mask = (
            mask
            & (slices[..., :1] <= refs[..., 1])
            & (slices[..., 1:] >= refs[..., 2])
        )
    chunked_lens = mask.sum(1)
    order = jnp.argsort(~mask, axis=1, stable=True)
    chunked = jnp.take_along_axis(refs, order[..., None], axis=1)
    valid = chunked_lens[:, None] > arange[None]
    chunked = jnp.where(valid[..., None], chunked, 0)
    if not retain:
        # parity note: the reference *adds* the slice start to boundaries
        # (_feats.py:836), a behavior pinned by its own tests
        shift = jnp.concatenate(
            [jnp.zeros_like(slices[..., :1]), slices[..., :1], slices[..., :1]], 1
        )
        chunked = jnp.where(valid[..., None], chunked + shift[:, None, :], chunked)
    return chunked, chunked_lens


def chunk_token_sequences_by_slices(
    refs: jax.Array,
    slices: jax.Array,
    ref_lens: Optional[jax.Array] = None,
    partial: bool = False,
    retain: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Keep ref token segments overlapping per-batch slices, left-packed.

    Parity: reference ``chunk_token_sequences_by_slices``
    (``_feats.py:790-837``); invalid tail positions are zero-filled here
    (the reference leaves them uninitialized).
    """
    refs, slices = jnp.asarray(refs), jnp.asarray(slices)
    if refs.ndim == 2:
        return (
            jnp.empty((0, refs.shape[1]), refs.dtype),
            jnp.empty((0,), jnp.int32),
        )
    if refs.ndim != 3 or refs.shape[2] != 3:
        raise RuntimeError(
            "Expected refs to be 2-dimensional or 3-dimensional with final "
            f"dimension size 3. Got shape '{refs.shape}'"
        )
    N, R = refs.shape[:2]
    if slices.shape != (N, 2):
        raise RuntimeError(
            f"Expected slices to be a tensor of shape ({N}, 2), got "
            f"{slices.shape}"
        )
    if ref_lens is None:
        ref_lens = jnp.full((N,), R, jnp.int32)
    else:
        ref_lens = jnp.asarray(ref_lens)
        if ref_lens.shape != (N,):
            raise RuntimeError(
                f"Expected ref_lens to be a tensor of shape ({N},), got "
                f"{ref_lens.shape}"
            )
    return _chunk_token_sequences_by_slices(
        refs, slices, ref_lens.astype(jnp.int32), partial, retain
    )
