"""Image warping ops: polyharmonic splines, dense/sparse warp, SpecAugment.

Capability parity with the reference's ``_img.py``: ``polyharmonic_spline``
(``_img.py:133-150``, a TF ``interpolate_spline`` port), ``warp_1d_grid``
(``_img.py:268-303``), ``dense_image_warp`` (``_img.py:393-439``),
``sparse_image_warp`` (``_img.py:520-714``), ``random_shift``
(``_img.py:883-908``) and the SpecAugment stack (``_img.py:1056-1245``).

TPU-first design notes:

- torch's ``grid_sample`` has no JAX analogue; :func:`grid_sample` here
  implements bilinear/nearest sampling with zeros/border/reflection padding
  (align_corners=False semantics) as pure gathers + lerps, which XLA fuses
  into the surrounding computation.
- The spline solve batches tiny dense systems; ``jnp.linalg.solve`` keeps
  them on-device. SpecAugment's per-batch time warp is three knots, so the
  full-matrix system is 5x5 — negligible next to the (N, T, F) resample.
- Randomness is explicit: stochastic ops take a ``key``. ``training`` is a
  static Python flag, as in the reference.
"""

import math
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .pad import pad_variable

__all__ = [
    "dense_image_warp",
    "grid_sample",
    "polyharmonic_spline",
    "random_shift",
    "sparse_image_warp",
    "spec_augment",
    "spec_augment_apply_parameters",
    "spec_augment_draw_parameters",
    "warp_1d_grid",
]

_F32_EPS = float(np.finfo(np.float32).eps)


def _phi(r: jax.Array, k: int) -> jax.Array:
    """Order-k polyharmonic radial basis (reference ``_phi`` _img.py:59-64)."""
    if k % 2:
        return r**k
    return (r**k) * jnp.log(jnp.clip(r, _F32_EPS, None))


def _cdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched pairwise Euclidean distance ``(N, P, I),(N, Q, I)->(N, P, Q)``."""
    diff = a[:, :, None, :] - b[:, None, :, :]
    return jnp.sqrt(jnp.clip((diff * diff).sum(-1), 0, None))


@partial(jax.jit, static_argnames=("order", "regularization_weight", "full_matrix"))
def _polyharmonic_spline(
    train_points, train_values, query_points, order,
    regularization_weight, full_matrix,
):
    c, f, x = train_points, train_values, query_points
    hp = jax.lax.Precision.HIGHEST  # golden-file fidelity on TPU matmuls
    A = _phi(_cdist(c, c), order)  # (N, T, T)
    if regularization_weight > 0.0:
        A = A + jnp.eye(A.shape[1], dtype=A.dtype)[None] * regularization_weight
    B = jnp.concatenate([c, jnp.ones_like(c[..., :1])], 2)  # (N, T, I+1)
    if full_matrix:
        ABt = jnp.concatenate([A, jnp.swapaxes(B, 1, 2)], 1)
        zeros = jnp.zeros((B.shape[0], B.shape[2], B.shape[2]), B.dtype)
        B0 = jnp.concatenate([B, zeros], 1)
        lhs = jnp.concatenate([ABt, B0], 2)  # (N, T+I+1, T+I+1)
        zeros = jnp.zeros((B.shape[0], B.shape[2], f.shape[2]), f.dtype)
        rhs = jnp.concatenate([f, zeros], 1)
        wv = jnp.linalg.solve(lhs, rhs)
        # iterative refinement: recovers accuracy lost to the TPU's f32
        # factorization (residuals computed at HIGHEST precision)
        for _ in range(2):
            resid = rhs - jnp.matmul(lhs, wv, precision=hp)
            wv = wv + jnp.linalg.solve(lhs, resid)
        w, v = wv[:, : B.shape[1]], wv[:, B.shape[1]:]
    else:
        Ainv = jnp.linalg.inv(A)
        Ainv_f = jnp.matmul(Ainv, f, precision=hp)
        Ainv_B = jnp.matmul(Ainv, B, precision=hp)
        Bt = jnp.swapaxes(B, 1, 2)
        v = jnp.linalg.solve(
            jnp.matmul(Bt, Ainv_B, precision=hp),
            jnp.matmul(Bt, Ainv_f, precision=hp),
        )
        w = Ainv_f - jnp.matmul(Ainv_B, v, precision=hp)
    phi_r = _phi(_cdist(x, c), order)  # (N, Q, T)
    x1 = jnp.concatenate([x, jnp.ones_like(x[..., :1])], 2)
    return jnp.matmul(phi_r, w, precision=hp) + jnp.matmul(x1, v, precision=hp)


def polyharmonic_spline(
    train_points: jax.Array,
    train_values: jax.Array,
    query_points: jax.Array,
    order: int,
    regularization_weight: float = 0.0,
    full_matrix: bool = True,
) -> jax.Array:
    """Interpolate query values from knots with a polyharmonic spline.

    Parity: reference ``polyharmonic_spline`` (``_img.py:133-150``),
    including both the full-matrix and block-decomposition solvers.
    """
    train_points = jnp.asarray(train_points, jnp.float32)
    train_values = jnp.asarray(train_values, jnp.float32)
    query_points = jnp.asarray(query_points, jnp.float32)
    return _polyharmonic_spline(
        train_points, train_values, query_points, int(order),
        float(regularization_weight), bool(full_matrix),
    )


def _reflect_coord(x: jax.Array, size: int) -> jax.Array:
    """Reflect continuous pixel coords into [-0.5, size-0.5] (no align_corners)."""
    lo, hi = -0.5, size - 0.5
    rng = hi - lo
    r = jnp.mod(x - lo, 2 * rng)
    return lo + rng - jnp.abs(r - rng)


@partial(jax.jit, static_argnames=("mode", "padding_mode"))
def _grid_sample(image, grid, mode, padding_mode):
    N, C, H, W = image.shape
    gx = grid[..., 0]  # width coord in [-1, 1]
    gy = grid[..., 1]  # height coord
    ix = ((gx + 1) * W - 1) / 2
    iy = ((gy + 1) * H - 1) / 2
    if padding_mode == "reflection":
        ix = _reflect_coord(ix, W)
        iy = _reflect_coord(iy, H)

    def gather(iy_idx, ix_idx):
        """image[n, :, iy_idx[n], ix_idx[n]] with clamped indices."""
        yc = jnp.clip(iy_idx, 0, H - 1)
        xc = jnp.clip(ix_idx, 0, W - 1)
        flat = image.reshape(N, C, H * W)
        lin = (yc * W + xc).reshape(N, -1)  # (N, P)
        out = jnp.take_along_axis(flat, lin[:, None, :], axis=2)
        return out.reshape((N, C) + iy_idx.shape[1:])

    if mode == "nearest":
        ix_r = jnp.round(ix).astype(jnp.int32)
        iy_r = jnp.round(iy).astype(jnp.int32)
        out = gather(iy_r, ix_r)
        if padding_mode == "zeros":
            valid = (ix_r >= 0) & (ix_r < W) & (iy_r >= 0) & (iy_r < H)
            out = out * valid[:, None].astype(out.dtype)
        return out
    # bilinear
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = ix - x0
    wy1 = iy - y0
    wx0, wy0 = 1 - wx1, 1 - wy1
    vals = []
    for yi, wy in ((y0, wy0), (y1, wy1)):
        for xi, wx in ((x0, wx0), (x1, wx1)):
            v = gather(yi, xi)
            w_ = wy * wx
            if padding_mode == "zeros":
                valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                w_ = w_ * valid.astype(w_.dtype)
            vals.append(v * w_[:, None].astype(v.dtype))
    return vals[0] + vals[1] + vals[2] + vals[3]


def grid_sample(
    image: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
) -> jax.Array:
    """torch-compatible ``grid_sample`` (align_corners=False) in pure JAX.

    `image` is ``(N, C, H, W)``; `grid` is ``(N, H', W', 2)`` with
    ``grid[..., 0]`` the width (x) and ``grid[..., 1]`` the height (y)
    coordinate in ``[-1, 1]``.
    """
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f"unsupported mode '{mode}'")
    if padding_mode not in ("zeros", "border", "reflection"):
        raise ValueError(f"unsupported padding_mode '{padding_mode}'")
    return _grid_sample(jnp.asarray(image), jnp.asarray(grid), mode, padding_mode)


def warp_1d_grid(
    src: jax.Array,
    flow: jax.Array,
    lengths: jax.Array,
    max_length: Optional[int] = None,
    interpolation_order: int = 1,
) -> jax.Array:
    """Grid values warping one dimension: ``src[n] -> src[n] + flow[n]``.

    Parity: reference ``warp_1d_grid`` (``_img.py:268-303``). `max_length`
    must be static under jit.
    """
    src = jnp.asarray(src, jnp.float32)
    flow = jnp.asarray(flow, jnp.float32)
    lengths_arr = jnp.asarray(lengths, jnp.float32)
    N = src.shape[0]
    if max_length is None:
        if isinstance(lengths, jax.core.Tracer):
            raise ValueError("max_length must be static when tracing")
        T = int(math.ceil(np.max(np.asarray(lengths)))) if np.asarray(lengths).size else 0
    else:
        T = int(max_length)
    eps = _F32_EPS
    src = jnp.clip(jnp.minimum(src, lengths_arr - 1), 0, None)
    dst = jnp.clip(jnp.minimum(src + flow, lengths_arr - 1), 0, None)
    src = (2.0 * src + 1.0) / T - 1.0
    dst = (2.0 * dst + 1.0) / T - 1.0
    lowers = jnp.full((N,), 1 / T - 1 - eps, jnp.float32)
    uppers = (2 * lengths_arr - 1) / T - 1.0 + eps
    # the spline's train points are the dst knots; when the warped position
    # clamps onto a boundary the reference's eps offset leaves two knots
    # ~1e-7 apart and the f32 solve is meaningless (cond ~1e7 — its output
    # diverges from the f64 solution by O(1) grid units). A 1e-3 separation
    # floor keeps the system well-conditioned and only moves the knot in
    # that degenerate regime (< T/2000 frames from the boundary).
    sep = 1e-3
    dst = jnp.clip(dst, lowers + sep, jnp.maximum(uppers - sep, lowers + sep))
    src3 = jnp.stack([lowers, src, uppers], 1)  # (N, 3)
    dst3 = jnp.stack([lowers, dst, uppers], 1)
    t = (2.0 * jnp.arange(T, dtype=jnp.float32) + 1.0) / T - 1.0
    grid = polyharmonic_spline(
        dst3[..., None],
        src3[..., None],
        jnp.broadcast_to(t[None], (N, T))[..., None],
        interpolation_order,
    )[..., 0]
    return grid


def dense_image_warp(
    image: jax.Array,
    flow: jax.Array,
    indexing: str = "hw",
    mode: str = "bilinear",
    padding_mode: str = "border",
) -> jax.Array:
    """Warp an image with per-pixel flow: ``out[h, w] = im[h-fh, w-fw]``.

    Parity: reference ``dense_image_warp`` (``_img.py:393-439``) / TF
    ``dense_image_warp`` with NCHW images.
    """
    image = jnp.asarray(image)
    flow = jnp.asarray(flow, jnp.float32)
    N, C, H, W = image.shape
    h = jnp.arange(H, dtype=jnp.float32)
    w = jnp.arange(W, dtype=jnp.float32)
    hg, wg = jnp.meshgrid(h, w, indexing="ij")  # (H, W)
    if indexing == "hw":
        flow = flow[..., ::-1]
    elif indexing != "wh":
        raise ValueError("Invalid indexing! must be one of 'wh' or 'hw'")
    hw = jnp.stack([wg, hg], 2)[None]  # (1, H, W, 2), (x=w, y=h)
    WH = jnp.asarray([W, H], jnp.float32).reshape(1, 1, 1, 2)
    grid = (2 * hw - 2 * flow + 1.0) / WH - 1.0
    return grid_sample(image, grid, mode=mode, padding_mode=padding_mode)


def _pinned_points(k: int, WH: jax.Array) -> jax.Array:
    """4k boundary control points (reference ``_img.py:244-265``)."""
    N = WH.shape[0]
    w_max = jnp.broadcast_to(WH[:, :1] - 1, (N, k + 1))
    h_max = jnp.broadcast_to(WH[:, 1:] - 1, (N, k + 1))
    range_ = jnp.linspace(0.0, 1.0, k + 1)
    w_range = w_max * range_
    h_range = h_max * range_
    zeros = jnp.zeros_like(w_range)
    bottom = jnp.stack([w_range, zeros], 2)
    left = jnp.stack([zeros[:, 1:-1], h_range[:, 1:-1]], 2)
    top = jnp.stack([w_range, h_max], 2)
    right = jnp.stack([w_max[:, 1:-1], h_range[:, 1:-1]], 2)
    return jnp.concatenate([bottom, left, top, right], 1)  # (N, 4k, 2)


def sparse_image_warp(
    image: jax.Array,
    source_points: jax.Array,
    dest_points: jax.Array,
    indexing: str = "hw",
    field_interpolation_order: int = 2,
    field_regularization_weight: float = 0.0,
    field_full_matrix: bool = True,
    pinned_boundary_points: int = 0,
    dense_interpolation_mode: str = "bilinear",
    dense_padding_mode: str = "border",
    include_flow: bool = True,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Warp an image so control points move source -> dest.

    Parity: reference ``sparse_image_warp`` (``_img.py:675-714``) / TF
    ``sparse_image_warp``, including the flow-bypass when `include_flow` is
    False (``_img.py:628-643``).
    """
    image = jnp.asarray(image)
    source_points = jnp.asarray(source_points, jnp.float32)
    dest_points = jnp.asarray(dest_points, jnp.float32)
    if indexing not in ("hw", "wh"):
        raise ValueError("Invalid indexing! must be one of 'wh' or 'hw'")
    if indexing == "hw":
        source_points = source_points[..., ::-1]
        dest_points = dest_points[..., ::-1]
    N, C, H, W = image.shape
    M = source_points.shape[1]
    if not M:
        flow = jnp.zeros((N, H, W, 2), jnp.float32)
        return (image, flow) if include_flow else image
    WH = jnp.broadcast_to(jnp.asarray([W, H], jnp.float32), (N, 2))
    if pinned_boundary_points > 0:
        pinned = _pinned_points(pinned_boundary_points, WH)
        source_points = jnp.concatenate([source_points, pinned], 1)
        dest_points = jnp.concatenate([dest_points, pinned], 1)
    h = jnp.arange(H, dtype=jnp.float32)
    w = jnp.arange(W, dtype=jnp.float32)
    hg, wg = jnp.meshgrid(h, w, indexing="ij")
    query = jnp.stack([wg.ravel(), hg.ravel()], 1)[None]  # (1, H*W, 2)
    query = jnp.broadcast_to(query, (N, H * W, 2))
    if include_flow:
        flow = polyharmonic_spline(
            dest_points, dest_points - source_points, query,
            field_interpolation_order,
            regularization_weight=field_regularization_weight,
            full_matrix=field_full_matrix,
        ).reshape(N, H, W, 2)
        warped = dense_image_warp(
            image, flow, indexing="wh", mode=dense_interpolation_mode,
            padding_mode=dense_padding_mode,
        )
        if indexing == "hw":
            flow = flow[..., ::-1]
        return warped, flow
    # bypass: interpolate grid_sample's grid directly
    train_values = (2.0 * source_points + 1.0) / WH[:, None] - 1.0
    grid = polyharmonic_spline(
        dest_points, train_values, query, field_interpolation_order,
        regularization_weight=field_regularization_weight,
        full_matrix=field_full_matrix,
    ).reshape(N, H, W, 2)
    return grid_sample(
        image, grid, mode=dense_interpolation_mode,
        padding_mode=dense_padding_mode,
    )


def random_shift(
    key: jax.Array,
    input: jax.Array,
    in_lens: jax.Array,
    prop: Tuple[float, float],
    mode: str = "reflect",
    value: float = 0.0,
    training: bool = True,
    out_len: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Pad each sequence left/right by random amounts bounded by `prop`.

    Parity: reference ``random_shift`` (``_img.py:885-908``), with an
    explicit PRNG `key`. `out_len` (static) bounds the padded length under
    jit; when omitted it is computed from concrete draws.
    """
    input = jnp.asarray(input)
    if input.ndim < 2:
        raise RuntimeError("input must be at least 2 dimensional")
    in_lens = jnp.asarray(in_lens)
    if in_lens.ndim != 1 or in_lens.shape[0] != input.shape[0]:
        raise RuntimeError(
            f"For input of shape {input.shape}, expected in_lens to be of "
            f"shape ({input.shape[0]},), got {in_lens.shape}"
        )
    if not training:
        return input, in_lens
    lens_f = in_lens.astype(jnp.float32)
    bound = jnp.stack([prop[0] * lens_f, prop[1] * lens_f])
    pad = (bound * jax.random.uniform(key, bound.shape)).astype(jnp.int32)
    out_lens = in_lens + pad.sum(0)
    if out_len is None:
        if isinstance(out_lens, jax.core.Tracer):
            raise ValueError("out_len must be static when tracing")
        out_len = int(np.max(np.asarray(out_lens)))
    return (
        pad_variable(input, in_lens, pad, mode, value, out_len=int(out_len)),
        out_lens,
    )


def _check_spec_augment_input(feats, lengths):
    if feats.ndim != 3:
        raise RuntimeError(
            f"Expected feats to have three dimensions, got {feats.ndim}"
        )
    N, T, _ = feats.shape
    if lengths is not None:
        if lengths.ndim != 1:
            raise RuntimeError(
                f"Expected lengths to be one dimensional, got {lengths.ndim}"
            )
        if lengths.shape[0] != N:
            raise RuntimeError(
                f"Batch dimension of feats ({N}) and lengths "
                f"({lengths.shape[0]}) do not match"
            )


def _axis_lerp_weights(grid: jax.Array, size: int):
    """Bilinear weights/indices for a 1-D normalized grid with border
    padding, matching ``_grid_sample``'s coordinate math exactly."""
    i = ((grid + 1) * size - 1) / 2
    x0 = jnp.floor(i).astype(jnp.int32)
    w1 = i - x0
    w0 = 1 - w1
    x0c = jnp.clip(x0, 0, size - 1)
    x1c = jnp.clip(x0 + 1, 0, size - 1)
    return x0c, x1c, w0, w1


def _separable_warp(
    feats: jax.Array,
    time_grid: Optional[jax.Array],
    freq_grid: Optional[jax.Array],
) -> jax.Array:
    """Bilinear+border warp of ``(N, T, F)`` feats by independent per-axis
    grids: whole-row gathers along time (HBM-friendly) and an ``(F, F)``
    interpolation matmul along frequency (MXU-friendly).

    bfloat16 feats stay bfloat16 at every kernel boundary (half the HBM
    bytes of the f32 path — the op is bandwidth-bound) while the lerps
    accumulate in f32; interpolation weights round to bf16 in the frequency
    matmul (<= 0.4% relative, documented tolerance of the bf16 path).
    """
    N, T, F = feats.shape
    in_dtype = feats.dtype
    bf16 = in_dtype == jnp.bfloat16
    out = feats
    if time_grid is not None:
        t0, t1, w0, w1 = _axis_lerp_weights(time_grid, T)  # (N, T)
        g0 = jnp.take_along_axis(out, t0[:, :, None], axis=1)
        g1 = jnp.take_along_axis(out, t1[:, :, None], axis=1)
        out = (
            w0[:, :, None] * g0.astype(jnp.float32)
            + w1[:, :, None] * g1.astype(jnp.float32)
        )
        if bf16:
            out = out.astype(in_dtype)
    if freq_grid is not None:
        f0, f1, w0, w1 = _axis_lerp_weights(freq_grid, F)  # (N, F)
        cols = jnp.arange(F, dtype=jnp.int32)
        Wf = w0[:, :, None] * (f0[:, :, None] == cols) + w1[:, :, None] * (
            f1[:, :, None] == cols
        )  # (N, F_out, F_in)
        if bf16:
            # bf16 x bf16 -> f32 is the MXU's native mode
            out = jnp.einsum(
                "nof,ntf->nto",
                Wf.astype(jnp.bfloat16),
                out.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(in_dtype)
        else:
            out = jnp.einsum(
                "nof,ntf->nto", Wf, out, precision=jax.lax.Precision.HIGHEST
            )
    return out


def spec_augment_draw_parameters(
    key: jax.Array,
    feats: jax.Array,
    max_time_warp: float,
    max_freq_warp: float,
    max_time_mask: int,
    max_freq_mask: int,
    max_time_mask_proportion: float,
    num_time_mask: int,
    num_time_mask_proportion: float,
    num_freq_mask: int,
    lengths: Optional[jax.Array] = None,
):
    """Draw the SpecAugment warp/mask parameters ``(w_0, w, v_0, v, t_0, t,
    f_0, f)`` (None for disabled steps).

    Parity: reference ``spec_augment_draw_parameters``
    (``_img.py:1056-1139``): warp positions before shifts, mask widths before
    positions, proportion-capped time masks.
    """
    feats = jnp.asarray(feats)
    _check_spec_augment_input(feats, lengths)
    N, T, F = feats.shape
    if lengths is None:
        lengths = jnp.full((N,), T, jnp.float32)
    else:
        lengths = jnp.asarray(lengths, jnp.float32)
    eps = _F32_EPS
    omeps = 1 - eps
    do_tm = bool(
        max_time_mask
        and max_time_mask_proportion
        and num_time_mask
        and num_time_mask_proportion
    )
    do_fm = bool(max_freq_mask and num_freq_mask)
    # ONE PRNG call for every quantity (each jax.random.uniform is several
    # device kernels; iid uniform columns are distributionally identical to
    # the per-quantity draws)
    cols = (
        (2 if max_time_warp else 0)
        + (2 if max_freq_warp else 0)
        + (2 * num_time_mask if do_tm else 0)
        + (2 * num_freq_mask if do_fm else 0)
    )
    u = jax.random.uniform(key, (N, max(cols, 1)))
    c = 0
    w_0 = w = v_0 = v = t_0 = t = f_0 = f = None
    if max_time_warp:
        Wc = jnp.clip(lengths / 2 - eps, 0, max_time_warp)
        w_0 = u[:, c] * (lengths - 2 * Wc) + Wc
        w = u[:, c + 1] * (2 * Wc) - Wc
        c += 2
    if max_freq_warp:
        V = min(max(F / 2 - eps, 0), max_freq_warp)
        v_0 = u[:, c] * (F - 2 * V) + V
        v = u[:, c + 1] * (2 * V) - V
        c += 2
    if do_tm:
        max_ = jnp.floor(
            jnp.clip(lengths * max_time_mask_proportion, None, max_time_mask)
        )
        nums_ = jnp.floor(
            jnp.clip(lengths * num_time_mask_proportion, None, num_time_mask)
        )
        t = (
            u[:, c : c + num_time_mask] * (max_ + omeps)[:, None]
        ).astype(jnp.int32)
        t = jnp.where(
            nums_[:, None] <= jnp.arange(num_time_mask, dtype=jnp.float32)[None],
            0,
            t,
        )
        t_0 = (
            u[:, c + num_time_mask : c + 2 * num_time_mask]
            * (lengths[:, None] - t + omeps)
        ).astype(jnp.int32)
        c += 2 * num_time_mask
    if do_fm:
        max_ = min(max_freq_mask, F)
        f = (u[:, c : c + num_freq_mask] * (max_ + omeps)).astype(jnp.int32)
        f_0 = (
            u[:, c + num_freq_mask : c + 2 * num_freq_mask] * (F - f + omeps)
        ).astype(jnp.int32)
    return w_0, w, v_0, v, t_0, t, f_0, f


def spec_augment_apply_parameters(
    feats: jax.Array,
    params,
    interpolation_order: int = 1,
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """Apply drawn SpecAugment parameters: warp then mask.

    Parity: reference ``spec_augment_apply_parameters``
    (``_img.py:1142-1211``). Disabled steps may be None or empty arrays.
    """
    feats = jnp.asarray(feats)
    _check_spec_augment_input(feats, lengths)
    N, T, F = feats.shape
    if lengths is None:
        lengths = jnp.full((N,), T, jnp.float32)
    else:
        lengths = jnp.asarray(lengths, jnp.float32)
    w_0, w, v_0, v, t_0, t, f_0, f = (
        None if p is None or (hasattr(p, "size") and p.size == 0) else jnp.asarray(p)
        for p in params
    )
    new_feats = feats
    time_grid = freq_grid = None
    if w_0 is not None and w is not None:
        time_grid = warp_1d_grid(w_0, w, lengths, T, interpolation_order)
    if v_0 is not None and v is not None:
        freq_grid = warp_1d_grid(
            v_0, v, jnp.full((N,), F, jnp.float32), F, interpolation_order
        )
    # fused Pallas path: time warp + both masks in one kernel pass (one HBM
    # read/write) when there's no frequency warp (the park2020 default)
    use_kernel = False
    if config.USE_PALLAS and freq_grid is None and T % 8 == 0:
        vmem_bytes = 4 * (T * T + 3 * T * F)
        if vmem_bytes <= 12 * 2**20:
            from .pallas import tpu_available

            use_kernel = tpu_available()
    if use_kernel:
        from .pallas import spec_augment_apply_kernel

        if time_grid is not None:
            t0i, t1i, tw0, tw1 = _axis_lerp_weights(time_grid, T)
        else:
            ident = jnp.broadcast_to(
                jnp.arange(T, dtype=jnp.int32)[None], (N, T)
            )
            t0i = t1i = ident
            tw0 = jnp.ones((N, T), jnp.float32)
            tw1 = jnp.zeros((N, T), jnp.float32)
        tmask_v = jnp.zeros((N, T), jnp.float32)
        if t_0 is not None and t is not None:
            tr = jnp.arange(T)[None, :, None]
            tmask_v = (
                ((tr >= t_0[:, None]) & (tr < (t_0 + t)[:, None]))
                .any(2)
                .astype(jnp.float32)
            )
        fmask_v = jnp.zeros((N, F), jnp.float32)
        if f_0 is not None and f is not None:
            fr = jnp.arange(F)[None, :, None]
            fmask_v = (
                ((fr >= f_0[:, None]) & (fr < (f_0 + f)[:, None]))
                .any(2)
                .astype(jnp.float32)
            )
        return spec_augment_apply_kernel(
            new_feats, t0i, t1i, tw0, tw1, tmask_v, fmask_v
        ).astype(feats.dtype)
    if time_grid is not None or freq_grid is not None:
        # SpecAugment's warp grids are separable (per-axis 1-D grids), so the
        # 2-D grid_sample (pointwise gathers, slow on TPU) reduces to a row
        # gather over time and a small (F, F) interpolation matmul over
        # frequency -- numerically identical to bilinear+border grid_sample
        new_feats = _separable_warp(new_feats, time_grid, freq_grid)
    tmask = fmask = None
    if t_0 is not None and t is not None:
        tr = jnp.arange(T)[None, :, None]  # (1, T, 1)
        t_1 = t_0 + t
        tmask = ((tr >= t_0[:, None]) & (tr < t_1[:, None])).any(2)[..., None]
    if f_0 is not None and f is not None:
        fr = jnp.arange(F)[None, :, None]
        f_1 = f_0 + f
        fmask = ((fr >= f_0[:, None]) & (fr < f_1[:, None])).any(2)[:, None, :]
    if tmask is not None or fmask is not None:
        mask = None
        if tmask is not None:
            mask = jnp.broadcast_to(tmask, (N, T, F))
        if fmask is not None:
            fm = jnp.broadcast_to(fmask, (N, T, F))
            mask = fm if mask is None else (mask | fm)
        new_feats = jnp.where(mask, jnp.asarray(0.0, new_feats.dtype), new_feats)
    return new_feats


def spec_augment(
    key: jax.Array,
    feats: jax.Array,
    max_time_warp: float = 80.0,
    max_freq_warp: float = 0.0,
    max_time_mask: int = 100,
    max_freq_mask: int = 27,
    max_time_mask_proportion: float = 0.04,
    num_time_mask: int = 20,
    num_time_mask_proportion: float = 0.04,
    num_freq_mask: int = 2,
    interpolation_order: int = 1,
    lengths: Optional[jax.Array] = None,
    training: bool = True,
) -> jax.Array:
    """SpecAugment: random time/freq warping and masking of filterbank feats.

    Defaults follow park2020 (as the reference's ``SpecAugment`` module,
    ``_img.py:1248-1536``). Parity: reference ``spec_augment``
    (``_img.py:1216-1245``), with an explicit PRNG `key`.
    """
    feats = jnp.asarray(feats)
    _check_spec_augment_input(feats, lengths)
    if not training:
        return feats
    params = spec_augment_draw_parameters(
        key, feats, max_time_warp, max_freq_warp, max_time_mask, max_freq_mask,
        max_time_mask_proportion, num_time_mask, num_time_mask_proportion,
        num_freq_mask, lengths,
    )
    return spec_augment_apply_parameters(
        feats, params, interpolation_order, lengths
    )
