"""Hand-written Pallas TPU kernels for hot paths.

Gated by :obj:`pydrobert_tpu.config.USE_PALLAS` and only engaged on TPU
backends; every kernel has an identical pure-XLA fallback (the default
implementation in its op module) and a parity test.

Current kernels:

- :func:`edit_distance_kernel`: the batched Levenshtein DP
  (``ops/string._string_matching_core``'s distance-only path) as a single
  kernel. The DP row stays resident in VMEM across all hypothesis steps —
  one HBM read of ref/hyp per batch tile and one scalar write per lane,
  instead of a ``lax.scan`` materializing ``(R+1, N)`` carries through HBM
  every step. The in-row deletion relaxation uses a log-step doubling
  min-plus scan.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["edit_distance_kernel", "tpu_available"]

_INF = float(np.finfo(np.float32).max / 2)


def tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _ed_kernel(
    ref_ref,
    hyp_ref,
    ref_lens_ref,
    hyp_lens_ref,
    out_ref,
    row_scratch,
    *,
    ins_cost: float,
    del_cost: float,
    sub_cost: float,
    num_steps: int,
    off: int,
    R: int,
):
    TILE = ref_ref.shape[1]
    RP1 = row_scratch.shape[0]  # R + 1 rounded up to the sublane tile
    rrange = jax.lax.broadcasted_iota(jnp.int32, (RP1, TILE), 0).astype(
        jnp.float32
    )
    row_scratch[:] = rrange * del_cost
    ref = ref_ref[:]  # (RP1 - 1, TILE); rows past R are padding and only
    # ever influence rows above ref_lens (deletion/insertion flow downward)
    ref_lens = ref_lens_ref[0, :]  # (TILE,)
    hyp_lens = hyp_lens_ref[0, :]

    def step(t, _):
        row = row_scratch[:]
        hyp_tok = hyp_ref[pl.ds(t - 1, 1), :]  # (1, TILE)
        ins_mask = (hyp_lens >= t).astype(jnp.float32)[None]  # (1, TILE)
        not_done = ((t - off) < hyp_lens)[None]  # (1, TILE)
        neq = (ref != hyp_tok).astype(jnp.float32)
        up = row + ins_cost * ins_mask
        sub = row[:-1] + sub_cost * neq  # (R, TILE)
        new = jnp.concatenate([up[:1], jnp.minimum(up[1:], sub)], 0)
        # deletion relaxation: cummin of (new - i*del) via doubling
        u = new - rrange * del_cost
        k = 1
        while k < R + 1:
            shifted = jnp.concatenate([jnp.full((k, TILE), _INF), u[:-k]], 0)
            u = jnp.minimum(u, shifted)
            k *= 2
        new = u + rrange * del_cost
        row_scratch[:] = jnp.where(not_done, new, row)
        return 0

    jax.lax.fori_loop(1, num_steps + 1, step, 0)
    row = row_scratch[:]
    sel = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (RP1, TILE), 0)
        == ref_lens[None].astype(jnp.int32),
        row,
        _INF,
    )
    out_ref[0, :] = sel.min(0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ins_cost", "del_cost", "sub_cost", "exclude_last", "interpret",
    ),
)
def edit_distance_kernel(
    ref: jax.Array,
    hyp: jax.Array,
    ref_lens: jax.Array,
    hyp_lens: jax.Array,
    ins_cost: float,
    del_cost: float,
    sub_cost: float,
    exclude_last: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Batched Levenshtein distances ``(N,)`` from time-major ``ref (R, N)``
    / ``hyp (H, N)`` with per-sequence lengths. Matches the distance-only
    path of ``ops.string._string_matching_core`` exactly."""
    R, N = ref.shape
    H = hyp.shape[0]
    off = 0 if exclude_last else 1
    num_steps = H + off - 1
    TILE = 128
    RP1 = -(-(R + 1) // 8) * 8  # sublane-aligned row count
    pad_r = RP1 - 1 - R
    if pad_r:
        ref = jnp.pad(ref, ((0, pad_r), (0, 0)))
    pad_n = (-N) % TILE
    if pad_n:
        ref = jnp.pad(ref, ((0, 0), (0, pad_n)))
        hyp = jnp.pad(hyp, ((0, 0), (0, pad_n)))
        ref_lens = jnp.pad(ref_lens, (0, pad_n))
        hyp_lens = jnp.pad(hyp_lens, (0, pad_n))
    NP = N + pad_n
    grid = (NP // TILE,)
    kernel = functools.partial(
        _ed_kernel,
        ins_cost=float(ins_cost),
        del_cost=float(del_cost),
        sub_cost=float(sub_cost),
        num_steps=int(num_steps),
        off=off,
        R=int(R),
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (RP1 - 1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (max(H, 1), TILE), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, NP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RP1, TILE), jnp.float32)],
        interpret=interpret,
    )(
        ref.astype(jnp.int32),
        (hyp if H else jnp.zeros((1, NP), jnp.int32)).astype(jnp.int32),
        ref_lens[None].astype(jnp.int32),
        hyp_lens[None].astype(jnp.int32),
    )
    return out[0, :N]


def _sa_kernel(x_ref, t0_ref, t1_ref, w0_ref, w1_ref, tm_ref, fm_ref, o_ref):
    """Fused SpecAugment apply for one utterance: time-warp as an in-VMEM
    one-hot interpolation matmul (MXU) + time/freq zero-masks, one HBM read
    and one write of the feature block."""
    _, T, F = x_ref.shape
    s_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    t0 = t0_ref[0, 0, :]  # (T,)
    t1 = t1_ref[0, 0, :]
    w0 = w0_ref[0, 0, :]
    w1 = w1_ref[0, 0, :]
    W = w0[:, None] * (s_ids == t0[:, None]) + w1[:, None] * (
        s_ids == t1[:, None]
    )
    warped = jax.lax.dot(
        W, x_ref[0],
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    keep = (1.0 - tm_ref[0, 0, :])[:, None] * (1.0 - fm_ref[0, 0, :])[None, :]
    o_ref[0] = warped * keep


@functools.partial(jax.jit, static_argnames=("interpret",))
def spec_augment_apply_kernel(
    feats: jax.Array,
    t0: jax.Array,
    t1: jax.Array,
    w0: jax.Array,
    w1: jax.Array,
    tmask: jax.Array,
    fmask: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused SpecAugment apply: ``out[n, t] = keep[n, t] * (w0[n, t] *
    feats[n, t0[n, t]] + w1[n, t] * feats[n, t1[n, t]])`` with time/freq
    masks, one kernel launch per batch (grid over N)."""
    N, T, F = feats.shape
    out = pl.pallas_call(
        _sa_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, T, F), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, F), lambda n: (n, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, T, F), jnp.float32),
        interpret=interpret,
    )(
        feats.astype(jnp.float32),
        t0.astype(jnp.int32)[:, None],
        t1.astype(jnp.int32)[:, None],
        w0.astype(jnp.float32)[:, None],
        w1.astype(jnp.float32)[:, None],
        tmask.astype(jnp.float32)[:, None],
        fmask.astype(jnp.float32)[:, None],
    )
    return out
