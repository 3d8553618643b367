"""Exact top-k via a stable variadic sort.

``jax.lax.top_k`` is the semantic reference here (descending values, ties
broken lowest-index-first — the semantics the searches' candidate
selection is specified and tested against, reference
``_decoding.py:869-884``), but XLA's dedicated TopK lowering on TPU is
measurably SLOWER than a plain stable variadic sort plus a static slice
for the decode prologues' shapes. Measured on the dev chip for the
headline decode prologue — top-32 of (T=500, N=32, V=1024) f32, medians
of 5 device-synced reps in one tunnel phase:

===================  ========
formulation          time
===================  ========
``lax.top_k``        51.7 ms
chunked two-level    48.8 ms
``argsort`` + slice  38.5 ms
stable sort + slice  32.8 ms
===================  ========

That prologue is the single largest component of the no-LM decode
benchmark (~60% of end-to-end time), so the searches use this form for
their hoisted whole-(T, N, V) top-M calls. Tie behavior is identical to
``lax.top_k``: a stable sort on the negated values keeps equal values in
ascending-index order, which is exactly lowest-index-first. The small
per-step top-k calls inside decode loop bodies keep ``lax.top_k`` — at
(N, W*S) candidate sizes the dedicated lowering is one fused kernel and
the sort's extra ops would add per-step dispatches.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["exact_top_k"]


def exact_top_k(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exactly ``jax.lax.top_k(x, k)``, lowered as a stable sort + slice.

    ``x`` may have any rank; the reduction runs over the trailing axis.
    Returns ``(values, indices)`` with ``lax.top_k``'s ordering and tie
    semantics (descending values; equal values lowest-index-first).

    The sort key is the float's sign-flipped integer bit pattern rather
    than the negated float: TopK orders by the IEEE *total order* (so
    ``+0.0`` outranks ``-0.0``) while a float sort compares ``-0.0 ==
    +0.0`` and would shuffle them into index order. The bitcast key makes
    distinct bit patterns distinct keys, bitwise-NOT reverses it for
    descending order, and the stable sort keeps true ties (identical bit
    patterns) lowest-index-first. The key map is a bijection, so the f32
    values come back by inverting it on the sliced ``(..., k)`` output —
    no third sort payload and no second full-width pass over ``x``.
    """
    if x.dtype != jnp.float32:  # the bit trick below is 32-bit-float-only
        return jax.lax.top_k(x, k)
    top = jnp.uint32(0x80000000)
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    # ascending total-order key, then ~ for descending
    dkey = ~jnp.where(u >= top, ~u, u | top)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    skey, idx = jax.lax.sort(
        (dkey, iota), dimension=x.ndim - 1, num_keys=1, is_stable=True
    )
    asc = ~skey[..., :k]
    vals = jax.lax.bitcast_convert_type(
        jnp.where(asc >= top, asc ^ top, ~asc), jnp.float32
    )
    return vals, idx[..., :k]


def kernel_top_m_ok(dtype, row_lanes: int, k: int) -> bool:
    """The ONE gate for routing hoisted top-M work through the Pallas
    selection kernels (:func:`hoisted_top_k` and the fused decode prologue
    both use it, so they can never route differently for the same inputs):
    float32/bfloat16 rows wide enough to be bandwidth-bound (bf16 streams
    half the bytes and upcasts exactly in VMEM), small enough ``k`` that
    the unrolled selection rounds stay cheap, VMEM-fitting tiles, and a
    per-device calibration verdict (``config.USE_PALLAS_TOPM``; always
    False off-TPU)."""
    from .pallas import top_m_vmem_ok, topm_kernel_preferred

    return (
        dtype in (jnp.float32, jnp.bfloat16)
        and row_lanes >= 256
        and 0 < k <= 64
        and top_m_vmem_ok(row_lanes)
        and topm_kernel_preferred()
    )


def hoisted_top_k(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """:func:`exact_top_k`, routed through the Pallas selection kernel when
    :func:`kernel_top_m_ok` says so. For the decode prologues' hoisted
    whole-``(T, N, V)`` calls. Identical values/indices/ties either way.
    """
    from .pallas import top_m_pallas

    if k <= x.shape[-1] and kernel_top_m_ok(x.dtype, x.shape[-1], k):
        return top_m_pallas(x, k)
    return exact_top_k(x, k)


__all__ += ["hoisted_top_k", "kernel_top_m_ok"]
