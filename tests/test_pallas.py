"""Pallas kernel parity tests (run on TPU; skipped on CPU hosts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydrobert_tpu.ops.pallas import edit_distance_kernel, tpu_available

pytestmark = pytest.mark.skipif(
    not tpu_available(), reason="pallas kernels require a TPU backend"
)


def _lev(r, h, ic, dc, sc):
    row = [i * dc for i in range(len(r) + 1)]
    for tok in h:
        new = [row[0] + ic]
        for i, rt in enumerate(r):
            new.append(
                min(
                    row[i + 1] + ic,
                    row[i] + (sc if rt != tok else 0),
                    new[i] + dc,
                )
            )
        row = new
    return row[len(r)]


@pytest.mark.parametrize("costs", [(1.0, 1.0, 1.0), (3.0, 3.0, 4.0)])
@pytest.mark.parametrize("shape", [(11, 13, 50), (40, 3, 200), (1, 1, 1)])
def test_edit_distance_kernel_matches_oracle(seeded, costs, shape):
    R, H, N = shape
    ref = jnp.asarray(np.random.randint(0, 5, (R, N)), jnp.int32)
    hyp = jnp.asarray(np.random.randint(0, 5, (H, N)), jnp.int32)
    ref_lens = jnp.asarray(np.random.randint(0, R + 1, (N,)), jnp.int32)
    hyp_lens = jnp.asarray(np.random.randint(0, H + 1, (N,)), jnp.int32)
    out = edit_distance_kernel(ref, hyp, ref_lens, hyp_lens, *costs)
    exp = [
        _lev(
            list(np.asarray(ref)[: ref_lens[n], n]),
            list(np.asarray(hyp)[: hyp_lens[n], n]),
            *costs,
        )
        for n in range(N)
    ]
    np.testing.assert_allclose(np.asarray(out), exp)


def test_public_error_rate_uses_kernel_and_matches(seeded, monkeypatch):
    """The gated public path on TPU equals the pure-XLA fallback."""
    from pydrobert_tpu import config
    from pydrobert_tpu.ops.string import error_rate

    ref = jnp.asarray(np.random.randint(0, 8, (20, 33)), jnp.int32)
    hyp = jnp.asarray(np.random.randint(0, 8, (24, 33)), jnp.int32)
    fast = error_rate(ref, hyp, norm=True)
    monkeypatch.setattr(config, "USE_PALLAS", False)
    slow = error_rate(ref, hyp, norm=True)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-6)
