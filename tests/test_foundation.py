import numpy as np
import pytest

from pydrobert_tpu import argcheck, config
from pydrobert_tpu.utils import serial


def test_config_constants():
    assert config.INDEX_PAD_VALUE == -100
    assert config.DEFT_FEAT_SUBDIR == "feat"
    assert np.isclose(np.exp(config.EPS_NINF), 0, atol=1e-15)
    assert np.isclose(np.exp(config.EPS_0), 1, atol=1e-6)
    assert np.exp(config.EPS_INF) > 1e18


def test_argcheck_basic():
    assert argcheck.is_posi(3, "x") == 3
    with pytest.raises(ValueError):
        argcheck.is_posi(0, "x")
    with pytest.raises(ValueError):
        argcheck.is_int(1.5, "x")
    assert argcheck.is_float(2, "x") == 2.0
    assert argcheck.is_bool(True, "b") is True
    with pytest.raises(ValueError):
        argcheck.is_bool(1, "b")
    assert argcheck.is_closed01(0.5, name="p") == 0.5
    with pytest.raises(ValueError):
        argcheck.is_open01(1.0, name="p")
    assert argcheck.is_in("a", ["a", "b"], "x") == "a"
    with pytest.raises(ValueError):
        argcheck.is_in("c", ["a", "b"], "x")
    assert argcheck.is_nat(None, "x", allow_none=True) is None
    arr = np.arange(5)
    assert argcheck.is_nonnegt(arr, "arr") is arr
    with pytest.raises(ValueError):
        argcheck.is_post(arr, "arr")
    assert argcheck.has_ndim(arr, 1, "arr") is arr
    with pytest.raises(ValueError):
        argcheck.has_ndim(arr, 2, "arr")
    assert argcheck.as_posi("4") == 4
    with pytest.raises(ValueError):
        argcheck.as_posi("-4")
    assert argcheck.is_token("hello") == "hello"
    with pytest.raises(ValueError):
        argcheck.is_token("he llo")


@pytest.mark.parametrize(
    "dtype", ["float32", "float64", "int64", "int32", "uint8", "bool"]
)
@pytest.mark.parametrize("shape", [(), (4,), (3, 5), (2, 3, 4)])
def test_serial_roundtrip(tmp_path, dtype, shape):
    arr = np.asarray(np.random.rand(*shape) * 10).astype(dtype)
    p = tmp_path / "x.pt"
    serial.save_tensor(arr, p)
    out = serial.load_tensor(p)
    assert out.dtype == arr.dtype
    assert out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_serial_pure_python_matches_torch(tmp_path):
    torch = pytest.importorskip("torch")
    arr = np.random.randn(7, 3).astype(np.float32)
    # pure writer -> torch reader
    serial._save_pure(arr, tmp_path / "pure.pt")
    t = torch.load(tmp_path / "pure.pt", weights_only=True)
    np.testing.assert_array_equal(t.numpy(), arr)
    # torch writer -> pure reader
    torch.save(torch.from_numpy(arr), tmp_path / "t.pt")
    out = serial._load_pure(tmp_path / "t.pt")
    np.testing.assert_array_equal(out, arr)
    # non-contiguous torch tensor
    torch.save(torch.from_numpy(arr).t(), tmp_path / "t2.pt")
    out = serial._load_pure(tmp_path / "t2.pt")
    np.testing.assert_array_equal(out, arr.T)


def test_pytree_utils():
    import jax.numpy as jnp

    from pydrobert_tpu.utils import extract_by_src, lengths_to_mask, mix_by_mask

    state = {"a": jnp.arange(12).reshape(4, 3), "b": jnp.arange(4.0)}
    src = jnp.array([2, 2, 0])
    out = extract_by_src(state, src)
    np.testing.assert_array_equal(out["a"][0], state["a"][2])
    np.testing.assert_array_equal(out["b"], [2.0, 2.0, 0.0])

    t = {"a": jnp.ones((3, 2)), "b": jnp.zeros((3,))}
    f = {"a": jnp.zeros((3, 2)), "b": jnp.ones((3,))}
    mask = jnp.array([True, False, True])
    mixed = mix_by_mask(t, f, mask)
    np.testing.assert_array_equal(mixed["a"][:, 0], [1, 0, 1])
    np.testing.assert_array_equal(mixed["b"], [0, 1, 0])

    m = lengths_to_mask(jnp.array([1, 3]), 4)
    np.testing.assert_array_equal(
        m, [[True, False, False, False], [True, True, True, False]]
    )


def test_eight_virtual_devices():
    import jax

    assert len(jax.devices()) == 8


def test_binomial_coefficient_exact_beyond_int32():
    """Exact counts survive x64-disabled mode (host-side int64; the
    reference guarantees exactness to length 66)."""
    from pydrobert_tpu.ops.combinatorics import binomial_coefficient

    assert int(binomial_coefficient(np.asarray(40), np.asarray(20))) == 137846528820
    assert int(binomial_coefficient(np.asarray(66), np.asarray(33))) == 7219428434016265740
    assert int(binomial_coefficient(np.asarray(10), np.asarray(3))) == 120


def test_save_tensor_scalar_round_trip(tmp_path):
    from pydrobert_tpu.utils.serial import _load_pure, _save_pure

    p = str(tmp_path / "s.pt")
    _save_pure(np.array(3.5), p)
    out = _load_pure(p)
    assert out.shape == () and float(out) == 3.5


def test_module_wrappers_bind_call_args_correctly():
    """Wrapper modules bind call-time positionals to the functional's
    NON-config parameters (the functionals interleave config between data
    arguments), and init rejects duplicate/excess positionals."""
    import jax
    import jax.numpy as jnp

    from pydrobert_tpu import modules as M

    key = jax.random.PRNGKey(0)
    feats = jnp.asarray(np.random.randn(3, 16, 5), np.float32)
    lengths = jnp.asarray([16.0, 12.0, 8.0])
    out = M.SpecAugment()(key, feats, lengths)
    assert out.shape == feats.shape
    toks = jnp.asarray([[1, 0, 2], [2, 2, 0]]).T
    val = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]).T
    out = M.FillAfterEndOfSequence(eos=0)(toks, val)
    np.testing.assert_allclose(np.asarray(out)[:, 0], [1.0, 2.0, 0.0])
    x = jnp.asarray(np.random.randn(2, 10, 3), np.float32)
    shifted, out_lens = M.RandomShift(prop=(0.1, 0.1))(
        key, x, jnp.asarray([10, 8]), False
    )
    np.testing.assert_array_equal(np.asarray(out_lens), [10, 8])  # eval mode
    with pytest.raises(TypeError):
        M.EditDistance(1, eos=2)
    with pytest.raises(TypeError):
        M.FillAfterEndOfSequence(0, 1, 2, 99, 100)
    assert M.EditDistance().eos is None  # functional default exposed


def test_argcheck_reference_positional_forms():
    from pydrobert_tpu import argcheck

    assert argcheck.is_open01(0.5, "p") == 0.5
    with pytest.raises(ValueError):
        argcheck.is_closed01(1.5, "p")
    assert argcheck.is_exactly(None, None, "x") is None
    with pytest.raises(ValueError):
        argcheck.is_exactly(5, None, "x")


def test_host_keyed_compile_cache(tmp_path):
    # cross-host XLA:CPU AOT reuse SIGILLs; the cache dir must be host-keyed
    from pydrobert_tpu.utils.cache import (
        compilation_cache_dir,
        host_fingerprint,
    )

    fp = host_fingerprint()
    assert fp and fp == host_fingerprint()  # stable
    d = compilation_cache_dir(str(tmp_path / "jax"))
    assert d.endswith(fp) and str(tmp_path) in d


def test_profile_program_reports_loop_and_timing():
    """utils.profiling.profile_program: the bench methodology as a library
    API — amortized per-call seconds, sync overhead, XLA cost analysis,
    and hottest-loop kernel counts."""
    import jax
    import jax.numpy as jnp

    from pydrobert_tpu.utils.profiling import (
        measure_sync_overhead, profile_program,
    )

    def f(x):
        def step(c, _):
            return c * 1.0001 + 1.0, None
        out, _ = jax.lax.scan(step, x, None, length=23)
        return out

    stats = profile_program(f, jnp.ones((16,)), calls=2, reps=2)
    assert stats["seconds_per_call"] > 0
    assert stats["loop_trip_count"] == 23
    assert stats["loop_kernels"] >= 1
    assert stats["flops"] >= 0
    assert "us_per_kernel" in stats
    assert measure_sync_overhead(reps=3) > 0
