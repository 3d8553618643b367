"""Attention parity tests vs the reference (weights copied across)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydrobert_tpu.ops.attn import (
    ConcatSoftAttention,
    DotProductSoftAttention,
    GeneralizedDotProductSoftAttention,
    MultiHeadedAttention,
)


@pytest.fixture(scope="session")
def ref_attn(ref_torch):
    import pydrobert.torch._attn as mod

    return mod


def _rand(*shape):
    return np.random.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("dim", [0, 1])
def test_dot_product_matches_reference(ref_attn, seeded, dim, jit_fn):
    import torch

    T, B, size = 8, 5, 6
    query = _rand(B, size)
    key = _rand(T, B, size) if dim == 0 else _rand(B, T, size)
    value = key.copy()
    lens = np.random.randint(1, T + 1, (B,))
    if dim == 0:
        mask = (np.arange(T)[:, None] < lens).astype(bool)
    else:
        mask = (np.arange(T)[None, :] < lens[:, None]).astype(bool)

    ref = ref_attn.DotProductSoftAttention(size, dim, scale_factor=0.5)
    exp = ref(
        torch.as_tensor(query), torch.as_tensor(key), torch.as_tensor(value),
        torch.as_tensor(mask),
    ).numpy()
    ours = DotProductSoftAttention(size=size, dim=dim, scale_factor=0.5)
    fn = jit_fn(lambda q, k, v, m: ours.apply({}, q, k, v, m))
    act = np.asarray(fn(query, key, value, mask))
    np.testing.assert_allclose(act, exp, atol=1e-5)
    # no-mask path
    exp = ref(
        torch.as_tensor(query), torch.as_tensor(key), torch.as_tensor(value)
    ).numpy()
    act = np.asarray(ours.apply({}, query, key, value))
    np.testing.assert_allclose(act, exp, atol=1e-5)


def test_generalized_dot_product_matches_reference(ref_attn, seeded):
    import torch

    T, B, qs, ks = 7, 4, 5, 3
    query, key, value = _rand(B, qs), _rand(T, B, ks), _rand(T, B, 2)
    ref = ref_attn.GeneralizedDotProductSoftAttention(qs, ks, bias=True)
    exp = ref(
        torch.as_tensor(query), torch.as_tensor(key), torch.as_tensor(value)
    ).detach().numpy()
    ours = GeneralizedDotProductSoftAttention(
        query_size=qs, key_size=ks, use_bias=True
    )
    params = {
        "params": {
            "linear": {
                "kernel": ref.weight.detach().numpy().T,
                "bias": ref.bias.detach().numpy(),
            }
        }
    }
    act = np.asarray(ours.apply(params, query, key, value))
    np.testing.assert_allclose(act, exp, atol=1e-5)


def test_concat_matches_reference(ref_attn, seeded):
    import torch

    T, B, qs, ks, hidden = 6, 3, 4, 5, 11
    query, key, value = _rand(B, qs), _rand(T, B, ks), _rand(T, B, ks)
    ref = ref_attn.ConcatSoftAttention(qs, ks, bias=True, hidden_size=hidden)
    exp = ref(
        torch.as_tensor(query), torch.as_tensor(key), torch.as_tensor(value)
    ).detach().numpy()
    ours = ConcatSoftAttention(
        query_size=qs, key_size=ks, use_bias=True, hidden_size=hidden
    )
    params = {
        "params": {
            "linear": {
                "kernel": ref.weight.detach().numpy().T,
                "bias": ref.bias.detach().numpy(),
            },
            "v": ref.v.detach().numpy(),
        }
    }
    act = np.asarray(ours.apply(params, query, key, value))
    np.testing.assert_allclose(act, exp, atol=1e-5)


def test_multi_headed_matches_reference(ref_attn, seeded, jit_fn):
    import torch

    T, B, qs, ks, vs, nh = 9, 4, 8, 6, 10, 2
    query, key, value = _rand(B, qs), _rand(T, B, ks), _rand(T, B, vs)
    lens = np.random.randint(1, T + 1, (B,))
    mask = (np.arange(T)[:, None] < lens).astype(bool)
    ref_single = ref_attn.DotProductSoftAttention(3, 0, scale_factor=1 / 3)
    # all biases on: the reference's init assigns bias_WK/bias_WV from
    # bias_WQ (copy-paste bug, _attn.py:577-578), so mixed flags can't be
    # compared against it
    ref = ref_attn.MultiHeadedAttention(
        qs, ks, vs, nh, ref_single, out_size=7, d_v=4,
        bias_WQ=True, bias_WK=True, bias_WV=True, bias_WC=True,
    )
    # NOTE: comparison is unmasked. The reference's MHA inserts the mask's
    # head axis at -2 (_attn.py:651), which contradicts its own documented
    # broadcast contract (head axis appended after C*) and fails on the
    # basic (T, B) mask; its tests never exercise MHA with a mask. We follow
    # the documented contract (trailing head axis) and verify the masked
    # path against a manual oracle below.
    exp = ref(
        torch.as_tensor(query), torch.as_tensor(key), torch.as_tensor(value)
    ).detach().numpy()
    ours = MultiHeadedAttention(
        query_size=qs,
        key_size=ks,
        value_size=vs,
        num_heads=nh,
        single_head_attention=DotProductSoftAttention(
            size=3, scale_factor=1 / 3
        ),
        out_size=7,
        d_v=4,
        bias_WQ=True,
        bias_WK=True,
        bias_WV=True,
        bias_WC=True,
    )

    def lin(mod, has_bias):
        d = {"kernel": mod.weight.detach().numpy().T}
        if has_bias:
            d["bias"] = mod.bias.detach().numpy()
        return d

    params = {
        "params": {
            "WQ": lin(ref.WQ, True),
            "WK": lin(ref.WK, True),
            "WV": lin(ref.WV, True),
            "WC": lin(ref.WC, True),
        }
    }
    fn = jit_fn(lambda q, k, v: ours.apply(params, q, k, v))
    act = np.asarray(fn(query, key, value))
    np.testing.assert_allclose(act, exp, atol=1e-5)

    # masked path vs manual per-head oracle
    act_m = np.asarray(ours.apply(params, query, key, value, mask))
    WQ, WK = params["params"]["WQ"], params["params"]["WK"]
    WV, WC = params["params"]["WV"], params["params"]["WC"]
    qh = (query @ WQ["kernel"] + WQ["bias"]).reshape(B, nh, 3)
    kh = (key @ WK["kernel"] + WK["bias"]).reshape(T, B, nh, 3)
    vh = (value @ WV["kernel"] + WV["bias"]).reshape(T, B, nh, 4)
    e = (qh[None] * kh).sum(-1) / 3  # (T, B, nh)
    e = np.where(mask[..., None], e, -np.inf)
    a = np.exp(e - e.max(0)) / np.exp(e - e.max(0)).sum(0)
    cat = (a[..., None] * vh).sum(0).reshape(B, nh * 4)
    exp_m = cat @ WC["kernel"] + WC["bias"]
    np.testing.assert_allclose(act_m, exp_m, atol=1e-5)


def test_attention_input_checks(seeded):
    ours = DotProductSoftAttention(size=4)
    q, k, v = _rand(3, 4), _rand(5, 3, 4), _rand(5, 3, 4)
    with pytest.raises(ValueError):
        ours.apply({}, _rand(3, 5), k, v)  # bad query size
    with pytest.raises(ValueError):
        ours.apply({}, _rand(2, 3, 4), k, v)  # bad rank
    bad_dim = DotProductSoftAttention(size=4, dim=2)
    with pytest.raises(ValueError):
        bad_dim.apply({}, q, k, v)
