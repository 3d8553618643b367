"""AOT serving artifacts (pydrobert_tpu.export): exported StableHLO
modules must reload without model code and reproduce the live decode.

The reference's analogue is TorchScript save/load (its jit matrix,
reference ``_compat.py:185-193``); here the contract is jax.export round
trips: same hypotheses, shape-specialization dispatch, and zero-pad
dispatch to larger specializations.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydrobert_tpu.export import (
    ServingArtifact,
    export_ctc_recognizer,
    export_transducer_recognizer,
    flatten_arrays,
    unflatten_arrays,
)
from pydrobert_tpu.models import ConformerConfig, ConformerCTC
from pydrobert_tpu.models.transducer import (
    ConformerTransducer,
    TransducerConfig,
)

_CTC_CFG = ConformerConfig(
    vocab_size=16, num_filts=8, d_model=16, num_layers=2, num_heads=2,
    subsample_channels=4, conv_kernel=5, dropout=0.0, dtype=jnp.float32,
)
_RNNT_CFG = TransducerConfig(
    encoder=ConformerConfig(
        vocab_size=16, num_filts=8, d_model=16, num_layers=1, num_heads=2,
        subsample_channels=4, conv_kernel=5, dropout=0.0, dtype=jnp.float32,
        attention_context=(4, 0), causal_conv=True,
    ),
    pred_dim=12,
    joint_dim=12,
)


def _ctc_setup(key, N=3, T=33):
    model = ConformerCTC(_CTC_CFG)
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(N, T, 8), jnp.float32)
    lens = jnp.asarray(
        ([T, T - 9, T // 2] + list(rng.randint(1, T, max(0, N - 3))))[:N],
        jnp.int32,
    )
    params = model.init(key, feats, lens)["params"]
    return model, params, feats, lens


def test_flatten_round_trip():
    tree = {"a": {"b": np.arange(3), "c": {"d": np.ones((2, 2))}}, "e": np.zeros(1)}
    flat = flatten_arrays(tree)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    back = unflatten_arrays(flat)
    assert np.array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])
    with pytest.raises(ValueError):
        flatten_arrays({"x/y": np.zeros(1)})


def test_ctc_greedy_artifact_round_trip(key, tmp_path):
    model, params, feats, lens = _ctc_setup(key)
    N, T = feats.shape[:2]
    path = os.path.join(tmp_path, "art")
    export_ctc_recognizer(
        path, model, params, specs=[(N, T)], platforms=("cpu", "tpu")
    )
    art = ServingArtifact.load(path)
    hyps, hyp_lens = art(np.asarray(feats), np.asarray(lens))

    from pydrobert_tpu.ops.decoding import ctc_greedy_search

    logits, out_lens = model.apply({"params": params}, feats, lens)
    _, exp_hyps, exp_lens = ctc_greedy_search(
        logits, out_lens, batch_first=True
    )
    assert np.array_equal(hyps, exp_hyps)
    assert np.array_equal(hyp_lens, exp_lens)
    # artifact really is multi-platform StableHLO
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert meta["platforms"] == ["cpu", "tpu"]
    assert meta["extra"]["family"] == "ctc"


def test_ctc_beam_artifact_matches_live_search(key, tmp_path):
    model, params, feats, lens = _ctc_setup(key)
    N, T = feats.shape[:2]
    path = os.path.join(tmp_path, "art")
    export_ctc_recognizer(
        path, model, params, specs=[(N, T)], width=4
    )
    art = ServingArtifact.load(path)
    y, y_lens, y_probs = art(np.asarray(feats), np.asarray(lens))

    from pydrobert_tpu.ops.decoding import CTCPrefixSearch

    logits, out_lens = model.apply({"params": params}, feats, lens)
    ey, el, ep = CTCPrefixSearch(4)(jnp.swapaxes(logits, 0, 1), out_lens)
    assert np.array_equal(y, jnp.transpose(ey, (1, 2, 0)))
    assert np.array_equal(y_lens, el)
    # AOT and live-jit compiles may fuse differently -> last-ulp drift
    np.testing.assert_allclose(y_probs, ep, rtol=1e-4)


def test_artifact_pads_batch_and_time_to_spec(key, tmp_path):
    model, params, feats, lens = _ctc_setup(key, N=3, T=33)
    path = os.path.join(tmp_path, "art")
    # exported at (4, 40): a (3, 33) call must zero-pad in, slice out
    export_ctc_recognizer(path, model, params, specs=[(4, 40)])
    art = ServingArtifact.load(path)
    hyps, hyp_lens = art(np.asarray(feats), np.asarray(lens))
    assert hyps.shape[0] == 3 and hyp_lens.shape == (3,)

    padded_feats = np.zeros((4, 40, 8), np.float32)
    padded_feats[:3, :33] = np.asarray(feats)
    padded_lens = np.zeros((4,), np.int32)
    padded_lens[:3] = np.asarray(lens)
    exp_hyps, exp_lens = art(padded_feats, padded_lens)
    assert np.array_equal(hyps, np.asarray(exp_hyps)[:3])
    assert np.array_equal(hyp_lens, np.asarray(exp_lens)[:3])


def test_artifact_picks_smallest_fitting_spec_and_rejects_misfits(
    key, tmp_path
):
    model, params, feats, lens = _ctc_setup(key, N=3, T=33)
    path = os.path.join(tmp_path, "art")
    export_ctc_recognizer(
        path, model, params, specs=[(8, 64), (3, 33)]
    )
    art = ServingArtifact.load(path)
    # exact (3, 33) fit must win over padding into (8, 64)
    assert art._fits(art.meta["specs"][1], [np.asarray(feats), np.asarray(lens)])
    hyps, _ = art(np.asarray(feats), np.asarray(lens))
    assert hyps.shape[0] == 3
    too_big = np.zeros((9, 64, 8), np.float32)
    with pytest.raises(ValueError, match="no exported specialization"):
        art(too_big, np.zeros((9,), np.int32))
    with pytest.raises(ValueError, match="no exported specialization"):
        art(np.asarray(feats, np.float64), np.asarray(lens))


def test_artifact_runs_without_model_code(key, tmp_path):
    """Loading consults only meta/params/StableHLO — simulate a serving
    process by loading from a re-read directory and calling through the
    deserialized module (the live model/fn objects are not involved)."""
    model, params, feats, lens = _ctc_setup(key)
    N, T = feats.shape[:2]
    path = os.path.join(tmp_path, "art")
    export_ctc_recognizer(path, model, params, specs=[(N, T)])
    art = ServingArtifact.load(path)
    # force module deserialization (not the exporter's in-memory object)
    assert not art._compiled
    hyps, hyp_lens = art(np.asarray(feats), np.asarray(lens))
    assert 0 in art._compiled
    assert hyps.shape[0] == N


def test_sharded_ctc_artifact_matches_unsharded_live(key, tmp_path):
    """A dp=4 x tp=2 mesh artifact must reload (rebuilding the mesh over
    this host's 8 virtual devices) and match the single-program decode."""
    from pydrobert_tpu.models import conformer_partition_rules
    from pydrobert_tpu.parallel import make_mesh

    model, params, feats, lens = _ctc_setup(key, N=4, T=32)
    mesh = make_mesh(2)
    path = os.path.join(tmp_path, "art")
    export_ctc_recognizer(
        path, model, params, specs=[(4, 32)],
        mesh=mesh, partition_rules=conformer_partition_rules,
    )
    art = ServingArtifact.load(path)
    assert art.meta["mesh"]["shape"] == [4, 2]
    hyps, hyp_lens = art(np.asarray(feats), np.asarray(lens))

    from pydrobert_tpu.ops.decoding import ctc_greedy_search

    logits, out_lens = model.apply({"params": params}, feats, lens)
    _, exp_hyps, exp_lens = ctc_greedy_search(
        logits, out_lens, batch_first=True
    )
    assert np.array_equal(hyps, exp_hyps)
    assert np.array_equal(hyp_lens, exp_lens)
    # a smaller batch still pads onto the mesh and slices back
    h3, l3 = art(np.asarray(feats)[:3], np.asarray(lens)[:3])
    assert np.array_equal(h3, np.asarray(exp_hyps)[:3])
    assert np.array_equal(l3, np.asarray(exp_lens)[:3])


def test_transducer_greedy_artifact_matches_live(key, tmp_path):
    model = ConformerTransducer(_RNNT_CFG)
    rng = np.random.RandomState(3)
    N, T = 2, 29
    feats = jnp.asarray(rng.randn(N, T, 8), jnp.float32)
    lens = jnp.asarray([T, T - 8], jnp.int32)
    refs = jnp.asarray(rng.randint(0, 16, (N, 4)), jnp.int32)
    params = model.init(
        key, feats, lens, refs, jnp.full((N,), 4, jnp.int32)
    )["params"]
    path = os.path.join(tmp_path, "art")
    export_transducer_recognizer(
        path, model, params, specs=[(N, T)], mode="greedy",
        max_symbols_per_frame=3,
    )
    art = ServingArtifact.load(path)
    hyps, hyp_lens = art(np.asarray(feats), np.asarray(lens))
    exp_hyps, exp_lens = model.apply(
        {"params": params}, feats, lens, 3, method="greedy"
    )
    assert np.array_equal(hyps, exp_hyps)
    assert np.array_equal(hyp_lens, exp_lens)


def test_transducer_beam_artifact_matches_live(key, tmp_path):
    model = ConformerTransducer(_RNNT_CFG)
    rng = np.random.RandomState(4)
    N, T = 2, 25
    feats = jnp.asarray(rng.randn(N, T, 8), jnp.float32)
    lens = jnp.asarray([T, T - 5], jnp.int32)
    refs = jnp.asarray(rng.randint(0, 16, (N, 4)), jnp.int32)
    params = model.init(
        key, feats, lens, refs, jnp.full((N,), 4, jnp.int32)
    )["params"]
    path = os.path.join(tmp_path, "art")
    export_transducer_recognizer(
        path, model, params, specs=[(N, T)], mode="beam", width=3,
        max_symbols_per_frame=2,
    )
    art = ServingArtifact.load(path)
    hyps, hyp_lens, scores = art(np.asarray(feats), np.asarray(lens))
    exp = model.apply(
        {"params": params}, feats, lens, 3, 2, None, 0.3, method="beam"
    )
    assert np.array_equal(hyps, exp[0])
    assert np.array_equal(hyp_lens, exp[1])
    np.testing.assert_allclose(scores, exp[2], rtol=1e-6)


def test_export_rejects_pallas_on_cpu_platforms(key, tmp_path):
    model, params, feats, lens = _ctc_setup(key)
    with pytest.raises(ValueError, match="TPU-only"):
        ServingArtifact.export(
            os.path.join(tmp_path, "a"),
            lambda p, x: x,
            params,
            [(jnp.zeros((2, 2)),)],
            allow_pallas=True,
        )
