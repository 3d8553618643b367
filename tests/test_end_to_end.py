"""The minimum end-to-end slice (SURVEY.md §7): synthetic data dir ->
loader (MVN + SpecAugment) -> jitted CTC training with the state controller
-> greedy decode -> hyp writing -> CLI error-rate scoring.

Touches foundation, ops, data, training, decoding, models, and CLI in one
flow, exactly the reference's intended usage."""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pydrobert_tpu import command_line
from pydrobert_tpu.data import (
    SpectDataLoader,
    SpectDataLoaderParams,
    SpectDataSet,
)
from pydrobert_tpu.functional import spec_augment
from pydrobert_tpu.models import ConformerConfig, ConformerCTC, make_train_step
from pydrobert_tpu.ops.decoding import ctc_greedy_search
from pydrobert_tpu.training import (
    TrainingStateController,
    TrainingStateParams,
)


@pytest.mark.slow
def test_minimum_end_to_end_slice(tmp_path, seeded, key):
    from pydrobert_tpu.utils.serial import save_tensor

    vocab = 13
    root = str(tmp_path / "data")
    os.makedirs(os.path.join(root, "feat"))
    os.makedirs(os.path.join(root, "ref"))
    rng = np.random.RandomState(seeded % 2**31)
    for n in range(8):
        T = int(rng.randint(20, 32))  # wide enough that CTC stays feasible
        save_tensor(
            rng.randn(T, 8).astype(np.float32),
            os.path.join(root, "feat", f"utt{n}.pt"),
        )
        R = int(rng.randint(1, 4))
        save_tensor(
            rng.randint(0, vocab, (R,)).astype(np.int64),
            os.path.join(root, "ref", f"utt{n}.pt"),
        )
    cfg = ConformerConfig(
        vocab_size=vocab, num_filts=8, d_model=16, num_layers=1, num_heads=2,
        subsample_channels=4, conv_kernel=5, dtype=jnp.float32,
    )
    model = ConformerCTC(cfg)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=3e-3)

    def augment(k, f, lens):
        return spec_augment(
            k, f, max_time_warp=2.0, max_time_mask=4, max_freq_mask=2,
            lengths=lens.astype(jnp.float32),
        )

    step = jax.jit(make_train_step(model, optimizer, augment=augment))
    controller = TrainingStateController(
        TrainingStateParams(num_epochs=3, seed=1),
        str(tmp_path / "hist.csv"),
        str(tmp_path / "states"),
    )
    loader_params = SpectDataLoaderParams(batch_size=4, do_mvn=True)
    params = opt_state = None
    losses = []
    for epoch in range(2):
        loader = SpectDataLoader(
            root, loader_params, seed=7, init_epoch=epoch, batch_first=True
        )
        epoch_losses = []
        for feats_b, refs_b, feat_sizes, ref_sizes in loader:
            fb = jnp.asarray(feats_b)
            lb = jnp.asarray(feat_sizes, jnp.int32)
            rb = jnp.asarray(np.where(refs_b < 0, 0, refs_b), jnp.int32)
            rlb = jnp.asarray(ref_sizes, jnp.int32)
            if params is None:
                params = model.init(key, fb, lb)["params"]
                opt_state = optimizer.init(params)
            params, opt_state, loss = step(
                params, opt_state, jax.random.fold_in(key, epoch), fb, lb,
                rb, rlb,
            )
            epoch_losses.append(float(loss))
        losses.append(float(np.mean(epoch_losses)))
        cont, opt_state = controller.update_for_epoch(
            params, opt_state, losses[-1], losses[-1]
        )
        assert cont
    assert losses[1] < losses[0]
    assert controller.get_last_epoch() == 2
    assert os.path.exists(str(tmp_path / "hist.csv"))

    # decode + write hyps + CLI scoring
    ds = SpectDataSet(root, params=loader_params)
    for i, utt_id in enumerate(ds.utt_ids):
        feat = jnp.asarray(ds[i][0])[None]
        lens_i = jnp.asarray([feat.shape[1]], jnp.int32)
        logits, out_lens = model.apply({"params": params}, feat, lens_i)
        _, paths, out_l = ctc_greedy_search(
            jnp.swapaxes(logits, 0, 1), out_lens
        )
        hyp = np.asarray(paths)[: int(out_l[0]), 0]
        ds.write_hyp(utt_id, hyp.astype(np.int64))
    out_file = str(tmp_path / "wer.txt")
    assert not command_line.compute_torch_token_data_dir_error_rates(
        [os.path.join(root, "ref"), os.path.join(root, "hyp"), out_file,
         "--quiet"]
    )
    wer = float(open(out_file).read())
    assert np.isfinite(wer) and wer >= 0
    # resume: a fresh controller + loader regenerate the same epoch stream
    controller2 = TrainingStateController(
        TrainingStateParams(num_epochs=3, seed=1),
        str(tmp_path / "hist.csv"),
        str(tmp_path / "states"),
    )
    assert controller2.get_last_epoch() == 2
    p2, o2 = controller2.load_model_and_optimizer_for_epoch(
        params, opt_state
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        p2,
        params,
    )


@pytest.mark.slow
def test_example_recipe_runs(tmp_path):
    """examples/train_ctc_asr.py end-to-end: synthesize -> sharded train
    (resumable) -> decode -> CLI scoring, exit code 0, artifacts present."""
    import importlib.util
    import sys

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "train_ctc_asr.py",
    )
    spec = importlib.util.spec_from_file_location("train_ctc_asr", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["train_ctc_asr"] = mod
    spec.loader.exec_module(mod)
    work = str(tmp_path / "work")
    argv = [
        "--work-dir", work, "--num-utts", "8", "--num-epochs", "2",
        "--model-parallelism", "2",
    ]
    assert mod.main(argv) == 0
    assert os.path.exists(os.path.join(work, "hist.csv"))
    assert os.path.exists(os.path.join(work, "wer.txt"))
    # resumable: a second run continues (or no-ops) cleanly from the state
    assert mod.main(argv) == 0
