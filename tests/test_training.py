"""Training controller tests (ported scenarios from the reference's
``tests/test_training.py``), with pytree states and optax optimizers."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pydrobert_tpu.training import (
    TrainingStateController,
    TrainingStateParams,
)


def _make_state(seed=0, lr=1e-3):
    params = {
        "w": jnp.asarray(np.random.RandomState(seed).randn(4, 4), jnp.float32),
        "b": jnp.zeros((4,), jnp.float32),
    }
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    return params, opt.init(params), opt


def _lr(opt_state):
    return float(np.asarray(opt_state.hyperparams["learning_rate"]))


def test_controller_stops_at_num_epochs(seeded):
    model, opt_state, _ = _make_state()
    params = TrainingStateParams(num_epochs=10, early_stopping_threshold=0.0)
    controller = TrainingStateController(params)
    for _ in range(9):
        cont, opt_state = controller.update_for_epoch(
            model, opt_state, 0.1, 0.1
        )
        assert cont
        assert controller.continue_training()
    cont, opt_state = controller.update_for_epoch(model, opt_state, 0.1, 0.1)
    assert not cont
    assert not controller.continue_training()


def test_controller_scheduling(seeded):
    # ported verbatim from reference tests/test_training.py:170-214
    model, opt_state, _ = _make_state(lr=1e-3)
    p = TrainingStateParams(
        early_stopping_threshold=0.1,
        early_stopping_patience=10,
        early_stopping_burnin=1,
        reduce_lr_threshold=0.2,
        reduce_lr_factor=0.5,
        reduce_lr_patience=5,
        reduce_lr_cooldown=2,
        reduce_lr_burnin=4,
    )
    controller = TrainingStateController(p)
    init_lr = _lr(opt_state)
    for _ in range(8):
        cont, opt_state = controller.update_for_epoch(model, opt_state, 1, 1)
        assert cont
        assert controller.continue_training()
    assert np.isclose(_lr(opt_state), init_lr)
    cont, opt_state = controller.update_for_epoch(model, opt_state, 1, 1)
    assert cont
    assert np.isclose(_lr(opt_state), init_lr / 2)
    for _ in range(6):
        cont, opt_state = controller.update_for_epoch(
            model, opt_state, 0.89, 0.89
        )
        assert cont
        assert controller.continue_training()
    assert np.isclose(_lr(opt_state), init_lr / 2)
    cont, opt_state = controller.update_for_epoch(model, opt_state, 0.68, 0.68)
    assert cont and controller.continue_training()
    assert np.isclose(_lr(opt_state), init_lr / 2)
    for _ in range(9):
        cont, opt_state = controller.update_for_epoch(
            model, opt_state, 0.68, 0.68
        )
        assert cont
        assert controller.continue_training()
    cont, opt_state = controller.update_for_epoch(model, opt_state, 0.68, 0.68)
    assert not cont
    assert not controller.continue_training()
    # no thresholds -> no lr movement, no stopping
    p.early_stopping_threshold = 0.0
    p.reduce_lr_threshold = 0.0
    controller = TrainingStateController(p)
    model, opt_state, _ = _make_state(lr=1e-3)
    init_lr = _lr(opt_state)
    for _ in range(20):
        cont, opt_state = controller.update_for_epoch(model, opt_state, 0, 0)
        assert cont
        assert controller.continue_training()
    assert np.isclose(_lr(opt_state), init_lr)


def test_controller_slippery_slope(seeded):
    model, opt_state, _ = _make_state()
    p = TrainingStateParams(
        early_stopping_threshold=1.0,
        early_stopping_patience=5,
        early_stopping_burnin=0,
        reduce_lr_threshold=1.0,
        reduce_lr_patience=2,
        reduce_lr_factor=0.5,
        reduce_lr_burnin=0,
        reduce_lr_cooldown=0,
    )
    controller = TrainingStateController(p)
    init_lr = _lr(opt_state)
    for step in range(6):
        dev = 3.5 - 0.75 * step
        _, opt_state = controller.update_for_epoch(model, opt_state, 1.0, dev)
        assert controller.continue_training(), step
        assert np.isclose(_lr(opt_state), init_lr), step


def test_controller_stores_and_retrieves(tmp_path, seeded):
    state_dir = str(tmp_path / "states")
    csv = str(tmp_path / "hist.csv")
    model1, opt_state1, opt = _make_state(seed=1, lr=1.0)
    model2, opt_state2, _ = _make_state(seed=2, lr=2.0)
    params = TrainingStateParams(seed=7)
    controller = TrainingStateController(
        params, state_csv_path=csv, state_dir=state_dir
    )
    _, opt_state1 = controller.update_for_epoch(model1, opt_state1, 0.3, 0.3)
    _, opt_state2 = controller.update_for_epoch(model2, opt_state2, 0.5, 0.5)
    # fresh controller resumes from the CSV
    controller2 = TrainingStateController(
        params, state_csv_path=csv, state_dir=state_dir
    )
    assert controller2.get_last_epoch() == 2
    assert controller2.get_best_epoch() == 1
    # load last state into a template
    template, opt_template, _ = _make_state(seed=9, lr=5.0)
    m, o = controller2.load_model_and_optimizer_for_epoch(
        template, opt_template
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        m,
        model2,
    )
    assert np.isclose(_lr(o), 2.0)
    # load best model only
    m1 = controller2.load_model_for_epoch(template, 1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        m1,
        model1,
    )


def test_controller_best(tmp_path, seeded):
    state_dir = str(tmp_path)
    model1, opt_state1, _ = _make_state(seed=1, lr=1.0)
    model2, opt_state2, _ = _make_state(seed=2, lr=2.0)
    model3, opt_state3, _ = _make_state(seed=3, lr=3.0)
    controller = TrainingStateController(
        TrainingStateParams(), state_dir=state_dir
    )
    assert controller.get_best_epoch() == 0
    _, opt_state1 = controller.update_for_epoch(model1, opt_state1, 0.5, 0.5)
    assert controller.get_best_epoch() == 1
    _, opt_state2 = controller.update_for_epoch(model2, opt_state2, 1, 1)
    assert controller.get_best_epoch() == 1
    _, opt_state2 = controller.update_for_epoch(model2, opt_state2, 1, 1)
    with pytest.raises(IOError):
        controller.load_model_and_optimizer_for_epoch(model3, opt_state3, 2)
    m, o = controller.load_model_and_optimizer_for_epoch(model3, opt_state3, 1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        m,
        model1,
    )
    assert _lr(o) == 1.0
    m, o = controller.load_model_and_optimizer_for_epoch(model3, opt_state3, 3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        m,
        model2,
    )
    assert _lr(o) == 2.0
    _, opt_state1 = controller.update_for_epoch(model1, opt_state1, 0.6, 0.6)
    assert controller.get_best_epoch() == 1
    # round-to-even at SCIENTIFIC_PRECISION: .400005 rounds to .40000
    _, opt_state1 = controller.update_for_epoch(
        model1, opt_state1, 0.400005, 0.400005
    )
    assert controller.get_best_epoch() == 5
    controller.load_model_and_optimizer_for_epoch(model3, opt_state3, 5)
    with pytest.raises(IOError):
        controller.load_model_and_optimizer_for_epoch(model3, opt_state3, 1)
    # negligible improvement isn't "better" (consistent with truncated CSV)
    _, opt_state1 = controller.update_for_epoch(model1, opt_state1, 0.4, 0.4)
    controller.load_model_and_optimizer_for_epoch(model3, opt_state3, 6)
    controller.load_model_and_optimizer_for_epoch(model3, opt_state3, 5)


def test_controller_add_entry(tmp_path, seeded):
    csv = str(tmp_path / "hist.csv")
    model, opt_state, _ = _make_state()
    controller = TrainingStateController(
        TrainingStateParams(), state_csv_path=csv
    )
    controller.add_entry("important", int)
    _, opt_state = controller.update_for_epoch(
        model, opt_state, 0.1, 0.1, important=3
    )
    _, opt_state = controller.update_for_epoch(
        model, opt_state, 0.2, 0.01, important=4
    )
    assert controller[1]["important"] == 3
    assert controller[2]["important"] == 4
    # missing entry raises
    with pytest.raises(TypeError):
        controller.update_for_epoch(model, opt_state, 0.1, 0.1)
    # unknown entry raises
    with pytest.raises(TypeError):
        controller.update_for_epoch(model, opt_state, 0.1, 0.1, bogus=1)
    # resume picks user entries up from CSV
    controller2 = TrainingStateController(
        TrainingStateParams(), state_csv_path=csv
    )
    controller2.add_entry("important", int)
    assert controller2[2]["important"] == 4


def test_keep_last_and_best_only(tmp_path, seeded):
    import os

    state_dir = str(tmp_path)
    model, opt_state, _ = _make_state(lr=1.0)
    controller = TrainingStateController(
        TrainingStateParams(keep_last_and_best_only=True),
        state_dir=state_dir,
    )
    mets = [0.5, 0.3, 0.7, 0.8]
    for met in mets:
        _, opt_state = controller.update_for_epoch(model, opt_state, met, met)
    # only epoch 2 (best) and epoch 4 (last) checkpoints remain
    files = sorted(os.listdir(state_dir))
    assert files == [
        "model_002.pt", "model_004.pt", "optim_002.pt", "optim_004.pt",
    ]


def test_optuna_suggest_params(seeded):
    optuna = pytest.importorskip("optuna")

    def objective(trial):
        params = TrainingStateParams.suggest_params(trial)
        assert params.num_epochs >= 1
        return 0.0

    sampler = optuna.samplers.RandomSampler(seed=5)
    study = optuna.create_study(sampler=sampler)
    study.optimize(objective, n_trials=3)


class _FakeTrial:
    """Duck-typed optuna trial: uniform draws within the given bounds,
    recording every suggestion (optuna itself is not installed here)."""

    def __init__(self, seed):
        self.rng = np.random.RandomState(seed)
        self.suggestions = {}

    def suggest_int(self, name, low, high, step=1, log=False):
        v = int(self.rng.randint(low, high + 1))
        self.suggestions[name] = v
        return v

    def suggest_float(self, name, low, high, step=None, log=False):
        v = float(self.rng.uniform(low, high))
        self.suggestions[name] = v
        return v

    def suggest_categorical(self, name, choices):
        v = choices[int(self.rng.randint(len(choices)))]
        self.suggestions[name] = v
        return v


def test_suggest_params_all_classes(seeded):
    """Every params class's optuna hook draws only within bounds and
    produces a constructible, validated instance (fake-trial duck typing;
    mirrors the reference's optuna interface, training.py:149-254)."""
    from pydrobert_tpu.data.params import (
        ContextWindowDataParams,
        SpectDataParams,
    )
    from pydrobert_tpu.data.dataloaders import (
        ContextWindowDataLoaderParams,
        DataLoaderParams,
        DynamicLengthDataLoaderParams,
        SpectDataLoaderParams,
    )

    for cls in (
        TrainingStateParams,
        SpectDataParams,
        ContextWindowDataParams,
        DataLoaderParams,
        DynamicLengthDataLoaderParams,
        SpectDataLoaderParams,
        ContextWindowDataLoaderParams,
    ):
        tunable = cls.get_tunable()
        trial = _FakeTrial(seeded % 2**31)
        params = cls.suggest_params(trial, prefix=f"{cls.__name__}.")
        assert isinstance(params, cls)
        if tunable:
            assert trial.suggestions, cls.__name__
            for name in trial.suggestions:
                assert name.startswith(f"{cls.__name__}."), name
                assert name.split(".", 1)[1] in tunable, name
        # a second suggestion into an existing base mutates that base
        base = cls()
        out = cls.suggest_params(_FakeTrial(1), base=base, only=tunable)
        assert out is base
        # restricting `only` to nothing suggests nothing
        t3 = _FakeTrial(2)
        cls.suggest_params(t3, only=set())
        assert not t3.suggestions


@pytest.mark.slow
def test_real_two_process_distributed(tmp_path):
    """Spawn two actual processes under ``jax.distributed`` (CPU + gloo) and
    check the library's multi-process hooks end-to-end, without any
    monkeypatching: samplers shard the same permutation disjointly by real
    rank/world, `all_reduce_metrics` means across processes, and the
    controller records reduced metrics (rank 0 writing).

    The reference runs the analogous scenario over torch.distributed/gloo
    (tests/test_dataloaders.py:818-907, tests/test_training.py:328-452).
    """
    import json
    import os
    import socket
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "_dist_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out_dir = str(tmp_path)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), "2", str(port), out_dir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for r in range(2)
    ]
    logs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    outs = [
        json.load(open(os.path.join(out_dir, f"rank{r}.json")))
        for r in range(2)
    ]
    # disjoint shards whose union is the serial permutation
    from pydrobert_tpu.data import EpochRandomSampler

    serial = EpochRandomSampler(list(range(12)), base_seed=42)
    for ep in ("epoch0", "epoch1"):
        a, b = outs[0][ep], outs[1][ep]
        assert not set(a) & set(b)
        epoch = int(ep[-1])
        exp = list(serial.get_samples_for_epoch_ignoring_distributed(epoch))
        # rank r takes every world-th sample starting at r
        assert a == exp[0::2] and b == exp[1::2]
    # metric reduction: mean of (1, 2) and of (2, 3)
    # base_seed=None broadcast: both ranks drew the same auto seed despite
    # desynchronized numpy global RNGs
    assert outs[0]["auto_seed"] == outs[1]["auto_seed"]
    for o in outs:
        assert abs(o["reduced"]["met"] - 1.5) < 1e-6
        assert abs(o["train_met"] - 1.5) < 1e-6
        assert abs(o["val_met"] - 2.5) < 1e-6
        # loader assembled the global batch (2 ranks x local batch 2 = 4)
        # from process-local shards, each holding its sampler's rows
        assert o["loader_global_shape"] == [4, 6, 3]
        assert o["loader_shard_ok"]
    # rank 0 wrote history + checkpoints exactly once
    assert os.path.exists(os.path.join(out_dir, "hist.csv"))
