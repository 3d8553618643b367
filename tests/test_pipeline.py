"""Pipeline parallelism (GPipe over the ``pipe`` mesh axis) on the 8-device
CPU mesh: generic ``pipeline_apply`` fwd/grad parity vs sequential
application, and the pipelined ConformerCTC forward/train step vs the plain
single-program paths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from pydrobert_tpu.models import (
    ConformerConfig,
    ConformerCTC,
    make_pipeline_train_step,
    make_pipelined_forward,
    make_train_step,
    pipeline_partition_rules,
    stack_block_params,
    unstack_block_params,
)
from pydrobert_tpu.parallel import (
    make_pipeline_mesh,
    pipeline_apply,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)

CFG = ConformerConfig(
    vocab_size=32,
    num_filts=8,
    d_model=16,
    num_layers=4,
    num_heads=2,
    subsample_channels=4,
    conv_kernel=5,
    dropout=0.0,  # the pipelined forward is deterministic; keep paths equal
    dtype=jnp.float32,
)


def _toy(seed=0, pp=4, B=8, T=6, D=16):
    rng = np.random.RandomState(seed)
    Ws = jnp.asarray(rng.randn(pp, D, D) * 0.1, jnp.float32)
    x = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, T) > 0.3)
    return Ws, x, mask


def _toy_stage(W, h, m):
    return jnp.tanh(h @ W) * m[..., None]


@pytest.mark.parametrize("pp,tp,m", [(4, 1, 4), (2, 2, 2), (8, 1, 8)])
def test_pipeline_apply_matches_sequential(pp, tp, m):
    mesh = make_pipeline_mesh(pp, tp)
    Ws, x, mask = _toy(pp=pp)
    out = jax.jit(
        lambda W, x: pipeline_apply(
            _toy_stage, W, x, extras=mask, mesh=mesh, n_microbatches=m
        )
    )(Ws, x)
    ref = x
    for i in range(pp):
        ref = _toy_stage(Ws[i], ref, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_apply_grad_matches_sequential():
    pp = 4
    mesh = make_pipeline_mesh(pp)
    Ws, x, mask = _toy(pp=pp)

    def loss_pipe(Ws):
        return pipeline_apply(
            _toy_stage, Ws, x, extras=mask, mesh=mesh, n_microbatches=4
        ).sum()

    def loss_ref(Ws):
        h = x
        for i in range(pp):
            h = _toy_stage(Ws[i], h, mask)
        return h.sum()

    g_pipe = jax.jit(jax.grad(loss_pipe))(Ws)
    g_ref = jax.grad(loss_ref)(Ws)
    np.testing.assert_allclose(
        np.asarray(g_pipe), np.asarray(g_ref), atol=1e-5
    )


def _init(key, N=8, T=32):
    model = ConformerCTC(CFG)
    rng = np.random.RandomState(17)
    feats = jnp.asarray(rng.randn(N, T, CFG.num_filts), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)), jnp.int32)
    params = model.init(key, feats, lens)["params"]
    return model, params, feats, lens


def test_stack_block_params_round_trip(key):
    _, params, _, _ = _init(key)
    pparams = stack_block_params(params, 2)
    leaves = jax.tree_util.tree_leaves(pparams["blocks"])
    assert all(a.shape[:2] == (2, 2) for a in leaves)
    back = unstack_block_params(pparams)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        params,
        back,
    )


def test_pipelined_forward_matches_model(key):
    model, params, feats, lens = _init(key)
    mesh = make_pipeline_mesh(2, 2)  # dp=2 x tp=2 x pp=2
    pparams = shard_params(
        stack_block_params(params, 2), mesh, pipeline_partition_rules
    )
    fwd = jax.jit(make_pipelined_forward(model, mesh, n_microbatches=4))
    logits_p, lens_p = fwd(pparams, feats, lens)
    logits_r, lens_r = model.apply({"params": params}, feats, lens)
    np.testing.assert_array_equal(np.asarray(lens_p), np.asarray(lens_r))
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(logits_r), atol=2e-5
    )


def test_pipeline_train_step_matches_plain(key):
    model, params, feats, lens = _init(key)
    N, U = feats.shape[0], 3
    rng = np.random.RandomState(3)
    refs = jnp.asarray(rng.randint(0, CFG.vocab_size, (N, U)), jnp.int32)
    ref_lens = jnp.full((N,), U, jnp.int32)
    optimizer = optax.sgd(1e-2)  # un-normalized update: grads compare tightly

    # single-program oracle (dropout=0.0 so the paths are the same math)
    step = make_train_step(model, optimizer)
    p1, _, loss1 = jax.jit(step)(
        params, optimizer.init(params), key, feats, lens, refs, ref_lens
    )

    mesh = make_pipeline_mesh(2, 2)
    pparams = shard_params(
        stack_block_params(params, 2), mesh, pipeline_partition_rules
    )
    popt = jax.device_put(
        optimizer.init(pparams), NamedSharding(mesh, PartitionSpec())
    )
    pstep = make_pipeline_train_step(model, optimizer, mesh, n_microbatches=4)
    pp2, _, loss_p = jax.jit(pstep)(
        pparams, popt, key, feats, lens, refs, ref_lens
    )
    np.testing.assert_allclose(float(loss_p), float(loss1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        unstack_block_params(jax.device_get(pp2)),
        p1,
    )


def test_transducer_pipeline_train_step_matches_plain(key):
    """dp x tp x pp transducer step == the single-program step (loss and
    updated params) when dropout is off."""
    from pydrobert_tpu.models import (
        ConformerTransducer,
        TransducerConfig,
        make_transducer_pipeline_train_step,
        make_transducer_train_step,
        transducer_pipeline_partition_rules,
        transducer_stack_block_params,
        transducer_unstack_block_params,
    )

    cfg = TransducerConfig(encoder=CFG, pred_dim=12, joint_dim=12)
    model = ConformerTransducer(cfg)
    N, T, U = 8, 24, 3
    rng = np.random.RandomState(23)
    feats = jnp.asarray(rng.randn(N, T, CFG.num_filts), jnp.float32)
    lens = jnp.asarray(rng.randint(T // 2, T + 1, (N,)), jnp.int32)
    refs = jnp.asarray(rng.randint(0, CFG.vocab_size, (N, U)), jnp.int32)
    ref_lens = jnp.asarray(rng.randint(1, U + 1, (N,)), jnp.int32)
    params = model.init(key, feats, lens, refs, ref_lens)["params"]
    optimizer = optax.sgd(1e-2)

    step = make_transducer_train_step(model, optimizer)
    p1, _, loss1 = jax.jit(step)(
        params, optimizer.init(params), key, feats, lens, refs, ref_lens
    )

    mesh = make_pipeline_mesh(2, 2)
    pparams = shard_params(
        transducer_stack_block_params(params, 2),
        mesh,
        transducer_pipeline_partition_rules,
    )
    popt = jax.device_put(
        optimizer.init(pparams), NamedSharding(mesh, PartitionSpec())
    )
    pstep = make_transducer_pipeline_train_step(
        model, optimizer, mesh, n_microbatches=4
    )
    pp2, _, loss_p = jax.jit(pstep)(
        pparams, popt, key, feats, lens, refs, ref_lens
    )
    np.testing.assert_allclose(float(loss_p), float(loss1), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        transducer_unstack_block_params(jax.device_get(pp2)),
        p1,
    )


def test_sharded_checkpoint_round_trip(key, tmp_path):
    """Orbax-backed save/restore preserves values AND mesh shardings for a
    dp x tp sharded param tree (sync and async paths)."""
    from pydrobert_tpu.models import ConformerCTC, conformer_partition_rules
    from pydrobert_tpu.parallel import (
        make_mesh,
        restore_sharded,
        save_sharded,
        wait_for_saves,
    )

    model = ConformerCTC(CFG)
    feats = jnp.zeros((8, 32, CFG.num_filts))
    lens = jnp.full((8,), 32, jnp.int32)
    params = model.init(key, feats, lens)["params"]
    mesh = make_mesh(model_parallelism=2)
    sp = shard_params(params, mesh, conformer_partition_rules)

    save_sharded(str(tmp_path / "ck"), sp)
    rt = restore_sharded(str(tmp_path / "ck"), sp)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        sp,
        rt,
    )
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.sharding == b.sharding, sp, rt)
    )

    save_sharded(str(tmp_path / "ck2"), sp, async_save=True)
    wait_for_saves()
    rt2 = restore_sharded(str(tmp_path / "ck2"), sp)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        sp,
        rt2,
    )


def test_pipeline_train_step_descends(key):
    """Pipelined training with SpecAugment regularization makes progress."""
    from pydrobert_tpu.ops.img import spec_augment

    model, params, feats, lens = _init(key)
    N, U = feats.shape[0], 3
    rng = np.random.RandomState(4)
    refs = jnp.asarray(rng.randint(0, CFG.vocab_size, (N, U)), jnp.int32)
    ref_lens = jnp.full((N,), U, jnp.int32)
    mesh = make_pipeline_mesh(2)  # dp=4 x pp=2: microbatch must divide dp=4
    pparams = shard_params(
        stack_block_params(params, 2), mesh, pipeline_partition_rules
    )
    optimizer = optax.adam(1e-2)
    popt = jax.device_put(
        optimizer.init(pparams), NamedSharding(mesh, PartitionSpec())
    )

    def augment(k, f, l):
        return spec_augment(
            k, f, max_time_warp=2.0, max_time_mask=4, max_freq_mask=2,
            lengths=l.astype(jnp.float32),
        )

    pstep = jax.jit(
        make_pipeline_train_step(
            model, optimizer, mesh, n_microbatches=2, augment=augment
        )
    )
    losses = []
    for i in range(5):
        pparams, popt, loss = pstep(
            pparams, popt, jax.random.fold_in(key, i),
            feats, lens, refs, ref_lens,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
