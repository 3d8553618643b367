#!/usr/bin/env python
"""End-to-end CTC ASR recipe: data dir -> train -> decode -> score.

The complete pydrobert_tpu workflow in one runnable script, mirroring how
the reference library is used around a torch training loop (its docs'
"training on a SpectDataSet" story) but TPU-native end to end:

1. (optionally) synthesize a valid SpectDataSet directory (``feat/`` +
   ``ref/`` of per-utterance ``.pt`` tensors — byte-compatible with the
   reference's on-disk convention);
2. build a device mesh and shard a Conformer-CTC model over it
   (data x tensor parallelism; single-device meshes work unchanged);
3. train with a jitted step (SpecAugment -> forward -> CTC loss -> adamw)
   driven by :class:`pydrobert_tpu.training.TrainingStateController`
   (CSV history, atomic checkpoints, early stopping, LR reduction —
   fully resumable: re-running this script continues where it stopped);
4. greedy-decode the training set, write ``hyp/``;
5. score with the ``compute-torch-token-data-dir-error-rates`` CLI.

Run (any JAX backend; on a CPU host try a virtual mesh first)::

   XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python examples/train_ctc_asr.py --work-dir /tmp/ctc_demo

Multi-host: launch one process per host with ``jax.distributed``
environment variables set; the samplers shard by process automatically and
the loader assembles global batches (pass ``--feat-pad-to``/
``--ref-pad-to`` so every process produces one global shape).
"""

import argparse
import os
import sys

import numpy as np

try:
    import pydrobert_tpu  # noqa: F401
except ImportError:  # running from a source checkout without installing
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def make_synthetic_dir(root: str, num_utts: int, vocab: int, seed: int = 0):
    """Write a small but valid SpectDataSet dir of random utterances."""
    from pydrobert_tpu.utils.serial import save_tensor

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "feat"), exist_ok=True)
    os.makedirs(os.path.join(root, "ref"), exist_ok=True)
    for n in range(num_utts):
        T = int(rng.randint(20, 32))
        save_tensor(
            rng.randn(T, 8).astype(np.float32),
            os.path.join(root, "feat", f"utt{n:03d}.pt"),
        )
        R = int(rng.randint(1, 4))
        save_tensor(
            rng.randint(0, vocab, (R,)).astype(np.int64),
            os.path.join(root, "ref", f"utt{n:03d}.pt"),
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--work-dir", required=True)
    parser.add_argument("--data-dir", default=None,
                        help="existing SpectDataSet dir (default: synthesize)")
    parser.add_argument("--num-utts", type=int, default=16)
    parser.add_argument("--vocab-size", type=int, default=13)
    parser.add_argument("--num-epochs", type=int, default=4)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--model-parallelism", type=int, default=1)
    parser.add_argument("--feat-pad-to", type=int, default=None)
    parser.add_argument("--ref-pad-to", type=int, default=None)
    args = parser.parse_args(argv)

    import jax

    # honor JAX_PLATFORMS even where a sitecustomize pre-imported jax and
    # pinned the platform (the env var alone is read too late there)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax.numpy as jnp
    import optax

    from pydrobert_tpu import command_line
    from pydrobert_tpu.data import (
        SpectDataLoader,
        SpectDataLoaderParams,
        SpectDataSet,
    )
    from pydrobert_tpu.functional import spec_augment
    from pydrobert_tpu.models import (
        ConformerConfig,
        ConformerCTC,
        conformer_partition_rules,
        make_train_step,
    )
    from pydrobert_tpu.ops.decoding import ctc_greedy_search
    from pydrobert_tpu.parallel import (
        batch_sharding,
        make_mesh,
        shard_params,
    )
    from pydrobert_tpu.training import (
        TrainingStateController,
        TrainingStateParams,
    )

    os.makedirs(args.work_dir, exist_ok=True)
    data_dir = args.data_dir
    if data_dir is None:
        data_dir = os.path.join(args.work_dir, "data")
        make_synthetic_dir(data_dir, args.num_utts, args.vocab_size)
        print(f"synthesized {args.num_utts} utterances under {data_dir}")

    # --- mesh + model ------------------------------------------------------
    mesh = make_mesh(model_parallelism=args.model_parallelism)
    print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} device(s)")
    cfg = ConformerConfig(
        vocab_size=args.vocab_size, num_filts=8, d_model=16, num_layers=1,
        num_heads=2, subsample_channels=4, conv_kernel=5, dtype=jnp.float32,
    )
    model = ConformerCTC(cfg)
    optimizer = optax.inject_hyperparams(optax.adamw)(learning_rate=3e-3)

    def augment(k, f, lens):
        return spec_augment(
            k, f, max_time_warp=2.0, max_time_mask=4, max_freq_mask=2,
            lengths=lens.astype(jnp.float32),
        )

    step = jax.jit(make_train_step(model, optimizer, augment=augment))

    # --- training, resumable via the state controller ----------------------
    tparams = TrainingStateParams(
        num_epochs=args.num_epochs, seed=1,
        early_stopping_threshold=0.0, early_stopping_patience=2,
    )
    controller = TrainingStateController(
        tparams,
        os.path.join(args.work_dir, "hist.csv"),
        os.path.join(args.work_dir, "states"),
    )
    lparams = SpectDataLoaderParams(batch_size=args.batch_size, do_mvn=True)
    # rbg: threefry dropout-mask generation cost ~27 ms of a 63 ms
    # flagship step on TPU (see make_train_step's docstring)
    key = jax.random.key(tparams.seed, impl="rbg")
    params = opt_state = None
    start = controller.get_last_epoch()
    batch_sh = batch_sharding(mesh)
    for epoch in range(start, tparams.num_epochs):
        loader = SpectDataLoader(
            data_dir, lparams, seed=7, init_epoch=epoch, sharding=batch_sh,
            feat_pad_to=args.feat_pad_to, ref_pad_to=args.ref_pad_to,
        )
        epoch_losses = []
        for feats_b, refs_b, feat_sizes, ref_sizes in loader:
            fb = jnp.asarray(feats_b)
            lb = jnp.asarray(feat_sizes, jnp.int32)
            rb = jnp.asarray(np.where(np.asarray(refs_b) < 0, 0, refs_b),
                             jnp.int32)
            rlb = jnp.asarray(ref_sizes, jnp.int32)
            if params is None:
                params = model.init(key, fb, lb)["params"]
                params = shard_params(
                    params, mesh, conformer_partition_rules
                )
                opt_state = optimizer.init(params)
                if epoch > 0:  # resume from the last checkpoint
                    params, opt_state = (
                        controller.load_model_and_optimizer_for_epoch(
                            params, opt_state, epoch
                        )
                    )
            params, opt_state, loss = step(
                params, opt_state, jax.random.fold_in(key, epoch),
                fb, lb, rb, rlb,
            )
            epoch_losses.append(float(loss))
        mean_loss = float(np.mean(epoch_losses))
        print(f"epoch {epoch + 1}: loss {mean_loss:.4f}")
        cont, opt_state = controller.update_for_epoch(
            params, opt_state, mean_loss, mean_loss
        )
        if not cont:
            if epoch + 1 < tparams.num_epochs:
                print("early stop")
            break

    # --- decode + score -----------------------------------------------------
    if params is None:  # resumed past the final epoch: load best
        ds0 = SpectDataSet(data_dir, params=lparams)
        f0 = jnp.asarray(ds0[0][0])[None]
        params = model.init(key, f0, jnp.asarray([f0.shape[1]], jnp.int32))[
            "params"
        ]
        params = controller.load_model_for_epoch(
            params, controller.get_best_epoch()
        )
    ds = SpectDataSet(data_dir, params=lparams)
    for i, utt_id in enumerate(ds.utt_ids):
        feat = jnp.asarray(ds[i][0])[None]
        lens_i = jnp.asarray([feat.shape[1]], jnp.int32)
        logits, out_lens = model.apply({"params": params}, feat, lens_i)
        _, paths, out_l = ctc_greedy_search(
            jnp.swapaxes(logits, 0, 1), out_lens
        )
        hyp = np.asarray(paths)[: int(out_l[0]), 0]
        ds.write_hyp(utt_id, hyp.astype(np.int64))
    wer_file = os.path.join(args.work_dir, "wer.txt")
    rc = command_line.compute_torch_token_data_dir_error_rates(
        [os.path.join(data_dir, "ref"), os.path.join(data_dir, "hyp"),
         wer_file, "--quiet"]
    )
    if rc:
        return rc
    print(f"error rate: {float(open(wer_file).read()):.4f} (-> {wer_file})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
