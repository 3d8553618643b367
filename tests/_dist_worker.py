"""Worker process for the real two-process ``jax.distributed`` test.

Run as ``python tests/_dist_worker.py <rank> <world> <port> <out_dir>``.
Exercises the library's actual multi-process hooks (no monkeypatching):
sampler sharding by ``jax.process_index()``, cross-process metric
reduction, and rank-0-only controller writes.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank, world = int(sys.argv[1]), int(sys.argv[2])
    port, out_dir = sys.argv[3], sys.argv[4]

    # one CPU device per process (the parent test env may carry the
    # suite's 8-device flag; XLA reads this at backend init, which hasn't
    # happened yet even when jax is pre-imported)
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=world, process_id=rank
    )
    assert jax.process_count() == world
    assert jax.process_index() == rank

    out = {}

    # 1. epoch samplers shard the permutation by real rank/world
    from pydrobert_tpu.data import EpochRandomSampler

    sampler = EpochRandomSampler(list(range(12)), base_seed=42)
    out["epoch0"] = [int(i) for i in sampler.get_samples_for_epoch(0)]
    out["epoch1"] = [int(i) for i in sampler.get_samples_for_epoch(1)]
    # base_seed=None must broadcast rank 0's draw so shards stay disjoint
    import numpy as np_

    np_.random.seed(100 + rank)  # desynchronize the per-process global RNG
    out["auto_seed"] = EpochRandomSampler(list(range(12))).base_seed

    # 2. cross-process metric reduction (gloo collectives on CPU)
    from pydrobert_tpu.parallel import all_reduce_metrics

    out["reduced"] = all_reduce_metrics({"met": float(rank + 1)})

    # 3. the training controller reduces metrics and only rank 0 writes
    import numpy as np

    from pydrobert_tpu.training import (
        TrainingStateController,
        TrainingStateParams,
    )

    csv = os.path.join(out_dir, "hist.csv")
    ckpt_dir = os.path.join(out_dir, "ckpts")
    controller = TrainingStateController(
        TrainingStateParams(num_epochs=3, seed=1), csv, ckpt_dir
    )
    model_state = {"w": np.zeros(3, np.float32)}
    opt_state = {"m": np.zeros(3, np.float32)}
    # per-rank metrics differ; the CSV row must hold the mean
    cont, opt_state = controller.update_for_epoch(
        model_state, opt_state, 1.0 + rank, 2.0 + rank
    )
    out["cont"] = bool(cont)
    out["train_met"] = float(controller.get_info(1)["train_met"])
    out["val_met"] = float(controller.get_info(1)["val_met"])

    # 4. data loader with a multi-process sharding: each process loads its
    # sampler shard; the loader assembles the GLOBAL batch array via
    # jax.make_array_from_process_local_data (device_put cannot span
    # non-addressable devices)
    import numpy as np2
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from pydrobert_tpu.data import SpectDataLoader, SpectDataLoaderParams
    from pydrobert_tpu.utils.serial import save_tensor

    data_dir = os.path.join(out_dir, f"data_rank{rank}")
    os.makedirs(os.path.join(data_dir, "feat"), exist_ok=True)
    rng = np2.random.RandomState(7)  # same data on both ranks
    T, F = 6, 3
    feats_all = rng.randn(8, T, F).astype(np2.float32)
    for n in range(8):
        save_tensor(
            feats_all[n], os.path.join(data_dir, "feat", f"utt{n}.pt")
        )
    mesh = Mesh(np2.asarray(jax.devices()[:world]), ("data",))
    assert len({d.process_index for d in mesh.devices.flat}) == world
    lparams = SpectDataLoaderParams(batch_size=2, drop_last=True)
    loader = SpectDataLoader(
        data_dir,
        lparams,
        shuffle=False,
        suppress_alis=True,
        suppress_uttids=True,
        sharding=NamedSharding(mesh, PartitionSpec("data")),
    )
    batches = list(loader)
    feats0 = batches[0][0]
    # global batch: both processes' local batches stacked over the mesh
    out["loader_global_shape"] = list(feats0.shape)
    # this process's addressable shard holds exactly its sampler's rows:
    # rank r takes utterances r, r + world, ... (strided sharding), and its
    # first per-process batch of 2 is [r, r + world]
    shard = np2.asarray(feats0.addressable_shards[0].data)
    exp = feats_all[[rank, rank + world]]
    out["loader_shard_ok"] = bool(np2.allclose(shard, exp))

    with open(os.path.join(out_dir, f"rank{rank}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
