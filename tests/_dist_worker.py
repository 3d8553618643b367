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

    with open(os.path.join(out_dir, f"rank{rank}.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
