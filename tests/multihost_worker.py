"""Subprocess worker for the true multi-process distributed test.

Run by tests/test_parallel.py::test_multiprocess_input_pipeline as N
separate processes, each owning a slice of the virtual CPU devices, joined
through jax.distributed (the same runtime a multi-host TPU pod uses over
DCN). Validates the parallel/input_pipeline.py path the single-process
tests cannot reach: `jax.make_array_from_process_local_data` assembling a
globally-sharded batch from per-host shards (SURVEY.md section 2c).

Usage: python multihost_worker.py <process_id> <num_processes> <coord_addr>
Prints one line per global batch: "batch <i> sum <v>", then "WORKER_OK".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    proc_id, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=proc_id)

    import jax.numpy as jnp
    import numpy as np

    from samplenet_tpu.parallel.input_pipeline import global_batches
    from samplenet_tpu.parallel.mesh import make_mesh

    assert jax.process_count() == nproc, jax.process_count()
    mesh = make_mesh()  # all global devices on the data axis

    # Deterministic dataset, identical on every host; host_shard carves the
    # per-process slice inside global_batches.
    total, n_pts = 16, 8
    data = np.arange(total * n_pts * 3, dtype=np.float32).reshape(
        total, n_pts, 3)
    labels = (np.arange(total) % 4).astype(np.int32)
    global_batch = 8

    @jax.jit
    def reduce_batch(bx, by):
        # forces a real cross-process reduction over the sharded batch axis
        return jnp.sum(bx), jnp.sum(by)

    per_host = total // nproc
    for i, (bx, by) in enumerate(global_batches(
            mesh, data, labels, global_batch, shuffle=False)):
        assert bx.shape == (global_batch, n_pts, 3), bx.shape
        got_x, got_y = reduce_batch(bx, by)
        # expected global batch i = rows [i*lb:(i+1)*lb] of every host shard
        lb = global_batch // nproc
        rows = np.concatenate([
            np.arange(p * per_host + i * lb, p * per_host + (i + 1) * lb)
            for p in range(nproc)
        ])
        assert np.isclose(float(got_x), float(data[rows].sum())), (
            i, float(got_x), float(data[rows].sum()))
        assert int(got_y) == int(labels[rows].sum()), (i, int(got_y))
        print(f"batch {i} sum {float(got_x)}", flush=True)

    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
