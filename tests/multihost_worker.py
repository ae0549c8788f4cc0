"""Subprocess worker for the true multi-process distributed test.

Run by tests/test_parallel.py::test_multiprocess_input_pipeline as N
separate processes, each owning a slice of the virtual CPU devices, joined
through jax.distributed (the same runtime a multi-host TPU pod uses over
DCN). Validates the parallel/input_pipeline.py path the single-process
tests cannot reach: `jax.make_array_from_process_local_data` assembling a
globally-sharded batch from per-host shards (SURVEY.md section 2c).

Usage: python multihost_worker.py <proc_id> <nproc> <coord_addr> [mode] [dir]
mode "pipeline" (default): input-pipeline reductions, prints
  "batch <i> sum <v>" lines then "WORKER_OK".
mode "train": REAL sampler train steps on the global mesh + a sharded
  orbax save (every process writes its shards), prints "loss <v>" and
  "pnorm <v>" then "WORKER_OK". <dir> is the shared checkpoint directory.
mode "uneven": process-local datasets of DIFFERENT lengths per host
  (each host loaded its own files); global_batches(process_local=True)
  must sync the batch count to the minimum instead of deadlocking.
  Prints "batch <i> sum <v>" lines then "WORKER_OK".
mode "restore": restore the sharded checkpoint written by a train run
  under a DIFFERENT process count/devices-per-process split; prints
  "step <k>" and "pnorm <v>" then "WORKER_OK". <dir> is the ckpt dir.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_mode(nproc: int, ckpt_dir: str) -> None:
    """2 real optimiser steps of the classification sampler track over the
    global mesh, host-sharded input with a remainder (host_shard drops the
    tail), then a SHARDED checkpoint save — exercises the multi-host path
    end-to-end, not just reductions."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from samplenet_tpu.models.pointnet_cls import PointNetClassifier
    from samplenet_tpu.parallel.input_pipeline import global_batches
    from samplenet_tpu.parallel.mesh import make_mesh
    from samplenet_tpu.train import checkpoints
    from samplenet_tpu.train.classification import (
        SampleNetConfig,
        create_samplenet_state,
        make_samplenet_train_step,
    )

    mesh = make_mesh()
    n_dev = len(jax.devices())
    batch, num_points = n_dev * 2, 64
    scfg = SampleNetConfig(num_out_points=8, bottleneck_size=32,
                           group_size=4, batch_size=batch)
    sampler, state = create_samplenet_state(
        scfg, num_points, jax.random.PRNGKey(0))
    classifier = PointNetClassifier(num_classes=4)
    c_vars = classifier.init(jax.random.PRNGKey(1),
                             jnp.zeros((2, 8, 3), jnp.float32),
                             training=False)
    rep = NamedSharding(mesh, P())
    put = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, t)
    with mesh:
        state = state.replace(params=put(state.params),
                              batch_stats=put(state.batch_stats),
                              opt_state=put(state.opt_state))
        c_vars = put(c_vars)
        step = make_samplenet_train_step(sampler, classifier, c_vars, scfg,
                                         augment_data=False)
        # total deliberately NOT divisible by nproc: host_shard drops the
        # remainder rows; 2 full global batches remain
        total = 2 * batch + 3
        rng = np.random.RandomState(0)
        data = rng.randn(total, num_points, 3).astype(np.float32)
        labels = (np.arange(total) % 4).astype(np.int32)
        losses = []
        for bx, by in global_batches(mesh, data, labels, batch,
                                     shuffle=False):
            state, metrics = step(state, bx, by, jax.random.PRNGKey(2))
            losses.append(metrics["loss"])
        assert len(losses) == 2, len(losses)
        for l in losses:
            v = float(l)
            assert np.isfinite(v), v
            print(f"loss {v:.6f}", flush=True)
        # sharded save: every process writes its own shards (no host gather)
        checkpoints.save_sharded(ckpt_dir, {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "step": state.step,
        })
        print(f"pnorm {_param_norm(state.params):.6f}", flush=True)
    print("WORKER_OK", flush=True)


def _param_norm(params) -> float:
    import jax
    import jax.numpy as jnp

    leaves = [jnp.sum(x.astype(jnp.float32) ** 2)
              for x in jax.tree_util.tree_leaves(params)]
    return float(jnp.sqrt(sum(leaves)))


def restore_mode(ckpt_dir: str) -> None:
    """Restore the train-mode sharded checkpoint under a DIFFERENT process
    count / devices-per-process split than it was written with (VERDICT r4
    item 7: cross-MESH-shape restore was covered, cross-PROCESS-count was
    not). Every restoring process reads shards other processes wrote."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from samplenet_tpu.parallel.mesh import make_mesh
    from samplenet_tpu.train import checkpoints
    from samplenet_tpu.train.classification import (
        SampleNetConfig,
        create_samplenet_state,
    )

    mesh = make_mesh()
    scfg = SampleNetConfig(num_out_points=8, bottleneck_size=32,
                           group_size=4, batch_size=len(jax.devices()) * 2)
    _, state = create_samplenet_state(scfg, 64, jax.random.PRNGKey(0))
    with mesh:
        rep = NamedSharding(mesh, P())
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, t)
        target = {"params": put(state.params),
                  "batch_stats": put(state.batch_stats),
                  "step": jax.device_put(state.step, rep)}
        tree = checkpoints.restore_sharded(ckpt_dir, target)
        print(f"step {int(tree['step'])}", flush=True)
        print(f"pnorm {_param_norm(tree['params']):.6f}", flush=True)
    print("WORKER_OK", flush=True)


def uneven_mode(proc_id: int, nproc: int) -> None:
    """Process-local datasets of different lengths per host: the pipeline
    must agree on min-across-hosts batches instead of deadlocking."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from samplenet_tpu.parallel.input_pipeline import global_batches
    from samplenet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    global_batch, n_pts = 2 * nproc, 4
    local_batch = global_batch // nproc
    # host p holds 2*local_batch + p rows -> per-host batch counts differ
    # (2, 2, 3, 3 at local_batch=2); the synced count must be min = 2
    lengths = [2 * local_batch + p for p in range(nproc)]

    def host_data(p):
        base = float(p * 1000)
        d = base + np.arange(
            lengths[p] * n_pts * 3, dtype=np.float32).reshape(
                lengths[p], n_pts, 3)
        y = (np.arange(lengths[p]) % 4).astype(np.int32)
        return d, y

    data, labels = host_data(proc_id)

    @jax.jit
    def reduce_batch(bx, by):
        return jnp.sum(bx), jnp.sum(by)

    n_seen = 0
    for i, (bx, by) in enumerate(global_batches(
            mesh, data, labels, global_batch, shuffle=False,
            process_local=True)):
        assert bx.shape == (global_batch, n_pts, 3), bx.shape
        got_x, got_y = reduce_batch(bx, by)
        # expected: rows [i*lb:(i+1)*lb] of EVERY host's local data
        exp_x = sum(
            host_data(p)[0][i * local_batch:(i + 1) * local_batch].sum()
            for p in range(nproc))
        exp_y = sum(
            int(host_data(p)[1][i * local_batch:(i + 1) * local_batch].sum())
            for p in range(nproc))
        assert np.isclose(float(got_x), float(exp_x)), (i, float(got_x),
                                                        float(exp_x))
        assert int(got_y) == exp_y, (i, int(got_y), exp_y)
        print(f"batch {i} sum {float(got_x)}", flush=True)
        n_seen += 1
    assert n_seen == min(l // local_batch for l in lengths), n_seen
    print("WORKER_OK", flush=True)


def main() -> None:
    proc_id, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "pipeline"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=proc_id)

    if mode == "train":
        train_mode(nproc, sys.argv[5])
        return
    if mode == "restore":
        restore_mode(sys.argv[5])
        return
    if mode == "uneven":
        uneven_mode(proc_id, nproc)
        return

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
