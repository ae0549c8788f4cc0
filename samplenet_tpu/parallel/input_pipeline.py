"""Multi-host input pipeline helpers.

On a multi-host TPU slice each process feeds only its local devices; the
global batch is the concatenation of per-host shards and XLA's GSPMD sees it
as one sharded array (jax.make_array_from_process_local_data). DCN carries
nothing but the initial dataset split — activations/collectives stay on ICI
(SURVEY.md §2c rebuild obligation).
"""

from __future__ import annotations

from collections.abc import Iterator

import jax
import numpy as np

from samplenet_tpu.parallel.mesh import batch_sharding


def host_shard(data: np.ndarray, labels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Static per-host split of a dataset (each host loads 1/num_processes)."""
    n = jax.process_count()
    if n == 1:
        return data, labels
    i = jax.process_index()
    per = len(labels) // n
    sl = slice(i * per, (i + 1) * per)
    return data[sl], labels[sl]


def global_batches(
    mesh,
    data: np.ndarray,
    labels: np.ndarray,
    global_batch: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    process_local: bool = False,
) -> Iterator[tuple[jax.Array, jax.Array]]:
    """Yields globally-sharded device arrays from process-local data.

    Each host draws its local slice of every global batch (same RNG stream
    everywhere so shard boundaries agree), then assembles a global jax.Array
    with the mesh's batch sharding.

    process_local=True means `data`/`labels` are ALREADY this host's share
    (each host loaded its own files) and lengths may differ across hosts;
    the batch count is then synchronised to the minimum across processes —
    without that sync a shorter host would stop iterating first and every
    other host's `make_array_from_process_local_data` would hang waiting
    for its shard.
    """
    sharding = batch_sharding(mesh)
    n_proc = jax.process_count()
    local_batch = global_batch // n_proc
    if process_local:
        local_data, local_labels = data, labels
    else:
        local_data, local_labels = host_shard(data, labels)
    order = np.arange(len(local_labels))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    n_batches = len(order) // local_batch
    if process_local and n_proc > 1:
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray(n_batches, np.int64))
        n_batches = int(np.min(counts))
    for s in range(0, n_batches * local_batch, local_batch):
        idx = order[s : s + local_batch]
        if n_proc == 1:
            yield (jax.device_put(local_data[idx], sharding),
                   jax.device_put(local_labels[idx], sharding))
        else:
            yield (
                jax.make_array_from_process_local_data(
                    sharding, local_data[idx]),
                jax.make_array_from_process_local_data(
                    sharding, local_labels[idx]),
            )
