"""Device mesh + sharding utilities (the distributed layer the reference
never had — SURVEY.md section 2c).

Design: a 2-axis mesh ('data', 'model'). Every tensor in this workload is
batch-leading ([B, N, 3], [B], [B, m, 3]), so data parallelism shards axis 0
over 'data' and XLA inserts the psum for the loss/grad reduction. The 'model'
axis shards the widest layers (the 1024-wide PointNet feature layer and the
3*m-wide SampleNet regressor head) for tensor parallelism — GSPMD places the
all-gathers on ICI.

Multi-host: `initialize_distributed` wraps jax.distributed.initialize; data
loading stays per-host (DCN never sees activations).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs: Any) -> None:
    """jax.distributed.initialize, tolerating single-process runs."""
    if jax.process_count() > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(**kwargs)


def make_mesh(
    data: int | None = None,
    model: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Builds a ('data', 'model') mesh over the available devices.

    With defaults, all devices go to the data axis. `model > 1` carves a
    tensor-parallel axis (adjacent devices share ICI hops on v5e)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] tensors sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of batch-leading arrays with data sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def param_sharding_rules(mesh: Mesh) -> Any:
    """Returns a fn mapping a param path/leaf to a NamedSharding.

    Heuristic tensor parallelism: any 2-D kernel whose output dim is a
    multiple of 8*model and >= 512 is sharded over 'model' on the output
    axis; biases of such layers likewise; everything else replicated.
    """
    model = mesh.shape["model"]

    def rule(path: tuple, leaf: jax.ShapeDtypeStruct) -> NamedSharding:
        if model == 1:
            return NamedSharding(mesh, P())
        shape = leaf.shape
        if len(shape) == 2 and shape[-1] >= 512 and shape[-1] % (8 * model) == 0:
            return NamedSharding(mesh, P(None, "model"))
        if len(shape) == 1 and shape[-1] >= 512 and shape[-1] % (8 * model) == 0:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return rule


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Apply param_sharding_rules to a param pytree (device_put)."""
    rule = param_sharding_rules(mesh)

    def place(path, leaf):
        sh = rule(path, jax.ShapeDtypeStruct(leaf.shape, leaf.dtype))
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(place, params)
