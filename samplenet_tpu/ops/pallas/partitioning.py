"""SPMD partitioning for the Pallas kernels.

A `pallas_call` is an opaque custom call to GSPMD/Shardy: without a
partitioning rule, a batch-sharded caller gets the kernel REPLICATED —
XLA all-gathers every operand to every device and each chip redundantly
computes the full batch (measured: 8 all-gathers on an 8-device mesh).

Every kernel in this package is embarrassingly batch-parallel (the grid
iterates over B; nothing crosses batch elements), so the right contract is:
shard dim 0 over whatever mesh axes the caller's data uses, replicate the
feature dims, and run the unchanged kernel on the per-shard batch. This
module declares exactly that via `jax.experimental.custom_partitioning`,
with a Shardy sharding rule for propagation (JAX >= 0.9 defaults to the
Shardy partitioner) and a GSPMD `infer_sharding_from_operands` fallback.

With this wrapper, a caller that jits over a `jax.sharding.Mesh` with
[B, ...] inputs sharded P('data') keeps the kernels local to each device
by construction — the flagship eval path (ops/matching.py) and the fused
soft projection (models/soft_projection.py) inherit multi-chip execution
with zero collectives inside the sampling op. (The reference has no
distributed story at all — SURVEY.md section 2c; this layer is the
rebuild's own charter.)
"""

from __future__ import annotations

import functools

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _batch_spec(arg_shapes, replicated_argnums):
    """The dim-0 partition spec shared by the batched operands: the first
    non-trivial dim-0 spec found (None -> replicated everywhere)."""
    for i, a in enumerate(arg_shapes):
        if i in replicated_argnums:
            continue
        spec = a.sharding.spec if getattr(a, "shape", ()) else ()
        if spec and spec[0] is not None:
            return spec[0]
    return None


def batch_partition(impl, *, rule: str, static_argnums: tuple[int, ...],
                    replicated_argnums: tuple[int, ...] = ()):
    """Wraps a batch-leading kernel entry point in custom_partitioning.

    Args:
      impl: function taking tensor operands (all [B, ...] except rank-0
        scalars, which are replicated) followed by the static (hashable)
        config args named by `static_argnums`, returning one array or a
        tuple of [B, ...] arrays.
      rule: Shardy einsum-like sharding rule, e.g.
        "b n c, b m c -> b n, b n" (a rank-0 operand is an empty term).
      static_argnums: positions of the static config args (must be the
        TRAILING positions of impl's signature).
      replicated_argnums: tensor operands that are NOT batch-leading (e.g.
        weight matrices shared by every batch element) — forced replicated.

    Returns the partitioned callable (same positional signature as impl).
    """
    cp = custom_partitioning(impl, static_argnums=static_argnums)
    n_static = len(static_argnums)

    def _shardings(mesh, arg_shapes, result_shape):
        import jax

        b = _batch_spec(arg_shapes, replicated_argnums)
        batched = NamedSharding(mesh, P(b))
        scalar = NamedSharding(mesh, P())
        arg_sh = tuple(
            batched
            if getattr(a, "shape", ()) and i not in replicated_argnums
            else scalar
            for i, a in enumerate(arg_shapes)
        )
        out_sh = jax.tree.map(
            lambda r: batched if r.shape else scalar, result_shape
        )
        return arg_sh, out_sh

    def partition(*args):
        static, (mesh, arg_shapes, result_shape) = (
            args[:n_static], args[n_static:])
        arg_sh, out_sh = _shardings(mesh, arg_shapes, result_shape)

        def lower_fn(*tensors):
            return impl(*tensors, *static)

        return mesh, lower_fn, out_sh, arg_sh

    def infer_sharding_from_operands(*args):
        (mesh, arg_shapes, result_shape) = args[len(static_argnums):]
        _, out_sh = _shardings(mesh, arg_shapes, result_shape)
        return out_sh

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
    )
    return cp


def batch_partitioned(*, rule: str, static_argnums: tuple[int, ...]):
    """Decorator form of `batch_partition`."""
    return functools.partial(
        batch_partition, rule=rule, static_argnums=static_argnums)
