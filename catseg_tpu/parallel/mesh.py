"""Device mesh + shardings.

The reference's entire distributed layer is DDP + eval all_gather over NCCL
(SURVEY.md §2.6).  Here the single-controller JAX equivalent:

- axis "data": batch-dim data parallelism (training batches, eval images);
  gradient psums are inserted by the SPMD partitioner.
- axis "class": the open-vocabulary class axis T — this model family's
  natural model-parallel direction.  Cost volume, swin stage, and decoder are
  embarrassingly parallel over T; linear class attention reduces over T
  through its KV/K-sum contractions, which XLA turns into two small psums per
  layer.  `constrain_class_axis` drops a sharding constraint on the (B, T,
  H, W, C) activations so the partitioner keeps the T axis distributed
  through the whole aggregator.

No process launcher, no DDP wrapper: one mesh, annotated arrays.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: list[Mesh] = []


@contextlib.contextmanager
def use_mesh(mesh: Mesh | None):
    """Activate a mesh for trace-time sharding constraints inside model code."""
    if mesh is None:
        yield
        return
    _ACTIVE_MESH.append(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.pop()


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH[-1] if _ACTIVE_MESH else None


def make_mesh(n_data: int | None = None, n_class: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_class
    devs = np.asarray(devices[: n_data * n_class]).reshape(n_data, n_class)
    return Mesh(devs, axis_names=("data", "class"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every leaf of a host batch on the mesh, sharded on axis 0."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def constrain_class_axis(x, mesh: Mesh | None = None):
    """Constrain a (B, T, ...) activation to ('data', 'class', ...).

    With the T axis distributed, the aggregator's per-class stages (corr
    embed, swin, decoder) stay fully local; only the class-attention KV/K-sum
    reductions and the top-k cross the axis (XLA inserts the psums)."""
    mesh = mesh if mesh is not None else active_mesh()
    if mesh is None or "class" not in mesh.axis_names or mesh.shape["class"] == 1:
        return x
    if x.shape[1] % mesh.shape["class"] != 0:
        return x  # unshardable T (e.g. truncated odd pad_len); stay on data axis
    spec = P("data", "class") if x.ndim >= 2 else P("data")
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def pallas_allowed() -> bool:
    """True when opaque Pallas custom calls are safe to emit.

    A pallas_call cannot be SPMD-partitioned by XLA: under an active mesh
    the partitioner's handling of the opaque call composes incorrectly with
    sharded operands (observed as deterministic O(1) divergence of the
    sharded aggregator at flagship dims — tests/test_sharded_flagship.py),
    so every kernel dispatch falls back to its plain-XLA formulation, which
    the partitioner handles with ordinary collectives.  Single-device jit
    (mesh absent) keeps the fused kernels."""
    return active_mesh() is None
