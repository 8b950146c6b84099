"""Device mesh + shardings.

The reference's entire distributed layer is DDP + eval all_gather over NCCL
(SURVEY.md §2.6).  Here the single-controller JAX equivalent:

- axis "data": batch-dim data parallelism (training batches, eval images).
  The product train/eval steps run each device's slice of the batch through
  the UNCHANGED single-chip program inside one `jax.shard_map` manual region
  and psum the tiny results (gradients / confusion matrices) — the
  reference's DDP property that distribution never alters the per-device
  kernels (train_net.py:317-324), which keeps the fused Pallas kernels live
  at any world size.
- axis "class": the open-vocabulary class axis T — this model family's
  natural model-parallel direction.  Cost volume, swin stage, and decoder are
  embarrassingly parallel over T; linear class attention reduces over T
  through its KV/K-sum contractions, which XLA turns into two small psums per
  layer.  `constrain_class_axis` drops a sharding constraint on the (B, T,
  H, W, C) activations so the partitioner keeps the T axis distributed
  through the whole aggregator (GSPMD paths); `shard_kernel` lets the fused
  kernels run on their local (image, class-slab) blocks inside those paths.

No process launcher, no DDP wrapper: one mesh, annotated arrays.
"""

from __future__ import annotations

import contextlib
import warnings

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: list = []
_LOCAL = object()  # sentinel: inside a shard_map manual region


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


@contextlib.contextmanager
def local_region():
    """Mark a shard_map body: model code traced inside sees no active mesh
    (per-device computation is ordinary single-chip code — sharding
    constraints would be meaningless and Pallas kernels are safe)."""
    _ACTIVE_MESH.append(_LOCAL)
    try:
        yield
    finally:
        _ACTIVE_MESH.pop()


def active_mesh() -> Mesh | None:
    if not _ACTIVE_MESH:
        return None
    top = _ACTIVE_MESH[-1]
    return None if top is _LOCAL else top


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
        # unshardable T (e.g. truncated odd pad_len): stay on the data axis.
        # Loud, not silent — an N-class mesh quietly degrading to data-only
        # is the same failure family as a sharded eval quietly going
        # sequential (evaluation/harness.py warns there too).
        warnings.warn(
            f"class axis T={x.shape[1]} not divisible by mesh class axis "
            f"{mesh.shape['class']}; activation stays data-sharded only "
            "(class-axis devices idle through the aggregator)",
            stacklevel=2)
        return x
    spec = P("data", "class") if x.ndim >= 2 else P("data")
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def pallas_allowed() -> bool:
    """True when opaque Pallas custom calls are safe to emit directly.

    A pallas_call cannot be SPMD-partitioned by XLA's GSPMD partitioner:
    under an active (auto-sharding) mesh the partitioner's handling of the
    opaque call composes incorrectly with sharded operands (observed as
    deterministic O(1) divergence of the sharded aggregator at flagship
    dims, round 3).  Inside a `shard_map` manual region (`local_region`)
    and on single-device jit the kernels are safe: they only ever see their
    local block.  GSPMD call sites that can express their operand layout
    should dispatch through :func:`shard_kernel` instead of falling back to
    plain XLA."""
    return active_mesh() is None


def mesh_divides(n_data_dim: int, n_class_dim: int | None = None) -> bool:
    """True when no GSPMD mesh is active, or the active mesh's axes divide
    the given batch (and optionally class) dimension — the condition for a
    fused kernel to dispatch through :func:`shard_kernel`."""
    mesh = active_mesh()
    if mesh is None:
        return True
    if n_data_dim % mesh.shape.get("data", 1) != 0:
        return False
    if n_class_dim is not None and n_class_dim % mesh.shape.get("class", 1) != 0:
        return False
    return True


def shard_kernel(fn, *args, specs, out_spec):
    """Run a fused-kernel composition under the active GSPMD mesh by entering
    a `jax.shard_map` manual region (identity without a mesh).

    ``specs``: one PartitionSpec per positional arg (tree-prefix semantics:
    a single P() covers a whole params dict).  Inside the region the model
    code sees no active mesh (``local_region``), so geometry gates treat the
    local block like single-chip work and Pallas kernels are emitted; XLA
    inserts any reshard needed to materialize ``specs`` at the boundary.
    """
    mesh = active_mesh()
    if mesh is None:
        return fn(*args)

    def body(*local_args):
        with local_region():
            return fn(*local_args)

    return jax.shard_map(body, mesh=mesh, in_specs=specs, out_specs=out_spec,
                         check_vma=False)(*args)
