"""shard_map-based distribution paths (round-4 redesign).

The product multi-chip steps run each device's batch slice through the
UNCHANGED single-chip program inside a jax.shard_map manual region
(parallel/mesh.py docstring) — these tests pin:

- DP train step (mesh {data:N}) == single-device step bit-tolerantly
  (pmean of per-shard grads vs global grads; bce_loss is a plain mean over
  equal-shaped elements so the decomposition is exact up to fp reorder);
- shard_kernel dispatches a fused-kernel composition under a GSPMD mesh and
  matches the meshless call;
- constrain_class_axis warns (not silently no-ops) on an indivisible T.
"""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from catseg_tpu.parallel.mesh import (
    constrain_class_axis, make_mesh, shard_kernel, use_mesh)

from test_catseg_model import mini_cfg


def _train_inputs(cfg, B, seed=0):
    rng = np.random.RandomState(seed)
    T = 6
    images = rng.rand(B, 128, 128, 3).astype(np.float32) * 255.0
    targets = rng.randint(0, T, (B, 128, 128)).astype(np.int32)
    tokens = np.zeros((T, cfg.clip.context), np.int32)
    tokens[:, 0] = 1
    tokens[:, 1] = np.arange(T) + 10
    tokens[:, 2] = 2
    return images, targets, tokens


def test_dp_train_step_matches_single_device():
    from catseg_tpu.train.loop import init_train_state, make_train_step

    cfg = mini_cfg(num_classes=6, crop_size=128)
    images, targets, tokens = _train_inputs(cfg, B=4)
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)

    def run(mesh):
        step = make_train_step(cfg, tx, tokens, mesh=mesh)
        p = jax.tree.map(lambda a: a + 0, state.params)
        o = jax.tree.map(lambda a: a + 0 if hasattr(a, "dtype") else a,
                         state.opt_state)
        p2, _, loss = step(p, o, jnp.asarray(images), jnp.asarray(targets))
        return float(loss), p2

    loss1, p1 = run(None)
    loss4, p4 = run(make_mesh(n_data=4, n_class=1))
    assert abs(loss1 - loss4) < 1e-5, (loss1, loss4)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
        p1, p4)
    worst = max(jax.tree.leaves(diffs))
    assert worst < 1e-4, worst


def test_shard_kernel_matches_meshless():
    # a pallas-kernel composition (fused_mlp fires on CPU interpret at these
    # dims) dispatched through shard_kernel under a {data:2, class:4} mesh
    from catseg_tpu.kernels.mlp import fused_mlp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 4, 4, 128).astype(np.float32))
    w1 = jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(256).astype(np.float32))
    w2 = jnp.asarray(rng.randn(256, 128).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(128).astype(np.float32))

    def f(x, w1, b1, w2, b2):
        return fused_mlp(x, w1, b1, w2, b2, "gelu")

    want = np.asarray(f(x, w1, b1, w2, b2))
    mesh = make_mesh(n_data=2, n_class=4)

    def meshed(x, w1, b1, w2, b2):
        with use_mesh(mesh):
            return shard_kernel(f, x, w1, b1, w2, b2,
                                specs=(P("data", "class"), P(), P(), P(), P()),
                                out_spec=P("data", "class"))

    got = np.asarray(jax.jit(meshed)(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_class_axis_indivisible_warns():
    mesh = make_mesh(n_data=2, n_class=4)
    x = jnp.zeros((2, 9, 4, 4, 8))  # T=9 not divisible by 4
    with use_mesh(mesh):
        with pytest.warns(UserWarning, match="not divisible"):
            out = constrain_class_axis(x)
    assert out.shape == x.shape


def test_divisible_class_axis_does_not_warn():
    mesh = make_mesh(n_data=2, n_class=4)
    x = jax.device_put(jnp.zeros((2, 8, 4, 4, 8)),
                       NamedSharding(mesh, P()))
    with use_mesh(mesh):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            constrain_class_axis(x)
