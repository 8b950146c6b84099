"""Space-to-depth decoder path vs the plain-XLA formulation.

The S2D path (catseg_tpu/ops/s2d.py, aggregator._up_tail_s2d) must be
numerically equivalent to _up_tail — same math, different layout — including
gradients, since training uses the same decoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catseg_tpu.configs import eval_preset, vitb384
from catseg_tpu.core import aggregator as A
from catseg_tpu.core import catseg
from catseg_tpu.ops.s2d import depth_to_space, space_to_depth


@pytest.fixture(scope="module")
def dec_params():
    cfg = eval_preset(vitb384())
    p = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    return p["agg"]


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 8, 5), jnp.float32)
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


@pytest.mark.parametrize("stage", ["decoder1", "decoder2"])
def test_up_tail_s2d_matches_plain(dec_params, stage):
    rng = np.random.RandomState(1)
    B, T = 2, 3
    if stage == "decoder1":
        dp, head = dec_params["decoder1"], None
        x = jnp.asarray(rng.randn(B * T, 8, 8, 128), jnp.float32)
        g = jnp.asarray(rng.randn(B, 16, 16, 32), jnp.float32)
    else:
        dp, head = dec_params["decoder2"], dec_params["head"]
        x = jnp.asarray(rng.randn(B * T, 8, 8, 64), jnp.float32)
        g = jnp.asarray(rng.randn(B, 16, 16, 16), jnp.float32)
    want = A._up_tail(x, (g,), dp, head, B, T)
    got = A._up_tail_s2d(x, (g,), dp, head, B, T)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_up_tail_s2d_no_guidance(dec_params):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 6, 6, 64), jnp.float32)
    dp, head = dec_params["decoder2"], dec_params["head"]
    want = A._up_tail(x, (), dp, head, 2, 2)
    got = A._up_tail_s2d(x, (), dp, head, 2, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_up_tail_s2d_gradients_match(dec_params):
    """Training runs the same decoder: weight/input grads must agree."""
    rng = np.random.RandomState(3)
    B, T = 1, 2
    dp, head = dec_params["decoder2"], dec_params["head"]
    x = jnp.asarray(rng.randn(B * T, 6, 6, 64), jnp.float32)
    g = jnp.asarray(rng.randn(B, 12, 12, 16), jnp.float32)

    def loss(fn, x, dp, head):
        return jnp.sum(jnp.tanh(fn(x, (g,), dp, head, B, T)))

    gw = jax.grad(lambda x, dp: loss(A._up_tail, x, dp, head), argnums=(0, 1))(x, dp)
    gs = jax.grad(lambda x, dp: loss(A._up_tail_s2d, x, dp, head), argnums=(0, 1))(x, dp)
    for a, b in zip(jax.tree_util.tree_leaves(gw), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)
