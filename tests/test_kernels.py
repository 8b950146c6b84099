"""Direct Pallas-kernel coverage at shapes that take the fused path.

The aggregator parity tests use tiny dims (HID=32), which fall back to the
plain-XLA reference implementations inside each kernel module; these tests
use pallas-eligible shapes (C, H multiples of 128, M >= tile) so the actual
kernel bodies run under interpret mode on the CPU suite.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from catseg_tpu.kernels.mlp import fused_mlp, _reference as mlp_reference


def _mlp_inputs(M=1024, C=128, H=512, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(M, C).astype(np.float32) * 0.5
    w1 = rng.randn(C, H).astype(np.float32) * 0.1
    b1 = rng.randn(H).astype(np.float32) * 0.1
    w2 = rng.randn(H, C).astype(np.float32) * 0.1
    b2 = rng.randn(C).astype(np.float32) * 0.1
    return x, w1, b1, w2, b2


def test_fused_mlp_gelu_matches_torch():
    x, w1, b1, w2, b2 = _mlp_inputs()
    got = fused_mlp(*(jnp.asarray(a) for a in (x, w1, b1, w2, b2)), "gelu")
    h = torch.nn.functional.gelu(torch.from_numpy(x) @ torch.from_numpy(w1) + torch.from_numpy(b1))
    want = h @ torch.from_numpy(w2) + torch.from_numpy(b2)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5, rtol=1e-5)


def test_fused_mlp_relu_ragged_tail():
    # M not a multiple of the tile: last grid step is a partial block
    x, w1, b1, w2, b2 = _mlp_inputs(M=1024 + 300)
    got = fused_mlp(*(jnp.asarray(a) for a in (x, w1, b1, w2, b2)), "relu")
    h = torch.relu(torch.from_numpy(x) @ torch.from_numpy(w1) + torch.from_numpy(b1))
    want = h @ torch.from_numpy(w2) + torch.from_numpy(b2)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5, rtol=1e-5)


def test_fused_mlp_grad_matches_reference():
    x, w1, b1, w2, b2 = _mlp_inputs(M=1024, seed=3)
    args = tuple(jnp.asarray(a) for a in (x, w1, b1, w2, b2))

    def loss_fused(*a):
        return jnp.sum(fused_mlp(*a, "gelu") ** 2)

    def loss_ref(*a):
        return jnp.sum(mlp_reference(*a, "gelu") ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
