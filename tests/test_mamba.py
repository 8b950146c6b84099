"""Selective-scan parity vs a sequential reference + VSS block smoke."""

import numpy as np

import jax
import jax.numpy as jnp

from catseg_tpu.core import mamba


def _sequential_scan(xs, dts, A, Bs, Cs, D, delta_bias):
    """selective_scan_ref semantics, plain numpy loop."""
    B, Dp, L = xs.shape
    G = Bs.shape[1]
    Dg = Dp // G
    N = A.shape[1]
    delta = np.log1p(np.exp(dts + delta_bias[None, :, None]))  # softplus
    y = np.zeros((B, Dp, L), np.float64)
    for b in range(B):
        h = np.zeros((Dp, N))
        for l in range(L):
            dA = np.exp(delta[b, :, l, None] * A)
            g_idx = np.repeat(np.arange(G), Dg)
            dBu = delta[b, :, l, None] * Bs[b, g_idx, :, l] * xs[b, :, l, None]
            h = dA * h + dBu
            y[b, :, l] = np.sum(h * Cs[b, g_idx, :, l], axis=-1)
    return y + D[None, :, None] * xs


def test_selective_scan_matches_sequential():
    rng = np.random.RandomState(0)
    B, G, Dg, L, N = 2, 4, 6, 10, 5
    Dp = G * Dg
    xs = rng.randn(B, Dp, L).astype(np.float32)
    dts = rng.randn(B, Dp, L).astype(np.float32) * 0.2
    A = -np.exp(rng.randn(Dp, N).astype(np.float32) * 0.2)
    Bs = rng.randn(B, G, N, L).astype(np.float32)
    Cs = rng.randn(B, G, N, L).astype(np.float32)
    D = rng.randn(Dp).astype(np.float32)
    bias = rng.randn(Dp).astype(np.float32) * 0.1
    got = np.asarray(mamba.selective_scan(
        jnp.asarray(xs), jnp.asarray(dts), jnp.asarray(A),
        jnp.asarray(Bs), jnp.asarray(Cs), jnp.asarray(D), jnp.asarray(bias)))
    want = _sequential_scan(xs, dts, A, Bs, Cs, D, bias)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_vss_block_smoke():
    cfg = mamba.SS2DConfig(d_model=32, d_state=4, expand=2.0)
    p = mamba.init_vss_block(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 32).astype(np.float32))
    out = mamba.vss_block_forward(p, x, cfg)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
