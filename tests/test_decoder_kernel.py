"""Fused phase-plane decoder kernel vs the plain-XLA _up_tail composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catseg_tpu.configs import eval_preset, vitb384
from catseg_tpu.core import aggregator as A
from catseg_tpu.core import catseg
from catseg_tpu.kernels.decoder import (
    decoder_kernel_applicable,
    from_planes,
    fused_decoder,
    to_planes,
)


@pytest.fixture(scope="module")
def agg_params():
    cfg = eval_preset(vitb384())
    p = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    return p["agg"]


def test_plane_roundtrip():
    rng = np.random.RandomState(0)
    for depth, hw in ((0, 24), (1, 48), (2, 96)):
        x = jnp.asarray(rng.randn(2, hw, hw, 3), jnp.float32)
        got = from_planes(to_planes(x, depth), depth)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


def _reference(x, g1, g2, d1, d2, head, B, T):
    h = A._up_tail(x, (g1,), d1, None, B, T)
    return A._up_tail(h, (g2,), d2, head, B, T)


@pytest.mark.parametrize("B,T", [(2, 2), (1, 3)])  # T even -> 2 slabs/step, odd -> 1
def test_fused_decoder_matches_xla(agg_params, B, T):
    rng = np.random.RandomState(1)
    d1, d2, head = agg_params["decoder1"], agg_params["decoder2"], agg_params["head"]
    x = jnp.asarray(rng.randn(B * T, 24, 24, 128) * 0.5, jnp.float32)
    g1 = jnp.asarray(rng.randn(B, 48, 48, 32) * 0.5, jnp.float32)
    g2 = jnp.asarray(rng.randn(B, 96, 96, 16) * 0.5, jnp.float32)
    assert decoder_kernel_applicable(x, d1, d2)
    want = _reference(x, g1, g2, d1, d2, head, B, T)
    got = fused_decoder(x, g1, g2, d1, d2, head, B, T)
    assert got.shape == want.shape == (B * T, 96, 96)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-5)


def test_fused_decoder_gradients(agg_params):
    """The custom VJP recomputes through the XLA reference: grads must match."""
    rng = np.random.RandomState(2)
    B, T = 1, 2
    d1, d2, head = agg_params["decoder1"], agg_params["decoder2"], agg_params["head"]
    x = jnp.asarray(rng.randn(B * T, 24, 24, 128) * 0.3, jnp.float32)
    g1 = jnp.asarray(rng.randn(B, 48, 48, 32) * 0.3, jnp.float32)
    g2 = jnp.asarray(rng.randn(B, 96, 96, 16) * 0.3, jnp.float32)

    def loss_fused(x, d1, d2):
        return jnp.sum(jnp.tanh(fused_decoder(x, g1, g2, d1, d2, head, B, T) * 0.1))

    def loss_ref(x, d1, d2):
        return jnp.sum(jnp.tanh(_reference(x, g1, g2, d1, d2, head, B, T) * 0.1))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, d1, d2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, d1, d2)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_grouped_conv_weight_layout():
    """_conv_w_grouped places each output phase's 9 tap blocks 1:1 onto its
    ROW GROUP's distinct rolled variants (rest zero), so each group's matmul
    equals the per-phase form: out_p = sum_t W_t @ rolled(key(p, t)).
    Groups must tile the phases contiguously (concatenated outputs are
    phase-major) and stay at the full-MXU-fill K-waste the docstring claims
    (12 variants at depth 1, 18 at depth 2)."""
    from catseg_tpu.kernels.decoder import (
        _conv_w_grouped, _conv_w_mat, _row_groups)

    rng = np.random.RandomState(3)
    for depth, cin, cout, want_D in ((1, 5, 7, 12), (2, 4, 3, 18)):
        w = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
        wm = _conv_w_mat(w)                       # (cout, 9*cin)
        wb = np.asarray(_conv_w_grouped(wm, cin, depth))
        groups = _row_groups(depth)
        s = 1 << depth
        assert wb.shape == (s, s * cout, want_D * cin)
        wm = np.asarray(wm)
        next_phase = 0
        for g, (phases, keys, pmaps) in enumerate(groups):
            assert phases[0] == next_phase  # contiguous tiling
            next_phase = phases[-1] + 1
            assert len(keys) == want_D
            for i, kmap in enumerate(pmaps):
                assert len(set(kmap)) == 9  # taps map to distinct variants
                got = np.zeros((cout, want_D * cin), np.float32)
                for t, j in enumerate(kmap):
                    got[:, j * cin:(j + 1) * cin] = wm[:, t * cin:(t + 1) * cin]
                np.testing.assert_array_equal(
                    wb[g, i * cout:(i + 1) * cout], got)
        assert next_phase == s * s
