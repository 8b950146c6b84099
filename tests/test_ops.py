"""Parity tests for catseg_tpu.ops against torch CPU functional ops.

torch here is the *oracle for numerics semantics* (the reference model is
torch); no reference code is imported.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from catseg_tpu import ops


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", [((24, 24), (48, 48)), ((14, 14), (24, 24)),
                                          ((640, 427), (384, 384)), ((12, 12), (24, 24)),
                                          ((7, 9), (30, 13))])
@pytest.mark.parametrize("align", [False, True])
def test_bilinear_matches_torch(in_hw, out_hw, align):
    x = _rand(2, in_hw[0], in_hw[1], 3)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                         mode="bilinear", align_corners=align).permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    # torch CPU's vectorized kernel rounds source coords slightly differently
    # on large downscales; 1e-4 abs on N(0,1) data is far below mIoU noise.
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("in_hw,out_hw", [((14, 14), (24, 24)), ((16, 16), (24, 24)),
                                          ((24, 24), (14, 14))])
def test_bicubic_matches_torch(in_hw, out_hw):
    x = _rand(1, in_hw[0], in_hw[1], 8, seed=3)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
                         mode="bicubic", align_corners=False).permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.resize_bicubic(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k,pad,stride", [(3, 1, 1), (7, 3, 1), (1, 0, 1), (3, 1, 2)])
def test_conv2d_matches_torch(k, pad, stride):
    x = _rand(2, 12, 12, 5, seed=1)
    w = _rand(k, k, 5, 7, seed=2)  # HWIO
    b = _rand(7, seed=4)
    want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(w).permute(3, 2, 0, 1),
                    torch.from_numpy(b), stride=stride, padding=pad)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride, padding=pad))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("k", [2, 4])
def test_conv_transpose_nonoverlap_matches_torch(k):
    x = _rand(2, 6, 6, 10, seed=5)
    w_t = _rand(10, 8, k, k, seed=6)  # torch layout (Cin, Cout, kh, kw)
    b = _rand(8, seed=7)
    want = F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                              torch.from_numpy(w_t), torch.from_numpy(b), stride=k)
    want = want.permute(0, 2, 3, 1).numpy()
    w_ours = np.transpose(w_t, (0, 2, 3, 1))  # (Cin, kh, kw, Cout)
    got = np.asarray(ops.conv_transpose2d_nonoverlap(jnp.asarray(x), jnp.asarray(w_ours), jnp.asarray(b), kernel=k))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_conv_grads_work_in_bf16():
    """Regression: preferred_element_type=f32 on a bf16 conv breaks the
    gradient rule (fp32 cotangent vs bf16 rhs) — both conv paths must be
    differentiable at the training compute dtype."""
    x = jnp.asarray(_rand(2, 6, 6, 10, seed=5), jnp.bfloat16)
    wt = jnp.asarray(_rand(10, 2, 2, 8, seed=6), jnp.bfloat16)
    wc = jnp.asarray(_rand(3, 3, 10, 8, seed=7), jnp.bfloat16)

    def f(x, wt, wc):
        y = ops.conv_transpose2d_nonoverlap(x, wt, None, kernel=2)
        z = ops.conv2d(x, wc, None, padding=1)
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(z.astype(jnp.float32))

    gx, gwt, gwc = jax.grad(f, argnums=(0, 1, 2))(x, wt, wc)
    assert gx.shape == x.shape and gwt.shape == wt.shape and gwc.shape == wc.shape
    assert np.isfinite(np.asarray(gx, np.float32)).all()


@pytest.mark.parametrize("pool", [(2, 2), (6, 6), (1, 1)])
def test_avg_pool_matches_torch(pool):
    x = _rand(3, 24, 24, 4, seed=8)
    want = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), pool).permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.avg_pool2d(jnp.asarray(x), pool))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_layer_norm_matches_torch():
    x = _rand(4, 10, 16, seed=9)
    scale = _rand(16, seed=10)
    bias = _rand(16, seed=11)
    want = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale), torch.from_numpy(bias)).numpy()
    got = np.asarray(ops.layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("groups,C", [(4, 64), (2, 32), (1, 16)])
def test_group_norm_matches_torch(groups, C):
    x = _rand(2, 6, 6, C, seed=12)
    scale = _rand(C, seed=13)
    bias = _rand(C, seed=14)
    want = F.group_norm(torch.from_numpy(x).permute(0, 3, 1, 2), groups,
                        torch.from_numpy(scale), torch.from_numpy(bias)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(ops.group_norm(jnp.asarray(x), groups, jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_window_roundtrip():
    x = jnp.asarray(_rand(3, 24, 24, 5, seed=15))
    w = ops.window_partition(x, 12)
    assert w.shape == (3 * 4, 144, 5)
    back = ops.window_reverse(w, 12, 24, 24)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_unfold_fold_matches_torch():
    kernel, stride = 384, 256
    x = _rand(1, 640, 640, 3, seed=16)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    unf = F.unfold(xt, kernel_size=kernel, stride=stride)  # (1, C*k*k, L)
    want_tiles = unf.squeeze(0).T.reshape(-1, 3, kernel, kernel).permute(0, 2, 3, 1).numpy()
    got_tiles = np.asarray(ops.unfold_tiles(jnp.asarray(x), kernel, stride))
    np.testing.assert_allclose(got_tiles, want_tiles, atol=0, rtol=0)

    # fold sums overlaps identically
    folded_t = F.fold(unf, (640, 640), kernel_size=kernel, stride=stride).permute(0, 2, 3, 1).numpy()
    folded_j = np.asarray(ops.fold_tiles(jnp.asarray(got_tiles), (640, 640), kernel, stride))
    np.testing.assert_allclose(folded_j, folded_t, atol=1e-5, rtol=1e-5)

    # divisor map equals fold(unfold(ones))
    ones = torch.ones(1, 1, 640, 640)
    div_t = F.fold(F.unfold(ones, kernel_size=kernel, stride=stride), (640, 640),
                   kernel_size=kernel, stride=stride).squeeze().numpy()
    div_j = ops.fold_divisor((640, 640), kernel, stride)[:, :, 0]
    np.testing.assert_array_equal(div_j, div_t)


def test_resize_to_single_pixel_matches_torch():
    """out_size=1: align_corners=False samples the source CENTER (torch's
    center-sampling formula), only align_corners=True collapses to coord 0."""
    import torch
    import torch.nn.functional as F

    from catseg_tpu.ops.resize import _linear_weights

    for n in (3, 5, 8):
        x = torch.arange(float(n))[None, None, :, None]
        for ac in (False, True):
            want = F.interpolate(x, size=(1, 1), mode="bilinear", align_corners=ac)
            got = _linear_weights(n, 1, ac) @ np.arange(float(n))
            np.testing.assert_allclose(got, want.reshape(1).numpy(), atol=1e-6)
