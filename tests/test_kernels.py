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


def _swin_layer_params(rng, C=128, Cg=32):
    import jax
    from catseg_tpu.core.aggregator import _init_swin_block

    k1, k2 = jax.random.split(rng)
    return {
        "swin1": _init_swin_block(k1, C, Cg),
        "swin2": _init_swin_block(k2, C, Cg),
        "guidance_norm": {"g": jnp.ones(Cg) * 1.1, "b": jnp.zeros(Cg) + 0.05},
    }


def test_fused_swin_pair_matches_blockwise_path():
    import jax
    from catseg_tpu.configs import CATSegConfig
    from catseg_tpu.core import aggregator as A

    B, T, H, W, C, Cg = 1, 2, 24, 24, 128, 32
    cfg = CATSegConfig(hidden_dim=C, num_heads=4, window_size=12,
                       feature_resolution=(H, W), appearance_guidance_proj_dim=Cg,
                       compute_dtype="float32")
    layer = _swin_layer_params(jax.random.PRNGKey(0), C, Cg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.randn(B, H, W, Cg).astype(np.float32) * 0.2)

    got = A.spatial_aggregation(x, g, layer, cfg)  # fused kernel (interpret on CPU)

    guid = A.layer_norm(g, layer["guidance_norm"]["g"], layer["guidance_norm"]["b"])
    want = A._swin_block(x, guid, layer["swin1"], cfg, shift=0)
    want = A._swin_block(want, guid, layer["swin2"], cfg, shift=6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)


def test_fused_swin_pair_no_guidance_and_grad():
    import jax
    from catseg_tpu.kernels.swin_block import fused_swin_pair, _reference_pair

    B, T, H, W, C = 1, 2, 24, 24, 128
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.2)

    def mk(seed):
        r = np.random.RandomState(seed)
        return {
            "ln1_g": jnp.asarray(1 + 0.1 * r.randn(C).astype(np.float32)),
            "ln1_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "qkv_w": jnp.asarray(r.randn(C, 3 * C).astype(np.float32) * 0.05),
            "qkv_b": jnp.asarray(0.1 * r.randn(3 * C).astype(np.float32)),
            "proj_w": jnp.asarray(r.randn(C, C).astype(np.float32) * 0.05),
            "proj_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "ln2_g": jnp.asarray(1 + 0.1 * r.randn(C).astype(np.float32)),
            "ln2_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "fc1_w": jnp.asarray(r.randn(C, 4 * C).astype(np.float32) * 0.05),
            "fc1_b": jnp.asarray(0.1 * r.randn(4 * C).astype(np.float32)),
            "fc2_w": jnp.asarray(r.randn(4 * C, C).astype(np.float32) * 0.05),
            "fc2_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
        }

    p1, p2 = mk(2), mk(3)
    from catseg_tpu.core.aggregator import _shift_mask
    mask = jnp.asarray(_shift_mask(H, W, 12, 6))

    got = fused_swin_pair(x, None, p1, p2, mask, 4, 12)
    want = _reference_pair(x, None, p1, p2, mask, 4, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4)

    g_fused = jax.grad(lambda x: jnp.sum(fused_swin_pair(x, None, p1, p2, mask, 4, 12) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(_reference_pair(x, None, p1, p2, mask, 4, 12) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=5e-4, rtol=5e-4)


def _class_layer_params(rng, C=128, Cg=48, pad=True):
    import jax
    from catseg_tpu.core.aggregator import _init_class_layer

    return _init_class_layer(rng, C, Cg, 8 if pad else 0)


def _legacy_class_path(x, text_guidance, cp, cfg):
    """The pre-kernel XLA path: pad -> transpose -> LN -> attn -> MLP."""
    import jax
    from catseg_tpu.core import aggregator as A

    B, T, H, W, C = x.shape
    xp = x.reshape(B, T, H, W, C)
    pad = cfg.pad_len - T if cfg.pad_len > 0 else 0
    if pad > 0:
        pad_tok = jnp.broadcast_to(cp["padding_tokens"].astype(xp.dtype), (B, pad, H, W, C))
        xp = jnp.concatenate([xp, pad_tok], axis=1)
        if text_guidance is not None:
            pad_guid = jnp.broadcast_to(
                cp["padding_guidance"].astype(text_guidance.dtype), (B, pad, text_guidance.shape[-1]))
            text_guidance = jnp.concatenate([text_guidance, pad_guid], axis=1)
    Tp = xp.shape[1]
    seq = xp.transpose(0, 2, 3, 1, 4).reshape(B * H * W, Tp, C)
    normed = A.layer_norm(seq, cp["norm1"]["g"], cp["norm1"]["b"])
    seq = seq + A._class_attention_inner(normed, text_guidance, cp, cfg, n_pos=H * W)
    normed = A.layer_norm(seq, cp["norm2"]["g"], cp["norm2"]["b"])
    seq = seq + A._linear(jax.nn.relu(A._linear(normed, cp["mlp1_w"], cp["mlp1_b"])), cp["mlp2_w"], cp["mlp2_b"])
    out = seq.reshape(B, H, W, Tp, C).transpose(0, 3, 1, 2, 4)[:, :T]
    return x + out


import pytest


@pytest.mark.parametrize("T,with_guid,pool", [(5, True, (1, 1)), (8, True, (1, 1)),
                                              (5, False, (1, 1)), (6, True, (2, 2))])
def test_fused_class_layer_matches_legacy_path(T, with_guid, pool):
    """pool=(2,2) covers the train-pooling route through the fused kernel
    (avg-pool -> kernel -> align_corners upsample, aggregator.py)."""
    import jax
    from catseg_tpu.configs import CATSegConfig
    from catseg_tpu.core import aggregator as A

    B, H, W, C, Cg = 1, 8, 8, 128, 48
    cfg = CATSegConfig(hidden_dim=C, num_heads=4, pad_len=8, pooling_size=pool,
                       attention_type="linear", feature_resolution=(H, W),
                       text_guidance_proj_dim=Cg, compute_dtype="float32")
    cp = _class_layer_params(jax.random.PRNGKey(0), C, Cg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.2)
    tg = jnp.asarray(rng.randn(B, T, Cg).astype(np.float32) * 0.2) if with_guid else None

    got = A.class_aggregation(x, tg, {"class": cp}, cfg)  # fused kernel path
    if pool == (1, 1):
        want = _legacy_class_path(x, tg, cp, cfg)
    else:
        import os

        os.environ["CATSEG_NO_PALLAS_CLASS"] = "1"
        try:
            want = A.class_aggregation(x, tg, {"class": cp}, cfg)
        finally:
            del os.environ["CATSEG_NO_PALLAS_CLASS"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4, rtol=3e-4)


@pytest.mark.parametrize("T,H", [(6, 8), (10, 24)])
def test_fused_class_layer_bf16_v3_path(T, H):
    """The bf16 compute path takes the v3 pair-transposed supermatrix kernel
    (class_layer._kernel_v3: one-shot int32 sublane-pair transpose + masked
    supermatrix attention); parity vs the plain-XLA reference at bf16
    tolerance.  T even / W % 4 == 0 gates the path (odd T falls back)."""
    import os

    import jax
    from catseg_tpu.kernels.class_layer import (
        _reference, fused_class_layer, pad_contributions)

    B, W, C, Cg, heads, Tp = 1, H, 128, 48, 4, 16
    cp = _class_layer_params(jax.random.PRNGKey(0), C, Cg)
    p = {
        "ln1_g": cp["norm1"]["g"], "ln1_b": cp["norm1"]["b"],
        "q_w": cp["q_w"], "q_b": cp["q_b"],
        "k_w": cp["k_w"], "k_b": cp["k_b"],
        "v_w": cp["v_w"], "v_b": cp["v_b"],
        "ln2_g": cp["norm2"]["g"], "ln2_b": cp["norm2"]["b"],
        "mlp1_w": cp["mlp1_w"], "mlp1_b": cp["mlp1_b"],
        "mlp2_w": cp["mlp2_w"], "mlp2_b": cp["mlp2_b"],
    }
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    qg = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    kg = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    pad_kv, pad_ksum = pad_contributions(
        cp["padding_tokens"].reshape(-1), None, p, Tp - T, Tp, heads)

    got = fused_class_layer(x, qg, kg, pad_kv, pad_ksum, p, heads, Tp)
    x_pm = x.transpose(0, 2, 3, 1, 4).reshape(B, H * W, T, C)
    want = _reference(x_pm, qg, kg, pad_kv, pad_ksum, p, heads, Tp)
    want = want.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_fused_class_layer_grad():
    import jax
    from catseg_tpu.configs import CATSegConfig
    from catseg_tpu.core import aggregator as A

    B, T, H, W, C = 1, 5, 8, 8, 128
    cfg = CATSegConfig(hidden_dim=C, num_heads=4, pad_len=8, pooling_size=(1, 1),
                       attention_type="linear", feature_resolution=(H, W),
                       text_guidance_proj_dim=0, compute_dtype="float32")
    cp = _class_layer_params(jax.random.PRNGKey(1), C, 0)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.2)

    g_fused = jax.grad(lambda x: jnp.sum(A.class_aggregation(x, None, {"class": cp}, cfg) ** 2))(x)
    g_legacy = jax.grad(lambda x: jnp.sum(_legacy_class_path(x, None, cp, cfg) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_legacy), atol=1e-3, rtol=1e-3)


def test_fused_swin_pair_grad_multichunk():
    """Backward chunks the class axis (32/chunk) — cover T spanning chunks."""
    import jax
    from catseg_tpu.kernels.swin_block import fused_swin_pair, _reference_pair
    from catseg_tpu.core.aggregator import _shift_mask

    B, T, H, W, C = 1, 34, 24, 24, 128
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.2)

    def mk(seed):
        r = np.random.RandomState(seed)
        return {
            "ln1_g": jnp.asarray(1 + 0.1 * r.randn(C).astype(np.float32)),
            "ln1_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "qkv_w": jnp.asarray(r.randn(C, 3 * C).astype(np.float32) * 0.05),
            "qkv_b": jnp.asarray(0.1 * r.randn(3 * C).astype(np.float32)),
            "proj_w": jnp.asarray(r.randn(C, C).astype(np.float32) * 0.05),
            "proj_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "ln2_g": jnp.asarray(1 + 0.1 * r.randn(C).astype(np.float32)),
            "ln2_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "fc1_w": jnp.asarray(r.randn(C, 4 * C).astype(np.float32) * 0.05),
            "fc1_b": jnp.asarray(0.1 * r.randn(4 * C).astype(np.float32)),
            "fc2_w": jnp.asarray(r.randn(4 * C, C).astype(np.float32) * 0.05),
            "fc2_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
        }

    p1, p2 = mk(8), mk(9)
    mask = jnp.asarray(_shift_mask(H, W, 12, 6))

    def loss(fn):
        return lambda x, p1: jnp.sum(fn(x, None, p1, p2, mask, 4, 12) ** 2)

    gx_f, gp_f = jax.grad(loss(fused_swin_pair), argnums=(0, 1))(x, p1)
    gx_r, gp_r = jax.grad(loss(_reference_pair), argnums=(0, 1))(x, p1)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(gp_f["qkv_w"]), np.asarray(gp_r["qkv_w"]),
                               atol=5e-3, rtol=5e-4)


def test_fused_swin_pair_guidance_grad():
    """Analytic backward must produce guidance cotangents matching XLA."""
    import jax
    from catseg_tpu.kernels.swin_block import fused_swin_pair, _reference_pair
    from catseg_tpu.core.aggregator import _shift_mask

    B, T, H, W, C = 2, 3, 24, 24, 128
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.2)
    guid4 = tuple(
        jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.1) for _ in range(4)
    )

    def mk(seed):
        r = np.random.RandomState(seed)
        return {
            "ln1_g": jnp.asarray(1 + 0.1 * r.randn(C).astype(np.float32)),
            "ln1_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "qkv_w": jnp.asarray(r.randn(C, 3 * C).astype(np.float32) * 0.05),
            "qkv_b": jnp.asarray(0.1 * r.randn(3 * C).astype(np.float32)),
            "proj_w": jnp.asarray(r.randn(C, C).astype(np.float32) * 0.05),
            "proj_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "ln2_g": jnp.asarray(1 + 0.1 * r.randn(C).astype(np.float32)),
            "ln2_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
            "fc1_w": jnp.asarray(r.randn(C, 4 * C).astype(np.float32) * 0.05),
            "fc1_b": jnp.asarray(0.1 * r.randn(4 * C).astype(np.float32)),
            "fc2_w": jnp.asarray(r.randn(4 * C, C).astype(np.float32) * 0.05),
            "fc2_b": jnp.asarray(0.1 * r.randn(C).astype(np.float32)),
        }

    p1, p2 = mk(12), mk(13)
    mask = jnp.asarray(_shift_mask(H, W, 12, 6))

    def loss(fn):
        return lambda x, g4, p2_: jnp.sum(fn(x, g4, p1, p2_, mask, 4, 12) ** 2)

    gx_f, gg_f, gp2_f = jax.grad(loss(fused_swin_pair), argnums=(0, 1, 2))(x, guid4, p2)
    gx_r, gg_r, gp2_r = jax.grad(loss(_reference_pair), argnums=(0, 1, 2))(x, guid4, p2)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=5e-4, rtol=5e-4)
    for a, b in zip(gg_f, gg_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(gp2_f["fc2_w"]), np.asarray(gp2_r["fc2_w"]),
                               atol=5e-3, rtol=5e-4)


def test_fused_class_layer_guidance_param_grads():
    """Analytic class-layer backward: guidance, param, and pad-token
    cotangents must match the legacy XLA path (pad rows enter the fused
    kernel only through pad_kv/pad_ksum, so this covers that chain too)."""
    import jax
    from catseg_tpu.configs import CATSegConfig
    from catseg_tpu.core import aggregator as A

    B, T, H, W, C, Cg = 1, 5, 8, 8, 128, 48
    cfg = CATSegConfig(hidden_dim=C, num_heads=4, pad_len=8, pooling_size=(1, 1),
                       attention_type="linear", feature_resolution=(H, W),
                       text_guidance_proj_dim=Cg, compute_dtype="float32")
    cp = _class_layer_params(jax.random.PRNGKey(3), C, Cg)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(B, T, H, W, C).astype(np.float32) * 0.2)
    tg = jnp.asarray(rng.randn(B, T, Cg).astype(np.float32) * 0.2)

    def loss(fn):
        return lambda x, tg, cp_: jnp.sum(fn(x, tg, cp_) ** 2)

    fused = lambda x, tg, cp_: A.class_aggregation(x, tg, {"class": cp_}, cfg)
    legacy = lambda x, tg, cp_: _legacy_class_path(x, tg, cp_, cfg)
    gx_f, gt_f, gp_f = jax.grad(loss(fused), argnums=(0, 1, 2))(x, tg, cp)
    gx_r, gt_r, gp_r = jax.grad(loss(legacy), argnums=(0, 1, 2))(x, tg, cp)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r), atol=1e-3, rtol=1e-3)
    for key in ("mlp1_w", "padding_tokens", "q_w", "v_b"):
        np.testing.assert_allclose(
            np.asarray(gp_f[key]), np.asarray(gp_r[key]), atol=2e-3, rtol=1e-3,
            err_msg=key)


@pytest.mark.parametrize("P,truncate", [(1, False), (2, False), (1, True)])
def test_fused_corr_embed_matches_reference(P, truncate):
    """kernels/corr_embed.py == l2_normalize + einsum cost + conv2d(7x7)
    (model.py:648-659 semantics), incl. grad through the custom VJP."""
    from catseg_tpu.kernels.corr_embed import (
        corr_embed_applicable, fused_corr_embed, _reference)
    from catseg_tpu.core.aggregator import l2_normalize

    rng = np.random.RandomState(0)
    B, T, E, C = 2, 10, 64, 128
    img = jnp.asarray(rng.randn(B, 24, 24, E).astype(np.float32))
    text = rng.randn(B, T, P, E).astype(np.float32)
    text = jnp.asarray(text / np.linalg.norm(text, axis=-1, keepdims=True))
    w = jnp.asarray(rng.randn(7, 7, P, C).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    # P > MAX_P routes to the XLA reference inside fused_corr_embed (the
    # ensemble prompt counts were never in kernel range)
    assert corr_embed_applicable(img, text, w) == (P == 1)

    got = np.asarray(fused_corr_embed(img, text, w, b))
    want = np.asarray(_reference(img, text, w, b))
    assert got.shape == (B, T, 24, 24, C)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    if truncate:
        # grad flows through the XLA-composition VJP
        def loss(img, w):
            return jnp.sum(jnp.tanh(fused_corr_embed(img, text, w, b)))

        gi, gw = jax.grad(loss, argnums=(0, 1))(img, w)

        def loss_ref(img, w):
            return jnp.sum(jnp.tanh(_reference(img, text, w, b)))

        ri, rw = jax.grad(loss_ref, argnums=(0, 1))(img, w)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(ri), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-4)


def test_fused_dense_attention_matches_reference():
    """CLIP dense-encode attention kernel (head pairs as 128-lane chunks,
    S -> Sp pad via -1e9 key mask) vs the plain-XLA maskless MHA."""
    import jax
    from catseg_tpu.kernels.clip_attn import (_pallas, _reference,
                                              dense_attention_applicable,
                                              fused_dense_attention)

    B, S, W, heads = 2, 50, 256, 4  # S pads to 64; W/heads = 64 (two chunks)
    assert dense_attention_applicable(W, heads, None)
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(B, S, W).astype(np.float32) * 0.3)
               for _ in range(3))
    got = np.asarray(_pallas(q, k, v, heads, interpret=True))
    want = np.asarray(_reference(q, k, v, heads))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    # custom-VJP backward (hand-written dq/dk/dv formulas) against autodiff
    # of the reference, for ALL THREE inputs (advisor r4: dk/dv were untested)
    g_f = jax.grad(lambda q, k, v: jnp.sum(jnp.tanh(
        fused_dense_attention(q, k, v, heads))), argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(lambda q, k, v: jnp.sum(jnp.tanh(
        _reference(q, k, v, heads))), argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_f, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-5, rtol=2e-5, err_msg=f"d{name}")
