"""Full-model forward smoke tests + BCE loss parity."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from catseg_tpu.configs import CLIPVariant, CATSegConfig
from catseg_tpu.core import catseg

MINI_CLIP = CLIPVariant(
    name="mini",
    patch=16,
    width=64,
    layers=4,
    heads=4,
    embed_dim=48,
    pretrain_res=32,
    text_width=48,
    text_heads=4,
    text_layers=2,
    vocab_size=100,
    context=16,
)


def mini_cfg(**kw):
    base = dict(
        clip=MINI_CLIP,
        clip_resolution=128,  # grid 8
        guidance_layers=(0, 1),
        guidance_proj_dim=64,
        text_guidance_dim=48,
        text_guidance_proj_dim=16,
        appearance_guidance_dim=48,
        appearance_guidance_proj_dim=16,
        decoder_dims=(32, 16),
        decoder_guidance_dims=(256, 128),
        decoder_guidance_proj_dims=(8, 4),
        num_layers=2,
        num_heads=4,
        hidden_dim=32,
        pooling_size=(2, 2),
        feature_resolution=(8, 8),
        window_size=4,
        pad_len=12,
        compute_dtype="float32",
    )
    base.update(kw)
    return CATSegConfig(**base)


def test_forward_shapes_and_jit():
    cfg = mini_cfg()
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    imgs = np.random.RandomState(0).randint(0, 255, (2, 128, 128, 3)).astype(np.float32)
    text = np.random.RandomState(1).randn(7, 1, 48).astype(np.float32)
    fwd = jax.jit(catseg.forward, static_argnames="cfg")
    out = fwd(params, jnp.asarray(imgs), jnp.asarray(text), cfg)
    assert out.shape == (2, 7, 32, 32)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_forward_topk_path():
    cfg = mini_cfg()
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    imgs = np.random.RandomState(0).randint(0, 255, (1, 128, 128, 3)).astype(np.float32)
    text = np.random.RandomState(1).randn(20, 1, 48).astype(np.float32)  # T > pad_len
    out = catseg.forward(params, jnp.asarray(imgs), jnp.asarray(text), cfg)
    assert out.shape == (1, 20, 32, 32)
    n_truncated = (np.asarray(out) == -100.0).all(axis=(2, 3)).sum()
    assert n_truncated == 20 - cfg.pad_len


def test_bce_loss_matches_torch():
    B, T, HW = 2, 9, 48
    rng = np.random.RandomState(3)
    logits = rng.randn(B, T, 32, 32).astype(np.float32)
    targets = rng.randint(0, T, (B, HW, HW)).astype(np.int32)
    targets[0, :5] = 255  # ignored region

    got = catseg.bce_loss(jnp.asarray(logits), jnp.asarray(targets), 255, (HW, HW))

    lt = F.interpolate(torch.from_numpy(logits), size=(HW, HW), mode="bilinear", align_corners=False)
    lt = lt.permute(0, 2, 3, 1)
    tt = torch.from_numpy(targets.astype(np.int64))
    mask = tt != 255
    onehot_full = torch.zeros(lt.shape)
    onehot_full[mask] = F.one_hot(tt[mask], num_classes=T).float()
    want = F.binary_cross_entropy_with_logits(lt, onehot_full)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_bfloat16_forward_runs():
    cfg = mini_cfg(compute_dtype="bfloat16")
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    imgs = np.random.RandomState(0).randint(0, 255, (1, 128, 128, 3)).astype(np.float32)
    text = np.random.RandomState(1).randn(7, 1, 48).astype(np.float32)
    out = catseg.forward(params, jnp.asarray(imgs), jnp.asarray(text), cfg)
    assert out.dtype == jnp.float32  # logits always fp32
    assert np.isfinite(np.asarray(out)).all()


def test_param_pytree_save_load(tmp_path):
    from catseg_tpu.weights import save_pytree, load_pytree

    cfg = mini_cfg()
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, params)
    loaded = load_pytree(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
