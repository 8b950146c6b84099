"""DINO encoder parity + fusion model smoke tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from catseg_tpu.core import dino as jdino
from catseg_tpu.core.dino import DINOVariant, DINO_VARIANTS

from torch_oracle import dino_intermediate_layers

MINI = DINOVariant(patch=8, width=64, layers=3, heads=4, pretrain_grid=4)


def _mini_dino_sd(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*s):
        return torch.randn(*s, generator=g) * 0.05

    sd = {
        "patch_embed.proj.weight": r(MINI.width, 3, MINI.patch, MINI.patch),
        "patch_embed.proj.bias": 0.1 * r(MINI.width),
        "cls_token": r(1, 1, MINI.width),
        "pos_embed": r(1, MINI.pretrain_grid**2 + 1, MINI.width),
        "norm.weight": 1 + 0.1 * r(MINI.width),
        "norm.bias": 0.1 * r(MINI.width),
    }
    for i in range(MINI.layers):
        p = f"blocks.{i}"
        w = MINI.width
        sd[p + ".norm1.weight"] = 1 + 0.1 * r(w)
        sd[p + ".norm1.bias"] = 0.1 * r(w)
        sd[p + ".attn.qkv.weight"] = r(3 * w, w)
        sd[p + ".attn.qkv.bias"] = 0.1 * r(3 * w)
        sd[p + ".attn.proj.weight"] = r(w, w)
        sd[p + ".attn.proj.bias"] = 0.1 * r(w)
        sd[p + ".norm2.weight"] = 1 + 0.1 * r(w)
        sd[p + ".norm2.bias"] = 0.1 * r(w)
        sd[p + ".mlp.fc1.weight"] = r(4 * w, w)
        sd[p + ".mlp.fc1.bias"] = 0.1 * r(4 * w)
        sd[p + ".mlp.fc2.weight"] = r(w, 4 * w)
        sd[p + ".mlp.fc2.bias"] = 0.1 * r(w)
    return sd


def test_dino_parity_with_pos_interp():
    sd = _mini_dino_sd()
    params = jdino.convert_dino_state_dict({k: t.numpy() for k, t in sd.items()})
    rng = np.random.RandomState(3)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)  # grid 8 != pretrain 4
    want = dino_intermediate_layers(
        sd, torch.from_numpy(imgs).permute(0, 3, 1, 2).contiguous(),
        patch=MINI.patch, layers=MINI.layers, heads=MINI.heads,
        pretrain_grid=MINI.pretrain_grid, n=3,
    )
    got = jdino.get_intermediate_layers(params, jnp.asarray(imgs), MINI, n=3)
    assert len(got) == len(want) == 3
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_), w_.numpy(), atol=3e-4, rtol=1e-3)


def test_fusion_forward_smoke():
    from catseg_tpu.core import fusion
    from catseg_tpu.configs import FusionConfig
    from test_catseg_model import mini_cfg

    DINO_VARIANTS["mini_dino"] = MINI
    cfg = mini_cfg(
        fusion=FusionConfig(encoder="mini_dino", encoder_resolution=128, clip_resolution=128, guidance_blocks=(0, 1)),
        text_guidance_dim=0,
    )
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 128, 128, 3)).astype(np.float32)
    text = rng.randn(7, 1, 48).astype(np.float32)
    out = fusion.fusion_forward(params, jnp.asarray(imgs), jnp.asarray(text), cfg)
    assert out.shape == (2, 7, 32, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_fusion_topk_scatter():
    from catseg_tpu.core import fusion
    from catseg_tpu.configs import FusionConfig
    from test_catseg_model import mini_cfg

    DINO_VARIANTS["mini_dino"] = MINI
    cfg = mini_cfg(
        fusion=FusionConfig(encoder="mini_dino", encoder_resolution=128, clip_resolution=128, guidance_blocks=(0, 1)),
        text_guidance_dim=0,
        pad_len=6,
    )
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (1, 128, 128, 3)).astype(np.float32)
    text = rng.randn(11, 1, 48).astype(np.float32)
    out = np.asarray(fusion.fusion_forward(params, jnp.asarray(imgs), jnp.asarray(text), cfg))
    assert out.shape == (1, 11, 32, 32)
    assert ((out == -100.0).all(axis=(2, 3))).sum() == 11 - 6


def test_fusion_train_step_freezes_second_encoder():
    """Fusion configs train through the same loop (ablation_train_eval31.sh
    semantics): step runs, loss is finite, DINO/second-encoder params do not
    move, aggregator params do."""
    from catseg_tpu.configs import FusionConfig
    from catseg_tpu.core import fusion
    from catseg_tpu.train.loop import init_train_state, make_train_step
    from test_catseg_model import mini_cfg

    DINO_VARIANTS["mini_dino"] = MINI
    cfg = mini_cfg(
        fusion=FusionConfig(encoder="mini_dino", encoder_resolution=128,
                            clip_resolution=128, guidance_blocks=(0, 1)),
        text_guidance_dim=0,
    )
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    assert "dino" in state.params
    T = 5
    # mini text encoder has context=16 (and vocab 100): synthesize token ids
    rng_t = np.random.RandomState(1)
    tokens = rng_t.randint(1, 99, (T, cfg.clip.context)).astype(np.int32)
    step = make_train_step(cfg, tx, tokens)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (2, 128, 128, 3)).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, T, (2, 128, 128)).astype(np.int32))
    # the step donates its inputs: snapshot host copies first
    dino_before = jax.tree_util.tree_map(np.asarray, state.params["dino"])
    agg_w_before = np.asarray(state.params["agg"]["conv1"]["w"])
    params, opt_state, loss = step(state.params, state.opt_state, images, targets)
    assert np.isfinite(float(loss))
    jax.tree_util.tree_map(
        lambda b, a: np.testing.assert_array_equal(b, np.asarray(a)),
        dino_before, params["dino"])
    moved = np.abs(np.asarray(params["agg"]["conv1"]["w"]) - agg_w_before).max()
    assert moved > 0


def test_fusion_whole_image_canvas_path():
    """The static-canvas whole-image eval path dispatches to the fusion
    forward (normalized input branch) and matches the raw forward."""
    from catseg_tpu.configs import FusionConfig
    from catseg_tpu.core import fusion
    from catseg_tpu.infer.pipeline import whole_image_probs_from_canvas
    from test_catseg_model import mini_cfg

    DINO_VARIANTS["mini_dino"] = MINI
    cfg = mini_cfg(
        fusion=FusionConfig(encoder="mini_dino", encoder_resolution=128,
                            clip_resolution=128, guidance_blocks=(0, 1)),
        text_guidance_dim=0,
        crop_size=128,  # SIZE_DIVISIBILITY == canvas -> resize is identity
    )
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (128, 128, 3)).astype(np.float32)
    text = jnp.asarray(rng.randn(7, 1, 48).astype(np.float32))

    got = whole_image_probs_from_canvas(
        params, jnp.asarray(img), jnp.asarray([128, 128], np.int32), text, cfg)
    want = jax.nn.sigmoid(
        fusion.fusion_forward(params, jnp.asarray(img)[None], text, cfg)[0].astype(jnp.float32)
    ).transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fusion_whole_image_canvas_no_bottleneck():
    """The fusion canvas path must resize the padded tensor directly to the
    fusion CLIP resolution (implicit_fusion_Ver31.py:239-240) — NOT through a
    cfg.clip_resolution bottleneck (round-1 advisor finding)."""
    from catseg_tpu.configs import FusionConfig
    from catseg_tpu.core import fusion
    from catseg_tpu.infer.pipeline import normalize_clip_padded, whole_image_probs_from_canvas
    from catseg_tpu.ops import resize_bilinear
    from test_catseg_model import mini_cfg

    DINO_VARIANTS["mini_dino"] = MINI
    cfg = mini_cfg(
        fusion=FusionConfig(encoder="mini_dino", encoder_resolution=128,
                            clip_resolution=128, guidance_blocks=(0, 1)),
        text_guidance_dim=0,
        clip_resolution=64,  # the plain-model resolution: must NOT be used
        crop_size=96,
    )
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    canvas = np.zeros((96, 96, 3), np.float32)
    canvas[:80, :90] = rng.randint(0, 255, (80, 90, 3)).astype(np.float32)
    hw = jnp.asarray([80, 90], np.int32)
    text = jnp.asarray(rng.randn(7, 1, 48).astype(np.float32))

    got = whole_image_probs_from_canvas(params, jnp.asarray(canvas), hw, text, cfg)
    # reference semantics: normalize -> pad (ph=pw=96=canvas) -> one resize
    # of the padded tensor to the fusion CLIP resolution
    norm = normalize_clip_padded(jnp.asarray(canvas), hw)
    clip_in = resize_bilinear(norm[None], (128, 128))
    want = jax.nn.sigmoid(
        fusion.fusion_forward(params, clip_in, text, cfg, normalized=True)[0].astype(jnp.float32)
    ).transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fusion_point_ablation_flags():
    """second_corr / dual_guidance gate where the second encoder enters
    (the fork's VerXX fusion-point ablations): with a flag off, the DINO
    modules behind it stop affecting the output; with both off, DINO is not
    run at all (zeroing its weights changes nothing)."""
    import jax.tree_util as jtu

    from catseg_tpu.core import fusion
    from catseg_tpu.configs import FusionConfig
    from test_catseg_model import mini_cfg

    DINO_VARIANTS["mini_dino"] = MINI
    base = dict(encoder="mini_dino", encoder_resolution=128, clip_resolution=128,
                guidance_blocks=(0, 1))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (1, 128, 128, 3)).astype(np.float32))
    text = jnp.asarray(rng.randn(7, 1, 48).astype(np.float32))

    def run(params, **flags):
        cfg = mini_cfg(fusion=FusionConfig(**base, **flags), text_guidance_dim=0)
        return np.asarray(fusion.fusion_forward(params, imgs, text, cfg))

    cfg_full = mini_cfg(fusion=FusionConfig(**base), text_guidance_dim=0)
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg_full)
    zeroed = dict(params)
    zeroed["dino"] = jtu.tree_map(jnp.zeros_like, params["dino"])

    full = run(params)
    no_corr = run(params, second_corr=False)
    no_guid = run(params, dual_guidance=False)
    neither = run(params, second_corr=False, dual_guidance=False)
    assert not np.allclose(full, no_corr)
    assert not np.allclose(full, no_guid)
    # both off -> DINO weights are irrelevant (encoder never runs)
    np.testing.assert_array_equal(
        neither, run(zeroed, second_corr=False, dual_guidance=False))
    # corr-only ablation: DINO still matters through the cost volume
    assert not np.allclose(no_guid, run(zeroed, dual_guidance=False))
