"""OpenCLIP (laion ViT-H/G tier) checkpoint conversion + GELU-path parity.

The reference loads these via ``open_clip.create_model_and_transforms(...,
force_image_size=336)`` (cat_seg_predictor.py:64-76): published laion2b
state dicts ship 224-grid visual pos embeds which open_clip bicubically
resizes at load, and the towers use exact nn.GELU rather than OpenAI's
QuickGELU.  These tests build a mini open_clip-style state dict (fused
in_proj qkv, attn_mask buffers, small pos-embed grid) and check the full
conversion + forward against a torch oracle running open_clip semantics.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from catseg_tpu.configs import CLIPVariant, vitg336, vith336
from catseg_tpu.core import clip as jclip
from catseg_tpu.weights.convert import (
    convert_openclip_state_dict,
    resize_pos_embed_grid,
)

from test_clip_parity import _mini_clip_state_dict

# mini open_clip-flavor variant: runs at grid 4 (pretrain_res 32, patch 8)
# while the "published" sd below ships a grid-2 pos embed — exercising the
# load-time force_image_size resize exactly like H/14 (16 -> 24)
VARIANT = CLIPVariant(
    name="mini-openclip",
    patch=8,
    width=64,
    layers=4,
    heads=4,
    embed_dim=32,
    pretrain_res=32,
    text_width=48,
    text_heads=4,
    text_layers=3,
    vocab_size=120,
    context=16,
    act="gelu",
)


def _mini_openclip_state_dict(seed=3):
    sd = _mini_clip_state_dict(seed)
    # ship a *smaller* pos-embed grid than the running resolution, as the
    # laion2b checkpoints do (224-grid vs force_image_size=336)
    g = torch.Generator().manual_seed(seed + 100)
    sd["visual.positional_embedding"] = torch.randn(2 * 2 + 1, VARIANT.width, generator=g) * 0.05
    # open_clip persists the causal mask as a buffer in the state dict
    sd["attn_mask"] = torch.full((VARIANT.context, VARIANT.context), float("-inf")).triu_(1)
    return sd


@pytest.fixture(scope="module")
def sd():
    return _mini_openclip_state_dict()


@pytest.fixture(scope="module")
def params(sd):
    return convert_openclip_state_dict(
        {k: t.numpy() for k, t in sd.items()}, target_grid=VARIANT.pretrain_grid
    )


def test_attn_mask_buffer_dropped(params):
    assert "attn_mask" not in params
    assert params["visual"]["positional_embedding"].shape[0] == VARIANT.pretrain_grid**2 + 1


def test_pos_embed_resize_matches_openclip(sd, params):
    """Conversion-time grid resize == open_clip resize_pos_embed (bicubic,
    align_corners=False; antialias is a no-op when upscaling)."""
    pe = sd["visual.positional_embedding"]
    tok, img = pe[:1], pe[1:]
    img = img.reshape(1, 2, 2, -1).permute(0, 3, 1, 2)
    img = F.interpolate(img, size=(4, 4), mode="bicubic", align_corners=False)
    want = torch.cat([tok, img.squeeze(0).reshape(-1, 16).T], dim=0).numpy()
    np.testing.assert_allclose(
        params["visual"]["positional_embedding"], want, atol=1e-5, rtol=1e-5
    )


def _oracle_sd_with_resized_pe(sd):
    """What open_clip's load produces: the sd with the pos embed pre-resized."""
    out = {k: v for k, v in sd.items() if k != "attn_mask"}
    out["visual.positional_embedding"] = torch.from_numpy(
        resize_pos_embed_grid(sd["visual.positional_embedding"].numpy(), 4)
    )
    return out


def test_visual_dense_parity_gelu(sd, params):
    from torch_oracle import clip_visual_dense

    rng = np.random.RandomState(7)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    want_tokens, want_taps = clip_visual_dense(
        _oracle_sd_with_resized_pe(sd),
        torch.from_numpy(imgs).permute(0, 3, 1, 2).contiguous(),
        patch=VARIANT.patch, layers=VARIANT.layers, heads=VARIANT.heads,
        pretrain_grid=VARIANT.pretrain_grid, taps=(1,), act="gelu",
    )
    got_tokens, got_taps = jclip.encode_image(
        params, jnp.asarray(imgs), VARIANT, dense=True, taps=(1,)
    )
    np.testing.assert_allclose(np.asarray(got_tokens), want_tokens.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_taps[0]), want_taps[0].numpy(), atol=2e-4, rtol=1e-3)
    # and the activations genuinely differ from the QuickGELU path
    quick = jclip.encode_image(
        params, jnp.asarray(imgs), VARIANT.__class__(**{**VARIANT.__dict__, "act": "quick_gelu"}),
        dense=True,
    )[0]
    assert not np.allclose(np.asarray(got_tokens), np.asarray(quick), atol=1e-4)


def test_text_parity_gelu(sd, params):
    from torch_oracle import clip_text

    rng = np.random.RandomState(11)
    tokens = np.zeros((4, VARIANT.context), dtype=np.int64)
    for i in range(4):
        L = rng.randint(3, VARIANT.context)
        tokens[i, 0] = VARIANT.vocab_size - 2
        tokens[i, 1 : L - 1] = rng.randint(1, VARIANT.vocab_size - 2, L - 2)
        tokens[i, L - 1] = VARIANT.vocab_size - 1
    want = clip_text(
        _oracle_sd_with_resized_pe(sd), torch.from_numpy(tokens),
        layers=VARIANT.text_layers, heads=VARIANT.text_heads, act="gelu",
    )
    got = jclip.encode_text(params, jnp.asarray(tokens.astype(np.int32)), VARIANT)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)


def test_hg_variant_geometry():
    """H/G presets: exact-GELU towers; bigG's 4.9231 visual mlp ratio
    reproduces open_clip's 8192 hidden width."""
    h, g = vith336(), vitg336()
    assert h.clip.act == "gelu" and g.clip.act == "gelu"
    assert h.clip.mlp_width == 4 * 1280
    assert g.clip.mlp_width == 8192
    assert h.clip.pretrain_grid == g.clip.pretrain_grid == 24


def test_mini_variant_init_mlp_ratio():
    import jax

    v = CLIPVariant(**{**VARIANT.__dict__, "mlp_ratio": 4.9231})
    p = jclip.init_clip_params(jax.random.PRNGKey(0), v)
    assert p["visual"]["blocks"]["fc_w"].shape[-1] == int(64 * 4.9231)
    # text tower stays at ratio 4
    assert p["text"]["blocks"]["fc_w"].shape[-1] == 4 * v.text_width


def test_load_params_bare_clip_sd(tmp_path, sd):
    """A bare CLIP .pth (no sem_seg_head prefix) = pretrained CLIP + random
    rest, the reference's train-time init (cat_seg_predictor.py:64-76)."""
    import jax

    from catseg_tpu.tools.common import load_params
    from test_catseg_model import mini_cfg

    cfg = mini_cfg().replace(clip=VARIANT)
    path = tmp_path / "openclip.pth"
    torch.save(sd, str(path))
    params = load_params(str(path), cfg)
    converted = convert_openclip_state_dict(
        {k: t.numpy() for k, t in sd.items()}, target_grid=VARIANT.pretrain_grid
    )
    for a, b in zip(jax.tree.leaves(params["clip"]), jax.tree.leaves(converted)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert "agg" in params  # randomly initialized remainder present
