"""Ver14 SAM mask-refinement fusion mode: end-to-end wiring + torch oracle.

Reference: implicit_fusion_Ver14.py — frozen SAM encoder at sam_resolution
(148), CLIP-normalized SAM input (274), nearest proposal upsample (368),
per-class prompt-encoder/mask-decoder refinement (379-398), dual BCE
supervision (413-415), refined masks at inference (420, 437).
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from catseg_tpu.configs import FusionConfig
from catseg_tpu.core import fusion
from catseg_tpu.core import sam as jsam
from catseg_tpu.core import sam_decoder as jd

from test_catseg_model import mini_cfg
from test_sam import MINI as MINI_SAM
from test_sam_decoder import DIM, DEPTH, GRID, HEADS, MLP, NUM_MASK, _sd
from torch_oracle import sam_mask_decoder


def _register_mini():
    jsam.SAM_VARIANTS["mini_sam"] = MINI_SAM


def _cfg(**kw):
    _register_mini()
    base = dict(
        fusion=FusionConfig(
            mode="sam_refine", encoder="mini_sam", encoder_resolution=32,
            clip_resolution=128, refine_chunk=4,
        ),
    )
    base.update(kw)
    return mini_cfg(**base)


def test_sam_refine_forward_shapes():
    cfg = _cfg()
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    assert set(params) >= {"clip", "agg", "sam", "sam_pe", "sam_dec"}
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 128, 128, 3)).astype(np.float32))
    text = jnp.asarray(rng.randn(7, 1, 48).astype(np.float32))
    # refined logits live on SAM's 4x-upscaled grid: 4 * (32 / 8) = 16
    out = fusion.fusion_forward(params, imgs, text, cfg)
    assert out.shape == (2, 7, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    coarse, refined = fusion.fusion_forward(params, imgs, text, cfg, with_coarse=True)
    assert coarse.shape == (2, 7, 8, 8)  # raw corr proposals at 24²-analog
    np.testing.assert_allclose(np.asarray(refined), np.asarray(out), atol=1e-6)


def test_sam_refine_head_proposals():
    cfg = _cfg(fusion=FusionConfig(
        mode="sam_refine", encoder="mini_sam", encoder_resolution=32,
        clip_resolution=128, refine_from="head", refine_chunk=4))
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (1, 128, 128, 3)).astype(np.float32))
    text = jnp.asarray(rng.randn(5, 1, 48).astype(np.float32))
    coarse, refined = fusion.fusion_forward(params, imgs, text, cfg, with_coarse=True)
    assert coarse.shape == (1, 5, 32, 32)  # aggregated head logits (4x decode)
    assert refined.shape == (1, 5, 16, 16)


def test_sam_refine_topk_scatter():
    """T > pad_len: only the kept classes are refined; dropped classes read
    -100 in both coarse and refined outputs (model.py:721-724 convention —
    the reference Ver14 pad_len branch itself is bit-rotted, see fusion.py)."""
    cfg = _cfg(pad_len=6)
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (1, 128, 128, 3)).astype(np.float32))
    text = jnp.asarray(rng.randn(11, 1, 48).astype(np.float32))
    coarse, refined = fusion.fusion_forward(params, imgs, text, cfg, with_coarse=True)
    coarse, refined = np.asarray(coarse), np.asarray(refined)
    assert coarse.shape == (1, 11, 8, 8) and refined.shape == (1, 11, 16, 16)
    dropped_c = (coarse == -100.0).all(axis=(2, 3))
    dropped_r = (refined == -100.0).all(axis=(2, 3))
    assert dropped_c.sum() == dropped_r.sum() == 11 - 6
    np.testing.assert_array_equal(dropped_c, dropped_r)


def test_sam_refine_oracle():
    """Full refinement composition (nearest upsample -> mask prompt embed ->
    mask decoder) matches the torch reference composition bit-for-bit at
    mini sizes (implicit_fusion_Ver14.py:368-398)."""
    import torch.nn.functional as F

    sd = _sd()
    pe, dec = jd.convert_sam_prompt_decoder({k: t.numpy() for k, t in sd.items()})
    rng = np.random.RandomState(7)
    B, T, h, w = 1, 3, 5, 6
    coarse = rng.randn(B, T, h, w).astype(np.float32)
    sam_feat = rng.randn(B, GRID, GRID, DIM).astype(np.float32)

    got = fusion.sam_mask_refine(None, pe, dec, jnp.asarray(coarse),
                                 jnp.asarray(sam_feat), chunk=2)

    # torch: F.interpolate default mode is nearest (Ver14:368)
    prompts = F.interpolate(torch.from_numpy(coarse), size=(4 * GRID, 4 * GRID))
    pe_grid = torch.from_numpy(np.asarray(jd.dense_pe(jnp.asarray(pe["gauss"]), (GRID, GRID))))
    for b in range(B):
        for t in range(T):
            m = prompts[b, t][None, :, :, None]  # (1, 4g, 4g, 1)
            dense = jd.embed_masks(pe, jnp.asarray(m.numpy()))
            want, _ = sam_mask_decoder(
                sd, torch.from_numpy(sam_feat[b:b + 1]), pe_grid,
                torch.zeros(1, 0, DIM), torch.from_numpy(np.asarray(dense)),
                heads=HEADS, depth=DEPTH, num_mask_tokens=NUM_MASK,
            )
            np.testing.assert_allclose(
                np.asarray(got[b, t]), want[0, 0].numpy(), atol=5e-4, rtol=1e-3)


def test_sam_refine_train_step_freeze_policy():
    """Training: summed dual BCE runs; the SAM encoder, iou head, and
    point/no-mask embeddings stay frozen (BuildSAM, Ver14:28-46) while the
    mask-decoder transformer and prompt mask-downscaling train."""
    from catseg_tpu.train.loop import init_train_state, make_train_step

    cfg = _cfg()
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    T = 5
    tokens = np.random.RandomState(1).randint(1, 99, (T, cfg.clip.context)).astype(np.int32)
    step = make_train_step(cfg, tx, tokens)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (2, 128, 128, 3)).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, T, (2, 128, 128)).astype(np.int32))

    sam_before = jax.tree_util.tree_map(np.asarray, state.params["sam"])
    iou_before = np.asarray(state.params["sam_dec"]["iou_head"]["ws"][0])
    pts_before = np.asarray(state.params["sam_pe"]["point_embeds"])
    dec_w_before = np.asarray(state.params["sam_dec"]["transformer"]["layers"][0]["self_attn"]["q_w"])
    pe_w_before = np.asarray(state.params["sam_pe"]["mask_conv1_w"])

    params, opt_state, loss = step(state.params, state.opt_state, images, targets)
    assert np.isfinite(float(loss))
    jax.tree_util.tree_map(
        lambda b, a: np.testing.assert_array_equal(b, np.asarray(a)),
        sam_before, params["sam"])
    np.testing.assert_array_equal(iou_before, np.asarray(params["sam_dec"]["iou_head"]["ws"][0]))
    np.testing.assert_array_equal(pts_before, np.asarray(params["sam_pe"]["point_embeds"]))
    assert np.abs(np.asarray(params["sam_dec"]["transformer"]["layers"][0]["self_attn"]["q_w"]) - dec_w_before).max() > 0
    assert np.abs(np.asarray(params["sam_pe"]["mask_conv1_w"]) - pe_w_before).max() > 0


def test_sam_refine_whole_image_canvas_path():
    """The static-canvas whole-image path dispatches to the sam_refine
    forward and matches the direct forward (Ver14:241 non-sliding branch:
    the padded tensor resizes straight to the SAM resolution)."""
    from catseg_tpu.infer.pipeline import whole_image_probs_from_canvas

    cfg = _cfg(crop_size=128)
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


def test_sam_refine_sliding_window_composition():
    """Sliding eval dispatches each tile through the sam_refine forward and
    folds the 4x-grid refined masks exactly like the plain family (the
    reference's sliding branch re-runs the whole Ver14 forward per window,
    implicit_fusion_Ver14.py:274): the pipeline path must equal a hand
    composition of per-tile fusion forwards + fold/average."""
    from catseg_tpu.infer.pipeline import sliding_window_probs
    from catseg_tpu.ops import fold_divisor, fold_tiles, resize_bilinear, unfold_tiles

    cfg = _cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    img640 = rng.randint(0, 255, (256, 256, 3)).astype(np.float32)
    imgk = rng.randint(0, 255, (128, 128, 3)).astype(np.float32)
    text = jnp.asarray(rng.randn(5, 1, 48).astype(np.float32))

    got = sliding_window_probs(params, jnp.asarray(img640), jnp.asarray(imgk), text, cfg)
    assert got.shape == (256, 256, 5)

    k, s, out = cfg.sw_kernel, cfg.sw_stride, cfg.sw_out_res
    tiles = unfold_tiles(jnp.asarray(img640)[None], k, s)
    per = [fusion.fusion_forward(params, t[None], text, cfg)[0] for t in tiles]
    per.append(fusion.fusion_forward(params, jnp.asarray(imgk)[None], text, cfg)[0])
    per = jnp.stack([p.transpose(1, 2, 0) for p in per])  # (nt+1, 16, 16, T)
    probs = jax.nn.sigmoid(resize_bilinear(per, (k, k)).astype(jnp.float32))
    folded = fold_tiles(probs[:-1], (out, out), k, s)[0]
    folded = folded / jnp.asarray(fold_divisor((out, out), k, s))
    want = (folded + resize_bilinear(probs[-1:], (out, out))[0]) / 2.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_sam_refine_checkpoint_convert_roundtrip():
    """A Ver14-style meta-arch state dict (sam_encoder./sam_prompt_encoder./
    sam_decoder. prefixes) converts into the sam/sam_pe/sam_dec subtrees."""
    from catseg_tpu.core.catseg import init_catseg_params
    from catseg_tpu.weights.convert import convert_catseg_checkpoint
    from catseg_tpu.weights.export import export_catseg_checkpoint

    cfg = _cfg()
    sd = export_catseg_checkpoint(init_catseg_params(jax.random.PRNGKey(1), cfg))
    sam_sd = {f"sam_encoder.{k}": t for k, t in _mini_sam_encoder_sd().items()}
    pd = _sd()
    for k, t in pd.items():
        if k.startswith("prompt_encoder."):
            sam_sd["sam_prompt_encoder." + k[len("prompt_encoder."):]] = t
        else:
            sam_sd["sam_decoder." + k[len("mask_decoder."):]] = t
    sd.update({k: t.numpy() for k, t in sam_sd.items()})
    params = convert_catseg_checkpoint(sd, num_layers=2)
    assert "sam" in params and "sam_pe" in params and "sam_dec" in params
    assert params["sam_dec"]["mask_tokens"].shape == (NUM_MASK, DIM)
    assert params["sam"]["pos_embed"].shape[-1] == MINI_SAM.width


def _mini_sam_encoder_sd():
    from test_sam import _mini_sam_sd

    return _mini_sam_sd()


def test_sam_refine_head_topk_scatter():
    """refine_from="head" with T > pad_len: the aggregator's top-k also
    bounds the SAM refinement (only kept classes are refined) and dropped
    classes read -100 in both outputs — same convention as raw_corr."""
    cfg = _cfg(pad_len=6, fusion=FusionConfig(
        mode="sam_refine", encoder="mini_sam", encoder_resolution=32,
        clip_resolution=128, refine_from="head", refine_chunk=4))
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (1, 128, 128, 3)).astype(np.float32))
    text = jnp.asarray(rng.randn(11, 1, 48).astype(np.float32))
    coarse, refined = fusion.fusion_forward(params, imgs, text, cfg, with_coarse=True)
    coarse, refined = np.asarray(coarse), np.asarray(refined)
    assert coarse.shape[:2] == (1, 11) and refined.shape[:2] == (1, 11)
    dropped_c = (coarse == -100.0).all(axis=(2, 3))
    dropped_r = (refined == -100.0).all(axis=(2, 3))
    assert dropped_c.sum() == dropped_r.sum() == 11 - 6
    np.testing.assert_array_equal(dropped_c, dropped_r)


def test_sam_refine_raw_corr_template_ensemble():
    """P > 1 raw-corr proposals are the template-averaged correlation (the
    reference's squeeze(1) only supports P=1); P=1 is unchanged."""
    from catseg_tpu.core.aggregator import correlation
    from catseg_tpu.core.catseg import clip_guidance_features, normalize_clip

    cfg = _cfg()
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (1, 128, 128, 3)).astype(np.float32))
    text = jnp.asarray(rng.randn(5, 3, 48).astype(np.float32))  # P=3
    coarse, _ = fusion.fusion_forward(params, imgs, text, cfg, with_coarse=True)
    img_feats, _ = clip_guidance_features(params, normalize_clip(imgs), cfg)
    want = correlation(img_feats, jnp.broadcast_to(
        text[None], (1,) + text.shape).astype(jnp.dtype(cfg.compute_dtype)))
    want = np.asarray(want.mean(axis=-1), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(coarse), want, atol=1e-5, rtol=1e-5)


def test_sam_refine_fusion_clip_resolution_wins():
    """The fusion config's clip_resolution governs the CLIP input in
    sam_refine mode (implicit_fusion_Ver14.py:241), independent of the
    top-level clip_resolution (which another family may have set)."""
    cfg_base = _cfg()
    params = fusion.init_fusion_params(jax.random.PRNGKey(0), cfg_base)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (1, 128, 128, 3)).astype(np.float32))
    text = jnp.asarray(rng.randn(5, 1, 48).astype(np.float32))
    want = np.asarray(fusion.fusion_forward(params, imgs, text, cfg_base))
    # a mismatched top-level clip_resolution must not change the CLIP input
    # (the old behavior resized to 96 -> grid 6, crashing the 8x8 reshape)
    cfg_mix = mini_cfg(clip_resolution=96, fusion=cfg_base.fusion)
    got = np.asarray(fusion.fusion_forward(params, imgs, text, cfg_mix))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sam_refine_export_convert_roundtrip():
    """A full Ver14 pytree exports to the meta-arch key names and converts
    back bit-identically (sam/sam_pe/sam_dec included) — the exporter is a
    true inverse for the SAM family, not just the base model."""
    import jax.tree_util as jtu

    from catseg_tpu.weights.convert import convert_catseg_checkpoint
    from catseg_tpu.weights.export import export_catseg_checkpoint

    cfg = _cfg()
    params = fusion.init_fusion_params(jax.random.PRNGKey(2), cfg)
    sd = export_catseg_checkpoint(params)
    assert any(k.startswith("sam_encoder.") for k in sd)
    assert any(k.startswith("sam_prompt_encoder.") for k in sd)
    assert any(k.startswith("sam_decoder.") for k in sd)
    back = convert_catseg_checkpoint(sd, num_layers=cfg.num_layers)
    for sub in ("sam", "sam_pe", "sam_dec"):
        want_leaves = jtu.tree_leaves_with_path(params[sub])
        got = back[sub]
        got_flat = dict(jtu.tree_leaves_with_path(got))
        assert len(got_flat) == len(want_leaves)
        for path, leaf in want_leaves:
            np.testing.assert_array_equal(
                np.asarray(leaf, dtype=np.float32), np.asarray(got_flat[path]),
                err_msg=str(path))
