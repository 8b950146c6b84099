"""Dual-encoder fusion pathway.

One parameterized implementation of the reference fork's 44 ImplicitFusion
variants (SURVEY.md §2.4), with the final published configuration (Ver31,
reference: cat_seg/implicit_fusion_Ver31.py:148-374 +
cat_seg/modeling/transformer/FusionAggregatorVer31.py) as the default:

- CLIP (RemoteCLIP ViT-B/32) runs at 768² (grid 24); a frozen DINO ViT-B/8
  runs at 384² (grid 48);
- the DINO last-layer map is downsampled (conv k2 s2, 768->512) to a second
  24² feature and correlated against the same text features -> second cost
  volume; per-corr top-k when T > pad_len (classes from the CLIP corr drive
  the final scatter);
- both volumes embed through their own 7x7 conv, sigmoid, concat, 7x7 fusion
  conv, sigmoid, + residual from the CLIP embed
  (corr_fusion_embed_seperate, FusionAggregatorVer31.py:138-154);
- DINO blocks 4/8 form a second decoder-guidance pyramid (conv1x1 768->256 @48²,
  ConvT 768->128 @96²; implicit_fusion_Ver31.py:156-157) and the FusionUP
  decoder concatenates both guidance pyramids (FusionAggregator.py:757-772).

The aggregator layer stack itself is shared with the single-encoder model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import CATSegConfig
from ..ops import conv2d, resize_bilinear
from ..ops.conv import conv_transpose2d_nonoverlap
from .aggregator import (
    _up_tail,
    _linear,
    class_aggregation,
    corr_embed,
    correlation,
    gather_classes,
    l2_normalize,
    scatter_full_logits,
    spatial_aggregation,
    topk_classes,
)
from .catseg import clip_guidance_features, normalize_clip
from .dino import DINO_VARIANTS, get_intermediate_layers, init_dino_params


def _corr_embed2(corr: jnp.ndarray, conv: dict) -> jnp.ndarray:
    B, T, H, W, P = corr.shape
    x = conv2d(corr.reshape(B * T, H, W, P), conv["w"], conv["b"], padding=3)
    return x.reshape(B, T, H, W, -1)


def _fusion_up(x, clip_g, dino_g, dp, head, B, T):
    """FusionUP (FusionAggregator.py:757-772): ConvT then both guidance
    pyramids fused via the algebraic conv split (see _up_tail)."""
    guid = tuple(g for g in (clip_g, dino_g) if g is not None)
    return _up_tail(x, guid, dp, head, B, T)


def fusion_aggregator_forward(
    agg: dict,
    img_feats: jnp.ndarray,
    dino_feats: jnp.ndarray,
    text_feats: jnp.ndarray,
    appearance_guidance: tuple,
    dino_guidance: tuple,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """FusionAggregatorVer31.forward (FusionAggregatorVer31.py:199-273).

    ``dino_feats=None`` (config ``second_corr=False``) degenerates the cost
    path to the base model's single-volume corr_embed — the fork's
    fusion-point ablations toggle exactly this; ``dino_guidance=(None, None)``
    (``dual_guidance=False``) drops the second decoder-guidance pyramid."""
    T = text_feats.shape[1]
    corr = correlation(img_feats, text_feats)

    classes = None
    if cfg.pad_len > 0 and T > cfg.pad_len:
        classes = topk_classes(corr, cfg.pad_len)
        text_kept = gather_classes(l2_normalize(text_feats, axis=-1), classes)
    else:
        text_kept = text_feats

    if dino_feats is None:
        if classes is not None:
            corr = gather_classes(corr, classes)
        x = corr_embed(corr, agg)
        text_feats = text_kept
        B, Tc, H, W = x.shape[:4]
    else:
        dino_corr = correlation(dino_feats, text_feats)
        if classes is not None:
            classes_dino = topk_classes(dino_corr, cfg.pad_len)
            corr = gather_classes(corr, classes)
            dino_corr = gather_classes(dino_corr, classes_dino)
        text_feats = text_kept

        clip_embed = jax.nn.sigmoid(_corr_embed2(corr, agg["conv1"]).astype(jnp.float32)).astype(corr.dtype)
        dino_embed = jax.nn.sigmoid(_corr_embed2(dino_corr, agg["conv2"]).astype(jnp.float32)).astype(corr.dtype)
        fused = jnp.concatenate([clip_embed, dino_embed], axis=-1)
        B, Tc, H, W, C2 = fused.shape
        fused = conv2d(fused.reshape(B * Tc, H, W, C2), agg["fusion_corr"]["w"], agg["fusion_corr"]["b"], padding=3)
        fused = jax.nn.sigmoid(fused.astype(jnp.float32)).astype(clip_embed.dtype).reshape(B, Tc, H, W, -1)
        x = fused + clip_embed  # residual (FusionAggregatorVer31.py:237)

    proj_guid = None
    if "guidance_proj" in agg:
        proj_guid = jax.nn.relu(
            conv2d(appearance_guidance[0], agg["guidance_proj"]["w"], agg["guidance_proj"]["b"], padding=1)
        )
    clip_dec = [
        jax.nn.relu(conv2d(g, p["w"], p["b"], padding=1))
        for p, g in zip(agg["clip_decoder_guidance_proj"], appearance_guidance[1:])
    ]
    dino_dec = [
        None if g is None else jax.nn.relu(conv2d(g, p["w"], p["b"], padding=1))
        for p, g in zip(agg["dino_decoder_guidance_proj"], dino_guidance)
    ]
    text_guid = None
    if "text_guidance_proj" in agg:
        tf = jnp.mean(text_feats.astype(jnp.float32), axis=-2)
        tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
        text_guid = jax.nn.relu(_linear(tf.astype(x.dtype), agg["text_guidance_proj"]["w"], agg["text_guidance_proj"]["b"]))

    for layer in agg["layers"]:
        x = spatial_aggregation(x, proj_guid, layer, cfg)
        x = class_aggregation(x, text_guid, layer, cfg)

    xs = x.reshape(B * Tc, H, W, -1)
    xs = _fusion_up(xs, clip_dec[0], dino_dec[0], agg["decoder1"], None, B, Tc)
    xs = _fusion_up(xs, clip_dec[1], dino_dec[1], agg["decoder2"], agg["head"], B, Tc)
    logits = xs.reshape(B, Tc, xs.shape[1], xs.shape[2]).astype(jnp.float32)
    if classes is not None:
        logits = scatter_full_logits(logits, classes, T)
    return logits


def fusion_forward(params: dict, images: jnp.ndarray, text_feats: jnp.ndarray, cfg: CATSegConfig,
                   normalized: bool = False, second_images: jnp.ndarray | None = None,
                   with_coarse: bool = False):
    """Fusion meta-architecture dispatch.

    mode="corr": Ver31 dual-correlation forward (implicit_fusion_Ver31.py:
    195-374).  mode="sam_refine": Ver14 SAM mask refinement
    (implicit_fusion_Ver14.py:368-398) — returns the refined logits, or
    ``(coarse, refined)`` when ``with_coarse`` (the training branch
    supervises both, Ver14:413-415).

    images: (B, H, W, 3) raw RGB (or CLIP-normalized when ``normalized``,
    for the static-canvas eval path that pads after normalization).  When
    ``second_images`` is None the second encoder's input is derived from the
    CLIP-normalized, CLIP-resolution image exactly as the reference's
    sliding-window branches do (implicit_fusion_Ver31.py:259-260,
    implicit_fusion_Ver14.py:274); the non-sliding branches instead resize
    the padded tensor to the second resolution directly
    (implicit_fusion_Ver31.py:239-240, Ver14:241), which the canvas eval
    path reproduces by passing ``second_images`` explicitly.
    """
    if cfg.fusion.mode == "sam_refine":
        return _sam_refine_forward(params, images, text_feats, cfg,
                                   normalized=normalized, second_images=second_images,
                                   with_coarse=with_coarse)
    fus = cfg.fusion
    dtype = jnp.dtype(cfg.compute_dtype)
    clip_images = images if normalized else normalize_clip(images)
    if clip_images.shape[1:3] != (fus.clip_resolution, fus.clip_resolution):
        clip_images = resize_bilinear(clip_images, (fus.clip_resolution, fus.clip_resolution))
    dino_images = second_images
    if dino_images is None:
        dino_images = resize_bilinear(clip_images, (fus.encoder_resolution, fus.encoder_resolution))

    res3, (_, res4, res5) = clip_guidance_features(params, clip_images, cfg)
    H, W = cfg.feature_resolution
    B = res3.shape[0]

    # fusion-point ablation flags (the fork's VerXX sub-families toggle
    # where the second encoder enters): the DINO forward is skipped
    # entirely when neither fusion point is active
    dino_feats = None
    dino_g1 = dino_g2 = None
    if fus.second_corr or fus.dual_guidance:
        dvar = DINO_VARIANTS[fus.encoder]
        dino_layers = get_intermediate_layers(params["dino"], dino_images.astype(dtype), dvar,
                                              n=dvar.layers, compute_dtype=dtype)
        g = fus.encoder_resolution // dvar.patch  # 48 for Ver31
        down = g // H  # 2 for Ver31
        if fus.second_corr:
            dino_last = dino_layers[-1][:, 1:, :].reshape(B, g, g, -1)
            dino_feats = conv2d(dino_last, params["dino_down"]["w"], params["dino_down"]["b"], stride=down)
        if fus.dual_guidance:
            gb = fus.guidance_blocks
            dino_l4 = dino_layers[gb[0]][:, 1:, :].reshape(B, g, g, -1)
            dino_l8 = dino_layers[gb[1]][:, 1:, :].reshape(B, g, g, -1)
            dino_g1 = conv2d(dino_l4, params["dino_proj1"]["w"], params["dino_proj1"]["b"])  # (B,48,48,256)
            dino_g2 = conv_transpose2d_nonoverlap(dino_l8, params["dino_proj2"]["w"], params["dino_proj2"]["b"], kernel=2)

    if text_feats.ndim == 3:
        text_feats = jnp.broadcast_to(text_feats[None], (B,) + text_feats.shape)
    return fusion_aggregator_forward(
        params["agg"], res3, dino_feats, text_feats.astype(dtype),
        (res3, res4, res5), (dino_g1, dino_g2), cfg,
    )


def sam_mask_refine(
    sam_params: dict,
    pe: dict,
    dec: dict,
    coarse_logits: jnp.ndarray,
    sam_feat: jnp.ndarray,
    chunk: int = 16,
) -> jnp.ndarray:
    """Ver14-style refinement (implicit_fusion_Ver14.py:368-398): per-class
    coarse logit maps become SAM mask prompts and the mask decoder re-predicts
    each class's mask against the SAM image embedding.

    coarse_logits: (B, T, h, w); sam_feat: (B, gh, gw, 256) (encoder neck
    output).  Returns (B, T, 4*gh, 4*gw) refined mask logits.  Classes are
    scanned in chunks to bound memory.
    """
    from ..ops.resize import resize_nearest
    from .sam_decoder import dense_pe, embed_masks, mask_decoder

    B, T = coarse_logits.shape[:2]
    gh, gw = sam_feat.shape[1:3]
    # the reference upsamples proposals to the 256² prompt grid with
    # F.interpolate's default NEAREST mode (implicit_fusion_Ver14.py:368)
    prompts = resize_nearest(
        coarse_logits.reshape(B * T, *coarse_logits.shape[2:])[..., None], (4 * gh, 4 * gw)
    ).reshape(B, T, 4 * gh, 4 * gw, 1)
    pe_grid = dense_pe(pe["gauss"], (gh, gw))

    # scan over class chunks with the image axis kept: the SAM embedding is
    # replicated only chunk-fold (a constant (B*cpi, gh, gw, 256) operand
    # reused every step) instead of materializing a T-fold copy — at
    # T=pad_len=256 and SAM ViT-B geometry that copy would be ~0.5 GB of HBM.
    # cpi = classes per image per step, sized so each dispatch stays ~chunk
    # mask-decoder instances regardless of batch size.
    cpi = max(1, chunk // B)
    Tp = -(-T // cpi) * cpi
    if Tp != T:
        prompts = jnp.concatenate(
            [prompts, jnp.zeros((B, Tp - T) + prompts.shape[2:], prompts.dtype)], axis=1)
    steps = Tp // cpi
    # (B, Tp, ...) -> (steps, B*cpi, ...): step s covers classes [s*cpi, (s+1)*cpi)
    prompts = (prompts.reshape(B, steps, cpi, *prompts.shape[2:])
               .transpose(1, 0, 2, 3, 4, 5)
               .reshape(steps, B * cpi, *prompts.shape[2:]))
    feats = jnp.repeat(sam_feat, cpi, axis=0)  # (B*cpi, gh, gw, 256), row b*cpi+c -> image b

    def body(_, pr):
        dense = embed_masks(pe, pr)
        sparse = jnp.zeros((pr.shape[0], 0, dense.shape[-1]), dense.dtype)
        masks, _ = mask_decoder(dec, feats, pe_grid, sparse, dense)
        return None, masks[:, 0]

    _, refined = jax.lax.scan(body, None, prompts)
    # (steps, B*cpi, H', W') -> (B, Tp, H', W') -> strip class padding
    refined = (refined.reshape(steps, B, cpi, *refined.shape[2:])
               .transpose(1, 0, 2, 3, 4)
               .reshape(B, Tp, *refined.shape[2:]))
    return refined[:, :T]


def _sam_refine_forward(params: dict, images: jnp.ndarray, text_feats: jnp.ndarray,
                        cfg: CATSegConfig, normalized: bool = False,
                        second_images: jnp.ndarray | None = None,
                        with_coarse: bool = False):
    """Ver14 forward: standard CAT-Seg proposals + SAM mask refinement.

    Proposals are the raw CLIP correlation (refine_from="raw_corr", the
    registered Ver14 aggregator bypasses aggregation and returns clip_corr,
    FusionAggregator.py:5011-5016) or the aggregated head logits
    (refine_from="head", the Ver14a/b sub-family shape).  The SAM encoder
    input is the CLIP-normalized image resized to the SAM resolution — NOT
    SAM-normalized (implicit_fusion_Ver14.py:274).  Returns refined logits
    (B, T, 256, 256); with ``with_coarse``, ``(coarse, refined)``.

    Divergence from the reference, by necessity: Ver14's pad_len branch
    references an undefined name and crashes for T > pad_len
    (FusionAggregator.py:4950 ``avg = corr...`` before ``corr`` exists), so
    the large-vocab path here follows the family convention instead — top-k
    by max corr, refine only the kept classes, scatter back with -100
    (model.py:694-724 semantics).
    """
    from .sam import SAM_VARIANTS, encode_image as sam_encode

    fus = cfg.fusion
    dtype = jnp.dtype(cfg.compute_dtype)
    clip_images = images if normalized else normalize_clip(images)
    # the fusion config's clip_resolution governs this family's CLIP input
    # (implicit_fusion_Ver14.py:241 resizes to 384²), same as the Ver31 path
    R = fus.clip_resolution
    if clip_images.shape[1:3] != (R, R):
        clip_images = resize_bilinear(clip_images, (R, R))
    sam_images = second_images
    if sam_images is None:
        sam_images = resize_bilinear(clip_images, (fus.encoder_resolution, fus.encoder_resolution))

    img_feats, guidance = clip_guidance_features(params, clip_images, cfg)
    B = img_feats.shape[0]
    if text_feats.ndim == 3:
        text_feats = jnp.broadcast_to(text_feats[None], (B,) + text_feats.shape)
    text_feats = text_feats.astype(dtype)
    T = text_feats.shape[1]

    classes = None
    if fus.refine_from == "head":
        from .aggregator import aggregator_forward

        # return_classes: the aggregator's pad_len top-k must also bound the
        # SAM refinement — refine only the kept classes, scatter at the tail
        coarse, classes = aggregator_forward(
            params["agg"], img_feats, text_feats, guidance, cfg, return_classes=True)
    else:  # "raw_corr"
        corr = correlation(img_feats, text_feats)  # (B, T, H, W, P)
        if cfg.pad_len > 0 and T > cfg.pad_len:
            classes = topk_classes(corr, cfg.pad_len)
            corr = gather_classes(corr, classes)
        # template-averaged proposals; at P=1 identical to the reference's
        # clip_corr.squeeze(1) (which only supports P=1)
        coarse = corr.mean(axis=-1).astype(jnp.float32)

    sam_feat = sam_encode(params["sam"], sam_images.astype(dtype),
                          SAM_VARIANTS[fus.encoder], compute_dtype=dtype)
    refined = sam_mask_refine(params["sam"], params["sam_pe"], params["sam_dec"],
                              coarse.astype(dtype), sam_feat, chunk=fus.refine_chunk)
    refined = refined.astype(jnp.float32)
    if classes is not None:
        coarse = scatter_full_logits(coarse, classes, T)
        refined = scatter_full_logits(refined, classes, T)
    if with_coarse:
        return coarse, refined
    return refined


def init_fusion_params(rng, cfg: CATSegConfig) -> dict:
    """Random-init fusion model parameters (Ver31 layout)."""
    from .aggregator import _init_conv
    from .catseg import init_catseg_params

    if cfg.fusion.mode == "sam_refine":
        # Ver14 layout: the full standard model + frozen SAM encoder +
        # trainable prompt-encoder/mask-decoder (implicit_fusion_Ver14.py:28-46)
        from .sam import SAM_VARIANTS, init_sam_params
        from .sam_decoder import init_sam_prompt_decoder

        ka, kb, kc = jax.random.split(rng, 3)
        svar = SAM_VARIANTS[cfg.fusion.encoder]
        base = init_catseg_params(ka, cfg)
        base["sam"] = init_sam_params(kb, svar)
        base["sam_pe"], base["sam_dec"] = init_sam_prompt_decoder(kc, dim=svar.out_chans)
        return base

    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(rng, 7)
    base = init_catseg_params(k1, cfg)
    agg = base["agg"]
    agg["conv2"] = _init_conv(k2, 7, 7, cfg.prompt_channel, cfg.hidden_dim)
    agg["fusion_corr"] = _init_conv(k3, 7, 7, 2 * cfg.hidden_dim, cfg.hidden_dim)
    agg["clip_decoder_guidance_proj"] = agg.pop("decoder_guidance_proj")
    agg["dino_decoder_guidance_proj"] = [
        _init_conv(k, 3, 3, d, dp)
        for k, d, dp in zip(jax.random.split(k4, 2), cfg.decoder_guidance_dims, cfg.decoder_guidance_proj_dims)
    ]
    # FusionUP decoders take in+guid channels into the DoubleConv
    hd = cfg.hidden_dim
    gp = cfg.decoder_guidance_proj_dims

    def _fusion_up_params(rng, cin, cout, guid):
        kk1, kk1b, kk2, kk3 = jax.random.split(rng, 4)
        upc = cin - guid
        bound = (1.0 / (cin * 4)) ** 0.5
        return {
            "up_w": jax.random.uniform(kk1, (cin, 2, 2, upc), minval=-bound, maxval=bound),
            "up_b": jax.random.uniform(kk1b, (upc,), minval=-bound, maxval=bound),
            "conv1_w": _init_conv(kk2, 3, 3, cin + guid, cout, bias=False)["w"],
            "gn1": {"g": jnp.ones(cout), "b": jnp.zeros(cout)},
            "conv2_w": _init_conv(kk3, 3, 3, cout, cout, bias=False)["w"],
            "gn2": {"g": jnp.ones(cout), "b": jnp.zeros(cout)},
        }

    agg["decoder1"] = _fusion_up_params(k5, hd, cfg.decoder_dims[0], gp[0])
    agg["decoder2"] = _fusion_up_params(k6, cfg.decoder_dims[0], cfg.decoder_dims[1], gp[1])

    kd1, kd2, kd3, kd4 = jax.random.split(k7, 4)
    dvar = DINO_VARIANTS[cfg.fusion.encoder]
    dw = dvar.width
    down = (cfg.fusion.encoder_resolution // dvar.patch) // cfg.feature_resolution[0]
    dg = cfg.decoder_guidance_dims
    base.update(
        {
            "dino": init_dino_params(kd1, dvar),
            "dino_down": _init_conv(kd2, down, down, dw, cfg.clip.embed_dim),
            "dino_proj1": _init_conv(kd3, 1, 1, dw, dg[0]),
            "dino_proj2": {
                "w": jax.random.uniform(kd4, (dw, 2, 2, dg[1]), minval=-0.02, maxval=0.02),
                "b": jnp.zeros(dg[1]),
            },
        }
    )
    return base
