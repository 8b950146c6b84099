"""CATSeg meta-architecture as pure functions (reference: cat_seg/cat_seg_model.py:18-229).

forward(params, images, text_feats) -> (B, T, 96, 96) logits.  Image
normalization, CLIP dense encoding with guidance taps, guidance-pyramid
assembly (res3/res4/res5), aggregator, and the BCE training loss.  Inference
pipelines (whole-image / sliding-window) live in catseg_tpu.infer; text
features are *inputs* here — the text-caching semantics of the reference
predictor (cat_seg_predictor.py:190-224) reduce, in a functional framework,
to "compute once per (class list, weights) and feed the array".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CATSegConfig, CLIP_PIXEL_MEAN, CLIP_PIXEL_STD
from ..ops import resize_bilinear
from ..ops.conv import conv_transpose2d_nonoverlap
from .aggregator import aggregator_forward, init_aggregator_params
from .clip import encode_image, init_clip_params


def normalize_clip(images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) raw RGB [0,255] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_PIXEL_MEAN, dtype=jnp.float32)
    std = jnp.asarray(CLIP_PIXEL_STD, dtype=jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


def clip_guidance_features(params: dict, clip_images: jnp.ndarray, cfg: CATSegConfig):
    """Dense CLIP encode + guidance pyramid (cat_seg_model.py:144-186).

    clip_images: (B, R, R, 3) already CLIP-normalized and resized to
    cfg.clip_resolution.  Returns (img_feats (B,24,24,E), guidance tuple).
    """
    dtype = jnp.dtype(cfg.compute_dtype)
    tokens, taps = encode_image(
        params["clip"],
        clip_images.astype(dtype),
        cfg.clip,
        dense=True,
        taps=cfg.guidance_layers,
        compute_dtype=dtype,
    )
    H, W = cfg.feature_resolution
    B = tokens.shape[0]
    res3 = tokens[:, 1:, :].reshape(B, H, W, -1)
    res4 = taps[0][:, 1:, :].reshape(B, H, W, -1)
    res5 = taps[1][:, 1:, :].reshape(B, H, W, -1)
    res4 = conv_transpose2d_nonoverlap(res4, params["upsample1"]["w"], params["upsample1"]["b"], kernel=2)
    res5 = conv_transpose2d_nonoverlap(res5, params["upsample2"]["w"], params["upsample2"]["b"], kernel=4)
    return res3, (res3, res4, res5)


def forward(params: dict, images: jnp.ndarray, text_feats: jnp.ndarray, cfg: CATSegConfig) -> jnp.ndarray:
    """Full model forward on raw RGB images.

    images: (B, H, W, 3) float RGB in [0, 255] (any H=W divisible by 384 is
    resized to clip_resolution as the reference does at cat_seg_model.py:144).
    text_feats: (T, P, E) or (B, T, P, E) L2-normalizable text embeddings.
    Returns (B, T, 96, 96) fp32 logits.
    """
    clip_images = normalize_clip(images)
    clip_images = resize_bilinear(clip_images, (cfg.clip_resolution, cfg.clip_resolution))
    img_feats, guidance = clip_guidance_features(params, clip_images, cfg)
    if text_feats.ndim == 3:
        text_feats = jnp.broadcast_to(text_feats[None], (images.shape[0],) + text_feats.shape)
    dtype = jnp.dtype(cfg.compute_dtype)
    return aggregator_forward(params["agg"], img_feats, text_feats.astype(dtype), guidance, cfg)


def bce_loss(logits: jnp.ndarray, targets: jnp.ndarray, ignore_value: int, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Per-pixel multi-label BCE (cat_seg_model.py:189-203).

    logits: (B, T, 96, 96); targets: (B, H, W) int32 class ids with
    ignore_value marking void.  Logits are upsampled to (H, W); the one-hot
    target is zero everywhere for ignored pixels (they still contribute
    all-negative supervision, matching the reference exactly).
    """
    B, T = logits.shape[:2]
    x = logits.transpose(0, 2, 3, 1)  # (B, 96, 96, T)
    x = resize_bilinear(x, out_hw).astype(jnp.float32)
    valid = targets != ignore_value
    onehot = jax.nn.one_hot(jnp.where(valid, targets, 0), T, dtype=jnp.float32)
    onehot = onehot * valid[..., None]
    # numerically-stable BCE-with-logits, mean over every element
    loss = jnp.maximum(x, 0) - x * onehot + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)


def init_catseg_params(rng, cfg: CATSegConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    pd = cfg.guidance_proj_dim
    bound1 = (1.0 / (pd * 4)) ** 0.5
    bound2 = (1.0 / (pd * 16)) ** 0.5
    return {
        "clip": init_clip_params(k1, cfg.clip),
        "agg": init_aggregator_params(k2, cfg),
        "upsample1": {
            "w": jax.random.uniform(k3, (pd, 2, 2, 256), minval=-bound1, maxval=bound1),
            "b": jnp.zeros(256),
        },
        "upsample2": {
            "w": jax.random.uniform(k4, (pd, 4, 4, 128), minval=-bound2, maxval=bound2),
            "b": jnp.zeros(128),
        },
    }


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
