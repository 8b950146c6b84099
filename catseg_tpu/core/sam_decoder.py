"""SAM prompt encoder + two-way-transformer mask decoder.

Completes the SAM package (reference: cat_seg/segment_anything/modeling/
{prompt_encoder,mask_decoder,transformer}.py) so the fork's Ver14-style
mask-refinement fusion — feed per-class coarse logit maps as mask prompts and
let SAM's decoder refine them (implicit_fusion_Ver14.py:298-381) — and
promptable segmentation in general are available.

Components:
- PositionEmbeddingRandom (random-Fourier coords, prompt_encoder.py:171-213)
- prompt encoding for points / boxes / masks (prompt_encoder.py:73-105)
- TwoWayTransformer (queries<->image cross attention with re-added
  positional embeddings each layer, transformer.py:16-183)
- MaskDecoder (iou+mask tokens, output upscaling, per-token hypernetwork
  MLPs, iou head, mask_decoder.py:16-154)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layer_norm
from ..ops.conv import conv2d, conv_transpose2d_nonoverlap
from .sam import _layernorm2d


def _linear(x, w, b=None):
    y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


# ----------------------------------------------------------- positional enc


def pe_encode(coords01: jnp.ndarray, gauss: jnp.ndarray) -> jnp.ndarray:
    """coords in [0,1]^2, shape (..., 2) -> (..., 2*num_feats)."""
    c = (2.0 * coords01 - 1.0).astype(jnp.float32) @ gauss.astype(jnp.float32)
    c = 2.0 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(gauss: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(H, W, C) grid positional encoding (prompt_encoder.py:194-205)."""
    h, w = size
    ys = (np.arange(h, dtype=np.float32) + 0.5) / h
    xs = (np.arange(w, dtype=np.float32) + 0.5) / w
    coords = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2) as (x, y)
    return pe_encode(jnp.asarray(coords), gauss)


# -------------------------------------------------------------- prompt enc


def embed_masks(pe: dict, masks: jnp.ndarray) -> jnp.ndarray:
    """(B, 4*h, 4*w, 1) mask prompts -> (B, h, w, C) dense embeddings
    (mask_downscaling, prompt_encoder.py:51-59)."""
    x = conv2d(masks, pe["mask_conv1_w"], pe["mask_conv1_b"], stride=2)
    x = jax.nn.gelu(_layernorm2d(x, pe["mask_ln1"]["g"], pe["mask_ln1"]["b"]), approximate=False)
    x = conv2d(x, pe["mask_conv2_w"], pe["mask_conv2_b"], stride=2)
    x = jax.nn.gelu(_layernorm2d(x, pe["mask_ln2"]["g"], pe["mask_ln2"]["b"]), approximate=False)
    return conv2d(x, pe["mask_conv3_w"], pe["mask_conv3_b"])


def embed_points(pe: dict, points: jnp.ndarray, labels: jnp.ndarray, input_size: tuple[int, int]) -> jnp.ndarray:
    """points (B, N, 2) pixel xy, labels (B, N) in {-1, 0, 1} -> (B, N, C)."""
    h, w = input_size
    coords = (points + 0.5) / jnp.asarray([w, h], jnp.float32)
    emb = pe_encode(coords, pe["gauss"])
    emb = jnp.where(labels[..., None] == -1, pe["not_a_point"], emb)
    emb = emb + jnp.where(labels[..., None] == 0, pe["point_embeds"][0], 0.0)
    emb = emb + jnp.where(labels[..., None] == 1, pe["point_embeds"][1], 0.0)
    return emb


def embed_boxes(pe: dict, boxes: jnp.ndarray, input_size: tuple[int, int]) -> jnp.ndarray:
    """boxes (B, 4) xyxy -> (B, 2, C) corner embeddings."""
    h, w = input_size
    corners = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray([w, h], jnp.float32)
    emb = pe_encode(corners, pe["gauss"])
    emb = emb.at[:, 0].add(pe["point_embeds"][2])
    emb = emb.at[:, 1].add(pe["point_embeds"][3])
    return emb


def no_mask_embed(pe: dict, size: tuple[int, int]) -> jnp.ndarray:
    return jnp.broadcast_to(pe["no_mask"], (1, size[0], size[1], pe["no_mask"].shape[-1]))


# ------------------------------------------------------------- transformer


def _attn(ap: dict, q, k, v, heads: int):
    B, Nq, _ = q.shape
    qp = _linear(q, ap["q_w"], ap["q_b"])
    kp = _linear(k, ap["k_w"], ap["k_b"])
    vp = _linear(v, ap["v_w"], ap["v_b"])
    Ci = qp.shape[-1]
    D = Ci // heads
    qp = qp.reshape(B, Nq, heads, D)
    kp = kp.reshape(B, -1, heads, D)
    vp = vp.reshape(B, -1, heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qp / np.sqrt(D), kp, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp, preferred_element_type=jnp.float32)
    return _linear(out.astype(q.dtype).reshape(B, Nq, Ci), ap["out_w"], ap["out_b"])


def two_way_transformer(tp: dict, image_emb: jnp.ndarray, image_pe: jnp.ndarray,
                        tokens: jnp.ndarray, heads: int = 8):
    """image_emb/image_pe (B, h, w, C); tokens (B, N, C) -> (queries, keys)."""
    B, h, w, C = image_emb.shape
    keys = image_emb.reshape(B, h * w, C)
    key_pe = image_pe.reshape(B if image_pe.ndim == 4 else 1, h * w, C)
    key_pe = jnp.broadcast_to(key_pe, keys.shape)
    queries = tokens

    for i, lp in enumerate(tp["layers"]):
        if i == 0:
            queries = _attn(lp["self_attn"], queries, queries, queries, heads)
        else:
            q = queries + tokens
            queries = queries + _attn(lp["self_attn"], q, q, queries, heads)
        queries = layer_norm(queries, lp["norm1"]["g"], lp["norm1"]["b"])

        q = queries + tokens
        k = keys + key_pe
        queries = queries + _attn(lp["cross_t2i"], q, k, keys, heads)
        queries = layer_norm(queries, lp["norm2"]["g"], lp["norm2"]["b"])

        mlp = _linear(jax.nn.relu(_linear(queries, lp["fc1_w"], lp["fc1_b"])), lp["fc2_w"], lp["fc2_b"])
        queries = layer_norm(queries + mlp, lp["norm3"]["g"], lp["norm3"]["b"])

        q = queries + tokens
        k = keys + key_pe
        keys = keys + _attn(lp["cross_i2t"], k, q, queries, heads)
        keys = layer_norm(keys, lp["norm4"]["g"], lp["norm4"]["b"])

    q = queries + tokens
    k = keys + key_pe
    queries = queries + _attn(tp["final_attn"], q, k, keys, heads)
    queries = layer_norm(queries, tp["norm_final"]["g"], tp["norm_final"]["b"])
    return queries, keys


# ------------------------------------------------------------ mask decoder


def _mlp3(mp: dict, x, sigmoid_output=False):
    n = len(mp["ws"])
    for i, (w, b) in enumerate(zip(mp["ws"], mp["bs"])):
        x = _linear(x, w, b)
        if i < n - 1:
            x = jax.nn.relu(x)
    return jax.nn.sigmoid(x) if sigmoid_output else x


def mask_decoder(
    dp: dict,
    image_embeddings: jnp.ndarray,
    image_pe: jnp.ndarray,
    sparse_prompts: jnp.ndarray,
    dense_prompts: jnp.ndarray,
    multimask_output: bool = False,
):
    """(B, h, w, 256) image embeddings (+ prompts) -> (masks, iou_pred).

    masks: (B, 1 or 3, 4h, 4w).  Follows mask_decoder.py:71-154 incl. the
    multimask slice rule (index 0 vs 1:4).
    """
    B = sparse_prompts.shape[0]
    num_mask_tokens = dp["mask_tokens"].shape[0]
    out_tokens = jnp.concatenate([dp["iou_token"], dp["mask_tokens"]], axis=0)
    tokens = jnp.concatenate([jnp.broadcast_to(out_tokens[None], (B,) + out_tokens.shape),
                              sparse_prompts.astype(out_tokens.dtype)], axis=1)
    src = image_embeddings + dense_prompts
    hs, keys = two_way_transformer(dp["transformer"], src, image_pe, tokens)
    iou_out = hs[:, 0]
    mask_tokens_out = hs[:, 1 : 1 + num_mask_tokens]

    h, w = src.shape[1:3]
    C = src.shape[-1]
    up = keys.reshape(B, h, w, C)
    up = conv_transpose2d_nonoverlap(up, dp["up1_w"], dp["up1_b"], kernel=2)
    up = jax.nn.gelu(_layernorm2d(up, dp["up_ln"]["g"], dp["up_ln"]["b"]), approximate=False)
    up = conv_transpose2d_nonoverlap(up, dp["up2_w"], dp["up2_b"], kernel=2)
    up = jax.nn.gelu(up.astype(jnp.float32)).astype(up.dtype)

    hyper = jnp.stack([_mlp3(dp["hyper_mlps"][i], mask_tokens_out[:, i]) for i in range(num_mask_tokens)], axis=1)
    masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up, preferred_element_type=jnp.float32)
    iou_pred = _mlp3(dp["iou_head"], iou_out)
    if multimask_output:
        return masks[:, 1:], iou_pred[:, 1:]
    return masks[:, :1], iou_pred[:, :1]


# ----------------------------------------------------------------- weights


def convert_sam_prompt_decoder(sd: dict) -> tuple[dict, dict]:
    """Meta SAM checkpoint ('prompt_encoder.'/'mask_decoder.' prefixes
    stripped per part) -> (prompt_encoder pytree, mask_decoder pytree)."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}

    def _t(a):
        return np.ascontiguousarray(a.T)

    def _convt(a):
        return np.ascontiguousarray(np.transpose(a, (0, 2, 3, 1)))

    def _conv(a):
        return np.ascontiguousarray(np.transpose(a, (2, 3, 1, 0)))

    p = "prompt_encoder."
    pe = {
        "gauss": sd[p + "pe_layer.positional_encoding_gaussian_matrix"],
        "point_embeds": np.stack([sd[p + f"point_embeddings.{i}.weight"][0] for i in range(4)]),
        "not_a_point": sd[p + "not_a_point_embed.weight"][0],
        "no_mask": sd[p + "no_mask_embed.weight"][0],
        "mask_conv1_w": _conv(sd[p + "mask_downscaling.0.weight"]),
        "mask_conv1_b": sd[p + "mask_downscaling.0.bias"],
        "mask_ln1": {"g": sd[p + "mask_downscaling.1.weight"], "b": sd[p + "mask_downscaling.1.bias"]},
        "mask_conv2_w": _conv(sd[p + "mask_downscaling.3.weight"]),
        "mask_conv2_b": sd[p + "mask_downscaling.3.bias"],
        "mask_ln2": {"g": sd[p + "mask_downscaling.4.weight"], "b": sd[p + "mask_downscaling.4.bias"]},
        "mask_conv3_w": _conv(sd[p + "mask_downscaling.6.weight"]),
        "mask_conv3_b": sd[p + "mask_downscaling.6.bias"],
    }

    m = "mask_decoder."

    def _attn_params(prefix):
        return {
            "q_w": _t(sd[prefix + ".q_proj.weight"]), "q_b": sd[prefix + ".q_proj.bias"],
            "k_w": _t(sd[prefix + ".k_proj.weight"]), "k_b": sd[prefix + ".k_proj.bias"],
            "v_w": _t(sd[prefix + ".v_proj.weight"]), "v_b": sd[prefix + ".v_proj.bias"],
            "out_w": _t(sd[prefix + ".out_proj.weight"]), "out_b": sd[prefix + ".out_proj.bias"],
        }

    def _ln(prefix):
        return {"g": sd[prefix + ".weight"], "b": sd[prefix + ".bias"]}

    layers = []
    i = 0
    while m + f"transformer.layers.{i}.self_attn.q_proj.weight" in sd:
        lp = m + f"transformer.layers.{i}"
        layers.append(
            {
                "self_attn": _attn_params(lp + ".self_attn"),
                "norm1": _ln(lp + ".norm1"),
                "cross_t2i": _attn_params(lp + ".cross_attn_token_to_image"),
                "norm2": _ln(lp + ".norm2"),
                "fc1_w": _t(sd[lp + ".mlp.lin1.weight"]), "fc1_b": sd[lp + ".mlp.lin1.bias"],
                "fc2_w": _t(sd[lp + ".mlp.lin2.weight"]), "fc2_b": sd[lp + ".mlp.lin2.bias"],
                "norm3": _ln(lp + ".norm3"),
                "cross_i2t": _attn_params(lp + ".cross_attn_image_to_token"),
                "norm4": _ln(lp + ".norm4"),
            }
        )
        i += 1

    def _mlp(prefix, n=3):
        return {
            "ws": [_t(sd[f"{prefix}.layers.{j}.weight"]) for j in range(n)],
            "bs": [sd[f"{prefix}.layers.{j}.bias"] for j in range(n)],
        }

    num_mask_tokens = sd[m + "mask_tokens.weight"].shape[0]
    dec = {
        "iou_token": sd[m + "iou_token.weight"],
        "mask_tokens": sd[m + "mask_tokens.weight"],
        "transformer": {
            "layers": layers,
            "final_attn": _attn_params(m + "transformer.final_attn_token_to_image"),
            "norm_final": _ln(m + "transformer.norm_final_attn"),
        },
        "up1_w": _convt(sd[m + "output_upscaling.0.weight"]),
        "up1_b": sd[m + "output_upscaling.0.bias"],
        "up_ln": _ln(m + "output_upscaling.1"),
        "up2_w": _convt(sd[m + "output_upscaling.3.weight"]),
        "up2_b": sd[m + "output_upscaling.3.bias"],
        "hyper_mlps": [_mlp(m + f"output_hypernetworks_mlps.{i}") for i in range(num_mask_tokens)],
        "iou_head": _mlp(m + "iou_prediction_head"),
    }
    return pe, dec


def init_sam_prompt_decoder(rng, dim: int = 256, depth: int = 2, mlp_dim: int = 2048,
                            down: int = 2, num_mask_tokens: int = 4) -> tuple[dict, dict]:
    ks = iter(jax.random.split(rng, 64))

    def r(*shape, s=0.02):
        return jax.random.normal(next(ks), shape) * s

    pe = {
        "gauss": r(2, dim // 2, s=1.0),
        "point_embeds": r(4, dim),
        "not_a_point": r(dim),
        "no_mask": r(dim),
        "mask_conv1_w": r(2, 2, 1, 4),
        "mask_conv1_b": jnp.zeros(4),
        "mask_ln1": {"g": jnp.ones(4), "b": jnp.zeros(4)},
        "mask_conv2_w": r(2, 2, 4, 16),
        "mask_conv2_b": jnp.zeros(16),
        "mask_ln2": {"g": jnp.ones(16), "b": jnp.zeros(16)},
        "mask_conv3_w": r(1, 1, 16, dim),
        "mask_conv3_b": jnp.zeros(dim),
    }
    di = dim // down

    def attn(inner):
        return {
            "q_w": r(dim, inner), "q_b": jnp.zeros(inner),
            "k_w": r(dim, inner), "k_b": jnp.zeros(inner),
            "v_w": r(dim, inner), "v_b": jnp.zeros(inner),
            "out_w": r(inner, dim), "out_b": jnp.zeros(dim),
        }

    def ln():
        return {"g": jnp.ones(dim), "b": jnp.zeros(dim)}

    layers = [
        {
            "self_attn": attn(dim), "norm1": ln(),
            "cross_t2i": attn(di), "norm2": ln(),
            "fc1_w": r(dim, mlp_dim), "fc1_b": jnp.zeros(mlp_dim),
            "fc2_w": r(mlp_dim, dim), "fc2_b": jnp.zeros(dim),
            "norm3": ln(),
            "cross_i2t": attn(di), "norm4": ln(),
        }
        for _ in range(depth)
    ]

    def mlp(dims):
        return {"ws": [r(a, b) for a, b in zip(dims[:-1], dims[1:])],
                "bs": [jnp.zeros(b) for b in dims[1:]]}

    dec = {
        "iou_token": r(1, dim),
        "mask_tokens": r(num_mask_tokens, dim),
        "transformer": {"layers": layers, "final_attn": attn(di), "norm_final": ln()},
        "up1_w": r(dim, 2, 2, dim // 4),
        "up1_b": jnp.zeros(dim // 4),
        "up_ln": {"g": jnp.ones(dim // 4), "b": jnp.zeros(dim // 4)},
        "up2_w": r(dim // 4, 2, 2, dim // 8),
        "up2_b": jnp.zeros(dim // 8),
        "hyper_mlps": [mlp([dim, dim, dim, dim // 8]) for _ in range(num_mask_tokens)],
        "iou_head": mlp([dim, 256, 256, num_mask_tokens]),
    }
    return pe, dec
