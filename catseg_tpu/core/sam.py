"""SAM (Segment Anything) image encoder — fusion second encoder, Ver06-14 family.

Reproduces the reference's vendored Meta SAM ViT image encoder
(cat_seg/segment_anything/modeling/image_encoder.py): patch-embed conv,
additive absolute positional embedding on the (H, W) token grid, transformer
blocks that window-partition (pad-to-multiple, window 14) except at the
global-attention indexes, decomposed relative position biases
(image_encoder.py:304-360), and a conv->LayerNorm2d->conv neck to 256
channels.  ``get_intermediate_layers`` returns every block's (B, H, W, C)
token grid plus the neck output (image_encoder.py:118-129).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layer_norm
from ..ops.conv import conv2d
from ..ops.resize import resize_bicubic


@dataclasses.dataclass(frozen=True)
class SAMVariant:
    img_size: int = 1024
    patch: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    out_chans: int = 256
    window: int = 14
    global_blocks: tuple[int, ...] = (2, 5, 8, 11)

    @property
    def grid(self) -> int:
        return self.img_size // self.patch


SAM_VITB = SAMVariant()
SAM_VITL = SAMVariant(width=1024, layers=24, heads=16, global_blocks=(5, 11, 17, 23))
SAM_VITH = SAMVariant(width=1280, layers=32, heads=16, global_blocks=(7, 15, 23, 31))

SAM_VARIANTS = {"sam_vitb": SAM_VITB, "sam_vitl": SAM_VITL, "sam_vith": SAM_VITH}


def _linear(x, w, b=None):
    y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """(2*max(q,k)-1, C) table -> (q, k, C) gathered biases (image_encoder.py:304-334).

    q_size == k_size in this encoder; the interpolation branch handles tables
    trained at a different resolution (linear, torch semantics)."""
    max_rel = 2 * max(q_size, k_size) - 1
    L = rel_pos.shape[0]
    if L != max_rel:
        from ..ops.resize import _linear_weights

        wmat = jnp.asarray(_linear_weights(L, max_rel, align_corners=False), dtype=jnp.float32)
        rel_pos = jnp.einsum("lc,ml->mc", rel_pos.astype(jnp.float32), wmat).astype(rel_pos.dtype)
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(np.int64)]


def _attention(x: jnp.ndarray, bp: dict, heads: int, use_rel_pos: bool) -> jnp.ndarray:
    """SAM attention over (B, H, W, C) token grids with decomposed rel-pos."""
    B, H, W, C = x.shape
    D = C // heads
    qkv = _linear(x.reshape(B, H * W, C), bp["qkv_w"], bp["qkv_b"]).reshape(B, H * W, 3, heads, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (D**-0.5), k, preferred_element_type=jnp.float32)
    if use_rel_pos:
        Rh = _get_rel_pos(H, H, bp["rel_pos_h"]).astype(jnp.float32)
        Rw = _get_rel_pos(W, W, bp["rel_pos_w"]).astype(jnp.float32)
        rq = q.reshape(B, H, W, heads, D).astype(jnp.float32)
        rel_h = jnp.einsum("bhwnd,hkd->bnhwk", rq, Rh)
        rel_w = jnp.einsum("bhwnd,wkd->bnhwk", rq, Rw)
        logits = logits.reshape(B, heads, H, W, H, W) + rel_h[..., :, None] + rel_w[..., None, :]
        logits = logits.reshape(B, heads, H * W, H * W)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, H * W, C)
    return _linear(out, bp["proj_w"], bp["proj_b"]).reshape(B, H, W, C)


def _window_partition_pad(x: jnp.ndarray, window: int):
    B, H, W, C = x.shape
    ph = (window - H % window) % window
    pw = (window - W % window) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def _window_unpartition(wins: jnp.ndarray, window: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    C = wins.shape[-1]
    B = wins.shape[0] // ((Hp // window) * (Wp // window))
    x = wins.reshape(B, Hp // window, Wp // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W]


def _block(x: jnp.ndarray, bp: dict, variant: SAMVariant, window: int) -> jnp.ndarray:
    shortcut = x
    x = layer_norm(x, bp["ln_1"]["g"], bp["ln_1"]["b"])
    hw = x.shape[1:3]
    if window > 0:
        x, pad_hw = _window_partition_pad(x, window)
    x = _attention(x, bp, variant.heads, use_rel_pos=True)
    if window > 0:
        x = _window_unpartition(x, window, pad_hw, hw)
    x = shortcut + x
    y = layer_norm(x, bp["ln_2"]["g"], bp["ln_2"]["b"])
    y = _linear(jax.nn.gelu(_linear(y, bp["fc1_w"], bp["fc1_b"]), approximate=False), bp["fc2_w"], bp["fc2_b"])
    return x + y


def _layernorm2d(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """SAM's LayerNorm2d: per-pixel channel norm with eps=1e-6."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) / jnp.sqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def encode_image(
    params: dict,
    images: jnp.ndarray,
    variant: SAMVariant = SAM_VITB,
    intermediates: bool = False,
    compute_dtype=jnp.float32,
):
    """images: (B, H, W, 3) SAM-normalized.  Returns the (B, h, w, 256) neck
    output; with intermediates=True, also every block's (B, h, w, width)."""
    B, H, W, _ = images.shape
    x = conv2d(images.astype(compute_dtype), params["patch_w"], params["patch_b"], stride=variant.patch)
    gh, gw = x.shape[1:3]
    pe = params["pos_embed"]
    if (gh, gw) != pe.shape[:2]:
        pe = resize_bicubic(pe[None].astype(jnp.float32), (gh, gw))[0].astype(pe.dtype)
    x = x + pe.astype(x.dtype)
    outs = []
    for i in range(variant.layers):
        bp = params["blocks"][i]
        window = 0 if i in variant.global_blocks else variant.window
        x = _block(x, bp, variant, window)
        if intermediates:
            outs.append(x)
    neck = conv2d(x, params["neck_conv1_w"], None)
    neck = _layernorm2d(neck, params["neck_ln1"]["g"], params["neck_ln1"]["b"])
    neck = conv2d(neck, params["neck_conv2_w"], None, padding=1)
    neck = _layernorm2d(neck, params["neck_ln2"]["g"], params["neck_ln2"]["b"])
    if intermediates:
        return neck, outs
    return neck


def init_sam_params(rng, variant: SAMVariant = SAM_VITB) -> dict:
    w = variant.width
    ks = jax.random.split(rng, 5)

    def blk(k, i):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        size = variant.grid if i in variant.global_blocks else variant.window
        return {
            "ln_1": {"g": jnp.ones(w), "b": jnp.zeros(w)},
            "qkv_w": jax.random.normal(k1, (w, 3 * w)) * 0.02,
            "qkv_b": jnp.zeros(3 * w),
            "proj_w": jax.random.normal(k2, (w, w)) * 0.02,
            "proj_b": jnp.zeros(w),
            "rel_pos_h": jnp.zeros((2 * size - 1, w // variant.heads)),
            "rel_pos_w": jnp.zeros((2 * size - 1, w // variant.heads)),
            "ln_2": {"g": jnp.ones(w), "b": jnp.zeros(w)},
            "fc1_w": jax.random.normal(k3, (w, 4 * w)) * 0.02,
            "fc1_b": jnp.zeros(4 * w),
            "fc2_w": jax.random.normal(k4, (4 * w, w)) * 0.02,
            "fc2_b": jnp.zeros(w),
        }

    # rel-pos tables differ in length between window and global blocks, so
    # blocks are NOT stacked; kept as a list pytree (indexable in the loop)
    blocks = [blk(k, i) for i, k in enumerate(jax.random.split(ks[0], variant.layers))]
    return {
        "patch_w": jax.random.normal(ks[1], (variant.patch, variant.patch, 3, w)) * 0.02,
        "patch_b": jnp.zeros(w),
        "pos_embed": jnp.zeros((variant.grid, variant.grid, w)),
        "blocks": blocks,
        "neck_conv1_w": jax.random.normal(ks[2], (1, 1, w, variant.out_chans)) * 0.02,
        "neck_ln1": {"g": jnp.ones(variant.out_chans), "b": jnp.zeros(variant.out_chans)},
        "neck_conv2_w": jax.random.normal(ks[3], (3, 3, variant.out_chans, variant.out_chans)) * 0.02,
        "neck_ln2": {"g": jnp.ones(variant.out_chans), "b": jnp.zeros(variant.out_chans)},
    }


def convert_sam_state_dict(sd: dict, variant: SAMVariant = SAM_VITB) -> dict:
    """Meta SAM checkpoint ('image_encoder.' prefix stripped) -> pytree."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}

    def _t(a):
        return np.ascontiguousarray(a.T)

    blocks = []
    for i in range(variant.layers):
        p = f"blocks.{i}"
        blocks.append(
            {
                "ln_1": {"g": sd[p + ".norm1.weight"], "b": sd[p + ".norm1.bias"]},
                "qkv_w": _t(sd[p + ".attn.qkv.weight"]),
                "qkv_b": sd[p + ".attn.qkv.bias"],
                "proj_w": _t(sd[p + ".attn.proj.weight"]),
                "proj_b": sd[p + ".attn.proj.bias"],
                "rel_pos_h": sd[p + ".attn.rel_pos_h"],
                "rel_pos_w": sd[p + ".attn.rel_pos_w"],
                "ln_2": {"g": sd[p + ".norm2.weight"], "b": sd[p + ".norm2.bias"]},
                "fc1_w": _t(sd[p + ".mlp.lin1.weight"]),
                "fc1_b": sd[p + ".mlp.lin1.bias"],
                "fc2_w": _t(sd[p + ".mlp.lin2.weight"]),
                "fc2_b": sd[p + ".mlp.lin2.bias"],
            }
        )
    return {
        "patch_w": np.ascontiguousarray(np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0))),
        "patch_b": sd["patch_embed.proj.bias"],
        "pos_embed": sd["pos_embed"][0],
        "blocks": blocks,
        "neck_conv1_w": np.ascontiguousarray(np.transpose(sd["neck.0.weight"], (2, 3, 1, 0))),
        "neck_ln1": {"g": sd["neck.1.weight"], "b": sd["neck.1.bias"]},
        "neck_conv2_w": np.ascontiguousarray(np.transpose(sd["neck.2.weight"], (2, 3, 1, 0))),
        "neck_ln2": {"g": sd["neck.3.weight"], "b": sd["neck.3.bias"]},
    }
