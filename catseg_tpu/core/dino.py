"""DINO ViT image encoder (second encoder of the fusion pathway).

Reproduces the reference's vendored facebookresearch/dino ViT
(cat_seg/vision_transformer.py:174-291): DeiT-style pre-norm blocks with
fused qkv, CLS token, bicubic positional-embedding interpolation with the
+0.1 scale-factor fudge (vision_transformer.py:214-234), and
``get_intermediate_layers`` that applies the *final* norm to every returned
block output (vision_transformer.py:283-291).

Blocks are stacked and scanned; intermediate layers come from the scan's
per-step outputs (cheap at DINO's 12 layers).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layer_norm
from ..ops.resize import _cubic_weights  # noqa: F401 (see _scale_cubic_weights)
from ..ops.conv import conv2d


@dataclasses.dataclass(frozen=True)
class DINOVariant:
    patch: int = 8
    width: int = 768
    layers: int = 12
    heads: int = 12
    pretrain_grid: int = 28  # 224 / 8


DINO_VITB8 = DINOVariant()

DINO_VARIANTS: dict[str, DINOVariant] = {"dino_vitb8": DINO_VITB8}


def _linear(x, w, b=None):
    y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _scale_cubic_weights(in_size: int, scale: float, out_size: int) -> np.ndarray:
    """torch bicubic with an explicit scale_factor (DINO's +0.1 fudge):
    source coord x = (i + 0.5) / scale - 0.5."""
    i = np.arange(out_size, dtype=np.float32)
    x = (i + np.float32(0.5)) / np.float32(scale) - np.float32(0.5)
    x0 = np.floor(x).astype(np.int64)
    f = (x - x0.astype(np.float32)).astype(np.float64)
    w = np.zeros((out_size, in_size))
    rows = np.arange(out_size)
    from ..ops.resize import _cubic_kernel

    for t in range(-1, 3):
        idx = np.clip(x0 + t, 0, in_size - 1)
        np.add.at(w, (rows, idx), _cubic_kernel(f - t))
    return w


def interpolate_pos_embed(pe: jnp.ndarray, pretrain_grid: int, grid: int) -> jnp.ndarray:
    """(1 + N², D) -> (1 + grid², D) with DINO's scale-factor bicubic."""
    if grid == pretrain_grid:
        return pe
    D = pe.shape[-1]
    scale = (grid + 0.1) / pretrain_grid
    out = int(math.floor(pretrain_grid * scale))
    assert out == grid, (out, grid)
    wmat = jnp.asarray(_scale_cubic_weights(pretrain_grid, scale, grid), dtype=jnp.float32)
    grid_pe = pe[1:].reshape(pretrain_grid, pretrain_grid, D).astype(jnp.float32)
    grid_pe = jnp.einsum("hwd,Hh->Hwd", grid_pe, wmat)
    grid_pe = jnp.einsum("Hwd,Ww->HWd", grid_pe, wmat)
    return jnp.concatenate([pe[:1].astype(jnp.float32), grid_pe.reshape(grid * grid, D)], axis=0).astype(pe.dtype)


def _block(x, bp, heads):
    B, N, C = x.shape
    D = C // heads
    y = layer_norm(x, bp["ln_1"]["g"], bp["ln_1"]["b"])
    qkv = _linear(y, bp["qkv_w"], bp["qkv_b"]).reshape(B, N, 3, heads, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (D**-0.5), k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, N, C)
    x = x + _linear(out, bp["proj_w"], bp["proj_b"])
    y = layer_norm(x, bp["ln_2"]["g"], bp["ln_2"]["b"])
    y = _linear(jax.nn.gelu(_linear(y, bp["fc1_w"], bp["fc1_b"]), approximate=False), bp["fc2_w"], bp["fc2_b"])
    return x + y


def get_intermediate_layers(
    params: dict,
    images: jnp.ndarray,
    variant: DINOVariant = DINO_VITB8,
    n: int = 12,
    compute_dtype=jnp.float32,
) -> list[jnp.ndarray]:
    """Token states (final-norm applied) of the last n blocks.

    images: (B, H, W, 3) normalized.  Returns list of (B, 1+G², width).
    """
    B, H, W, _ = images.shape
    grid = H // variant.patch
    x = conv2d(images.astype(compute_dtype), params["patch_w"], params["patch_b"],
               stride=variant.patch)
    x = x.reshape(B, grid * grid, variant.width)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, variant.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(params["pos_embed"], variant.pretrain_grid, grid).astype(x.dtype)

    def body(carry, bp):
        out = _block(carry, bp, variant.heads)
        return out, out

    _, ys = jax.lax.scan(body, x, params["blocks"])
    outs = []
    for i in range(variant.layers - n, variant.layers):
        outs.append(layer_norm(ys[i], params["norm"]["g"], params["norm"]["b"]))
    return outs


def init_dino_params(rng, variant: DINOVariant = DINO_VITB8) -> dict:
    ks = jax.random.split(rng, 4)
    w = variant.width

    def blk(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        return {
            "ln_1": {"g": jnp.ones(w), "b": jnp.zeros(w)},
            "qkv_w": jax.random.normal(k1, (w, 3 * w)) * 0.02,
            "qkv_b": jnp.zeros(3 * w),
            "proj_w": jax.random.normal(k2, (w, w)) * 0.02,
            "proj_b": jnp.zeros(w),
            "ln_2": {"g": jnp.ones(w), "b": jnp.zeros(w)},
            "fc1_w": jax.random.normal(k3, (w, 4 * w)) * 0.02,
            "fc1_b": jnp.zeros(4 * w),
            "fc2_w": jax.random.normal(k4, (4 * w, w)) * 0.02,
            "fc2_b": jnp.zeros(w),
        }

    blocks = [blk(k) for k in jax.random.split(ks[0], variant.layers)]
    return {
        "patch_w": jax.random.normal(ks[1], (variant.patch, variant.patch, 3, w)) * 0.02,
        "patch_b": jnp.zeros(w),
        "cls_token": jax.random.normal(ks[2], (w,)) * 0.02,
        "pos_embed": jax.random.normal(ks[3], (variant.pretrain_grid**2 + 1, w)) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"g": jnp.ones(w), "b": jnp.zeros(w)},
    }


def convert_dino_state_dict(sd: dict) -> dict:
    """facebookresearch/dino checkpoint (numpy values) -> pytree."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    n = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))

    def _t(a):
        return np.ascontiguousarray(a.T)

    blocks = []
    for i in range(n):
        p = f"blocks.{i}"
        blocks.append(
            {
                "ln_1": {"g": sd[p + ".norm1.weight"], "b": sd[p + ".norm1.bias"]},
                "qkv_w": _t(sd[p + ".attn.qkv.weight"]),
                "qkv_b": sd[p + ".attn.qkv.bias"],
                "proj_w": _t(sd[p + ".attn.proj.weight"]),
                "proj_b": sd[p + ".attn.proj.bias"],
                "ln_2": {"g": sd[p + ".norm2.weight"], "b": sd[p + ".norm2.bias"]},
                "fc1_w": _t(sd[p + ".mlp.fc1.weight"]),
                "fc1_b": sd[p + ".mlp.fc1.bias"],
                "fc2_w": _t(sd[p + ".mlp.fc2.weight"]),
                "fc2_b": sd[p + ".mlp.fc2.bias"],
            }
        )
    stacked = {}
    for key in blocks[0]:
        if isinstance(blocks[0][key], dict):
            stacked[key] = {k2: np.stack([b[key][k2] for b in blocks]) for k2 in blocks[0][key]}
        else:
            stacked[key] = np.stack([b[key] for b in blocks])
    return {
        "patch_w": np.ascontiguousarray(np.transpose(sd["patch_embed.proj.weight"], (2, 3, 1, 0))),
        "patch_b": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"].reshape(-1),
        "pos_embed": sd["pos_embed"].reshape(-1, sd["pos_embed"].shape[-1]),
        "blocks": stacked,
        "norm": {"g": sd["norm.weight"], "b": sd["norm.bias"]},
    }
