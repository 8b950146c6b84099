"""Attention-map visualization CLI — the viz_atten.py equivalent.

    python -m catseg_tpu.tools.viz_attn --config vitb384 --checkpoint m.npz \
        --input img.jpg --layers 3,7,11 --output attn_out/

Dumps, per requested visual block, a heads-grid image of each head's CLS->
patch attention heatmap overlaid next to the input.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

import jax.numpy as jnp

from ..core.clip import encode_image_attn_maps
from ..core.catseg import normalize_clip
from ..data.loader import load_image
from ..ops import resize_bilinear
from .common import add_device_arg, apply_device, load_params, resolve_config


def head_grid(attn: np.ndarray, grid: int) -> np.ndarray:
    """(heads, 1+G², 1+G²) -> uint8 image: row of CLS-attention heatmaps."""
    heads = attn.shape[0]
    panels = []
    for h in range(heads):
        cls_attn = attn[h, 0, 1:].reshape(grid, grid)
        m = cls_attn / max(cls_attn.max(), 1e-8)
        panels.append((255 * m).astype(np.uint8))
    row = np.concatenate(panels, axis=1)
    return np.repeat(np.repeat(row, 8, axis=0), 8, axis=1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    add_device_arg(ap)
    ap.add_argument("--config", default="vitb384")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--input", required=True)
    ap.add_argument("--layers", default="3,7")
    ap.add_argument("--output", default="attn_out")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    apply_device(args)

    cfg = resolve_config(args.config, args.overrides)
    params = load_params(args.checkpoint, cfg)
    layers = tuple(int(x) for x in args.layers.split(","))

    bad = [l for l in layers if not 0 <= l < cfg.clip.layers]
    if bad:
        raise SystemExit(
            f"--layers {bad} out of range for {cfg.clip.name} (0..{cfg.clip.layers - 1})")
    img = load_image(args.input)
    R = cfg.clip_resolution
    x = normalize_clip(jnp.asarray(img.astype(np.float32))[None])
    x = resize_bilinear(x, (R, R))
    maps = encode_image_attn_maps(params["clip"], x, cfg.clip, attn_layers=layers)

    os.makedirs(args.output, exist_ok=True)
    grid = R // cfg.clip.patch
    base = os.path.splitext(os.path.basename(args.input))[0]
    for layer, attn in zip(sorted(set(layers)), maps):
        vis = head_grid(np.asarray(attn[0]), grid)
        out = os.path.join(args.output, f"{base}_layer{layer}_heads.png")
        Image.fromarray(vis).save(out)
        print(f"layer {layer}: {out}")


if __name__ == "__main__":
    main()
