"""Sliding-window unfold/fold as static reshapes and scatter-adds.

The reference implements tiled inference with ``nn.Unfold``/``nn.Fold``
(cat_seg/cat_seg_model.py:163-164,212): a 640x640 image is cut into
kernel=384 / stride=256 tiles (2x2 = 4 tiles) which are batched through the
model, then folded back with overlap-count normalization.  On TPU the tiles
become a leading batch dimension via dynamic-slice-free static slicing, and
fold is a sum of padded tiles; the overlap divisor is a trace-time constant
(fold(unfold(ones))).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _tile_origins(size: int, kernel: int, stride: int) -> list[int]:
    # nn.Unfold visits floor((size - kernel)/stride) + 1 positions per axis.
    n = (size - kernel) // stride + 1
    return [i * stride for i in range(n)]


def unfold_tiles(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nTiles, kernel, kernel, C), row-major tile order
    (matches nn.Unfold's column ordering)."""
    B, H, W, C = x.shape
    ys = _tile_origins(H, kernel, stride)
    xs = _tile_origins(W, kernel, stride)
    tiles = [x[:, y : y + kernel, xo : xo + kernel, :] for y in ys for xo in xs]
    return jnp.concatenate(tiles, axis=0).reshape(len(ys) * len(xs) * B, kernel, kernel, C)


def fold_tiles(tiles: jnp.ndarray, out_hw: tuple[int, int], kernel: int, stride: int) -> jnp.ndarray:
    """Inverse of unfold_tiles *without* normalization: overlaps are summed.

    tiles: (nTiles * B, kernel, kernel, C) in the order unfold_tiles emits.
    """
    H, W = out_hw
    ys = _tile_origins(H, kernel, stride)
    xs = _tile_origins(W, kernel, stride)
    n = len(ys) * len(xs)
    B = tiles.shape[0] // n
    C = tiles.shape[-1]
    out = jnp.zeros((B, H, W, C), dtype=jnp.float32)
    idx = 0
    for y in ys:
        for xo in xs:
            t = tiles[idx * B : (idx + 1) * B].astype(jnp.float32)
            out = out.at[:, y : y + kernel, xo : xo + kernel, :].add(t)
            idx += 1
    return out.astype(tiles.dtype)


@functools.lru_cache(maxsize=None)
def fold_divisor(out_hw: tuple[int, int], kernel: int, stride: int) -> np.ndarray:
    """Constant overlap-count map: fold(unfold(ones)), shape (H, W, 1)."""
    H, W = out_hw
    div = np.zeros((H, W, 1), dtype=np.float32)
    for y in _tile_origins(H, kernel, stride):
        for xo in _tile_origins(W, kernel, stride):
            div[y : y + kernel, xo : xo + kernel] += 1.0
    return div
