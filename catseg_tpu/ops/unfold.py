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

import functools  # noqa: F401  (kept: tile-cover maps below are cached)

import numpy as np
import jax
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


def _segments(size: int, origins: list[int], kernel: int) -> list[tuple[int, int]]:
    """Half-open intervals between consecutive tile edges covering [0, size)."""
    edges = sorted({0, size} | {e for o in origins for e in (o, o + kernel) if 0 < e < size})
    return list(zip(edges[:-1], edges[1:]))


def fold_tiles(tiles: jnp.ndarray, out_hw: tuple[int, int], kernel: int, stride: int) -> jnp.ndarray:
    """Inverse of unfold_tiles *without* normalization: overlaps are summed.

    tiles: (nTiles * B, kernel, kernel, C) in the order unfold_tiles emits.

    Assembled segment-by-segment: the tile edges cut the canvas into a static
    grid of blocks, each covered by a fixed set of tiles, so the fold is pure
    slices + sums + one concat — a single output write.  (The scatter form —
    sequential ``.at[].add`` onto a zeros canvas — read-modify-writes the
    full (B, H, W, C) fp32 buffer once per tile, ~4x the HBM traffic at the
    eval geometry.)  Summation runs in tile-index order, matching the scatter
    form bit-for-bit in fp32.
    """
    H, W = out_hw
    ys = _tile_origins(H, kernel, stride)
    xs = _tile_origins(W, kernel, stride)
    n = len(ys) * len(xs)
    B = tiles.shape[0] // n
    tidx = {(y, xo): i for i, (y, xo) in enumerate((y, xo) for y in ys for xo in xs)}

    rows = []
    for (a, b) in _segments(H, ys, kernel):
        cols = []
        for (c, d) in _segments(W, xs, kernel):
            cover = [(y, xo) for y in ys for xo in xs
                     if y <= a and b <= y + kernel and xo <= c and d <= xo + kernel]
            if not cover:
                cols.append(jnp.zeros((B, b - a, d - c, tiles.shape[-1]), jnp.float32))
                continue
            blk = None
            for (y, xo) in cover:  # tile-index order == scatter add order
                i = tidx[(y, xo)]
                t = tiles[i * B : (i + 1) * B, a - y : b - y, c - xo : d - xo].astype(jnp.float32)
                blk = t if blk is None else blk + t
            cols.append(blk)
        rows.append(jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0])
    out = jnp.concatenate(rows, axis=1) if len(rows) > 1 else rows[0]
    return out.astype(tiles.dtype)


def fold_divisor(out_hw: tuple[int, int], kernel: int, stride: int) -> jnp.ndarray:
    """Constant overlap-count map: fold(unfold(ones)), shape (H, W, 1).

    The count is separable — div[y, x] = (#tiles covering row y) x
    (#tiles covering col x) — and is computed IN-GRAPH from the tiny origin
    lists: a dense (640, 640, 1) f32 literal is ~1.6 MB of serialized HLO,
    and the tunneled remote-compile endpoint caps request size.  Small-int
    products are exact in f32, so values match the dense accumulation
    bit-for-bit."""
    H, W = out_hw

    def count(n):
        origins = np.asarray(_tile_origins(n, kernel, stride), np.int32)
        i = jax.lax.iota(jnp.int32, n)
        hit = (i[None, :] >= origins[:, None]) & (i[None, :] < origins[:, None] + kernel)
        return jnp.sum(hit, axis=0).astype(jnp.float32)

    return (count(H)[:, None] * count(W)[None, :])[:, :, None]
