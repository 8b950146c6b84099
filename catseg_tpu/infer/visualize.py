"""Semantic-segmentation visualization: color overlays and side-by-side dumps.

Replaces the reference's demo/visualizer.py draw_sem_seg and
OVRSSS_Visualizer.save_visual (pred/GT overlay grids; per-dataset palettes at
OVRSSS_Visualizer.py:82-195).  Pure PIL/numpy.
"""

from __future__ import annotations

import colorsys

import numpy as np
from PIL import Image


def build_palette(num_classes: int, seed: int = 1) -> np.ndarray:
    """(K, 3) uint8 distinct colors (golden-ratio hue walk)."""
    rng = np.random.RandomState(seed)
    colors = []
    h = rng.rand()
    for _ in range(num_classes):
        h = (h + 0.61803398875) % 1.0
        s = 0.55 + 0.4 * rng.rand()
        v = 0.75 + 0.25 * rng.rand()
        colors.append([int(255 * c) for c in colorsys.hsv_to_rgb(h, s, v)])
    return np.asarray(colors, dtype=np.uint8)


def colorize(seg: np.ndarray, palette: np.ndarray, ignore_label: int | None = None) -> np.ndarray:
    """(H, W) int ids -> (H, W, 3) uint8; ignore pixels are black."""
    out = np.zeros(seg.shape + (3,), dtype=np.uint8)
    valid = np.ones(seg.shape, bool)
    if ignore_label is not None:
        valid = seg != ignore_label
    ids = np.clip(seg, 0, len(palette) - 1)
    out[valid] = palette[ids[valid]]
    return out


def overlay(image: np.ndarray, seg: np.ndarray, palette: np.ndarray, alpha: float = 0.5,
            ignore_label: int | None = None) -> np.ndarray:
    """Blend a colorized segmentation over the RGB image."""
    color = colorize(seg, palette, ignore_label).astype(np.float32)
    img = image.astype(np.float32)
    if img.shape[:2] != seg.shape:
        img = np.asarray(Image.fromarray(image.astype(np.uint8)).resize(seg.shape[::-1]))
        img = img.astype(np.float32)
    return np.clip((1 - alpha) * img + alpha * color, 0, 255).astype(np.uint8)


def save_visual(image: np.ndarray, pred: np.ndarray, gt: np.ndarray | None, out_path: str,
                num_classes: int, ignore_label: int = 255, alpha: float = 0.5) -> None:
    """Side-by-side [image | pred overlay | gt overlay] (viz.py:332-365 analog)."""
    palette = build_palette(num_classes)
    panels = [image.astype(np.uint8), overlay(image, pred, palette, alpha)]
    if gt is not None:
        panels.append(overlay(image, gt, palette, alpha, ignore_label=ignore_label))
    H = min(p.shape[0] for p in panels)
    panels = [p[:H] for p in panels]
    Image.fromarray(np.concatenate(panels, axis=1)).save(out_path)
