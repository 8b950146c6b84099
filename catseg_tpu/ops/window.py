"""Swin-style window partition / reverse on NHWC tensors.

Equivalent to the reference helpers at
cat_seg/modeling/transformer/model.py:18-47, expressed as static
reshape/transpose so XLA compiles them into pure layout changes.
"""

from __future__ import annotations

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, window*window, C)."""
    B, H, W, C = x.shape
    nh, nw = H // window, W // window
    x = x.reshape(B, nh, window, nw, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * nh * nw, window * window, C)


def window_reverse(windows: jnp.ndarray, window: int, H: int, W: int) -> jnp.ndarray:
    """(B * nH * nW, window*window, C) -> (B, H, W, C)."""
    nh, nw = H // window, W // window
    B = windows.shape[0] // (nh * nw)
    C = windows.shape[-1]
    x = windows.reshape(B, nh, nw, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)
