"""Normalization primitives with torch-parity numerics.

LayerNorm runs its statistics in float32 regardless of the activation dtype
(the reference CLIP does the same upcast: cat_seg/third_party/model_vpt.py:156-162),
which is also the right numerics policy for bfloat16 TPU execution.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    from ..kernels.layer_norm import fused_layer_norm

    return fused_layer_norm(x, scale, bias, eps)


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """NHWC GroupNorm matching ``nn.GroupNorm(num_groups, C)``."""
    B, H, W, C = x.shape
    dtype = x.dtype
    x32 = x.astype(jnp.float32).reshape(B, H * W, num_groups, C // num_groups)
    mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 3), keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps)
    y = y.reshape(B, H, W, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)
