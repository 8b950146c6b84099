"""Convolution helpers in TPU-native NHWC layout.

Weight layout is HWIO (kh, kw, in, out) throughout the framework; the torch
checkpoint converter (catseg_tpu.weights.convert) transposes from torch's
OIHW.  Every transposed convolution in the model family has stride == kernel
(reference: upsample1/upsample2 at cat_seg/cat_seg_model.py:81-82, decoder Up
blocks at cat_seg/modeling/transformer/model.py:546), i.e. non-overlapping —
which on TPU is best expressed as a single matmul followed by a
depth-to-space reshape instead of a gradient-of-conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """NHWC conv with HWIO weights, torch 'zeros' padding semantics."""
    # No preferred_element_type here: with bf16 operands it breaks the conv
    # gradient rule (fp32 cotangent vs bf16 rhs); the TPU conv accumulates in
    # fp32 internally either way.
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = (out.astype(jnp.float32) + b.astype(jnp.float32)).astype(out.dtype)
    return out.astype(x.dtype)


def conv_transpose2d_nonoverlap(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    kernel: int = 2,
) -> jnp.ndarray:
    """ConvTranspose2d with stride == kernel_size (no overlap, no padding).

    Matches ``nn.ConvTranspose2d(Cin, Cout, kernel_size=k, stride=k)``.
    ``w`` is stored as (Cin, k, k, Cout) (converter reshapes torch's
    (Cin, Cout, k, k)).  Implemented as one matmul Cin -> (k*k*Cout) and a
    depth-to-space, which XLA maps straight onto the MXU.
    """
    B, H, W, Cin = x.shape
    k = kernel
    assert w.shape[0] == Cin and w.shape[1] == k and w.shape[2] == k, (w.shape, x.shape)
    # input-dilated conv (flipped kernel, pad k-1) — XLA's native transposed
    # conv path; ~35% faster on TPU than matmul + explicit depth-to-space
    # (the 6-D transpose shuffles HBM at sub-cacheline granularity)
    wk = w.transpose(1, 2, 0, 3)[::-1, ::-1].astype(x.dtype)
    # No preferred_element_type: with bf16 operands it breaks the conv
    # gradient rule (fp32 cotangent vs bf16 rhs) — same constraint as conv2d.
    out = jax.lax.conv_general_dilated(
        x, wk, window_strides=(1, 1), padding=((k - 1, k - 1), (k - 1, k - 1)),
        lhs_dilation=(k, k), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = (out.astype(jnp.float32) + b.astype(jnp.float32)).astype(out.dtype)
    return out.astype(x.dtype)


def avg_pool2d(x: jnp.ndarray, pool: tuple[int, int]) -> jnp.ndarray:
    """NHWC AvgPool2d(kernel=stride=pool), floor division on edges (torch default)."""
    ph, pw = pool
    if ph == 1 and pw == 1:
        return x
    B, H, W, C = x.shape
    Ho, Wo = H // ph, W // pw
    x = x[:, : Ho * ph, : Wo * pw, :]
    x = x.reshape(B, Ho, ph, Wo, pw, C)
    return jnp.mean(x.astype(jnp.float32), axis=(2, 4)).astype(x.dtype)


def patchify(x: jnp.ndarray, w: jnp.ndarray, patch: int) -> jnp.ndarray:
    """Patch-embedding conv (kernel=stride=patch, bias-free) as a matmul.

    Equivalent to ``nn.Conv2d(3, width, patch, stride=patch, bias=False)``
    (reference: VisualTransformer.conv1, cat_seg/third_party/model_vpt.py:273)
    followed by flatten to (B, grid*grid, width).  ``w`` is HWIO.
    """
    B, H, W, C = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, gh * gw, patch * patch * C)
    wm = w.reshape(patch * patch * C, -1).astype(x.dtype)
    # w is (kh, kw, in, out) -> rows are (kh, kw, in) flattened, matching x.
    return jnp.einsum("bpd,dk->bpk", x, wm, preferred_element_type=jnp.float32).astype(x.dtype)
