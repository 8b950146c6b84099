"""Space-to-depth decoder convolutions.

The reference decoder (cat_seg/modeling/transformer/model.py:540-555) runs
3x3 convs at 32-96 channels on 48^2/96^2 grids — shapes that leave the MXU's
128-wide tiles mostly empty (measured ~10% MFU; the largest single stage of
eval at ~19 ms/image).  Rewriting each Up stage in space-to-depth (S2D)
layout fixes the arithmetic shape without changing the math:

* ``ConvTranspose2d(k=2, s=2)`` from (H, W, Cin) to (2H, 2W, Cout) is exactly
  a matmul Cin -> 4*Cout whose four output blocks are the four spatial phases
  — i.e. it *natively* produces the S2D form of its output, no relayout.
* A 3x3 conv on the (2H, 2W, C) image equals a **2x2**-kernel conv on the
  (H, W, 4C) S2D image: output phase (a, b) at block position (q, r) is the
  image position (2q+a, 2r+b), whose 3x3 window spans input block rows
  {q-1+a, q+a} and cols {r-1+b, r+b} — two blocks each way.  With 'valid'
  2x2 over a 1-padded block image, phase (a, b) is read at offset (a, b) of
  the conv output, channel block 2a+b.  16/9 more MACs than the 3x3, but
  K and N grow 4x (e.g. conv1 of decoder1: K 128 -> 512, N 64 -> 256), which
  more than pays for it on the MXU.
* GroupNorm/ReLU/the per-image guidance-add are phase-pointwise, so they run
  in S2D layout directly; only the final 1-channel head output (or the stage
  boundary) pays a depth-to-space transpose.

Weight re-blocking is a linear, bijective scatter built once per trace (and
differentiable, so the same path serves training).

Measured result (v5e, B=5, T=150): in *plain XLA* this layout LOSES to the
direct 3x3 form (decoder2 tail 38 ms vs 12.4 ms) — the phase-offset output
slicing in :func:`conv3x3_s2d` materializes four shifted copies of every conv
output in HBM (slice+concat alone measured ~10 ms), which costs more than the
MXU tiling win.  The direct form is already near its own ceiling (~22% MFU,
bounded by N=32 output tiles).  These helpers are the *numerically tested
semantics* for a fused in-VMEM kernel, where the phase slices are cheap
register moves; the production decoder keeps the direct XLA form until such
a kernel beats it end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, 2H, 2W, C) -> (N, H, W, 4C); phase (a, b) at channel block 2a+b."""
    N, H2, W2, C = x.shape
    x = x.reshape(N, H2 // 2, 2, W2 // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(N, H2 // 2, W2 // 2, 4 * C)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 4C) -> (N, 2H, 2W, C); inverse of :func:`space_to_depth`."""
    N, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(N, H, W, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(N, 2 * H, 2 * W, C)


@functools.lru_cache(maxsize=None)
def _s2d_index_map(cin: int, cout: int) -> tuple[np.ndarray, np.ndarray]:
    """Gather/scatter indices mapping a (3,3,Cin,Cout) kernel into its
    (2,2,4Cin,4Cout) S2D-blocked form.

    For output phase (a, b), block tap (kr, kc) and input phase (c, d), the
    image-space offset is dy = 2*(kr-1+a) + c - a (likewise dx); taps with
    |dy| > 1 or |dx| > 1 fall outside the 3x3 support and stay zero.
    Returns (src, dst) flat index arrays into the respective kernels.
    """
    src, dst = [], []
    for a in range(2):
        for b in range(2):
            for kr in range(2):
                for c in range(2):
                    dy = 2 * (kr - 1 + a) + c - a
                    if abs(dy) > 1:
                        continue
                    for kc in range(2):
                        for d in range(2):
                            dx = 2 * (kc - 1 + b) + d - b
                            if abs(dx) > 1:
                                continue
                            src.append(((dy + 1) * 3 + dx + 1))
                            dst.append(
                                ((kr * 2 + kc) * 4 + (2 * c + d)) * 4 + 2 * a + b
                            )
    return np.asarray(src), np.asarray(dst)


def s2d_conv3x3_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Re-block a (3, 3, Cin, Cout) kernel to (2, 2, 4Cin, 4Cout) S2D form.

    Linear in ``w`` (a pure scatter of the nine taps into phase blocks), so
    gradients flow through it for training.
    """
    _, _, cin, cout = w.shape
    src, dst = _s2d_index_map(cin, cout)
    taps = w.reshape(9, cin, cout)
    w2 = jnp.zeros((2 * 2 * 4 * 4, cin, cout), w.dtype)
    w2 = w2.at[dst].set(taps[src])
    return (
        w2.reshape(2, 2, 4, 4, cin, cout)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(2, 2, 4 * cin, 4 * cout)
    )


def conv3x3_s2d(x: jnp.ndarray, w2: jnp.ndarray, cout: int) -> jnp.ndarray:
    """3x3 'same' conv applied in S2D layout.

    x: (N, H, W, 4Cin) S2D image; w2: output of :func:`s2d_conv3x3_weights`;
    returns the (N, H, W, 4Cout) S2D image of the conv output.
    """
    out = jax.lax.conv_general_dilated(
        x,
        w2.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h, w = x.shape[1], x.shape[2]
    return jnp.concatenate(
        [
            out[:, 0:h, 0:w, 0 * cout : 1 * cout],
            out[:, 0:h, 1 : w + 1, 1 * cout : 2 * cout],
            out[:, 1 : h + 1, 0:w, 2 * cout : 3 * cout],
            out[:, 1 : h + 1, 1 : w + 1, 3 * cout : 4 * cout],
        ],
        axis=-1,
    )


def group_norm_s2d(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over the underlying image, computed in S2D layout.

    Matches ``nn.GroupNorm(num_groups, C)`` on the depth-to-space image: the
    four phase blocks of each channel belong to the same spatial reduction.
    """
    N, H, W, C4 = x.shape
    C = C4 // 4
    dtype = x.dtype
    x32 = x.astype(jnp.float32).reshape(N, H * W, 4, num_groups, C // num_groups)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 4), keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    x32 = x32.reshape(N, H * W, 4, C) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return x32.reshape(N, H, W, C4).astype(dtype)


def up_matmul_s2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(k=2, s=2) emitting its output directly in S2D layout.

    ``w``: (Cin, 2, 2, Cout) as stored by the converter (ops/conv.py
    conv_transpose2d_nonoverlap) — block (a, b) of the output is
    ``x @ w[:, a, b, :] + b``, i.e. one matmul Cin -> 4Cout.
    """
    cin, _, _, cout = w.shape
    wm = w.reshape(cin, 4 * cout).astype(x.dtype)
    out = jnp.einsum("nhwc,ck->nhwk", x, wm, preferred_element_type=jnp.float32)
    return (out + jnp.tile(b, 4).astype(jnp.float32)).astype(x.dtype)
