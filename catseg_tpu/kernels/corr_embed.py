"""Fused cosine-cost volume + 7x7 correlation embedding (Pallas TPU kernel).

Reference pipeline (cat_seg/modeling/transformer/model.py:648-659): L2-
normalize image and text features, cosine cost volume
``einsum('bchw,btpc->bpthw')``, then a per-class Conv2d(P, 128, 7x7, pad 3)
embeds each (H, W) correlation map.  As separate XLA stages these ran at
1-17% of their rooflines (round-3 stage records: correlation 4.33 ms @1%,
corr_embed 4.95 ms @17% at B=10, T=150): the conv has Cin = P (often 1!),
so XLA's conv emitter gets a K = 49*P contraction at its N=32 output-tile
ceiling, and the cost volume materializes a (B, T, H, W, P) HBM round trip
in between.

TPU-shaped single kernel, per (image, class-chunk) grid step:

- The image features arrive TRANSPOSED (E, L): spatial positions on the
  128-lane axis, padded like the decoder's phase planes (PADR zero rows
  above/below for the 7x7's +-3 row taps).  The per-position L2 norm is a
  ones-row MXU contraction (Mosaic lacks sublane reduces); the cost volume
  is then ONE matmul text_n (Tc, E) @ img_n (E, L) -> corr (Tc, L) with NO
  transposes anywhere — computing corr in class-major directly.
- The 7x7 conv becomes a T-batched matmul: 49 lane-rolled copies of corr
  (the decoder's roll-with-edge-masks trick, +-3 columns masked) stack into
  X (Tc, 49P, L); dot_general(X, W (49P, C), batch T) contracts the taps at
  M = L (full rows) and emits (Tc, L, C) — CHANNELS-LAST, so the sublane
  slice of the valid lanes is the aggregator's (B, T, H, W, C) input with
  one reshape and no layout fix-up.

Backward: custom VJP through the plain-XLA composition (normalize -> einsum
-> conv2d) — the fused forward is bit-comparable to it (same fp32
accumulation structure), and training reuses XLA's conv gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASE = 24                      # flagship feature grid
PADR = 3                       # zero pad rows above/below for +-3 row taps
ROWS = BASE + 2 * PADR         # 30
L = -(-(ROWS * BASE) // 128) * 128   # 768
_DATA_LO = PADR * BASE         # first valid lane
_DATA_HI = _DATA_LO + BASE * BASE
MAX_P = 1                      # single-prompt only (P>1 keeps the XLA path;
                               # the ensemble P=80 was never in kernel range)


def _kernel(imgT_ref, text_ref, w_ref, o_ref, *, E: int, dtype):
    f32 = jnp.float32
    imgT = imgT_ref[0].astype(f32)                          # (E, L)
    n2 = jax.lax.dot_general(jnp.ones((1, E), f32), imgT * imgT,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)    # (1, L)
    # torch F.normalize: x / max(||x||, eps)
    inv = 1.0 / jnp.maximum(jnp.sqrt(n2), 1e-12)
    imgn = (imgT * inv).astype(dtype)

    Tc = text_ref.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    col = lanes % BASE

    text_p = text_ref[0].astype(dtype)                       # (Tc, E)
    corr = jax.lax.dot_general(text_p, imgn, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)   # (Tc, L)
    cols = []
    for dy in range(-PADR, PADR + 1):
        for dx in range(-PADR, PADR + 1):
            shift = dy * BASE + dx
            v = pltpu.roll(corr, (-shift) % L, 1) if shift else corr
            if dx > 0:
                v = jnp.where(col >= BASE - dx, 0.0, v)
            elif dx < 0:
                v = jnp.where(col < -dx, 0.0, v)
            cols.append(v.astype(dtype).reshape(Tc, 1, L))
    # constant-ones tap: the conv bias rides the contraction as w2's last
    # row (no 3D-broadcast bias add, which Mosaic's layout pass rejects)
    cols.append(jnp.ones((Tc, 1, L), dtype))
    X = jnp.concatenate(cols, axis=1)                        # (Tc, 50, L)

    W = w_ref[:].astype(dtype)                               # (50, C)
    Wb = jnp.broadcast_to(W[None], (Tc,) + W.shape)
    out = jax.lax.dot_general(X, Wb, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32)    # (Tc, L, C)
    # write the full padded-L rows: a 3D middle-dim slice here crashes
    # Mosaic's vector layout pass (Check failed: limits[i] <= dim(i), v5e);
    # the caller slices the valid lanes in XLA instead
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas(imgT, text_n, w2, dtype, interpret: bool):
    B, E, _ = imgT.shape
    T = text_n.shape[1]
    C = w2.shape[1]
    # class chunks: pad T to a sublane multiple, split into <=128-row chunks
    # sized to minimize tail waste (T=150 -> 2 chunks of 80)
    T8 = -(-T // 8) * 8
    nT = -(-T8 // 128)
    Tc = -(-(T8 // nT) // 8) * 8
    while nT * Tc < T8:
        Tc += 8
    Tp = nT * Tc
    if Tp != T:
        text_n = jnp.concatenate(
            [text_n, jnp.zeros((B, Tp - T, E), text_n.dtype)], axis=1)

    out = pl.pallas_call(
        functools.partial(_kernel, E=E, dtype=dtype),
        grid=(B, nT),
        in_specs=[
            pl.BlockSpec((1, E, L), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Tc, E), lambda b, t: (b, t, 0)),
            pl.BlockSpec(w2.shape, lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Tc, L, C), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, L, C), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(imgT, text_n, w2)
    return out[:, :T, _DATA_LO:_DATA_HI].reshape(B, T, BASE, BASE, C)


def _to_padded_T(img_feats, dtype):
    """(B, H, W, E) -> (B, E, L) transposed + row-padded lane layout."""
    B, H, W, E = img_feats.shape
    flat = img_feats.reshape(B, H * W, E).transpose(0, 2, 1).astype(dtype)
    out = jnp.zeros((B, E, L), dtype)
    return out.at[:, :, _DATA_LO:_DATA_HI].set(flat)


def _reference(img_feats, text_n, w, b):
    from ..core.aggregator import l2_normalize
    from ..ops import conv2d

    B, H, W, E = img_feats.shape
    T, P = text_n.shape[1], text_n.shape[2]
    img = l2_normalize(img_feats, axis=-1)
    corr = jnp.einsum("bhwc,btpc->bthwp", img, text_n.astype(img.dtype),
                      preferred_element_type=jnp.float32).astype(img.dtype)
    x = conv2d(corr.reshape(B * T, H, W, P), w, b, padding=3)
    return x.reshape(B, T, H, W, -1)


def corr_embed_applicable(img_feats, text_feats, w) -> bool:
    """Fused-path geometry: 24x24 grid, lane-multiple embed width, small P."""
    return (img_feats.shape[1] == BASE and img_feats.shape[2] == BASE
            and w.shape[-1] % 128 == 0 and text_feats.shape[2] <= MAX_P
            and img_feats.shape[-1] % 8 == 0)


@jax.custom_vjp
def fused_corr_embed(img_feats, text_n, w, b):
    """L2-normalized cosine cost volume + 7x7 embedding in one kernel.

    img_feats: (B, 24, 24, E) raw (unnormalized) image features;
    text_n: (B, T, P, E) text features ALREADY L2-normalized (the caller
    normalizes once — the truncation path reuses the normalized copy for
    gathering); w: (7, 7, P, C) HWIO conv weights; b: (C,).
    Returns (B, T, 24, 24, C) in img_feats.dtype — matches
    correlation() + corr_embed() (tests/test_kernels.py)."""
    backend = jax.default_backend()
    if backend not in ("tpu", "cpu") or text_n.shape[2] > MAX_P:
        return _reference(img_feats, text_n, w, b)
    dtype = img_feats.dtype
    C = w.shape[-1]
    imgT = _to_padded_T(img_feats, dtype)
    # bias rides as the 50th "tap" against a constant-ones plane (in bf16
    # compute the bias is rounded to dtype once — same scale as every other
    # bf16 operand rounding)
    w2 = jnp.concatenate([w.reshape(49, C), b.reshape(1, C)], axis=0).astype(dtype)
    return _pallas(imgT, text_n.reshape(text_n.shape[0], -1, text_n.shape[-1]).astype(dtype),
                   w2, dtype, interpret=backend == "cpu")


def _fwd(img_feats, text_n, w, b):
    return fused_corr_embed(img_feats, text_n, w, b), (img_feats, text_n, w, b)


def _bwd(res, g):
    img_feats, text_n, w, b = res
    _, vjp = jax.vjp(_reference, img_feats, text_n, w, b)
    return vjp(g)


fused_corr_embed.defvjp(_fwd, _bwd)
