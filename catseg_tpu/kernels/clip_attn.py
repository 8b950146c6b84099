"""Fused full-sequence multi-head attention for the CLIP encoder (Pallas).

The dense CLIP image encode (third_party/model_vpt.py:176-240 semantics, see
core/clip.py) runs maskless softmax attention over ~577 tokens for every
sliding-window tile.  The plain-XLA formulation materializes the
(B, heads, S, S) fp32 logits in HBM — at eval shapes (10, 12, 577, 577)
that is ~160 MB per layer and three-plus HBM round trips through the
softmax chain, which is why the measured CLIP guidance stage ran at ~26
TF/s effective (~7% of the bf16 peak) despite perfectly-shaped gemms.

This kernel keeps the logits in VMEM.  One grid step per image/tile: the
padded (Sp, W) q/k/v blocks live in VMEM and heads are processed two at a
time as 128-lane chunks (Mosaic cannot split the lane dim below 128; with
D = 64 a head PAIR is exactly one 128-lane slice).  Within a chunk the two
heads run as full-width matmuls against a per-head lane-masked, row-tiled Q
(the swin-pair trick, kernels/swin_block.py) — 2x redundant MACs on perfect
MXU tiles instead of a relayout.  Sequence padding (S -> Sp, a multiple of
64) is handled by an additive -1e9 key mask built from iota; padded query
rows compute garbage that the caller slices away.

Applies to encoders with head_dim == 64 (CLIP ViT-B/16 and ViT-L/14 — the
flagship tiers).  ViT-H/G (head_dim 80/104) keep the XLA path.

Backward: recompute with plain-XLA einsums (the standard trade; CLIP
finetuning only touches q/v projections and small batches).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference(q, k, v, heads: int):
    """Plain-XLA maskless MHA on (B, S, W); fp32 softmax (core/clip._mha)."""
    B, S, W = q.shape
    D = W // heads
    qh = q.reshape(B, S, heads, D)
    kh = k.reshape(B, S, heads, D)
    vh = v.reshape(B, S, heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(B, S, W)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, s_real: int, scale: float):
    Sp, W = q_ref.shape[1], q_ref.shape[2]
    D = W // heads
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # additive key-padding mask (1, Sp): -1e9 on the zero pad rows of k
    neg = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (1, Sp), 1) >= s_real, -1e9, 0.0)
    # row-tiled per-head lane mask: row block h of the doubled Q keeps lanes
    # of head h within the 128-lane chunk
    row2 = jax.lax.broadcasted_iota(jnp.int32, (2 * Sp, 128), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2 * Sp, 128), 1)
    hsel = ((row2 // Sp) == (lane2 // D)).astype(q.dtype)
    for c in range(W // 128):
        sl = slice(c * 128, (c + 1) * 128)
        qc = q[:, sl]
        kc = k[:, sl]
        vc = v[:, sl]
        Qh = jnp.concatenate([qc, qc], axis=0) * hsel        # (2Sp, 128)
        logits = jax.lax.dot_general(
            Qh, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + neg  # (2Sp, Sp)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        of = jax.lax.dot_general(
            attn, vc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * hsel.astype(jnp.float32)
        o_ref[0, :, sl] = (of[:Sp] + of[Sp:]).astype(o_ref.dtype)


def _pallas(q, k, v, heads: int, interpret: bool):
    B, S, W = q.shape
    D = W // heads
    Sp = -(-S // 64) * 64
    if Sp != S:
        pad = [(0, 0), (0, Sp - S), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    spec = pl.BlockSpec((1, Sp, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, s_real=S, scale=D ** -0.5),
        out_shape=jax.ShapeDtypeStruct((B, Sp, W), q.dtype),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * (2 * Sp) * Sp * W,
            bytes_accessed=4 * B * Sp * W * q.dtype.itemsize,
            transcendentals=2 * B * Sp * Sp * (W // 128),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(q, k, v)
    return out[:, :S] if Sp != S else out


def dense_attention_applicable(W: int, heads: int, mask) -> bool:
    """Head PAIRS must tile the 128-lane chunks exactly (D == 64)."""
    return mask is None and W % 128 == 0 and W % heads == 0 and W // heads == 64


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dense_attention(q, k, v, heads: int):
    """softmax(q k^T / sqrt(D)) v over full (B, S, W) sequences, maskless.

    Requires W // heads == 64 (see dense_attention_applicable).  The scale
    is applied to the fp32 logits after the matmul, matching core/clip._mha.
    """
    from ..parallel.mesh import pallas_allowed

    backend = jax.default_backend()
    if backend == "tpu" and pallas_allowed():
        return _pallas(q, k, v, heads, interpret=False)
    return _reference(q, k, v, heads)


def _fwd(q, k, v, heads):
    return fused_dense_attention(q, k, v, heads), (q, k, v)


def _bwd(heads, res, g):
    q, k, v = res
    B, S, W = q.shape
    D = W // heads
    scale = D ** -0.5
    qh = q.astype(jnp.float32).reshape(B, S, heads, D)
    kh = k.astype(jnp.float32).reshape(B, S, heads, D)
    vh = v.astype(jnp.float32).reshape(B, S, heads, D)
    gh = g.astype(jnp.float32).reshape(B, S, heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", attn, gh)
    dattn = jnp.einsum("bqhd,bkhd->bhqk", gh, vh)
    dlogits = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", dlogits, kh) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dlogits, qh) * scale
    return (dq.reshape(B, S, W).astype(q.dtype),
            dk.reshape(B, S, W).astype(k.dtype),
            dv.reshape(B, S, W).astype(v.dtype))


fused_dense_attention.defvjp(_fwd, _bwd)
