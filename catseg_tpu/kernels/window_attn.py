"""Fused windowed multi-head attention (Pallas TPU kernel).

The Swin stage materializes (B*T*nW, heads, N, N) attention logits in HBM —
at CAT-Seg eval shapes (3000, 4, 144, 144) that is ~1 GB of fp32 traffic per
block and dominates the stage (profiled: softmax alone ~3.6 ms/block).  This
kernel keeps logits entirely in VMEM: each grid step loads one image-row of
nW windows of already-projected q/k/v, computes scale*QK^T + shift-mask,
softmax (fp32), and the value contraction, writing only the (N, C) outputs.

Backward pass: custom VJP recomputes attention with plain XLA einsums (the
standard recompute-in-backward trade; training batches are small so the
backward is not the bottleneck).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_reference(q, k, v, mask, heads: int, scale: float):
    """Plain-XLA windowed attention on (Bw, N, C); mask (nW, N, N) or None."""
    Bw, N, C = q.shape
    D = C // heads
    qh = q.reshape(Bw, N, heads, D)
    kh = k.reshape(Bw, N, heads, D)
    vh = v.reshape(Bw, N, heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh, preferred_element_type=jnp.float32)
    if mask is not None:
        nW = mask.shape[0]
        logits = logits.reshape(Bw // nW, nW, heads, N, N) + mask[None, :, None]
        logits = logits.reshape(Bw, heads, N, N)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(Bw, N, C)


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, heads: int, scale: float):
    # One window per grid step.  Mosaic cannot split the 128-lane channel dim
    # into heads, so each head's QK^T runs as a full-width rank-2 matmul with
    # the other heads' lanes zeroed (4x redundant MACs, but the MXU tile is
    # perfect and everything stays in VMEM — far cheaper than the HBM round
    # trips this kernel eliminates).
    N, C = q_ref.shape[1], q_ref.shape[2]
    D = C // heads
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    add_mask = mask_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    acc = jnp.zeros((N, C), jnp.float32)
    for h in range(heads):
        mh = jnp.logical_and(lane >= h * D, lane < (h + 1) * D)
        qh = jnp.where(mh, q, jnp.zeros_like(q))
        logits = jax.lax.dot_general(
            qh, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, N): contracts only head h's lanes (q is zero elsewhere)
        logits = logits * scale + add_mask
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        vh = jnp.where(mh, v, jnp.zeros_like(v))
        acc = acc + jnp.dot(attn, vh, preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _pallas_attention(q, k, v, mask, heads: int, scale: float, interpret: bool):
    Bw, N, C = q.shape
    nW = mask.shape[0]
    grid = (Bw,)
    spec = pl.BlockSpec((1, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, N, N), lambda i: (i % nW, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((Bw, N, C), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec, mask_spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * Bw * N * N * C,
            bytes_accessed=4 * Bw * N * C * q.dtype.itemsize,
            transcendentals=Bw * heads * N * N,
        ),
    )(q, k, v, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_window_attention(q, k, v, mask, heads: int, scale: float):
    """softmax(scale * q k^T + mask) v over windows.

    q/k/v: (Bw, N, C) with Bw a multiple of mask.shape[0] (= windows per
    image; the mask broadcasts across images).  mask: (nW, N, N) additive
    fp32 (zeros when unshifted).  Returns (Bw, N, C) in q.dtype.
    """
    from ..parallel.mesh import pallas_allowed

    backend = jax.default_backend()
    if backend == "tpu" and pallas_allowed():
        return _pallas_attention(q, k, v, mask, heads, scale, interpret=False)
    if backend == "cpu" and pallas_allowed():
        # interpret mode keeps the kernel logic covered by the CPU test suite
        return _pallas_attention(q, k, v, mask, heads, scale, interpret=True)
    return _attention_reference(q, k, v, mask, heads, scale)


def _fwd(q, k, v, mask, heads, scale):
    return fused_window_attention(q, k, v, mask, heads, scale), (q, k, v, mask)


def _bwd(heads, scale, res, g):
    q, k, v, mask = res
    Bw, N, C = q.shape
    D = C // heads
    nW = mask.shape[0]
    qh = q.astype(jnp.float32).reshape(Bw, N, heads, D)
    kh = k.astype(jnp.float32).reshape(Bw, N, heads, D)
    vh = v.astype(jnp.float32).reshape(Bw, N, heads, D)
    gh = g.astype(jnp.float32).reshape(Bw, N, heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh)
    logits = (logits.reshape(Bw // nW, nW, heads, N, N) + mask[None, :, None]).reshape(Bw, heads, N, N)
    attn = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", attn, gh)
    dattn = jnp.einsum("bqhd,bkhd->bhqk", gh, vh)
    tmp = dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True)
    dlogits = attn * tmp
    dq = jnp.einsum("bhqk,bkhd->bqhd", dlogits, kh) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dlogits, qh * scale)
    return (
        dq.reshape(Bw, N, C).astype(q.dtype),
        dk.reshape(Bw, N, C).astype(k.dtype),
        dv.reshape(Bw, N, C).astype(v.dtype),
        jnp.zeros_like(mask),
    )


fused_window_attention.defvjp(_fwd, _bwd)
