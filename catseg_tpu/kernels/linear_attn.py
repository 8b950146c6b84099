"""Fused linear (elu+1 kernelized) class attention (Pallas TPU kernel).

The class-aggregation stage runs kernelized attention across the class axis
for every pooled spatial position (reference LinearAttention,
cat_seg/modeling/transformer/model.py:260-286).  XLA materializes the fp32
feature maps and per-position KV tensors in HBM; this kernel computes the
whole thing per position in VMEM.

Head handling mirrors kernels/window_attn.py: Mosaic cannot split the
128-lane channel dim, so KV is computed full-width and masked block-diagonal
(cross-head blocks zeroed by a constant mask), and the per-head normalizers
ride a (C, heads) indicator matmul.  ~4x redundant MACs on tiny matmuls,
zero HBM intermediates.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference(q, k, v, heads: int, eps: float = 1e-6):
    """Plain-XLA path: q/k/v (N, S, C) -> (N, S, C)."""
    N, S, C = q.shape
    D = C // heads
    qh = q.reshape(N, S, heads, D)
    kh = k.reshape(N, S, heads, D)
    vh = v.reshape(N, S, heads, D)
    Q = jax.nn.elu(qh.astype(jnp.float32)) + 1.0
    K = jax.nn.elu(kh.astype(jnp.float32)) + 1.0
    v32 = vh.astype(jnp.float32) / S
    KV = jnp.einsum("nshd,nshv->nhdv", K, v32)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * S
    return out.astype(q.dtype).reshape(N, S, C)


def _phi(x):
    # elu(x)+1 without expm1 (unimplemented in Mosaic): x+1 for x>0, exp(x) else
    return jnp.where(x > 0, x + 1.0, jnp.exp(x))


_BLK = 8  # sequences per grid step


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, eps: float):
    Bs, S, C = q_ref.shape
    D = C // heads
    Q = _phi(q_ref[:].astype(jnp.float32))  # (Bs, S, C)
    K = _phi(k_ref[:].astype(jnp.float32))
    V = v_ref[:].astype(jnp.float32) / S

    lane = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    head_of_lane = lane // D
    blockdiag = (head_of_lane == head_of_lane.T).astype(jnp.float32)  # (C, C)
    indicator = (head_of_lane == jax.lax.broadcasted_iota(jnp.int32, (1, heads), 1)).astype(jnp.float32)

    # batched (1 batch dim) contractions — Mosaic's limit
    KV = jax.lax.dot_general(K, V, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # (Bs, C, C)
    KV = KV * blockdiag[None]
    Ksum = jnp.sum(K, axis=1)  # (Bs, C)
    # per-head normalizer: Q · (Ksum masked to head h) via a (Bs, C, heads) matmul
    Zh = jax.lax.dot_general(Q, Ksum[:, :, None] * indicator[None],
                             dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # (Bs, S, heads)
    Zh = 1.0 / (Zh + eps)
    scale = jax.lax.dot_general(Zh, jnp.broadcast_to(indicator.T[None], (Bs, heads, C)),
                                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)  # (Bs, S, C)
    out = jax.lax.dot_general(Q, KV, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (out * scale * S).astype(o_ref.dtype)


def _pallas(q, k, v, heads: int, eps: float, interpret: bool):
    N, S, C = q.shape
    spec = pl.BlockSpec((_BLK, S, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((N, S, C), q.dtype),
        grid=(pl.cdiv(N, _BLK),),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * N * S * C * C,
            bytes_accessed=4 * N * S * C * q.dtype.itemsize,
            transcendentals=2 * N * S * C,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_linear_attention(q, k, v, heads: int):
    """elu+1 kernelized attention over the class axis; q/k/v (N, S, C)."""
    N, S, C = q.shape
    backend = jax.default_backend()
    from ..parallel.mesh import pallas_allowed

    if C % 128 == 0 and S % 8 == 0 and backend in ("tpu", "cpu") and pallas_allowed():
        return _pallas(q, k, v, heads, 1e-6, interpret=backend == "cpu")
    return _reference(q, k, v, heads)


def _fwd(q, k, v, heads):
    return fused_linear_attention(q, k, v, heads), (q, k, v)


def _bwd(heads, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _reference(a, b, c, heads), q, k, v)
    return vjp(g)


fused_linear_attention.defvjp(_fwd, _bwd)
