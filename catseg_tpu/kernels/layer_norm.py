"""Fused LayerNorm (Pallas TPU kernel).

XLA lowers the fp32-statistics LayerNorm into several HBM passes (upcast,
mean, var, normalize, downcast) — profiled at ~2.8 ms per call on the
(750*576, 128) aggregator activations, i.e. ~10x the bandwidth bound.  This
kernel does one read + one write per element: each grid step loads a row
tile, computes fp32 statistics in VMEM, and writes the normalized bf16 tile.

Backward: custom VJP with the standard LayerNorm gradient in plain XLA
(recompute-stats; training steps are not bandwidth-critical here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512


def _var(x32, mean, fast: bool):
    """fp32 row variance; ``fast`` (bf16 compute) = single-pass E[x^2]-mu^2 —
    one fewer VPU pass, error ~eps_f32*mu^2 (below bf16 input quantization);
    fp32 compute keeps the two-pass form for oracle parity (see
    swin_block._ln for the measured rationale)."""
    if fast:
        return jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mean * mean
    return jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)


def _kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = _var(x, mean, x_ref.dtype == jnp.bfloat16)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _pallas_ln(x2d, g, b, eps: float, interpret: bool):
    M, C = x2d.shape
    grid = (pl.cdiv(M, _TILE),)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M, C), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2d, g.reshape(1, C), b.reshape(1, C))


def _reference_ln(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = _var(x32, mean, x.dtype == jnp.bfloat16)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, g, b, eps: float = 1e-5):
    """LayerNorm over the last axis, fp32 statistics, any leading shape."""
    shape = x.shape
    C = shape[-1]
    x2d = x.reshape(-1, C)
    backend = jax.default_backend()
    M = x2d.shape[0]
    # the kernel wants lane-aligned channels and enough rows to tile
    from ..parallel.mesh import pallas_allowed

    if C % 128 == 0 and M >= _TILE and backend in ("tpu", "cpu") and pallas_allowed():
        out = _pallas_ln(x2d, g, b, eps, interpret=backend == "cpu")
        return out.reshape(shape)
    return _reference_ln(x, g, b, eps)


def _fwd(x, g, b, eps):
    return fused_layer_norm(x, g, b, eps), (x, g)


def _bwd(eps, res, dy):
    x, g = res
    x32 = x.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = _var(x32, mean, x.dtype == jnp.bfloat16)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * inv
    dgam = jnp.sum(dy32 * xhat, axis=tuple(range(x.ndim - 1)))
    dbet = jnp.sum(dy32, axis=tuple(range(x.ndim - 1)))
    dxhat = dy32 * g.astype(jnp.float32)
    C = x.shape[-1]
    dx = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True) - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx.astype(x.dtype), dgam.astype(g.dtype), dbet.astype(g.dtype)


fused_layer_norm.defvjp(_fwd, _bwd)
