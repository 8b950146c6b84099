"""Fully fused Swin block-pair (Pallas TPU kernel).

The spatial aggregation stage (reference model.py:228-253) is bandwidth
bound, not FLOP bound: each block's LN -> window-partition -> qkv ->
attention -> proj -> window-reverse -> residual -> LN -> MLP chain round
trips the (B*T, 24, 24, 128) activation through HBM ~10 times (~2.5 GB per
block at eval shapes, ~11 ms measured vs a ~1.5 ms roofline).

This kernel runs ONE grid step per (image, class) slab: the whole
(H, W, C) activation lives in VMEM while both blocks of the pair (shift 0,
then shift window/2) execute end to end — LN1, one fused qkv gemm,
per-image guidance q/k add, cyclic shift via wrap-around static slices,
per-window masked-head attention (Mosaic cannot split the 128-lane channel
dim into heads, so each head's QK^T is a full-width matmul against a
lane-masked q — redundant MACs on a perfect MXU tile beat HBM round trips),
window re-assembly, out-proj, residual, LN2, exact-GELU MLP (hidden stays in
VMEM), residual.  HBM traffic per block-pair: read x + guidance projections
+ weights, write x — ~0.25 GB instead of ~5 GB.

Guidance semantics follow model.py:94-96/193-195 via the algebraic split
linear(concat(x, g)) == linear_x(x) + linear_g(g): the per-image halves
(qg/kg) are projected once per image outside and broadcast across T by the
BlockSpec index map.

Backward: recompute-based custom VJP through the plain-XLA reference pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import _act


def _ln(x32, g, b, eps=1e-5):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * g + b


def _roll_rows_cols(x, s: int):
    """Cyclic shift by +s on the last three dims' spatial axes (..., H, W, C)."""
    if s == 0:
        return x
    x = jnp.concatenate([x[..., -s:, :, :], x[..., :-s, :, :]], axis=-3)
    return jnp.concatenate([x[..., :, -s:, :], x[..., :, :-s, :]], axis=-2)


def _window_attn(q, k, v, mask, heads: int, scale: float, H: int, W: int, win: int):
    """q/k/v: (G, H, W, C) shifted grids -> (G, H, W, C) attention output.

    Windows are static (win, win) slices.  Per head, QK^T runs full-width
    with q lane-masked to the head's channels (Mosaic cannot split the
    128-lane dim).  Only Q is expanded per head (rows h*N+n, lane-masked to
    head h); K and V are stacked ONCE per window — the per-head output mask
    is applied AFTER attn@V, which commutes because the lane mask acts on
    the contraction-free channel axis.  This cuts the window-stack copy
    traffic from 3*heads to (heads + 2) slabs per window, which dominated
    the kernel (softmax itself is ~2 ms of a 9 ms attention stage).
    mask: (nW, N, N) additive fp32 or None.
    """
    G, C = q.shape[0], q.shape[-1]
    D = C // heads
    N = win * win
    nW = (H // win) * (W // win)
    # stacked per-head lane mask: row h*N+n keeps lanes of head h
    lane = jax.lax.broadcasted_iota(jnp.int32, (heads * N, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (heads * N, C), 0)
    hsel = ((lane >= (row // N) * D) & (lane < (row // N + 1) * D)).astype(q.dtype)

    qs, ks, vs = [], [], []
    for g in range(G):
        for wi in range(H // win):
            for wj in range(W // win):
                sl = (g, slice(wi * win, (wi + 1) * win), slice(wj * win, (wj + 1) * win))
                qs.append(q[sl].reshape(N, C))
                ks.append(k[sl].reshape(N, C))
                vs.append(v[sl].reshape(N, C))
    Q = jnp.stack(qs)  # (G*nW, N, C)
    K = jnp.stack(ks)
    V = jnp.stack(vs)
    Qh = jnp.tile(Q, (1, heads, 1)) * hsel[None]  # (G*nW, heads*N, C)
    logits = jax.lax.dot_general(
        Qh, K, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G*nW, heads*N, N)
    if mask is not None:
        mh = jnp.tile(mask, (1, heads, 1))  # (nW, heads*N, N), row h*N+n = mask[n]
        logits = logits + jnp.tile(mh, (G, 1, 1))
    mx = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    out = jax.lax.dot_general(
        attn, V, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)  # (G*nW, heads*N, C) full-width rows
    # per-head lane mask then head-sum reassembles the partitioned channels
    out = jnp.sum((out * hsel[None]).reshape(G * nW, heads, N, C), axis=1)  # (G*nW, N, C)

    slabs = []
    for g in range(G):
        rows_out = []
        for wi in range(H // win):
            cols = [out[g * nW + wi * (W // win) + wj].reshape(win, win, C)
                    for wj in range(W // win)]
            rows_out.append(jnp.concatenate(cols, axis=1))
        slabs.append(jnp.concatenate(rows_out, axis=0))
    return jnp.stack(slabs)


def _one_block(x, qg, kg, p, mask, heads: int, shift: int, H: int, W: int, win: int):
    """x: (G, H, W, C) in compute dtype; qg/kg: (H, W, C) or None.  One swin
    block over G class slabs of one image (guidance is class-invariant)."""
    G, C = x.shape[0], x.shape[-1]
    scale = (C // heads) ** -0.5
    xf = x.reshape(G * H * W, C)
    y = _ln(xf.astype(jnp.float32), p["ln1_g"], p["ln1_b"]).astype(x.dtype)
    qkv = jnp.dot(y, p["qkv_w"], preferred_element_type=jnp.float32) + p["qkv_b"]
    qkv = qkv.astype(x.dtype)
    q = qkv[:, :C].reshape(G, H, W, C)
    k = qkv[:, C : 2 * C].reshape(G, H, W, C)
    v = qkv[:, 2 * C :].reshape(G, H, W, C)
    if qg is not None:
        q = q + qg.astype(x.dtype)[None]
        k = k + kg.astype(x.dtype)[None]
    if shift > 0:
        q = _roll_rows_cols(q, -shift)
        k = _roll_rows_cols(k, -shift)
        v = _roll_rows_cols(v, -shift)
    out = _window_attn(q, k, v, mask, heads, scale, H, W, win)
    if shift > 0:
        out = _roll_rows_cols(out, shift)
    out = jnp.dot(out.reshape(G * H * W, C), p["proj_w"], preferred_element_type=jnp.float32) + p["proj_b"]
    xf = xf + out.astype(x.dtype)
    y = _ln(xf.astype(jnp.float32), p["ln2_g"], p["ln2_b"]).astype(x.dtype)
    h = jnp.dot(y, p["fc1_w"], preferred_element_type=jnp.float32) + p["fc1_b"]
    h = _act(h, "gelu").astype(x.dtype)
    o = jnp.dot(h, p["fc2_w"], preferred_element_type=jnp.float32) + p["fc2_b"]
    return (xf + o.astype(x.dtype)).reshape(G, H, W, C)


_P_KEYS = ("ln1_g", "ln1_b", "qkv_w", "qkv_b", "proj_w", "proj_b",
           "ln2_g", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b")


def _kernel(*refs, heads: int, H: int, W: int, win: int, has_guid: bool):
    it = iter(refs)
    x_ref = next(it)
    if has_guid:
        qg1_ref, kg1_ref, qg2_ref, kg2_ref = next(it), next(it), next(it), next(it)
    mask_ref = next(it)
    p1 = {k: next(it) for k in _P_KEYS}
    p2 = {k: next(it) for k in _P_KEYS}
    o_ref = next(it)

    # biases / LN params arrive as (1, n) and squeeze back to (n,); weights
    # (C, *) never have a leading 1 (C >= 128)
    def unflat(p):
        vals = {k: p[k][:] for k in _P_KEYS}
        return {k: (v[0] if v.shape[0] == 1 else v) for k, v in vals.items()}

    P1, P2 = unflat(p1), unflat(p2)

    x = x_ref[0]  # (G, H, W, C): G class slabs of one image
    qg1 = kg1 = qg2 = kg2 = None
    if has_guid:
        qg1, kg1 = qg1_ref[0], kg1_ref[0]
        qg2, kg2 = qg2_ref[0], kg2_ref[0]
    mask = mask_ref[:]
    x = _one_block(x, qg1, kg1, P1, None, heads, 0, H, W, win)
    x = _one_block(x, qg2, kg2, P2, mask, heads, win // 2, H, W, win)
    o_ref[0] = x


def _flat_params(p, dtype):
    out = []
    for k in _P_KEYS:
        a = p[k].astype(jnp.float32 if k.startswith("ln") else dtype)
        if a.ndim == 1:
            a = a.reshape(1, -1)
        out.append(a)
    return out


# class slabs per grid step (tuning hook; see comment at the use site)
_G_OVERRIDE = 2


def _pallas_pair(x, guid4, p1, p2, mask, heads: int, win: int, interpret: bool):
    B, T, H, W, C = x.shape
    has_guid = guid4 is not None

    # G class slabs per grid step: amortizes per-step dispatch/DMA overhead
    # and widens the qkv/proj/MLP gemms G-fold.  G=2 is the VMEM ceiling at
    # (24, 24, 128) eval shapes (G=4 overflows the 16 MB scoped limit: the
    # fp32 attention logits (G*nW*heads, N, N) + fp32 gemm accumulators hit
    # 23 MB); classes pad to a multiple of G (the padded slabs compute
    # garbage that is sliced away — <1% waste at benchmark Ts).
    G = min(_G_OVERRIDE, T)
    Tp = -(-T // G) * G
    if Tp != T:
        x = jnp.concatenate([x, jnp.zeros((B, Tp - T, H, W, C), x.dtype)], axis=1)

    grid = (B, Tp // G)
    x_spec = pl.BlockSpec((1, G, H, W, C), lambda b, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, H, W, C), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b, t: (0,) * a.ndim, memory_space=pltpu.VMEM)

    operands = [x]
    specs = [x_spec]
    if has_guid:
        for g in guid4:
            operands.append(g.astype(x.dtype))
            specs.append(g_spec)
    operands.append(mask)
    specs.append(const(mask))
    for p in (p1, p2):
        for a in _flat_params(p, x.dtype):
            operands.append(a)
            specs.append(const(a))

    nW, N = (H // win) * (W // win), win * win
    flops_attn = 2 * B * Tp * nW * heads * 2 * N * C * N  # lane-masked full-width
    flops_mm = 2 * B * Tp * H * W * C * (3 * C + C + 8 * C)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, H=H, W=W, win=win, has_guid=has_guid),
        out_shape=jax.ShapeDtypeStruct((B, Tp, H, W, C), x.dtype),
        grid=grid,
        in_specs=specs,
        out_specs=x_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (flops_attn + flops_mm),
            bytes_accessed=2 * B * Tp * H * W * C * x.dtype.itemsize,
            transcendentals=2 * B * Tp * (nW * heads * N * N + H * W * 4 * C),
        ),
    )(*operands)
    return out[:, :T] if Tp != T else out


def _reference_pair(x, guid4, p1, p2, mask, heads: int, win: int):
    """Plain-XLA pair with identical math (fallback + VJP recompute)."""
    B, T, H, W, C = x.shape
    xf = x.reshape(B * T, H * W, C)
    m = mask

    def block(xf, qg, kg, p, msk, shift):
        P = {k: p[k].astype(jnp.float32 if k.startswith("ln") else x.dtype) for k in _P_KEYS}
        y = _ln(xf.astype(jnp.float32), P["ln1_g"], P["ln1_b"]).astype(x.dtype)
        qkv = jnp.einsum("bnc,cd->bnd", y, P["qkv_w"], preferred_element_type=jnp.float32) + P["qkv_b"]
        qkv = qkv.astype(x.dtype)
        q = qkv[..., :C].reshape(B, T, H, W, C)
        k = qkv[..., C : 2 * C].reshape(B, T, H, W, C)
        v = qkv[..., 2 * C :].reshape(B, T, H, W, C)
        if qg is not None:
            q = q + qg[:, None].astype(x.dtype)
            k = k + kg[:, None].astype(x.dtype)
        if shift > 0:
            q, k, v = (jnp.roll(a, (-shift, -shift), axis=(2, 3)) for a in (q, k, v))
        # window partition
        nh, nw = H // win, W // win

        def part(a):
            a = a.reshape(B * T, nh, win, nw, win, C).transpose(0, 1, 3, 2, 4, 5)
            return a.reshape(B * T, nh * nw, win * win, C)

        qw, kw, vw = part(q), part(k), part(v)
        D = C // heads
        qh = qw.reshape(*qw.shape[:-1], heads, D)
        kh = kw.reshape(*kw.shape[:-1], heads, D)
        vh = vw.reshape(*vw.shape[:-1], heads, D)
        logits = jnp.einsum("bwqhd,bwkhd->bwhqk", qh, kh, preferred_element_type=jnp.float32) * (D**-0.5)
        if msk is not None:
            logits = logits + msk[None, :, None]
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, vh, preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B * T, nh, nw, win, win, C).transpose(0, 1, 3, 2, 4, 5).reshape(B * T, H, W, C)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        out = jnp.einsum("bnc,cd->bnd", out.reshape(B * T, H * W, C), P["proj_w"],
                         preferred_element_type=jnp.float32) + P["proj_b"]
        xf2 = xf + out.astype(x.dtype)
        y = _ln(xf2.astype(jnp.float32), P["ln2_g"], P["ln2_b"]).astype(x.dtype)
        h = jnp.einsum("bnc,cd->bnd", y, P["fc1_w"], preferred_element_type=jnp.float32) + P["fc1_b"]
        h = _act(h, "gelu").astype(x.dtype)
        o = jnp.einsum("bnc,cd->bnd", h, P["fc2_w"], preferred_element_type=jnp.float32) + P["fc2_b"]
        return xf2 + o.astype(x.dtype)

    qg1 = kg1 = qg2 = kg2 = None
    if guid4 is not None:
        qg1, kg1, qg2, kg2 = guid4
    xf = block(xf, qg1, kg1, p1, None, 0)
    xf = block(xf, qg2, kg2, p2, m, win // 2)
    return xf.reshape(B, T, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_swin_pair(x, guid4, p1, p2, mask, heads: int, win: int):
    """Both swin blocks of one aggregator layer, fused.

    x: (B, T, H, W, C); guid4: None or (qg1, kg1, qg2, kg2) each (B, H, W, C)
    — the per-image guidance halves of each block's q/k projections; p1/p2:
    dicts with keys ln1_g/b, qkv_w (C,3C), qkv_b, proj_w/b, ln2_g/b,
    fc1_w/b, fc2_w/b; mask: (nW, N, N) fp32 additive mask for the shifted
    block.  Requires H, W divisible by win and C a multiple of 128.
    """
    backend = jax.default_backend()
    if backend == "tpu":
        return _pallas_pair(x, guid4, p1, p2, mask, heads, win, interpret=False)
    if backend == "cpu":
        return _pallas_pair(x, guid4, p1, p2, mask, heads, win, interpret=True)
    return _reference_pair(x, guid4, p1, p2, mask, heads, win)


def _fwd(x, guid4, p1, p2, mask, heads, win):
    return fused_swin_pair(x, guid4, p1, p2, mask, heads, win), (x, guid4, p1, p2, mask)


def _bwd(heads, win, res, g):
    x, guid4, p1, p2, mask = res
    _, vjp = jax.vjp(lambda *a: _reference_pair(*a, heads, win), x, guid4, p1, p2, mask)
    return vjp(g)


fused_swin_pair.defvjp(_fwd, _bwd)
