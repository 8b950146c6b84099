"""Fully fused Swin block-pair (Pallas TPU kernel).

The spatial aggregation stage (reference model.py:228-253) is bandwidth
bound, not FLOP bound: each block's LN -> window-partition -> qkv ->
attention -> proj -> window-reverse -> residual -> LN -> MLP chain round
trips the (B*T, 24, 24, 128) activation through HBM ~10 times (~2.5 GB per
block at eval shapes, ~11 ms measured vs a ~1.5 ms roofline).

This kernel runs ONE grid step per (image, G-class slab): the whole
activation lives in VMEM while both blocks of the pair (shift 0, then
shift window/2) execute end to end — LN1, one fused qkv gemm, per-image
guidance q/k add, per-window masked-head attention, out-proj, residual,
LN2, exact-GELU MLP (hidden stays in VMEM), residual.

Two TPU-specific moves shape the attention machinery:

- **Window partition / cyclic shift as permutation matmuls.** Mosaic
  relayouts for the slice/reshape/concat window partition (and its inverse)
  dominated the kernel (~6 ms/layer measured; softmax itself is ~2 ms).
  Both the shift roll and the (win, win) partition are one row permutation
  of the flattened (H*W, C) token matrix — constant one-hot (H*W, H*W)
  matmuls replace ~30 VPU relayout copies, and window rows materialize as
  pure leading-dim reshapes.  Because LN/MLP/residual are row-wise, both
  blocks run entirely in window-major space and the layout hops compose:
  3 permutation matmuls per forward pair (in, P2@P1^T between blocks, out)
  instead of 4, and 5 per backward step instead of 10.

- **Lane-masked heads.** Mosaic cannot split the 128-lane channel dim into
  heads, so per head the QK^T runs full-width against a lane-masked q
  (redundant MACs on a perfect MXU tile beat the relayout).  Only Q is
  expanded per head; K/V are kept once per window and the per-head output
  mask is applied after attn@V (the lane mask acts on the contraction-free
  axis, so it commutes).

HBM traffic per block-pair: read x + guidance + weights, write x —
~0.25 GB instead of ~5 GB.  Guidance semantics follow model.py:94-96/193-195
via the algebraic split linear(concat(x, g)) == linear_x(x) + linear_g(g):
the per-image halves (qg/kg) are projected and pre-permuted once per image
outside and broadcast across class slabs by the BlockSpec index map.

Backward: analytic Pallas kernel — recompute the forward in VMEM, reverse
every stage, accumulate parameter/guidance grads across sequential grid
steps (pl.when(first) init + add).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import _act


def _ln(x32, g, b, eps=1e-5, fast=False):
    """LayerNorm on fp32 rows.  ``fast`` (bf16 compute paths) uses the
    single-pass variance E[x^2] - mu^2 — one fewer full VPU pass over the
    activation (measured ~1.4 ms/pair at eval shapes).  fp32 cancellation
    error is ~eps*mu^2 (abs) — with bf16 inputs the variance is already
    quantization-limited at ~1e-3 relative, so the shortcut is invisible;
    fp32 compute keeps the two-pass form for oracle-level parity."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if fast:
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mu * mu
    else:
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * g + b


def _softmax_rows(logits, fast):
    """Row softmax of fp32 logits.  ``fast`` skips the max-subtraction pass:
    exact in real arithmetic, and safe here because logits are clamped at 60
    (exp(60)*N << fp32 max) and every query row has at least one entry
    within exp-range (the shift mask never masks a token against its own
    region).  Saves ~1 ms/pair at eval shapes."""
    if fast:
        e = jnp.exp(jnp.minimum(logits, 60.0))
    else:
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _partition_indices(H: int, W: int, win: int, shift: int) -> np.ndarray:
    """src[t] = flat grid index feeding window-major row t (shift folded in).

    Row order: windows scan (wi, wj) row-major — matching the additive mask
    built by aggregator._shift_mask — then (win, win) row-major within the
    window, applied to the grid rolled by (-shift, -shift).
    """
    idx = np.arange(H * W).reshape(H, W)
    r = np.roll(idx, (-shift, -shift), axis=(0, 1))
    return (
        r.reshape(H // win, win, W // win, win)
        .transpose(0, 2, 1, 3)
        .reshape(H * W)
    )


def _perm_matrix(src: np.ndarray, dtype) -> jnp.ndarray:
    """(n, n) permutation matrix with P[i, src[i]] = 1, materialized IN-GRAPH
    from the (n,) index vector: a dense 576x576 literal is ~663 KB of
    serialized HLO per instance (the tunneled runtime's remote-compile
    endpoint rejects multi-MB programs), while the one_hot lowering is a few
    bytes of iota/compare ops producing the identical matrix."""
    return jax.nn.one_hot(jnp.asarray(np.asarray(src, np.int32)), src.shape[0],
                          dtype=dtype)


def _window_attn(q, k, v, mask, heads: int, scale: float, G: int, nW: int, N: int):
    """q/k/v: (G*nW, N, C) window-major rows -> (G*nW, N, C) attention out."""
    C = q.shape[-1]
    D = C // heads
    # stacked per-head lane mask: row h*N+n keeps lanes of head h
    lane = jax.lax.broadcasted_iota(jnp.int32, (heads * N, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (heads * N, C), 0)
    hsel = ((lane >= (row // N) * D) & (lane < (row // N + 1) * D)).astype(q.dtype)

    Qh = jnp.tile(q, (1, heads, 1)) * hsel[None]  # (G*nW, heads*N, C)
    logits = jax.lax.dot_general(
        Qh, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G*nW, heads*N, N)
    if mask is not None:
        mh = jnp.tile(mask, (1, heads, 1))  # (nW, heads*N, N), row h*N+n = mask[n]
        logits = logits + jnp.tile(mh, (G, 1, 1))
    if _ABLATE == "nosoftmax":
        attn = (logits * 0.01).astype(q.dtype)
    else:
        attn = _softmax_rows(logits, fast=q.dtype == jnp.bfloat16).astype(q.dtype)
    out = jax.lax.dot_general(
        attn, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)  # (G*nW, heads*N, C) full-width rows
    # per-head lane mask then head-sum reassembles the partitioned channels
    return jnp.sum((out * hsel[None]).reshape(G * nW, heads, N, C), axis=1)


def _permute_slabs(P, x, G: int, HW: int, transpose: bool = False):
    """Apply a (HW, HW) permutation matmul to each of G row slabs of x.

    0/1-matrix matmuls are bit-exact row copies (1.0*v products, +0 sums),
    so moving the residual stream through them preserves parity."""
    if _ABLATE == "noperm":
        return x
    dn = (((0,), (0,)), ((), ())) if transpose else (((1,), (0,)), ((), ()))
    return jnp.concatenate(
        [jax.lax.dot_general(P, x[g * HW : (g + 1) * HW], dimension_numbers=dn,
                             preferred_element_type=jnp.float32).astype(x.dtype)
         for g in range(G)],
        axis=0,
    )


def _one_block_noperm(x, qg, kg, p, mask, heads: int, G: int, HW: int, nW: int, N: int):
    """One swin block with x ALREADY in this block's window-major order (the
    forward pair composes the three layout changes into standalone
    permutation matmuls — see _kernel).  qg/kg pre-permuted per image."""
    C = x.shape[-1]
    scale = (C // heads) ** -0.5
    fast = x.dtype == jnp.bfloat16
    y = _ln(x.astype(jnp.float32), p["ln1_g"], p["ln1_b"], fast=fast).astype(x.dtype)
    if _ABLATE == "noattn":
        x = x + y
    else:
        qkv = jnp.dot(y, p["qkv_w"], preferred_element_type=jnp.float32) + p["qkv_b"]
        qkv = qkv.astype(x.dtype)
        q, k, v = qkv[:, :C], qkv[:, C : 2 * C], qkv[:, 2 * C :]
        if qg is not None:
            q = (q.reshape(G, HW, C) + qg.astype(x.dtype)[None]).reshape(G * HW, C)
            k = (k.reshape(G, HW, C) + kg.astype(x.dtype)[None]).reshape(G * HW, C)
        if _ABLATE == "noattnmm":
            out = v
        else:
            out = _window_attn(
                q.reshape(G * nW, N, C), k.reshape(G * nW, N, C), v.reshape(G * nW, N, C),
                mask, heads, scale, G, nW, N,
            ).reshape(G * HW, C)
        out = jnp.dot(out, p["proj_w"], preferred_element_type=jnp.float32) + p["proj_b"]
        x = x + out.astype(x.dtype)
    if _ABLATE == "nomlp":
        return x
    if _ABLATE == "noln2":
        y = x
    else:
        y = _ln(x.astype(jnp.float32), p["ln2_g"], p["ln2_b"], fast=fast).astype(x.dtype)
    h = jnp.dot(y, p["fc1_w"], preferred_element_type=jnp.float32) + p["fc1_b"]
    if _ABLATE == "nogelu":
        h = h.astype(x.dtype)
    else:
        h = _act(h, "gelu", fast=x.dtype == jnp.bfloat16).astype(x.dtype)
    o = jnp.dot(h, p["fc2_w"], preferred_element_type=jnp.float32) + p["fc2_b"]
    return x + o.astype(x.dtype)


_P_KEYS = ("ln1_g", "ln1_b", "qkv_w", "qkv_b", "proj_w", "proj_b",
           "ln2_g", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b")


# ----------------------------------------------------------------- backward


def _ln_stats(x32, eps=1e-5, fast=False):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if fast:
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mu * mu
    else:
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * r, r


def _ln_bwd(dy32, xhat, r, g):
    """Given upstream dy (f32), LN stats and scale: (dx, dscale, dbias)."""
    dyh = dy32 * g
    m1 = jnp.mean(dyh, axis=-1, keepdims=True)
    m2 = jnp.mean(dyh * xhat, axis=-1, keepdims=True)
    dx = r * (dyh - m1 - xhat * m2)
    dg = jnp.sum(dy32 * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy32, axis=0, keepdims=True)
    return dx, dg, db


def _gelu_grad(h1, fast: bool):
    """d/dx of the forward's GELU at f32 h1 (exact poly for fp32 compute,
    tanh form for bf16 — must match what the forward evaluated, see mlp.py)."""
    from .mlp import _act_grad

    return _act_grad(h1, "gelu", fast=fast)


def _block_bwd(x, dout, qg, kg, p, mask, P, heads: int, G: int, HW: int, nW: int, N: int):
    """Analytic backward of one swin block: recompute-in-VMEM forward, then
    reverse every stage.  x: (G*HW, C) block input; dout: (G*HW, C) cotangent
    of the block output.  Returns (dx, param-grad dict, dqg, dkg) — parameter
    and guidance grads as f32, dx in x.dtype.

    P=None means x/dout are ALREADY in this block's window-major order (the
    pair driver composes the layout hops — see _bwd_kernel); the four
    per-block permutation matmuls drop out, and every emitted gradient is
    basis-consistent (param grads contract over rows, so they are
    permutation-invariant; dqg/dkg stay in the block's window order, the
    same basis the pre-permuted guidance arrives in)."""
    C = x.shape[-1]
    scale = (C // heads) ** -0.5
    f32 = jnp.float32
    fast = x.dtype == jnp.bfloat16
    # ---- forward recompute (same rounding as _one_block_noperm)
    xh1, r1 = _ln_stats(x.astype(f32), fast=fast)
    y1 = (xh1 * p["ln1_g"] + p["ln1_b"]).astype(x.dtype)
    yp = y1 if P is None else jnp.concatenate(
        [jnp.dot(P, y1[g * HW : (g + 1) * HW], preferred_element_type=f32).astype(x.dtype)
         for g in range(G)], axis=0)
    qkv = (jnp.dot(yp, p["qkv_w"], preferred_element_type=f32) + p["qkv_b"]).astype(x.dtype)
    q, k, v = qkv[:, :C], qkv[:, C : 2 * C], qkv[:, 2 * C :]
    if qg is not None:
        q = (q.reshape(G, HW, C) + qg.astype(x.dtype)[None]).reshape(G * HW, C)
        k = (k.reshape(G, HW, C) + kg.astype(x.dtype)[None]).reshape(G * HW, C)
    qw = q.reshape(G * nW, N, C)
    kw = k.reshape(G * nW, N, C)
    vw = v.reshape(G * nW, N, C)
    D = C // heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (heads * N, C), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (heads * N, C), 0)
    hsel = ((lane >= (row // N) * D) & (lane < (row // N + 1) * D)).astype(x.dtype)
    Qh = jnp.tile(qw, (1, heads, 1)) * hsel[None]
    S = jax.lax.dot_general(Qh, kw, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=f32) * scale
    if mask is not None:
        mh = jnp.tile(mask, (1, heads, 1))
        S = S + jnp.tile(mh, (G, 1, 1))
    A32 = _softmax_rows(S, fast=fast)
    A = A32.astype(x.dtype)
    OF = jax.lax.dot_general(A, vw, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32).astype(x.dtype)
    O = jnp.sum((OF * hsel[None]).reshape(G * nW, heads, N, C), axis=1)
    o = O.reshape(G * HW, C) if P is None else jnp.concatenate(
        [jax.lax.dot_general(P, O.reshape(G, HW, C)[g],
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=f32).astype(x.dtype)
         for g in range(G)], axis=0)
    outl = jnp.dot(o, p["proj_w"], preferred_element_type=f32) + p["proj_b"]
    x2 = x + outl.astype(x.dtype)
    xh2, r2 = _ln_stats(x2.astype(f32), fast=fast)
    y2 = (xh2 * p["ln2_g"] + p["ln2_b"]).astype(x.dtype)
    h1 = jnp.dot(y2, p["fc1_w"], preferred_element_type=f32) + p["fc1_b"]
    hg = _act(h1, "gelu", fast=x.dtype == jnp.bfloat16).astype(x.dtype)

    # ---- backward
    d3 = dout.astype(f32)
    dc = dout.astype(x.dtype)
    dfc2_w = jax.lax.dot_general(hg, dc, dimension_numbers=(((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
    dfc2_b = jnp.sum(d3, axis=0, keepdims=True)
    dh = jax.lax.dot_general(dc, p["fc2_w"], dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dh1 = dh * _gelu_grad(h1, fast=x.dtype == jnp.bfloat16)
    dh1c = dh1.astype(x.dtype)
    dfc1_w = jax.lax.dot_general(y2, dh1c, dimension_numbers=(((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
    dfc1_b = jnp.sum(dh1, axis=0, keepdims=True)
    dy2 = jax.lax.dot_general(dh1c, p["fc1_w"], dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dx2, dg2, db2 = _ln_bwd(dy2, xh2, r2, p["ln2_g"])
    dx2 = dx2 + d3
    dx2c = dx2.astype(x.dtype)
    dproj_w = jax.lax.dot_general(o, dx2c, dimension_numbers=(((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
    dproj_b = jnp.sum(dx2, axis=0, keepdims=True)
    do = jax.lax.dot_general(dx2c, p["proj_w"], dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32).astype(x.dtype)
    dO = (do if P is None else jnp.concatenate(
        [jnp.dot(P, do[g * HW : (g + 1) * HW], preferred_element_type=f32).astype(x.dtype)
         for g in range(G)], axis=0)).reshape(G * nW, N, C)
    dOF = jnp.tile(dO, (1, heads, 1)) * hsel[None]
    dA = jax.lax.dot_general(dOF, vw, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=f32)
    dV = jax.lax.dot_general(A, dOF, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32)
    dS = A32 * (dA - jnp.sum(dA * A32, axis=-1, keepdims=True))
    dSc = dS.astype(x.dtype)
    dQh = jax.lax.dot_general(dSc, kw, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=f32) * scale
    dK = jax.lax.dot_general(dSc, Qh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32) * scale
    dq = jnp.sum((dQh * hsel[None]).reshape(G * nW, heads, N, C), axis=1)
    dqr = dq.reshape(G, HW, C)
    dkr = dK.reshape(G, HW, C)
    dvr = dV.reshape(G, HW, C)
    dqg_out = dkg_out = None
    if qg is not None:
        dqg_out = jnp.sum(dqr, axis=0)
        dkg_out = jnp.sum(dkr, axis=0)
    dqkv = jnp.concatenate(
        [dqr.reshape(G * HW, C), dkr.reshape(G * HW, C), dvr.reshape(G * HW, C)],
        axis=-1).astype(x.dtype)
    dqkv_w = jax.lax.dot_general(yp, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
    dqkv_b = jnp.sum(dqkv.astype(f32), axis=0, keepdims=True)
    dyp = jax.lax.dot_general(dqkv, p["qkv_w"], dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=f32).astype(x.dtype)
    dy1 = dyp.astype(f32) if P is None else jnp.concatenate(
        [jax.lax.dot_general(P, dyp[g * HW : (g + 1) * HW],
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=f32)
         for g in range(G)], axis=0)
    dx0, dg1, db1 = _ln_bwd(dy1, xh1, r1, p["ln1_g"])
    dx0 = dx0 + dx2
    grads = {"ln1_g": dg1, "ln1_b": db1, "qkv_w": dqkv_w, "qkv_b": dqkv_b,
             "proj_w": dproj_w, "proj_b": dproj_b, "ln2_g": dg2, "ln2_b": db2,
             "fc1_w": dfc1_w, "fc1_b": dfc1_b, "fc2_w": dfc2_w, "fc2_b": dfc2_b}
    return dx0.astype(x.dtype), grads, dqg_out, dkg_out


def _kernel(*refs, heads: int, HW: int, nW: int, N: int, G: int, has_guid: bool):
    it = iter(refs)
    x_ref = next(it)
    if has_guid:
        qg1_ref, kg1_ref, qg2_ref, kg2_ref = next(it), next(it), next(it), next(it)
    mask_ref = next(it)
    # perm12 = P2 @ P1^T maps block-1 window order straight to block-2's:
    # running both blocks entirely in window-major space (row-wise LN / MLP /
    # residual commute with permutations) needs 3 permutation matmuls per
    # pair instead of 4
    perm1_ref, perm12_ref, perm2_ref = next(it), next(it), next(it)
    p1 = {k: next(it) for k in _P_KEYS}
    p2 = {k: next(it) for k in _P_KEYS}
    o_ref = next(it)

    # biases / LN params arrive as (1, n) and squeeze back to (n,); weights
    # (C, *) never have a leading 1 (C >= 128)
    def unflat(p):
        vals = {k: p[k][:] for k in _P_KEYS}
        return {k: (v[0] if v.shape[0] == 1 else v) for k, v in vals.items()}

    P1, P2 = unflat(p1), unflat(p2)

    x = x_ref[0].reshape(G * HW, -1)  # G class slabs of one image, grid rows
    qg1 = kg1 = qg2 = kg2 = None
    if has_guid:
        qg1, kg1 = qg1_ref[0], kg1_ref[0]
        qg2, kg2 = qg2_ref[0], kg2_ref[0]
    mask = mask_ref[:]
    x = _permute_slabs(perm1_ref[:], x, G, HW)
    x = _one_block_noperm(x, qg1, kg1, P1, None, heads, G, HW, nW, N)
    x = _permute_slabs(perm12_ref[:], x, G, HW)
    x = _one_block_noperm(x, qg2, kg2, P2, mask, heads, G, HW, nW, N)
    x = _permute_slabs(perm2_ref[:], x, G, HW, transpose=True)
    o_ref[0] = x.reshape(G, HW, -1)


def _flat_params(p, dtype):
    out = []
    for k in _P_KEYS:
        a = p[k].astype(jnp.float32 if k.startswith("ln") else dtype)
        if a.ndim == 1:
            a = a.reshape(1, -1)
        out.append(a)
    return out


# class slabs per grid step (tuning hook; see comment at the use site).
# Env-overridable so an on-chip sweep is one process per value — pjit
# caches on function identity, so in-process sweeps silently reuse the
# first executable (see dev notes).
_G_OVERRIDE = int(os.environ.get("CATSEG_SWIN_G", "2"))
# measurement-only ablation hook (numerics become GARBAGE when set): skips
# one component of the fused pair so its wall cost can be attributed on the
# real chip.  Trace-time like CATSEG_ACT_ABLATE: fresh process per setting.
_ABLATE = os.environ.get("CATSEG_SWIN_ABLATE", "")
if _ABLATE:
    import warnings

    warnings.warn(f"CATSEG_SWIN_ABLATE={_ABLATE}: swin kernel numerics are "
                  "intentionally wrong (profiling hook)", stacklevel=1)
# scoped-VMEM ceiling for the kernel (the 16 MB default is conservative)
_VMEM_LIMIT = int(os.environ.get("CATSEG_SWIN_VMEM_MB", "32")) * 1024 * 1024
# class slabs per backward grid step (the backward holds ~3x the forward's
# live tensors, so it runs narrower)
_BWD_G = int(os.environ.get("CATSEG_SWIN_BWD_G", "1"))


def _pallas_pair(x, guid4, p1, p2, mask, heads: int, win: int, interpret: bool):
    B, T, H, W, C = x.shape
    has_guid = guid4 is not None
    HW = H * W
    nW, N = (H // win) * (W // win), win * win

    # G class slabs per grid step: amortizes per-step dispatch/DMA overhead
    # and widens the qkv/proj/MLP gemms G-fold.  G=2 is the VMEM ceiling at
    # (24, 24, 128) eval shapes (larger G overflows the 16 MB scoped limit
    # with the fp32 attention logits + gemm accumulators); classes pad to a
    # multiple of G (the padded slabs compute garbage that is sliced away —
    # <1% waste at benchmark Ts).
    G = min(_G_OVERRIDE, T)
    Tp = -(-T // G) * G
    if Tp != T:
        x = jnp.concatenate([x, jnp.zeros((B, Tp - T, H, W, C), x.dtype)], axis=1)

    src1 = _partition_indices(H, W, win, 0)
    src2 = _partition_indices(H, W, win, win // 2)
    perm1 = _perm_matrix(src1, x.dtype)
    perm2 = _perm_matrix(src2, x.dtype)
    # block-1-window-order -> block-2-window-order composition: row t of the
    # win2 layout holds grid token src2[t], which sits at row inv1[src2[t]]
    # of the win1 layout
    inv1 = np.argsort(src1)
    perm12 = _perm_matrix(inv1[src2], x.dtype)

    grid = (B, Tp // G)
    x_spec = pl.BlockSpec((1, G, HW, C), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, HW, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b, t: (0,) * a.ndim, memory_space=pltpu.VMEM)

    operands = [x.reshape(B, Tp, HW, C)]
    specs = [x_spec]
    if has_guid:
        # pre-permute per-image guidance into each block's window-major order
        # (one gather per image outside the kernel)
        for src, pair in ((src1, guid4[:2]), (src2, guid4[2:])):
            for g in pair:
                operands.append(g.astype(x.dtype).reshape(B, HW, C)[:, src])
                specs.append(g_spec)
    operands.append(mask)
    specs.append(const(mask))
    for a in (perm1, perm12, perm2):
        operands.append(a)
        specs.append(const(a))
    for p in (p1, p2):
        for a in _flat_params(p, x.dtype):
            operands.append(a)
            specs.append(const(a))

    flops_attn = 2 * B * Tp * nW * heads * 2 * N * C * N  # lane-masked full-width
    # 3 composed permutation matmuls per pair (1.5 * HW per block on average)
    flops_mm = 2 * B * Tp * HW * C * (3 * C + C + 8 * C + 1.5 * HW)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, HW=HW, nW=nW, N=N, G=G, has_guid=has_guid),
        out_shape=jax.ShapeDtypeStruct((B, Tp, HW, C), x.dtype),
        grid=grid,
        in_specs=specs,
        out_specs=x_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * (flops_attn + flops_mm)),
            bytes_accessed=2 * B * Tp * HW * C * x.dtype.itemsize,
            transcendentals=2 * B * Tp * (nW * heads * N * N + HW * 4 * C),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*operands)
    out = out.reshape(B, Tp, H, W, C)
    return out[:, :T] if Tp != T else out


def _bwd_kernel(*refs, heads: int, HW: int, nW: int, N: int, G: int, has_guid: bool):
    it = iter(refs)
    x_ref, g_ref = next(it), next(it)
    if has_guid:
        qg1_ref, kg1_ref, qg2_ref, kg2_ref = next(it), next(it), next(it), next(it)
    mask_ref = next(it)
    # same layout composition as the forward kernel: everything runs in
    # window-major space, with 5 permutation matmuls per step instead of 10
    # (x in, cotangent in, hop between blocks, hop back, dx out)
    perm1_ref, perm12_ref, perm2_ref = next(it), next(it), next(it)
    p1 = {k: next(it) for k in _P_KEYS}
    p2 = {k: next(it) for k in _P_KEYS}
    dx_ref = next(it)
    dguid_refs = [next(it) for _ in range(4)] if has_guid else []
    dp1_refs = {k: next(it) for k in _P_KEYS}
    dp2_refs = {k: next(it) for k in _P_KEYS}

    def unflat(p):
        vals = {k: p[k][:] for k in _P_KEYS}
        return {k: (v[0] if v.shape[0] == 1 else v) for k, v in vals.items()}

    P1, P2 = unflat(p1), unflat(p2)
    x = x_ref[0].reshape(G * HW, -1)
    dx3 = g_ref[0].reshape(G * HW, -1)
    qg1 = kg1 = qg2 = kg2 = None
    if has_guid:
        qg1, kg1 = qg1_ref[0], kg1_ref[0]
        qg2, kg2 = qg2_ref[0], kg2_ref[0]
    mask = mask_ref[:]
    xp = _permute_slabs(perm1_ref[:], x, G, HW)                 # grid -> win1
    dx3p = _permute_slabs(perm2_ref[:], dx3, G, HW)             # grid -> win2
    # block1 forward recompute feeds block2's backward
    x1p = _one_block_noperm(xp, qg1, kg1, P1, None, heads, G, HW, nW, N)
    x2in = _permute_slabs(perm12_ref[:], x1p, G, HW)            # win1 -> win2
    dx2p, g2, dqg2, dkg2 = _block_bwd(x2in, dx3p, qg2, kg2, P2, mask, None,
                                      heads, G, HW, nW, N)
    dx2w1 = _permute_slabs(perm12_ref[:], dx2p, G, HW, transpose=True)  # win2 -> win1
    dx0p, g1, dqg1, dkg1 = _block_bwd(xp, dx2w1, qg1, kg1, P1, None, None,
                                      heads, G, HW, nW, N)
    dx0 = _permute_slabs(perm1_ref[:], dx0p, G, HW, transpose=True)     # win1 -> grid
    dx_ref[0] = dx0.reshape(G, HW, -1).astype(dx_ref.dtype)

    b, t = pl.program_id(0), pl.program_id(1)

    def accum(ref, val, fst):
        @pl.when(fst)
        def _init():
            ref[...] = val.astype(ref.dtype)

        @pl.when(jnp.logical_not(fst))
        def _add():
            ref[...] = ref[...] + val.astype(ref.dtype)

    # param grads: one VMEM-resident block revisited by every grid step
    first = jnp.logical_and(b == 0, t == 0)
    for refs_d, grads in ((dp1_refs, g1), (dp2_refs, g2)):
        for kk in _P_KEYS:
            accum(refs_d[kk], grads[kk], first)
    if has_guid:
        # guidance grads: per-image blocks, accumulated over the class steps
        ft = t == 0
        for ref, val in zip(dguid_refs, (dqg1, dkg1, dqg2, dkg2)):
            accum(ref, val[None], ft)


def _pallas_pair_bwd(x, g, guid4, p1, p2, mask, heads: int, win: int, interpret: bool):
    """Analytic backward pass: (dx, dguid4, dp1, dp2)."""
    B, T, H, W, C = x.shape
    has_guid = guid4 is not None
    HW = H * W
    nW, N = (H // win) * (W // win), win * win
    G = min(_BWD_G, T)
    Tp = -(-T // G) * G
    if Tp != T:
        pad = jnp.zeros((B, Tp - T, H, W, C), x.dtype)
        x = jnp.concatenate([x, pad], axis=1)
        g = jnp.concatenate([g, pad.astype(g.dtype)], axis=1)

    src1 = _partition_indices(H, W, win, 0)
    src2 = _partition_indices(H, W, win, win // 2)
    perm1 = _perm_matrix(src1, x.dtype)
    perm2 = _perm_matrix(src2, x.dtype)
    perm12 = _perm_matrix(np.argsort(src1)[src2], x.dtype)

    grid = (B, Tp // G)
    x_spec = pl.BlockSpec((1, G, HW, C), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, HW, C), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b, t: (0,) * a.ndim, memory_space=pltpu.VMEM)

    operands = [x.reshape(B, Tp, HW, C), g.reshape(B, Tp, HW, C).astype(x.dtype)]
    specs = [x_spec, x_spec]
    if has_guid:
        for src, pair in ((src1, guid4[:2]), (src2, guid4[2:])):
            for gg in pair:
                operands.append(gg.astype(x.dtype).reshape(B, HW, C)[:, src])
                specs.append(g_spec)
    operands.append(mask)
    specs.append(const(mask))
    for a in (perm1, perm12, perm2):
        operands.append(a)
        specs.append(const(a))
    flat1, flat2 = _flat_params(p1, x.dtype), _flat_params(p2, x.dtype)
    for fl in (flat1, flat2):
        for a in fl:
            operands.append(a)
            specs.append(const(a))

    out_shapes = [jax.ShapeDtypeStruct((B, Tp, HW, C), x.dtype)]
    out_specs = [x_spec]
    if has_guid:
        for _ in range(4):
            out_shapes.append(jax.ShapeDtypeStruct((B, HW, C), jnp.float32))
            out_specs.append(g_spec)
    for fl in (flat1, flat2):
        for a in fl:
            out_shapes.append(jax.ShapeDtypeStruct(a.shape, jnp.float32))
            out_specs.append(const(a))

    res = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, HW=HW, nW=nW, N=N, G=G, has_guid=has_guid),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*operands)

    it = iter(res)
    dx = next(it).reshape(B, Tp, H, W, C)[:, :T]
    dguid = None
    if has_guid:
        dg_list = []
        for src, gg in zip((src1, src1, src2, src2), guid4):
            inv = np.argsort(src)
            dg_list.append(next(it)[:, inv].reshape(gg.shape).astype(gg.dtype))
        dguid = tuple(dg_list)

    def undo_flat(p, vals):
        out = {}
        for k, v in zip(_P_KEYS, vals):
            out[k] = v.reshape(p[k].shape).astype(p[k].dtype)
        return out

    dp1 = undo_flat(p1, [next(it) for _ in _P_KEYS])
    dp2 = undo_flat(p2, [next(it) for _ in _P_KEYS])
    return dx, dguid, dp1, dp2


def _reference_pair(x, guid4, p1, p2, mask, heads: int, win: int):
    """Plain-XLA pair with identical math (fallback + VJP recompute)."""
    B, T, H, W, C = x.shape
    xf = x.reshape(B * T, H * W, C)
    m = mask

    def block(xf, qg, kg, p, msk, shift):
        P = {k: p[k].astype(jnp.float32 if k.startswith("ln") else x.dtype) for k in _P_KEYS}
        fast = x.dtype == jnp.bfloat16
        y = _ln(xf.astype(jnp.float32), P["ln1_g"], P["ln1_b"], fast=fast).astype(x.dtype)
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
        attn = _softmax_rows(logits, fast=fast).astype(x.dtype)
        out = jnp.einsum("bwhqk,bwkhd->bwqhd", attn, vh, preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B * T, nh, nw, win, win, C).transpose(0, 1, 3, 2, 4, 5).reshape(B * T, H, W, C)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        out = jnp.einsum("bnc,cd->bnd", out.reshape(B * T, H * W, C), P["proj_w"],
                         preferred_element_type=jnp.float32) + P["proj_b"]
        xf2 = xf + out.astype(x.dtype)
        y = _ln(xf2.astype(jnp.float32), P["ln2_g"], P["ln2_b"], fast=fast).astype(x.dtype)
        h = jnp.einsum("bnc,cd->bnd", y, P["fc1_w"], preferred_element_type=jnp.float32) + P["fc1_b"]
        h = _act(h, "gelu", fast=x.dtype == jnp.bfloat16).astype(x.dtype)
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
    if os.environ.get("CATSEG_NO_PALLAS_SWIN"):  # debug/rollback escape hatch
        return _reference_pair(x, guid4, p1, p2, mask, heads, win)
    backend = jax.default_backend()
    if backend == "tpu":
        return _pallas_pair(x, guid4, p1, p2, mask, heads, win, interpret=False)
    if backend == "cpu":
        return _pallas_pair(x, guid4, p1, p2, mask, heads, win, interpret=True)
    return _reference_pair(x, guid4, p1, p2, mask, heads, win)


def _fwd(x, guid4, p1, p2, mask, heads, win):
    return fused_swin_pair(x, guid4, p1, p2, mask, heads, win), (x, guid4, p1, p2, mask)


# class-chunk size for the XLA-fallback backward recompute: the reference
# pair's gradient holds fp32 attention logits/probs for every (slab, window,
# head) at once (~1 GB per 700 slabs per block) — chunking the class axis
# keeps the recompute's peak memory flat in T at identical FLOPs
_BWD_CHUNK = 16


def _bwd(heads, win, res, g):
    x, guid4, p1, p2, mask = res
    backend = jax.default_backend()
    if backend in ("tpu", "cpu"):
        dx, dguid, dp1, dp2 = _pallas_pair_bwd(
            x, g, guid4, p1, p2, mask, heads, win, interpret=(backend == "cpu"))
        return dx, dguid, dp1, dp2, jnp.zeros_like(mask)
    return _bwd_xla(heads, win, res, g)


def _bwd_xla(heads, win, res, g):
    x, guid4, p1, p2, mask = res
    B, T = x.shape[:2]
    nc = -(-T // _BWD_CHUNK)
    Tp = nc * _BWD_CHUNK
    if Tp != T:
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, Tp - T)
        xp = jnp.pad(x, pad)
        gp = jnp.pad(g, pad)
    else:
        xp, gp = x, g
    # (nc, B, chunk, H, W, C): scan recomputes + differentiates one class
    # chunk at a time; guidance/param cotangents accumulate over chunks
    xc = jnp.moveaxis(xp.reshape(B, nc, _BWD_CHUNK, *x.shape[2:]), 1, 0)
    gc = jnp.moveaxis(gp.reshape(B, nc, _BWD_CHUNK, *x.shape[2:]), 1, 0)

    def chunk_vjp(xi, gi):
        _, vjp = jax.vjp(lambda *a: _reference_pair(*a, heads, win), xi, guid4, p1, p2, mask)
        return vjp(gi)

    def body(carry, xg):
        xi, gi = xg
        dx, dguid, dp1, dp2, dmask = chunk_vjp(xi, gi)
        acc = jax.tree_util.tree_map(jnp.add, carry, (dguid, dp1, dp2, dmask))
        return acc, dx

    zeros = jax.tree_util.tree_map(
        jnp.zeros_like,
        (guid4, p1, p2, mask),
    )
    (dguid, dp1, dp2, dmask), dxc = jax.lax.scan(body, zeros, (xc, gc))
    dx = jnp.moveaxis(dxc, 0, 1).reshape(B, Tp, *x.shape[2:])[:, :T]
    return dx, dguid, dp1, dp2, dmask


fused_swin_pair.defvjp(_fwd, _bwd)
