"""Fully fused class-attention transformer layer (Pallas TPU kernel).

The class stage (reference ClassTransformerLayer, model.py:357-424) at eval
pooling (1,1) runs LN -> qkv -> linear attention over the class axis -> MLP
for every spatial position.  The plain-XLA pipeline materializes the
pad_len-padded position-major (B*H*W, Tp, C) sequence (a 110+ MB transpose
each way) plus every intermediate in HBM; this kernel reads the CLASS-major
(B, T, H, W, C) activation directly — one image row of W positions per grid
step, a (1, T, 1, W, C) block whose (W*C)-contiguous chunks DMA cleanly —
and keeps everything in VMEM.

Three tricks make it TPU-shaped:

- The learnable padding token (model.py:372-373,397-410) contributes
  IDENTICAL rows to every position's key/value set.  Linear attention only
  sees keys through the sums KV = sum_s K_s^T V_s and Ksum = sum_s K_s, so
  the (pad_len - T) pad rows collapse to constant terms (pad_kv, pad_ksum)
  precomputed once outside the kernel — pad rows are never materialized.

- Mosaic cannot split the 128-lane channel dim into heads.  Per-head
  KV_h = K_h^T V_h is instead extracted from ONE full-width matmul:
  (K^T V) * blockdiag_mask equals the block-diagonal stack of all KV_h, and
  out = Q @ blockdiag(KV) then computes every head's product in one matmul.
  The normalizer z[l, h] = Q_h[l] . Ksum_h becomes (Q * Ksum) @
  blockdiag_ones — per-head lane-group sums broadcast back to channels.

Backward: analytic Pallas kernel (recompute in VMEM, reverse each stage,
accumulate param grads across grid steps); falls back to autodiff through
the plain-XLA reference off-TPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6

# measurement-only ablation hook (numerics become GARBAGE when set): skips a
# component of the fused layer to attribute wall cost on-chip.  Trace-time;
# fresh process per setting.
import os as _os

_ABLATE = _os.environ.get("CATSEG_CLASS_ABLATE", "")
if _ABLATE:
    import warnings

    warnings.warn(f"CATSEG_CLASS_ABLATE={_ABLATE}: class kernel numerics are "
                  "intentionally wrong (profiling hook)", stacklevel=1)


def _elu1(x):
    # jax.nn.elu uses expm1, which Mosaic lacks; exp is exact enough here
    return jnp.where(x > 0, x + 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _blockdiag(C: int, D: int, dtype):
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return ((row // D) == (col // D)).astype(dtype)


# -------------------------------------------------------------- v2 fast path
#
# The round-5 ablations measured the (T, W, C) <-> (W, T, C) layout
# relayouts at ~30% of the whole fused layer and the per-position W-batched
# attention dots at ~35% — and an fp32-relayout probe showed the transpose
# cost scales with SUBLANE ROW COUNT, not bytes.  The v2 path (bf16 compute
# only) halves the relayout rows by bitcasting sublane PAIRS of the W axis
# into int32 before transposing (the decoder's fast-roll trick,
# kernels/decoder.py), which lands the data in an interleaved
# (W/2, 2T, C) layout: row 2t+j of block w2 holds position 2*w2+j, class t.
# Attention then runs as parity/block-masked SUPERMATRIX matmuls — a chunk
# of 4 positions becomes one (4T, 4C) lane-tiled operand and its per-head
# KV blocks come out of ONE row-contraction — so the MXU sees 2 big dots
# per chunk instead of 24 per-position stationaries (each ~270-cycle weight
# loads for a ~5 MF dot).  LN / qkv / guidance / elu / MLP hoist out of the
# chunk loop and run once per image row on (W*T, C) flat rows.


def _pair_transpose_in(x3, interpret: bool):
    """(T, W, C) bf16 -> (W2*2T, C) interleaved rows: out[w2*2T + 2t + j]
    = x3[t, 2*w2 + j].  Compiled: int32 sublane-pair bitcast halves the
    relayout's sublane rows; interpret mode emulates the composite map."""
    T, W, C = x3.shape
    if interpret:
        xt = x3.reshape(T, W // 2, 2, C).transpose(1, 0, 2, 3)
        return xt.reshape(W // 2 * 2 * T, C)
    xp = pltpu.bitcast(x3, jnp.int32)          # (T, W2, C)
    xt = xp.transpose((1, 0, 2))               # (W2, T, C)
    return pltpu.bitcast(xt, x3.dtype).reshape(W // 2 * 2 * T, C)


def _pair_transpose_out(xf, T: int, W: int, interpret: bool):
    """Inverse of :func:`_pair_transpose_in`: (W2*2T, C) -> (T, W, C)."""
    C = xf.shape[-1]
    x3 = xf.reshape(W // 2, 2 * T, C)
    if interpret:
        return x3.reshape(W // 2, T, 2, C).transpose(1, 0, 2, 3).reshape(T, W, C)
    xp = pltpu.bitcast(x3, jnp.int32)          # (W2, T, C)
    xt = xp.transpose((1, 0, 2))               # (T, W2, C)
    return pltpu.bitcast(xt, xf.dtype)


def _kernel_v2(x_ref, qg_ref, kg_ref, padkv_ref, padks_ref,
               ln1g_ref, ln1b_ref, qkvw_ref, qkvb_ref,
               ln2g_ref, ln2b_ref, m1w_ref, m1b_ref, m2w_ref, m2b_ref,
               o_ref, *, heads: int, Tp: int, has_guid: bool, interpret: bool,
               plain: bool = False):
    T, R, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3], x_ref.shape[4]
    D = C // heads
    f32 = jnp.float32
    dt = x_ref.dtype
    W2 = W // 2
    # positions per supermatrix chunk (must be even: whole w2 blocks)
    CW = int(_os.environ.get("CATSEG_CLASS_CW", "4"))
    while W % CW or CW % 2:
        CW -= 1
    NC = W // CW                # chunks per image row
    rows = W * T                # flat rows per image row
    cr = CW * T                 # rows per chunk
    fast = dt == jnp.bfloat16

    bd = _blockdiag(C, D, f32)
    ln1g, ln1b = ln1g_ref[0], ln1b_ref[0]
    padkv4 = jnp.tile(padkv_ref[:], (CW, 1))          # (4C, C) f32
    padks = padks_ref[:]                              # (1, C) f32

    # chunk-invariant masks: row r of a chunk holds position q(r) =
    # 2*(r // (2T)) + (r % 2) (relative), class (r % 2T) // 2; the ``plain``
    # A/B variant uses a non-interleaved transpose (q(r) = r // T)
    def qfn(r):
        return r // T if plain else 2 * (r // (2 * T)) + (r % 2)

    rr = jax.lax.broadcasted_iota(jnp.int32, (cr, CW * C), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (cr, CW * C), 1)
    qmask = (qfn(rr) == ll // C).astype(dt)           # (4T, 4C)
    bd4 = jnp.tile(bd, (CW, 1))                       # (4C, C) f32
    pr = jax.lax.broadcasted_iota(jnp.int32, (CW, cr), 0)
    qr = jax.lax.broadcasted_iota(jnp.int32, (CW, cr), 1)
    sel4 = (pr == qfn(qr)).astype(dt)                 # (CW, 4T)
    selTb = (jax.lax.broadcasted_iota(jnp.int32, (cr, CW), 1)
             == qfn(jax.lax.broadcasted_iota(jnp.int32, (cr, CW), 0))).astype(f32)

    if has_guid:
        # qg/kg arrive pre-interleaved as (B, 2T, C): row 2t+j = class t
        # (plain variant: (B, T, C), broadcast per position block)
        qgv = qg_ref[0].astype(f32)
        kgv = kg_ref[0].astype(f32)

    def row_body(r, carry):
        xi = x_ref[0, :, r]                           # (T, W, C)
        if plain:
            xf = xi.transpose((1, 0, 2)).reshape(rows, C)
        else:
            xf = _pair_transpose_in(xi, interpret)    # (W2*2T, C) interleaved
        x32 = xf.astype(f32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        if fast:
            var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mu * mu
        else:
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln1g + ln1b).astype(dt)
        qkv = jnp.dot(y, qkvw_ref[:], preferred_element_type=f32) + qkvb_ref[0]
        q, k, v = qkv[:, :C], qkv[:, C:2 * C], qkv[:, 2 * C:]
        if has_guid:
            gb = (W, T) if plain else (W2, 2 * T)
            q = (q.reshape(*gb, C) + qgv[None]).reshape(rows, C)
            k = (k.reshape(*gb, C) + kgv[None]).reshape(rows, C)
        Q = _elu1(q)
        K = _elu1(k)
        Qc = Q.astype(dt)
        Kc = K.astype(dt)
        Vc = (v / Tp).astype(dt)

        outs = []
        for c in range(NC):
            sl = slice(c * cr, (c + 1) * cr)
            Qb = jnp.tile(Qc[sl], (1, CW)) * qmask    # (4T, 4C)
            Kb = jnp.tile(Kc[sl], (1, CW)) * qmask
            kv = jax.lax.dot_general(Kb, Vc[sl], (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)   # (4C, C)
            kv = (kv * bd4 + padkv4).astype(dt)
            attn = jax.lax.dot_general(Qb, kv, (((1,), (0,)), ((), ())),
                                       preferred_element_type=f32)  # (4T, C)
            ks4 = jax.lax.dot_general(sel4, Kc[sl], (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32) + padks
            ksb = jnp.dot(selTb, ks4, preferred_element_type=f32)   # (4T, C)
            zraw = (Q[sl] * ksb).astype(dt)
            z = jnp.dot(zraw, bd.astype(dt), preferred_element_type=f32)
            outs.append(attn * (Tp / (z + _EPS)))
        attn_all = jnp.concatenate(outs, axis=0)      # (rows, C)

        seq32 = x32 + attn_all
        seq = seq32.astype(dt)
        mu = jnp.mean(seq32, axis=-1, keepdims=True)
        if fast:
            var = jnp.mean(jnp.square(seq32), axis=-1, keepdims=True) - mu * mu
        else:
            var = jnp.mean(jnp.square(seq32 - mu), axis=-1, keepdims=True)
        y2 = ((seq32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln2g_ref[0]
              + ln2b_ref[0]).astype(dt)
        h = jnp.dot(y2, m1w_ref[:], preferred_element_type=f32) + m1b_ref[0]
        h = jnp.maximum(h, 0.0).astype(dt)
        o = jnp.dot(h, m2w_ref[:], preferred_element_type=f32) + m2b_ref[0]
        out = (seq + o.astype(dt))
        if plain:
            o_ref[0, :, r] = out.reshape(W, T, C).transpose((1, 0, 2))
        else:
            o_ref[0, :, r] = _pair_transpose_out(out, T, W, interpret)
        return carry

    jax.lax.fori_loop(0, R, row_body, 0)


def _kernel(x_ref, qg_ref, kg_ref, padkv_ref, padks_ref,
            ln1g_ref, ln1b_ref, qkvw_ref, qkvb_ref,
            ln2g_ref, ln2b_ref, m1w_ref, m1b_ref, m2w_ref, m2b_ref,
            o_ref, *, heads: int, Tp: int, has_guid: bool):
    T, R, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3], x_ref.shape[4]
    D = C // heads
    bd = _blockdiag(C, D, jnp.float32)
    ln1g, ln1b = ln1g_ref[0], ln1b_ref[0]
    padkv = padkv_ref[:]          # (C, C) fp32, block-diagonal
    padks = padks_ref[:]          # (1, C) fp32
    if has_guid:
        qgv = qg_ref[0].astype(jnp.float32)
        kgv = kg_ref[0].astype(jnp.float32)

    # R image rows ride each grid step so the class-major block's HBM chunks
    # are R*W*C long instead of W*C: the round-4 ablation measured the whole
    # kernel at 98% of a copy-only variant, i.e. strided-DMA-bound at ~6 KB
    # chunks — R is sized for ~contiguous-bandwidth chunks (see _pallas).
    # Rows are processed one per fori_loop iteration (compile time flat in
    # R), each as W-batched dots (the single batch dim Mosaic allows).
    # Batching 2 rows per iteration measured WORSE (12.15 vs 10.87 ms at
    # eval dims) and 4 rows OOM-killed the Mosaic compile helper (the 4D
    # (T, ib, W, C) relayout) — the kernel is bound by the attention dots'
    # per-batch-element pipeline latency, which wider W does not amortize.

    t32 = _os.environ.get("CATSEG_CLASS_T32", "")  # fp32-relayout experiment

    def row_body(r, carry):
        if _ABLATE == "copyonly":
            o_ref[0, :, r] = x_ref[0, :, r]
            return carry
        if _ABLATE == "notrans":
            x3 = x_ref[0, :, r]                               # (T, W, C) GARBAGE
        elif t32:
            x3 = x_ref[0, :, r].astype(jnp.float32).transpose((1, 0, 2)).astype(x_ref.dtype)
        else:
            x3 = x_ref[0, :, r].transpose((1, 0, 2))          # (W, T, C)
        x = x3.reshape(W * T, C)
        x32 = x.astype(jnp.float32)
        fast = x.dtype == jnp.bfloat16
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        if fast:  # single-pass variance: one fewer VPU pass (see swin_block._ln)
            var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mu * mu
        else:
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln1g + ln1b).astype(x.dtype)

        if _ABLATE == "noqkv":
            qkv = jnp.concatenate([y.astype(jnp.float32)] * 3, axis=-1)
        else:
            qkv = jnp.dot(y, qkvw_ref[:], preferred_element_type=jnp.float32) + qkvb_ref[0]
        qkv3 = qkv.reshape(W, T, 3 * C)
        q = qkv3[..., :C]
        k = qkv3[..., C : 2 * C]
        v = qkv3[..., 2 * C :]
        if has_guid:
            q = q + qgv[None]     # (T, C) broadcast over W
            k = k + kgv[None]
        if _ABLATE == "noattn":
            seq = (x32 + q.reshape(W * T, C)).astype(x.dtype)
        else:
            if _ABLATE == "noelu":
                Q, K = q, k
            else:
                Q = _elu1(q)          # (W, T, C) fp32
                K = _elu1(k)
            if _ABLATE == "nokv":
                kv = jnp.broadcast_to(padkv[None], (W, C, C))
            else:
                kv = jax.lax.dot_general(K, v / Tp, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                                         preferred_element_type=jnp.float32)  # (W, C, C)
                kv = kv * bd[None] + padkv[None]
            # sublane reduce of K is unimplemented in Mosaic; a ones-row
            # contraction computes the same per-position (1, C) sum on the MXU
            if _ABLATE == "noksum":
                ksum = jnp.broadcast_to(padks[None], (W, 1, C))
            else:
                ksum = jax.lax.dot_general(jnp.ones((W, 1, T), jnp.float32), K,
                                           dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                           preferred_element_type=jnp.float32) + padks[None]
            z = jnp.dot((Q * ksum).reshape(W * T, C), bd,
                        preferred_element_type=jnp.float32)  # per-head sums
            if _ABLATE == "noattnmm":
                attn = Q
            else:
                attn = jax.lax.dot_general(Q, kv, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                           preferred_element_type=jnp.float32)
            if _ABLATE == "nodiv":
                attn_all = attn.reshape(W * T, C) + z
            else:
                attn_all = attn.reshape(W * T, C) * (Tp / (z + _EPS))
            seq = (x32 + attn_all).astype(x.dtype)

        if _ABLATE == "nomlp":
            out = seq.reshape(W, T, C)
        else:
            s32 = seq.astype(jnp.float32)
            mu = jnp.mean(s32, axis=-1, keepdims=True)
            if fast:
                var = jnp.mean(jnp.square(s32), axis=-1, keepdims=True) - mu * mu
            else:
                var = jnp.mean(jnp.square(s32 - mu), axis=-1, keepdims=True)
            y2 = ((s32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln2g_ref[0] + ln2b_ref[0]).astype(x.dtype)
            h = jnp.dot(y2, m1w_ref[:], preferred_element_type=jnp.float32) + m1b_ref[0]
            h = jnp.maximum(h, 0.0).astype(x.dtype)
            o = jnp.dot(h, m2w_ref[:], preferred_element_type=jnp.float32) + m2b_ref[0]
            out = (seq + o.astype(x.dtype)).reshape(W, T, C)
        if _ABLATE == "notrans":
            o_ref[0, :, r] = out.reshape(T, W, C)             # GARBAGE layout
        elif t32:
            o_ref[0, :, r] = out.astype(jnp.float32).transpose((1, 0, 2)).astype(o_ref.dtype)
        else:
            o_ref[0, :, r] = out.transpose((1, 0, 2))
        return carry

    jax.lax.fori_loop(0, R, row_body, 0)


def pad_contributions(pad_token, pad_guid, p, n_pad: int, Tp: int, heads: int):
    """K/V of the learnable padding row -> (pad_kv (C,C) blockdiag, pad_ksum (1,C)).

    pad_token: (C,); pad_guid: (Cg,) or None.  Uses the layer's ln1 and k/v
    projections exactly as a real row would (model.py:397-410)."""
    C = pad_token.shape[0]
    D = C // heads
    t32 = pad_token.astype(jnp.float32)
    mu = jnp.mean(t32)
    var = jnp.mean(jnp.square(t32 - mu))
    y = (t32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["ln1_g"].astype(jnp.float32) + p["ln1_b"].astype(jnp.float32)
    k = y @ p["k_w"][:C].astype(jnp.float32) + p["k_b"].astype(jnp.float32)
    v = y @ p["v_w"].astype(jnp.float32) + p["v_b"].astype(jnp.float32)
    if pad_guid is not None:
        k = k + pad_guid.astype(jnp.float32) @ p["k_w"][C:].astype(jnp.float32)
    K = jnp.where(k > 0, k + 1.0, jnp.exp(jnp.minimum(k, 0.0)))
    kv = jnp.outer(K, v / Tp) * n_pad
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    bd = ((row // D) == (col // D)).astype(jnp.float32)
    return kv * bd, (K * n_pad).reshape(1, C)


# ----------------------------------------------------------------- backward


def _elu1_grad(x):
    return jnp.where(x > 0, 1.0, jnp.exp(jnp.minimum(x, 0.0)))


def _ln_fwd(x32, g, b, fast=False):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if fast:
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mu * mu
    else:
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + 1e-5)
    xh = (x32 - mu) * r
    return xh * g + b, xh, r


def _ln_bwd(dy32, xh, r, g):
    dyh = dy32 * g
    m1 = jnp.mean(dyh, axis=-1, keepdims=True)
    m2 = jnp.mean(dyh * xh, axis=-1, keepdims=True)
    dx = r * (dyh - m1 - xh * m2)
    dg = jnp.sum(dy32 * xh, axis=0, keepdims=True)
    db = jnp.sum(dy32, axis=0, keepdims=True)
    return dx, dg, db


def _bwd_kernel(x_ref, g_ref, qg_ref, kg_ref, padkv_ref, padks_ref,
                ln1g_ref, ln1b_ref, qkvw_ref, qkvb_ref,
                ln2g_ref, ln2b_ref, m1w_ref, m1b_ref, m2w_ref, m2b_ref,
                dx_ref, dqg_ref, dkg_ref, dpadkv_ref, dpadks_ref,
                dln1g_ref, dln1b_ref, dqkvw_ref, dqkvb_ref,
                dln2g_ref, dln2b_ref, dm1w_ref, dm1b_ref, dm2w_ref, dm2b_ref,
                *, heads: int, Tp: int, has_guid: bool):
    """Analytic backward: forward recompute in VMEM, then reverse every
    stage.  Same grid/layout as the forward kernel (one image row per step);
    parameter/pad/guidance grads accumulate across steps in VMEM blocks."""
    T, W, C = x_ref.shape[1], x_ref.shape[3], x_ref.shape[4]
    D = C // heads
    f32 = jnp.float32
    bd = _blockdiag(C, D, f32)

    x3 = x_ref[0, :, 0]
    x = x3.reshape(T * W, C)
    dout = g_ref[0, :, 0].reshape(T * W, C)
    x32 = x.astype(f32)
    fast = x.dtype == jnp.bfloat16
    y1f, xh1, r1 = _ln_fwd(x32, ln1g_ref[0], ln1b_ref[0], fast=fast)
    y = y1f.astype(x.dtype)
    qkv = jnp.dot(y, qkvw_ref[:], preferred_element_type=f32) + qkvb_ref[0]
    qkv3 = qkv.reshape(T, W, 3 * C)
    padkv = padkv_ref[:]
    padks = padks_ref[:]
    if has_guid:
        qgv = qg_ref[0].astype(f32)
        kgv = kg_ref[0].astype(f32)

    attn_cols = []
    bwd_cols = []  # (dq, dk, dv) per position, f32 (T, C)
    d_padkv = jnp.zeros((C, C), f32)
    d_padks = jnp.zeros((1, C), f32)
    # ---- forward attention per position (recompute; save nothing to HBM)
    per_pos = []
    for w in range(W):
        blk = qkv3[:, w, :]
        q = blk[:, :C]
        k = blk[:, C : 2 * C]
        v = blk[:, 2 * C :]
        if has_guid:
            q = q + qgv
            k = k + kgv
        Q = _elu1(q)
        K = _elu1(k)
        Vs = v / Tp
        kv = jax.lax.dot_general(K, Vs, dimension_numbers=(((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        kv_used = kv * bd + padkv
        ksum = jax.lax.dot_general(jnp.ones((1, T), f32), K,
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=f32) + padks
        z = jnp.dot(Q * ksum, bd, preferred_element_type=f32)
        P = jnp.dot(Q, kv_used, preferred_element_type=f32)
        r = Tp / (z + _EPS)
        attn_cols.append(P * r)
        per_pos.append((q, k, Q, K, Vs, kv_used, ksum, z, P, r))
    attn_all = jnp.stack(attn_cols, axis=1).reshape(T * W, C)
    seq32 = x32 + attn_all
    seq = seq32.astype(x.dtype)
    y2f, xh2, r2 = _ln_fwd(seq32, ln2g_ref[0], ln2b_ref[0], fast=fast)
    y2 = y2f.astype(x.dtype)
    h1 = jnp.dot(y2, m1w_ref[:], preferred_element_type=f32) + m1b_ref[0]
    hg = jnp.maximum(h1, 0.0).astype(x.dtype)

    # ---- backward MLP + LN2
    d3 = dout.astype(f32)
    dc = dout.astype(x.dtype)
    dm2w = jax.lax.dot_general(hg, dc, dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=f32)
    dm2b = jnp.sum(d3, axis=0, keepdims=True)
    dh = jax.lax.dot_general(dc, m2w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dh1 = dh * (h1 > 0)
    dh1c = dh1.astype(x.dtype)
    dm1w = jax.lax.dot_general(y2, dh1c, dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=f32)
    dm1b = jnp.sum(dh1, axis=0, keepdims=True)
    dy2 = jax.lax.dot_general(dh1c, m1w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dseq, dln2g, dln2b = _ln_bwd(dy2, xh2, r2, ln2g_ref[0])
    dseq = dseq + d3
    dattn3 = dseq.reshape(T, W, C)

    # ---- backward attention per position
    for w in range(W):
        q, k, Q, K, Vs, kv_used, ksum, z, P, r = per_pos[w]
        dattn = dattn3[:, w, :]
        dP = dattn * r
        dzt = -(dattn * P) * (r / (z + _EPS))  # P*r/(z+eps) per lane
        du = jnp.dot(dzt, bd, preferred_element_type=f32)
        dQ = du * ksum + jax.lax.dot_general(dP, kv_used,
                                             dimension_numbers=(((1,), (1,)), ((), ())),
                                             preferred_element_type=f32)
        dksum = jax.lax.dot_general(jnp.ones((1, T), f32), du * Q,
                                    dimension_numbers=(((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        dkv_used = jax.lax.dot_general(Q, dP, dimension_numbers=(((0,), (0,)), ((), ())),
                                       preferred_element_type=f32)
        d_padkv = d_padkv + dkv_used
        d_padks = d_padks + dksum
        dkv_raw = dkv_used * bd
        dK = jax.lax.dot_general(Vs, dkv_raw, dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=f32) + jnp.broadcast_to(dksum, (T, C))
        dVs = jnp.dot(K, dkv_raw, preferred_element_type=f32)
        dq = dQ * _elu1_grad(q)
        dk = dK * _elu1_grad(k)
        dv = dVs / Tp
        bwd_cols.append((dq, dk, dv))

    dqkv3 = jnp.stack([jnp.concatenate(c, axis=-1) for c in bwd_cols], axis=1)  # (T, W, 3C)
    if has_guid:
        ones_w = jnp.ones((1, W), f32)
        dqg = jax.lax.dot_general(dqkv3[:, :, :C], ones_w,
                                  dimension_numbers=(((1,), (1,)), ((), ())),
                                  preferred_element_type=f32).reshape(T, C)
        dkg = jax.lax.dot_general(dqkv3[:, :, C : 2 * C], ones_w,
                                  dimension_numbers=(((1,), (1,)), ((), ())),
                                  preferred_element_type=f32).reshape(T, C)
    dqkv = dqkv3.reshape(T * W, 3 * C)
    dqkvc = dqkv.astype(x.dtype)
    dqkvw = jax.lax.dot_general(y, dqkvc, dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
    dqkvb = jnp.sum(dqkv, axis=0, keepdims=True)
    dy1 = jax.lax.dot_general(dqkvc, qkvw_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    dx0, dln1g, dln1b = _ln_bwd(dy1, xh1, r1, ln1g_ref[0])
    dx0 = dx0 + dseq
    dx_ref[0, :, 0] = dx0.reshape(T, W, C).astype(dx_ref.dtype)

    b, h = pl.program_id(0), pl.program_id(1)

    def accum(ref, val, fst):
        @pl.when(fst)
        def _init():
            ref[...] = val.astype(ref.dtype)

        @pl.when(jnp.logical_not(fst))
        def _add():
            ref[...] = ref[...] + val.astype(ref.dtype)

    first = jnp.logical_and(b == 0, h == 0)
    for ref, val in ((dpadkv_ref, d_padkv), (dpadks_ref, d_padks),
                     (dln1g_ref, dln1g), (dln1b_ref, dln1b),
                     (dqkvw_ref, dqkvw), (dqkvb_ref, dqkvb),
                     (dln2g_ref, dln2g), (dln2b_ref, dln2b),
                     (dm1w_ref, dm1w), (dm1b_ref, dm1b),
                     (dm2w_ref, dm2w), (dm2b_ref, dm2b)):
        accum(ref, val, first)
    if has_guid:
        ft = h == 0
        accum(dqg_ref, dqg[None], ft)
        accum(dkg_ref, dkg[None], ft)


def _pallas_bwd(x, g, qg, kg, pad_kv, pad_ksum, p, heads: int, Tp: int, interpret: bool):
    B, T, H, W, C = x.shape
    has_guid = qg is not None
    dt = x.dtype

    def v2(a, cast=None):
        a = a.astype(cast or dt)
        return a.reshape(1, -1) if a.ndim == 1 else a

    qkv_w = jnp.concatenate([p["q_w"][:C], p["k_w"][:C], p["v_w"]], axis=1).astype(dt)
    qkv_b = jnp.concatenate([p["q_b"], p["k_b"], p["v_b"]]).astype(jnp.float32).reshape(1, -1)
    zerog = jnp.zeros((B, T, C), dt)
    operands = [
        x, g.astype(dt),
        (qg.astype(dt) if has_guid else zerog),
        (kg.astype(dt) if has_guid else zerog),
        pad_kv.astype(jnp.float32),
        pad_ksum.astype(jnp.float32).reshape(1, C),
        v2(p["ln1_g"], jnp.float32), v2(p["ln1_b"], jnp.float32),
        qkv_w, qkv_b,
        v2(p["ln2_g"], jnp.float32), v2(p["ln2_b"], jnp.float32),
        v2(p["mlp1_w"]), v2(p["mlp1_b"], jnp.float32),
        v2(p["mlp2_w"]), v2(p["mlp2_b"], jnp.float32),
    ]
    x_spec = pl.BlockSpec((1, T, 1, W, C), lambda b, h: (b, 0, h, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, T, C), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b, h: (0,) * a.ndim, memory_space=pltpu.VMEM)
    specs = [x_spec, x_spec, g_spec, g_spec] + [const(a) for a in operands[4:]]

    Cmlp = p["mlp1_w"].shape[1]
    out_shapes = [
        jax.ShapeDtypeStruct((B, T, H, W, C), dt),            # dx
        jax.ShapeDtypeStruct((B, T, C), jnp.float32),         # dqg
        jax.ShapeDtypeStruct((B, T, C), jnp.float32),         # dkg
        jax.ShapeDtypeStruct((C, C), jnp.float32),            # dpad_kv
        jax.ShapeDtypeStruct((1, C), jnp.float32),            # dpad_ksum
        jax.ShapeDtypeStruct((1, C), jnp.float32),            # dln1_g
        jax.ShapeDtypeStruct((1, C), jnp.float32),            # dln1_b
        jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),        # dqkv_w
        jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),        # dqkv_b
        jax.ShapeDtypeStruct((1, C), jnp.float32),            # dln2_g
        jax.ShapeDtypeStruct((1, C), jnp.float32),            # dln2_b
        jax.ShapeDtypeStruct((C, Cmlp), jnp.float32),         # dmlp1_w
        jax.ShapeDtypeStruct((1, Cmlp), jnp.float32),         # dmlp1_b
        jax.ShapeDtypeStruct((Cmlp, C), jnp.float32),         # dmlp2_w
        jax.ShapeDtypeStruct((1, C), jnp.float32),            # dmlp2_b
    ]
    out_specs = [x_spec, g_spec, g_spec] + [const(a) for a in out_shapes[3:]]

    res = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, Tp=Tp, has_guid=has_guid),
        out_shape=tuple(out_shapes),
        grid=(B, H),
        in_specs=specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(*operands)

    (dx, dqg, dkg, dpad_kv, dpad_ksum, dln1g, dln1b, dqkvw, dqkvb,
     dln2g, dln2b, dm1w, dm1b, dm2w, dm2b) = res

    Cg = p["q_w"].shape[0] - C
    zg = jnp.zeros((Cg, C), p["q_w"].dtype)
    dp = {
        "ln1_g": dln1g.reshape(-1).astype(p["ln1_g"].dtype),
        "ln1_b": dln1b.reshape(-1).astype(p["ln1_b"].dtype),
        # q_w/k_w guidance rows ([C:]) feed qg/kg OUTSIDE this vjp boundary;
        # their cotangent flows through dqg/dkg in the caller's autodiff
        "q_w": jnp.concatenate([dqkvw[:, :C].astype(p["q_w"].dtype), zg], axis=0),
        "q_b": dqkvb[0, :C].astype(p["q_b"].dtype),
        "k_w": jnp.concatenate([dqkvw[:, C : 2 * C].astype(p["k_w"].dtype), zg], axis=0),
        "k_b": dqkvb[0, C : 2 * C].astype(p["k_b"].dtype),
        "v_w": dqkvw[:, 2 * C :].astype(p["v_w"].dtype),
        "v_b": dqkvb[0, 2 * C :].astype(p["v_b"].dtype),
        "ln2_g": dln2g.reshape(-1).astype(p["ln2_g"].dtype),
        "ln2_b": dln2b.reshape(-1).astype(p["ln2_b"].dtype),
        "mlp1_w": dm1w.astype(p["mlp1_w"].dtype),
        "mlp1_b": dm1b.reshape(-1).astype(p["mlp1_b"].dtype),
        "mlp2_w": dm2w.astype(p["mlp2_w"].dtype),
        "mlp2_b": dm2b.reshape(-1).astype(p["mlp2_b"].dtype),
    }
    dqg_out = dqg.astype(qg.dtype) if has_guid else None
    dkg_out = dkg.astype(kg.dtype) if has_guid else None
    return (dx, dqg_out, dkg_out,
            dpad_kv.astype(pad_kv.dtype),
            dpad_ksum.reshape(pad_ksum.shape).astype(pad_ksum.dtype), dp)


def _reference(x_pm, qg, kg, pad_kv, pad_ksum, p, heads: int, Tp: int):
    """Plain-XLA math identical to the kernel (fallback + VJP recompute).

    x_pm: (B, HW, T, C) position-major."""
    B, HW, T, C = x_pm.shape
    D = C // heads
    x32 = x_pm.astype(jnp.float32)
    fast = x_pm.dtype == jnp.bfloat16
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if fast:
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mu * mu
    else:
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["ln1_g"] + p["ln1_b"]).astype(x_pm.dtype)
    qkv_w = jnp.concatenate([p["q_w"][:C], p["k_w"][:C], p["v_w"]], axis=1).astype(x_pm.dtype)
    qkv_b = jnp.concatenate([p["q_b"], p["k_b"], p["v_b"]])
    qkv = jnp.einsum("bntc,cd->bntd", y, qkv_w, preferred_element_type=jnp.float32) + qkv_b
    q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
    if qg is not None:
        q = q + qg[:, None].astype(jnp.float32)
        k = k + kg[:, None].astype(jnp.float32)
    Q = jnp.where(q > 0, q + 1.0, jnp.exp(jnp.minimum(q, 0.0)))
    K = jnp.where(k > 0, k + 1.0, jnp.exp(jnp.minimum(k, 0.0)))
    Qh = Q.reshape(B, HW, T, heads, D)
    Kh = K.reshape(B, HW, T, heads, D)
    Vh = (v / Tp).reshape(B, HW, T, heads, D)
    kv = jnp.einsum("bnthd,bnthe->bnhde", Kh, Vh)
    kv = kv + pad_kv.reshape(heads, D, heads, D)[jnp.arange(heads), :, jnp.arange(heads), :]
    ksum = Kh.sum(axis=2) + pad_ksum.reshape(heads, D)
    z = jnp.einsum("bnthd,bnhd->bnth", Qh, ksum)
    attn = jnp.einsum("bnthd,bnhde->bnthe", Qh, kv) * (Tp / (z[..., None] + _EPS))
    seq = (x32 + attn.reshape(B, HW, T, C)).astype(x_pm.dtype)
    s32 = seq.astype(jnp.float32)
    mu = jnp.mean(s32, axis=-1, keepdims=True)
    if fast:
        var = jnp.mean(jnp.square(s32), axis=-1, keepdims=True) - mu * mu
    else:
        var = jnp.mean(jnp.square(s32 - mu), axis=-1, keepdims=True)
    y2 = ((s32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["ln2_g"] + p["ln2_b"]).astype(x_pm.dtype)
    h = jnp.einsum("bntc,cd->bntd", y2, p["mlp1_w"].astype(x_pm.dtype),
                   preferred_element_type=jnp.float32) + p["mlp1_b"]
    h = jnp.maximum(h, 0.0).astype(x_pm.dtype)
    o = jnp.einsum("bntc,cd->bntd", h, p["mlp2_w"].astype(x_pm.dtype),
                   preferred_element_type=jnp.float32) + p["mlp2_b"]
    return seq + o.astype(x_pm.dtype)


def _kernel_v3(x_ref, qg_ref, kg_ref, padkv_ref, padks_ref,
               ln1g_ref, ln1b_ref, qkvw_ref, qkvb_ref,
               ln2g_ref, ln2b_ref, m1w_ref, m1b_ref, m2w_ref, m2b_ref,
               o_ref, xt_ref, ot_ref, *, heads: int, Tp: int, has_guid: bool,
               interpret: bool):
    """One-shot variant of :func:`_kernel_v2`: the whole (T, R*W, C) block is
    pair-transposed ONCE into a VMEM scratch, and a fori loop walks
    super-chunks of 8 positions with plain leading-dim dynamic slices — no
    per-row middle-dim strided extraction (measured ~25% of the v2 kernel).
    Requires T even (the CW=4 sub-chunk slices land on 8-row boundaries)."""
    T, R, W, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3], x_ref.shape[4]
    D = C // heads
    f32 = jnp.float32
    dt = x_ref.dtype
    RW = R * W
    CW = 4                       # positions per supermatrix sub-chunk
    cr = CW * T
    fast = dt == jnp.bfloat16

    bd = _blockdiag(C, D, f32)
    ln1g, ln1b = ln1g_ref[0], ln1b_ref[0]
    padkv4 = jnp.tile(padkv_ref[:], (CW, 1))
    padks = padks_ref[:]

    rr = jax.lax.broadcasted_iota(jnp.int32, (cr, CW * C), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (cr, CW * C), 1)
    qfn = lambda r: 2 * (r // (2 * T)) + (r % 2)
    qmask = (qfn(rr) == ll // C).astype(dt)
    bd4 = jnp.tile(bd, (CW, 1))
    pr = jax.lax.broadcasted_iota(jnp.int32, (CW, cr), 0)
    qr = jax.lax.broadcasted_iota(jnp.int32, (CW, cr), 1)
    sel4 = (pr == qfn(qr)).astype(dt)
    selTb = (jax.lax.broadcasted_iota(jnp.int32, (cr, CW), 1)
             == qfn(jax.lax.broadcasted_iota(jnp.int32, (cr, CW), 0))).astype(f32)

    if has_guid:
        qgv = qg_ref[0].astype(f32)          # (2T, C) interleaved
        kgv = kg_ref[0].astype(f32)

    # ---- one-shot pair transpose into scratch
    xall = x_ref[0].reshape(T, RW, C)
    if interpret:
        xt_ref[...] = (xall.reshape(T, RW // 2, 2, C)
                       .transpose(1, 0, 2, 3).reshape(RW // 2, 2 * T, C))
    else:
        xp = pltpu.bitcast(xall, jnp.int32)              # (T, RW/2, C)
        xt_ref[...] = xp.transpose((1, 0, 2))            # (RW/2, T, C)

    def sc_body(c, carry):
        if interpret:
            xf = xt_ref[pl.ds(c * 4, 4)].reshape(8 * T, C)
        else:
            pk = xt_ref[pl.ds(c * 4, 4)]                 # (4, T, C) int32
            xf = pltpu.bitcast(pk.reshape(4 * T, C), dt)  # (8T, C) bf16
        x32 = xf.astype(f32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        if fast:
            var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - mu * mu
        else:
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln1g + ln1b).astype(dt)
        qkv = jnp.dot(y, qkvw_ref[:], preferred_element_type=f32) + qkvb_ref[0]
        q, k, v = qkv[:, :C], qkv[:, C:2 * C], qkv[:, 2 * C:]
        if has_guid:
            q = (q.reshape(4, 2 * T, C) + qgv[None]).reshape(8 * T, C)
            k = (k.reshape(4, 2 * T, C) + kgv[None]).reshape(8 * T, C)
        Q = _elu1(q)
        K = _elu1(k)
        Qc = Q.astype(dt)
        Kc = K.astype(dt)
        Vc = (v / Tp).astype(dt)

        outs = []
        for s in range(2):
            sl = slice(s * cr, (s + 1) * cr)             # 600-row static slice
            Qb = jnp.tile(Qc[sl], (1, CW)) * qmask
            Kb = jnp.tile(Kc[sl], (1, CW)) * qmask
            kv = jax.lax.dot_general(Kb, Vc[sl], (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            kv = (kv * bd4 + padkv4).astype(dt)
            attn = jax.lax.dot_general(Qb, kv, (((1,), (0,)), ((), ())),
                                       preferred_element_type=f32)
            ks4 = jax.lax.dot_general(sel4, Kc[sl], (((1,), (0,)), ((), ())),
                                      preferred_element_type=f32) + padks
            ksb = jnp.dot(selTb, ks4, preferred_element_type=f32)
            zraw = (Q[sl] * ksb).astype(dt)
            z = jnp.dot(zraw, bd.astype(dt), preferred_element_type=f32)
            outs.append(attn * (Tp / (z + _EPS)))
        attn_all = jnp.concatenate(outs, axis=0)

        seq32 = x32 + attn_all
        seq = seq32.astype(dt)
        mu = jnp.mean(seq32, axis=-1, keepdims=True)
        if fast:
            var = jnp.mean(jnp.square(seq32), axis=-1, keepdims=True) - mu * mu
        else:
            var = jnp.mean(jnp.square(seq32 - mu), axis=-1, keepdims=True)
        y2 = ((seq32 - mu) * jax.lax.rsqrt(var + 1e-5) * ln2g_ref[0]
              + ln2b_ref[0]).astype(dt)
        h = jnp.dot(y2, m1w_ref[:], preferred_element_type=f32) + m1b_ref[0]
        h = jnp.maximum(h, 0.0).astype(dt)
        o = jnp.dot(h, m2w_ref[:], preferred_element_type=f32) + m2b_ref[0]
        out = seq + o.astype(dt)                         # (8T, C)
        if interpret:
            ot_ref[pl.ds(c * 4, 4)] = out.reshape(4, 2 * T, C)
        else:
            ot_ref[pl.ds(c * 4, 4)] = pltpu.bitcast(out, jnp.int32).reshape(4, T, C)
        return carry

    jax.lax.fori_loop(0, RW // 8, sc_body, 0)

    # ---- one-shot inverse transpose out
    if interpret:
        o3 = (ot_ref[...].reshape(RW // 2, T, 2, C)
              .transpose(1, 0, 2, 3).reshape(T, RW, C))
    else:
        o3 = pltpu.bitcast(ot_ref[...].transpose((1, 0, 2)), dt)  # (T, RW, C)
    o_ref[0] = o3.reshape(T, R, W, C)


def _pallas(x, qg, kg, pad_kv, pad_ksum, p, heads: int, Tp: int, interpret: bool):
    B, T, H, W, C = x.shape
    has_guid = qg is not None
    dt = x.dtype

    # v2 fast path (see _kernel_v2): bf16 compute, even geometry, no
    # measurement ablation active (the component hooks live in the v1 body)
    use_v2 = (dt == jnp.bfloat16 and W % 4 == 0 and T % 2 == 0
              and not _ABLATE and not os.environ.get("CATSEG_CLASS_V1"))

    def v2(a, cast=None):
        a = a.astype(cast or dt)
        return a.reshape(1, -1) if a.ndim == 1 else a

    qkv_w = jnp.concatenate([p["q_w"][:C], p["k_w"][:C], p["v_w"]], axis=1).astype(dt)
    qkv_b = jnp.concatenate([p["q_b"], p["k_b"], p["v_b"]]).astype(jnp.float32).reshape(1, -1)
    plain = bool(os.environ.get("CATSEG_CLASS_PLAINT"))  # A/B: plain transpose
    gT = 2 * T if (use_v2 and not plain) else T
    interleave = ((lambda g: jnp.repeat(g, 2, axis=1))
                  if (use_v2 and not plain) else (lambda g: g))
    zerog = jnp.zeros((B, gT, C), dt)
    operands = [
        x,
        (interleave(qg).astype(dt) if has_guid else zerog),
        (interleave(kg).astype(dt) if has_guid else zerog),
        pad_kv.astype(jnp.float32),
        pad_ksum.astype(jnp.float32).reshape(1, C),
        v2(p["ln1_g"], jnp.float32), v2(p["ln1_b"], jnp.float32),
        qkv_w, qkv_b,
        v2(p["ln2_g"], jnp.float32), v2(p["ln2_b"], jnp.float32),
        v2(p["mlp1_w"]), v2(p["mlp1_b"], jnp.float32),
        v2(p["mlp2_w"]), v2(p["mlp2_b"], jnp.float32),
    ]
    # Rows per grid step: the r4 ablation measured the kernel at 98% of a
    # copy-only variant — strided-DMA-bound, because a (1, T, 1, W, C)
    # block reads T chunks of only W*C*2 = 6 KB each at H*W*C stride.  R
    # rows per block make the per-class chunk R*W*C long; R is the largest
    # divisor of H whose block fits a ~16 MB budget (leaves room for the
    # double-buffered out block + the per-row fp32 intermediates under the
    # 100 MB scoped-VMEM cap).  Rows are fori_loop'd inside the kernel, so
    # compile time does not grow with R.
    env_r = os.environ.get("CATSEG_CLASS_ROWS")
    if env_r:
        R = int(env_r)
        while H % R:
            R -= 1
    else:
        budget = 16 * 1024 * 1024
        R = 1
        for r in range(1, H + 1):
            if H % r == 0 and T * r * W * C * dt.itemsize <= budget:
                R = r
    x_spec = pl.BlockSpec((1, T, R, W, C), lambda b, h: (b, 0, h, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, gT, C), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM)
    const = lambda a: pl.BlockSpec(a.shape, lambda b, h: (0,) * a.ndim, memory_space=pltpu.VMEM)
    specs = [x_spec, g_spec, g_spec] + [const(a) for a in operands[3:]]

    use_v3 = use_v2 and not plain and (R * W) % 8 == 0 and not os.environ.get(
        "CATSEG_CLASS_NO_V3")
    scratch = []
    if use_v3:
        kern = functools.partial(_kernel_v3, heads=heads, Tp=Tp,
                                 has_guid=has_guid, interpret=interpret)
        if interpret:
            sshape = ((R * W // 2, 2 * T, C), dt)
        else:
            sshape = ((R * W // 2, T, C), jnp.int32)
        scratch = [pltpu.VMEM(*sshape), pltpu.VMEM(*sshape)]
    elif use_v2:
        kern = functools.partial(_kernel_v2, heads=heads, Tp=Tp,
                                 has_guid=has_guid, interpret=interpret,
                                 plain=plain)
    else:
        kern = functools.partial(_kernel, heads=heads, Tp=Tp, has_guid=has_guid)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, C), dt),
        grid=(B, H // R),
        in_specs=specs,
        out_specs=x_spec,
        interpret=interpret,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * T * C * (3 * C + 8 * C + 3 * C),
            bytes_accessed=2 * B * T * H * W * C * dt.itemsize,
            transcendentals=B * H * W * T * 2 * C,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*operands)


def _fcl(x, qg, kg, pad_kv, pad_ksum, p, heads: int, Tp: int):
    backend = jax.default_backend()
    if backend == "tpu":
        return _pallas(x, qg, kg, pad_kv, pad_ksum, p, heads, Tp, interpret=False)
    if backend == "cpu":
        return _pallas(x, qg, kg, pad_kv, pad_ksum, p, heads, Tp, interpret=True)
    B, T, H, W, C = x.shape
    x_pm = x.transpose(0, 2, 3, 1, 4).reshape(B, H * W, T, C)
    out = _reference(x_pm, qg, kg, pad_kv, pad_ksum, p, heads, Tp)
    return out.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_class_layer(x, qg, kg, pad_kv, pad_ksum, p, heads: int, Tp: int):
    """One class-attention transformer layer on CLASS-major input.

    x: (B, T, H, W, C) — T REAL classes only; the pad_len padding rows enter
    through pad_kv (C, C) / pad_ksum (1, C) (see pad_contributions).  qg/kg:
    (B, T, C) per-class text-guidance halves of q/k, or None.  p: dict with
    ln1_g/b, q_w (C+Cg, C), q_b, k_w, k_b, v_w (C, C), v_b, ln2_g/b,
    mlp1_w/b, mlp2_w/b.  Returns (B, T, H, W, C) = input + attention + MLP
    residual chain (the caller applies the outer pooling residual).
    """
    return _fcl(x, qg, kg, pad_kv, pad_ksum, p, heads, Tp)


def _fwd(x, qg, kg, pad_kv, pad_ksum, p, heads, Tp):
    out = _fcl(x, qg, kg, pad_kv, pad_ksum, p, heads, Tp)
    return out, (x, qg, kg, pad_kv, pad_ksum, p)


def _bwd(heads, Tp, res, g):
    x, qg, kg, pad_kv, pad_ksum, p = res
    backend = jax.default_backend()
    if backend in ("tpu", "cpu"):
        return _pallas_bwd(x, g, qg, kg, pad_kv, pad_ksum, p, heads, Tp,
                           interpret=(backend == "cpu"))

    def ref(x, qg, kg, pad_kv, pad_ksum, p):
        B, T, H, W, C = x.shape
        x_pm = x.transpose(0, 2, 3, 1, 4).reshape(B, H * W, T, C)
        out = _reference(x_pm, qg, kg, pad_kv, pad_ksum, p, heads, Tp)
        return out.reshape(B, H, W, T, C).transpose(0, 3, 1, 2, 4)

    _, vjp = jax.vjp(ref, x, qg, kg, pad_kv, pad_ksum, p)
    return vjp(g)


fused_class_layer.defvjp(_fwd, _bwd)
