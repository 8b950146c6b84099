"""Fully fused guidance-conditioned decoder (Pallas TPU kernel).

The reference decoder (Up -> DoubleConv -> Up -> DoubleConv -> head conv,
cat_seg/modeling/transformer/model.py:520-555,632-634) runs 3x3 convs at
32-96 channels over 48^2/96^2 grids for every (image, class) slab.  XLA's
conv emitter is then pinned at its N=32 output-tile ceiling (~22-25% MXU
util; the decoder is the largest eval stage at ~16.5 ms in-context for
B=5, T=150).  This kernel restructures the whole decoder around three ideas:

1. **Phase-plane layout.**  Every activation lives as phase planes over the
   24^2 *base* grid: stage 1 (the 48-grid) as 4 planes (pixel (2q+a, 2r+b)
   -> plane (a, b)), stage 2 (the 96-grid) as 16 planes.  A ConvTranspose2d
   (k=2, s=2) is then a per-plane matmul that *natively* emits its phased
   output — no depth-to-space anywhere inside the kernel (one cheap XLA
   reshape/transpose of the (16, 24, 24) head output at the very end).

2. **Transposed im2col with lane-rolls.**  Planes are stored (C, L) with the
   flattened padded base grid in the 128-lane dim (L = (24+2)*24 rounded to
   640; one zero row above and below, zero tail lanes).  A 3x3 conv (at the
   48- or 96-level) becomes ONE matmul (Cout, 9C) @ (9C, L) per output
   plane, whose im2col operand stacks 9 rolled input planes.  All rolls are
   on fp32 (Mosaic lane rotates are 32-bit only) by +-24, +-1 lanes; phase
   crossings select the source plane so only ~6 distinct (plane, shift)
   variants exist per axis and CSE collapses the repeats.  K = 9*C
   (432/576/864) and N = 640 make full MXU tiles — vs N=32 for the direct
   form.  Border correctness is free: the pad rows/lanes are kept zero, so
   wrapped rolls read zeros; only the horizontal (base col 0/23) edges need
   two constant lane masks.

3. **Everything in VMEM.**  One (image, class) slab per grid step: ~2 MB of
   activations live entirely in VMEM; HBM sees only the (128, 640) input
   slab, the per-image guidance planes, and the (16, 640) fp32 logits out.

Guidance concat is algebraically split as in aggregator._double_conv: the
per-image guidance halves of conv1 are precomputed OUTSIDE (B images, not
B*T) as phased planes and added before GroupNorm.

Geometry is fixed to the flagship family: base 24, decoder dims (96->64,
48->32), i.e. ViT-B/16@384 and ViT-L/14@336 (both have 24^2 feature grids).
Other shapes fall back to the XLA path in aggregator._up_tail.

Backward: custom VJP recomputes through the plain-XLA reference
(aggregator._up_tail composition) — exact same math, so training gradients
are unaffected by the kernel.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASE = 24          # base grid (feature resolution)
ROWS = BASE + 2    # one zero pad row above and below
L = 640            # ceil(ROWS*BASE / 128) * 128  (26*24 = 624 -> 640)
_DATA_LO = BASE            # first valid lane (row 1, col 0)
_DATA_HI = BASE + BASE * BASE  # one past last valid lane


def _lane_masks():
    """(valid, left_edge, right_edge) lane masks over the padded flat grid,
    built from iota inside the kernel (trace-time shapes, no host constants)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    row = lanes // BASE
    col = lanes - row * BASE
    valid = (lanes < ROWS * BASE) & (row >= 1) & (row <= BASE)
    left = valid & (col == 0)
    right = valid & (col == BASE - 1)
    return valid, left, right


# ------------------------------------------------------------------ host prep


def to_planes(x: jnp.ndarray, depth: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, P*C, L) phase planes over the 24^2 base grid.

    depth=0: H=W=24, one plane.  depth=1: 48 -> 4 planes.  depth=2: 96 -> 16.
    Plane p = (py*2^depth... row-major (py, px); channels within each plane.
    """
    N, H, W, C = x.shape
    s = 1 << depth
    assert H == BASE * s and W == BASE * s, (x.shape, depth)
    xp = x.reshape(N, BASE, s, BASE, s, C)
    xp = xp.transpose(0, 2, 4, 5, 1, 3)  # (N, py, px, C, q, r)
    flat = xp.reshape(N, s * s * C, BASE * BASE)
    out = jnp.zeros((N, s * s * C, L), x.dtype)
    return out.at[:, :, _DATA_LO:_DATA_HI].set(flat)


def from_planes(x: jnp.ndarray, depth: int) -> jnp.ndarray:
    """(N, P*C, L) -> (N, H, W, C): inverse of :func:`to_planes`."""
    N, PC, _ = x.shape
    s = 1 << depth
    C = PC // (s * s)
    flat = x[:, :, _DATA_LO:_DATA_HI]
    xp = flat.reshape(N, s, s, C, BASE, BASE)
    xp = xp.transpose(0, 4, 1, 5, 2, 3)  # (N, q, py, r, px, C)
    return xp.reshape(N, BASE * s, BASE * s, C)


def _conv_w_mat(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO -> (Cout, 9*Cin) tap-major matmul weights."""
    kh, kw, cin, cout = w.shape
    return w.reshape(kh * kw * cin, cout).T


def _up_w_planes(w: jnp.ndarray) -> jnp.ndarray:
    """(Cin, 2, 2, Cout) ConvT weights -> (4, Cout, Cin): plane (a, b) block."""
    cin, _, _, cout = w.shape
    return w.transpose(1, 2, 3, 0).reshape(4, cout, cin)


def _tap_sources(depth: int):
    """For each output phase p and tap (dy, dx) at the conv's native grid:
    the (source plane, base row shift, base col shift) triple.

    Native grid = BASE * 2^depth; a tap moves +-1 native pixel, which maps to
    a neighboring phase plane with a base-grid carry shift.
    """
    s = 1 << depth
    out = []
    for py in range(s):
        for px in range(s):
            taps = []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = py + dy, px + dx
                    cy, ny_ = ny // s, ny % s
                    cx, nx_ = nx // s, nx % s
                    taps.append((ny_ * s + nx_, cy, cx))
            out.append(taps)
    return out


# ------------------------------------------------------------------ kernel


def _rolled(plane_f32, cy: int, cx: int, left, right):
    """Roll a (C, L) fp32 plane by a (row, col) base shift with edge masking.

    Reads source position (q+cy, r+cx): a lane roll of cy*BASE + cx.  Pad
    rows/lanes are zero, so vertical wrap reads zeros; horizontal carries
    additionally mask the wrapped edge column.
    """
    shift = cy * BASE + cx
    x = plane_f32
    if shift:
        x = pltpu.roll(x, (-shift) % L, 1)
    if cx == 1:
        x = jnp.where(right, jnp.zeros_like(x), x)
    elif cx == -1:
        x = jnp.where(left, jnp.zeros_like(x), x)
    return x


def _phased_conv(x_f32, C: int, depth: int, w_ref, left, right, dtype):
    """3x3 'same' conv at the native grid of `depth`, on phased planes.

    x_f32: (P*C, L) fp32 planes (pad regions zero).  w_ref: (Cout, 9C).
    Returns (P*Cout, L) fp32.  Rolled variants are memoized: across all
    output phases only ~6 distinct (plane, shift) pairs exist per axis.
    """
    P = (1 << depth) ** 2
    w = w_ref[:].astype(dtype)
    planes = [x_f32[p * C:(p + 1) * C] for p in range(P)]
    cache = {}

    def rolled(sp, cy, cx):
        key = (sp, cy, cx)
        if key not in cache:
            cache[key] = _rolled(planes[sp], cy, cx, left, right).astype(dtype)
        return cache[key]

    outs = []
    for taps in _tap_sources(depth):
        xcol = jnp.concatenate([rolled(*t) for t in taps], axis=0)
        outs.append(jax.lax.dot_general(
            w, xcol, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=0)


def _group_norm_relu(h, C: int, P: int, g_ref, b_ref, valid, n_groups: int):
    """GroupNorm(n_groups, C) + ReLU over phased planes, zeroing pad regions.

    h: (P*C, L) fp32 conv output (+bias/guidance already added).  Stats run
    over each channel group across ALL planes and valid lanes (the planes
    jointly tile the native image).  g/b refs: (C, 1).
    """
    hm = jnp.where(valid, h, 0.0)
    gs = C // n_groups
    cnt = float(P * gs * (BASE * BASE))
    # Row-block slices + scalar reductions: Mosaic's layout inference aborts
    # on multi-axis keepdims reductions over >2D reshapes (seen on v5e).
    stats = []
    for g in range(n_groups):
        s1 = jnp.float32(0.0)
        s2 = jnp.float32(0.0)
        for p in range(P):
            blk = hm[p * C + g * gs:p * C + (g + 1) * gs]
            s1 = s1 + jnp.sum(blk)
            s2 = s2 + jnp.sum(blk * blk)
        mean = s1 / cnt
        var = s2 / cnt - mean * mean
        stats.append((mean, jax.lax.rsqrt(var + 1e-5)))
    gain = g_ref[:].astype(jnp.float32)
    bias = b_ref[:].astype(jnp.float32)
    out = []
    for p in range(P):
        for g in range(n_groups):
            mean, inv = stats[g]
            blk = h[p * C + g * gs:p * C + (g + 1) * gs]
            gg = gain[g * gs:(g + 1) * gs]
            bb = bias[g * gs:(g + 1) * gs]
            out.append((blk - mean) * (inv * gg) + bb)
    y = jnp.maximum(jnp.concatenate(out, axis=0), 0.0)
    return jnp.where(valid, y, 0.0)


def _kernel(x_ref, hg1_ref, hg2_ref,
            up1_ref, up1b_ref, c11_ref, gn11g_ref, gn11b_ref,
            c12_ref, gn12g_ref, gn12b_ref,
            up2_ref, up2b_ref, c21_ref, gn21g_ref, gn21b_ref,
            c22_ref, gn22g_ref, gn22b_ref,
            hw_ref, hb_ref, o_ref, *, dtype, slabs: int):
    f32 = jnp.float32
    valid, left, right = _lane_masks()
    up1 = up1_ref[:]                               # (4, 96, 128)
    up2 = up2_ref[:]                               # (4, 48, 64)

    for s in range(slabs):
        # ---- stage 1: up (24 -> 48, phased) + DoubleConv at the 48-level
        x = x_ref[s]                               # (128, L), dense base grid
        u1 = jnp.concatenate([
            jax.lax.dot_general(up1[p].astype(x.dtype), x, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
            for p in range(4)], axis=0)            # (4*96, L)
        u1 = u1 + jnp.tile(up1b_ref[:], (4, 1))    # bias (96,1) tiled over planes
        u1 = jnp.where(valid, u1, 0.0)

        h = _phased_conv(u1, 96, 1, c11_ref, left, right, dtype)   # (4*64, L)
        h = h + hg1_ref[0].astype(f32)             # guidance half of conv1
        h = _group_norm_relu(h, 64, 4, gn11g_ref, gn11b_ref, valid, 64 // 16)

        h = _phased_conv(h, 64, 1, c12_ref, left, right, dtype)    # (4*64, L)
        h = _group_norm_relu(h, 64, 4, gn12g_ref, gn12b_ref, valid, 64 // 16)

        # ---- stage 2: up (48 -> 96 => 16 planes) + DoubleConv at the 96-level
        planes1 = [h[p * 64:(p + 1) * 64].astype(dtype) for p in range(4)]
        u2_parts = []
        for py2 in range(4):                       # depth-2 phase rows 2a+alpha
            a, al = py2 // 2, py2 % 2
            for px2 in range(4):
                b, be = px2 // 2, px2 % 2
                u2_parts.append(jax.lax.dot_general(
                    up2[al * 2 + be].astype(dtype), planes1[a * 2 + b],
                    (((1,), (0,)), ((), ())), preferred_element_type=f32))
        u2 = jnp.concatenate(u2_parts, axis=0)     # (16*48, L)
        u2 = u2 + jnp.tile(up2b_ref[:], (16, 1))
        u2 = jnp.where(valid, u2, 0.0)

        h2 = _phased_conv(u2, 48, 2, c21_ref, left, right, dtype)  # (16*32, L)
        h2 = h2 + hg2_ref[0].astype(f32)
        h2 = _group_norm_relu(h2, 32, 16, gn21g_ref, gn21b_ref, valid, 32 // 16)

        h2 = _phased_conv(h2, 32, 2, c22_ref, left, right, dtype)  # (16*32, L)
        h2 = _group_norm_relu(h2, 32, 16, gn22g_ref, gn22b_ref, valid, 32 // 16)

        # ---- head: 3x3, 32 -> 1 at the 96-level
        out = _phased_conv(h2, 32, 2, hw_ref, left, right, dtype)  # (16*1, L)
        o_ref[s] = (out + hb_ref[:]).astype(o_ref.dtype)


# ------------------------------------------------------------------ driver


def _xla_reference(x, g1, g2, d1, d2, head, B, T):
    from ..core.aggregator import _up_tail

    h = _up_tail(x, (g1,) if g1 is not None else (), d1, None, B, T)
    return _up_tail(h, (g2,) if g2 is not None else (), d2, head, B, T)


def _prep_guidance(dp, g, depth: int, T: int, cup: int, dtype):
    """Per-image guidance half of conv1 (+ conv1 bias-free) as phased planes,
    broadcast over the class axis at the kernel's index_map (not here)."""
    from ..ops.conv import conv2d

    cg = g.shape[-1]
    wg = dp["conv1_w"][:, :, cup:cup + cg]
    hg = conv2d(g.astype(dtype), wg, None, padding=1)     # (B, H, W, mid)
    return to_planes(hg.astype(jnp.float32), depth)       # (B, P*mid, L)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_decoder(x, g1, g2, d1, d2, head, B: int, T: int):
    """conv_decoder (both Up stages + head) as one Pallas kernel per slab.

    x: (B*T, 24, 24, 128); g1: (B, 48, 48, Cg1); g2: (B, 96, 96, Cg2).
    Returns (B*T, 96, 96) fp32 logits.  Matches aggregator._up_tail
    composition (tests/test_decoder_kernel.py); geometry outside the
    flagship family must use the XLA path.
    """
    return _fused_fwd_impl(x, g1, g2, d1, d2, head, B, T)


def _fused_fwd_impl(x, g1, g2, d1, d2, head, B, T):
    N = x.shape[0]
    dtype = x.dtype
    xp = to_planes(x, 0)                                   # (N, 128, L)

    hg1 = _prep_guidance(d1, g1, 1, T, d1["up_w"].shape[-1], dtype)
    hg2 = _prep_guidance(d2, g2, 2, T, d2["up_w"].shape[-1], dtype)
    # fold conv1 biases (none in reference DoubleConv: bias-free convs) —
    # reference model.py:523-531 uses bias-free Conv2d inside DoubleConv.

    up1 = _up_w_planes(d1["up_w"]).astype(dtype)           # (4, 96, 128)
    up2 = _up_w_planes(d2["up_w"]).astype(dtype)           # (4, 48, 64)
    cup1 = d1["up_w"].shape[-1]
    cup2 = d2["up_w"].shape[-1]
    c11 = _conv_w_mat(d1["conv1_w"][:, :, :cup1]).astype(dtype)   # (64, 9*96)
    c12 = _conv_w_mat(d1["conv2_w"]).astype(dtype)                # (64, 9*64)
    c21 = _conv_w_mat(d2["conv1_w"][:, :, :cup2]).astype(dtype)   # (32, 9*48)
    c22 = _conv_w_mat(d2["conv2_w"]).astype(dtype)                # (32, 9*32)
    hw = _conv_w_mat(head["w"]).astype(dtype)                     # (1, 9*32)

    col = lambda v: v.reshape(-1, 1).astype(jnp.float32)
    # Slabs per grid step: amortizes per-step DMA/dispatch overhead.  S must
    # divide T so a step never spans two images (the hg blocks are per-image).
    # Capped at 2: the body is fully unrolled per slab and Mosaic compile
    # time grows superlinearly with it (S=5 took >20 min on the v5e).
    S = next(s for s in (2, 1) if T % s == 0 and N % s == 0)
    kernel = functools.partial(_kernel, dtype=dtype, slabs=S)
    interpret = jax.default_backend() != "tpu"
    TS = T // S

    out = pl.pallas_call(
        kernel,
        grid=(N // S,),
        in_specs=[
            pl.BlockSpec((S, 128, L), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 4 * 64, L), lambda i: (i // TS, 0, 0)),
            pl.BlockSpec((1, 16 * 32, L), lambda i: (i // TS, 0, 0)),
            pl.BlockSpec((4, 96, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((96, 1), lambda i: (0, 0)),
            pl.BlockSpec((64, 9 * 96), lambda i: (0, 0)),
            pl.BlockSpec((64, 1), lambda i: (0, 0)),
            pl.BlockSpec((64, 1), lambda i: (0, 0)),
            pl.BlockSpec((64, 9 * 64), lambda i: (0, 0)),
            pl.BlockSpec((64, 1), lambda i: (0, 0)),
            pl.BlockSpec((64, 1), lambda i: (0, 0)),
            pl.BlockSpec((4, 48, 64), lambda i: (0, 0, 0)),
            pl.BlockSpec((48, 1), lambda i: (0, 0)),
            pl.BlockSpec((32, 9 * 48), lambda i: (0, 0)),
            pl.BlockSpec((32, 1), lambda i: (0, 0)),
            pl.BlockSpec((32, 1), lambda i: (0, 0)),
            pl.BlockSpec((32, 9 * 32), lambda i: (0, 0)),
            pl.BlockSpec((32, 1), lambda i: (0, 0)),
            pl.BlockSpec((32, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 9 * 32), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((S, 16, L), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 16, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, hg1, hg2,
      up1, col(d1["up_b"]), c11, col(d1["gn1"]["g"]), col(d1["gn1"]["b"]),
      c12, col(d1["gn2"]["g"]), col(d1["gn2"]["b"]),
      up2, col(d2["up_b"]), c21, col(d2["gn1"]["g"]), col(d2["gn1"]["b"]),
      c22, col(d2["gn2"]["g"]), col(d2["gn2"]["b"]),
      hw, col(head["b"]))

    return from_planes(out, 2)[..., 0]


def _fused_fwd(x, g1, g2, d1, d2, head, B, T):
    return fused_decoder(x, g1, g2, d1, d2, head, B, T), (x, g1, g2, d1, d2, head)


def _fused_bwd(B, T, res, gout):
    x, g1, g2, d1, d2, head = res
    _, vjp = jax.vjp(lambda *a: _xla_reference(*a, B, T), x, g1, g2, d1, d2, head)
    return vjp(gout)


fused_decoder.defvjp(_fused_fwd, _fused_bwd)


def decoder_kernel_applicable(x, d1, d2) -> bool:
    """Kernel geometry: 24^2 base, decoder dims (96, 64) / (48, 32)."""
    return (x.shape[1] == BASE and x.shape[2] == BASE and x.shape[3] == 128
            and d1["up_w"].shape[-1] == 96 and d1["conv1_w"].shape[-1] == 64
            and d2["up_w"].shape[-1] == 48 and d2["conv1_w"].shape[-1] == 32)
