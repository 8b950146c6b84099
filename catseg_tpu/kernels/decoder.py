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

Backward: custom VJP into an analytic Pallas reverse sweep (_fused_bwd /
_bwd_kernel below): the forward is recomputed stage by stage in VMEM and
reversed, with parameter/guidance gradients accumulated across grid steps;
a conv's input-grad reuses the forward machinery with flipped taps and
negated phase carries.  Verified against jax.vjp of the XLA composition
(tests/test_decoder_kernel.py).
"""

from __future__ import annotations

import functools
import os as _os

# measurement-only ablation hook (numerics become GARBAGE when set)
_ABLATE = _os.environ.get("CATSEG_DEC_ABLATE", "")
if _ABLATE:
    import warnings

    warnings.warn(f"CATSEG_DEC_ABLATE={_ABLATE}: decoder kernel numerics are "
                  "intentionally wrong (profiling hook)", stacklevel=1)

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


def _lane_masks(S: int = 1):
    """(valid, left_edge, right_edge) lane masks over S concatenated padded
    flat grids (slabs ride the LANE axis, one L-segment each), built from
    iota inside the kernel (trace-time shapes, no host constants)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, S * L), 1) % L
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


def _conv_w_mat_inv(wm: jnp.ndarray, cin: int) -> jnp.ndarray:
    """(Cout, 9*Cin) -> (3, 3, Cin, Cout): inverse of :func:`_conv_w_mat`."""
    cout = wm.shape[0]
    return wm.T.reshape(3, 3, cin, cout)


def _conv_w_mat_T(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (Cin, 9*Cout) weights of the *input-gradient*
    conv: dX = conv3x3(dY, flip(W)^T) — taps spatially flipped, in/out
    channels swapped."""
    return _conv_w_mat(w[::-1, ::-1].transpose(0, 1, 3, 2))


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
    """Roll a (C, S*L) fp32 plane stack by a (row, col) base shift with edge
    masking.  Reads source position (q+cy, r+cx): a lane roll of
    cy*BASE + cx.  Pad rows/lanes are zero, so vertical wrap reads zeros;
    horizontal carries additionally mask the wrapped edge column.

    With S slabs concatenated on the lane axis, one ring roll serves all
    slabs: every VALID output lane reads within +-(BASE+1) lanes, so a
    cross-slab (or ring-wrap) read can only land in the neighbouring slab's
    zero pad row (lanes 0..BASE-1) or zero tail (lanes 600..639) — provided
    invalid lanes are re-zeroed between stages (GN/masking does).
    """
    shift = cy * BASE + cx
    x = plane_f32
    if shift:
        x = pltpu.roll(x, (-shift) % x.shape[-1], 1)
    if cx == 1:
        x = jnp.where(right, jnp.zeros_like(x), x)
    elif cx == -1:
        x = jnp.where(left, jnp.zeros_like(x), x)
    return x


def _phased_xcols(x_f32, C: int, depth: int, left, right, dtype):
    """Per-output-plane im2col stacks (9C, L) for a 3x3 conv on phased planes.

    Rolled variants are memoized: across all output phases only ~6 distinct
    (plane, shift) pairs exist per axis, so CSE keeps the roll count low.
    """
    P = (1 << depth) ** 2
    planes = [x_f32[p * C:(p + 1) * C] for p in range(P)]
    cache = {}

    def rolled(sp, cy, cx):
        key = (sp, cy, cx)
        if key not in cache:
            cache[key] = _rolled(planes[sp], cy, cx, left, right).astype(dtype)
        return cache[key]

    return [jnp.concatenate([rolled(*t) for t in taps], axis=0)
            for taps in _tap_sources(depth)]


def _phased_conv(x_f32, C: int, depth: int, w, left, right, dtype):
    """3x3 'same' conv at the native grid of `depth`, on phased planes.

    x_f32: (P*C, L) fp32 planes (pad regions zero).  w: (Cout, 9C) array.
    Returns (P*Cout, L) fp32.
    """
    w = w.astype(dtype)
    return jnp.concatenate([
        jax.lax.dot_general(w, xcol, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for xcol in _phased_xcols(x_f32, C, depth, left, right, dtype)], axis=0)


@functools.lru_cache(maxsize=None)
def _all_groups(depth: int):
    """Single whole-P group (all phases, all distinct variants).  K-waste is
    the worst (16/36 variants vs 9 useful) but M = P*Cout in ONE dot — used
    for the 1-channel head conv, where the row-grouped form's M = s*Cout =
    4 rows pays 4 dispatches of 8-row-padded matmuls for ~0.2 ms/stage."""
    srcs = _tap_sources(depth)
    keys: list = []
    kidx: dict = {}
    pmaps = []
    for taps in srcs:
        row = []
        for key in taps:
            if key not in kidx:
                kidx[key] = len(keys)
                keys.append(key)
            row.append(kidx[key])
        pmaps.append(tuple(row))
    return ((tuple(range(len(srcs))), tuple(keys), tuple(pmaps)),)


@functools.lru_cache(maxsize=None)
def _row_groups(depth: int):
    """Output phases grouped by base ROW phase py, with each group's distinct
    rolled variants and per-phase tap -> variant maps.

    The round-3 kernel grouped ALL phases into one matmul: M = P*Cout (full
    MXU row fill) but K = D_all*C with D_all = 16 (depth 1) / 36 (depth 2)
    distinct variants vs 9 useful taps — 1.78x / 4x redundant MACs, and the
    measured kernel was FLOP-bound on exactly that waste (row-4 ablation:
    slimming K to 9C cut 36.2 -> 18.9 ms at eval shapes).  Grouping by base
    row keeps M = s*Cout (= 128 at both decoder stages: 2*64, 4*32 — still
    full fill) while each group only stacks the variants its own phases
    read: 3 row-variants x 4 col-variants = 12 (depth 1) and 3 x 6 = 18
    (depth 2) — K-waste 1.33x / 2x.  Groups are contiguous phase ranges, so
    concatenated group outputs are already phase-major.
    """
    s = 1 << depth
    srcs = _tap_sources(depth)
    groups = []
    for py in range(s):
        phases = list(range(py * s, (py + 1) * s))
        keys: list = []
        kidx: dict = {}
        pmaps = []
        for p in phases:
            row = []
            for key in srcs[p]:
                if key not in kidx:
                    kidx[key] = len(keys)
                    keys.append(key)
                row.append(kidx[key])
            pmaps.append(tuple(row))
        groups.append((tuple(phases), tuple(keys), tuple(pmaps)))
    assert len({len(k) for _, k, _ in groups}) == 1  # uniform D per group
    return tuple(groups)


def _conv_w_grouped(wm: jnp.ndarray, cin: int, depth: int,
                    allp: bool = False) -> jnp.ndarray:
    """(Cout, 9*Cin) tap-major weights -> (G, sP*Cout, D*Cin) row-grouped
    block form (see :func:`_row_groups`).

    Group g's row block p holds that phase's weights laid out over the
    group's D distinct rolled variants (zero where the phase has no tap
    reading that variant; a phase's 9 taps map to 9 distinct variants, so
    placement is 1:1).  Built outside the kernel (host/XLA) — the block
    tensor is an operand, not per-step VMEM work.
    """
    cout = wm.shape[0]
    zero = jnp.zeros((cout, cin), wm.dtype)
    gmats = []
    for _, keys, pmaps in (_all_groups if allp else _row_groups)(depth):
        D = len(keys)
        rows = []
        for kmap in pmaps:
            by_variant = {j: t for t, j in enumerate(kmap)}
            rows.append(jnp.concatenate(
                [wm[:, by_variant[j] * cin:(by_variant[j] + 1) * cin]
                 if j in by_variant else zero for j in range(D)], axis=1))
        gmats.append(jnp.concatenate(rows, axis=0))
    return jnp.stack(gmats, axis=0)


def _phased_conv_grouped(x_f32, C: int, depth: int, wb, left, right, dtype,
                         fast_roll: bool = False, allp: bool = False):
    """Row-grouped phased 3x3 conv: one matmul per base-row group.

    wb: (G, sP*Cout, D*C) from :func:`_conv_w_grouped`.  Each group's dot
    runs at M = sP*Cout (full MXU row fill at the decoder channel counts)
    against only ITS distinct rolled variants (K = D*C, D = 12/18 vs the
    whole-P form's 16/36) — the rolled planes are memoized across groups so
    the total roll count is unchanged.  Bit-behavior: f32 accumulation order
    over the contraction differs from the per-phase form (zero blocks
    contribute exactly 0); covered by the same XLA-equivalence tests.

    ``fast_roll`` (compiled bf16 only): cast each plane to bf16 ONCE, then
    roll the bf16 lanes through an int32 sublane-pair bitcast — pltpu.roll
    is 32-bit-only, but bitcast packs sublanes and preserves lane structure
    (probed bit-exact on v5e).  Halves the roll/variant-stack bytes vs the
    r3 roll-fp32-then-cast-per-variant path.
    """
    P = (1 << depth) ** 2
    cache: dict = {}
    if fast_roll:
        planes = [x_f32[p * C:(p + 1) * C].astype(dtype) for p in range(P)]

        def rolled(key):
            if key not in cache:
                sp, cy, cx = key
                x = planes[sp]
                shift = cy * BASE + cx
                if shift and _ABLATE != "noroll":
                    packed = pltpu.bitcast(x, jnp.int32)
                    packed = pltpu.roll(packed, (-shift) % x.shape[-1], 1)
                    x = pltpu.bitcast(packed, jnp.bfloat16)
                if cx == 1:
                    x = jnp.where(right, jnp.zeros_like(x), x)
                elif cx == -1:
                    x = jnp.where(left, jnp.zeros_like(x), x)
                cache[key] = x
            return cache[key]
    else:
        planes = [x_f32[p * C:(p + 1) * C] for p in range(P)]

        def rolled(key):
            if key not in cache:
                sp, cy, cx = key
                cache[key] = _rolled(planes[sp], cy, cx, left, right).astype(dtype)
            return cache[key]

    wb = wb.astype(dtype)
    groups = (_all_groups if allp else _row_groups)(depth)
    cout = wb.shape[1] // ((1 << depth) ** 2 if allp else (1 << depth))
    if _ABLATE == "noconv":
        P_out = (1 << depth) ** 2 if allp else len(groups) * (1 << depth)
        return x_f32[:P_out * cout] * 1.0001
    outs = []
    shared = None
    for g, (_, keys, _) in enumerate(groups):
        if _ABLATE == "onestack":
            if shared is None:
                shared = jnp.concatenate([rolled(k) for k in keys], axis=0)
            stacked = shared
        else:
            stacked = jnp.concatenate([rolled(k) for k in keys], axis=0)
        outs.append(jax.lax.dot_general(
            wb[g], stacked, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=0)


def _gn_selT(C: int, P: int, n_groups: int):
    """(P*C, n_groups) 0/1 membership: plane-stack row r belongs to channel
    group (r % C) // (C // n_groups).  Built from iota (no host constants)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (P * C, n_groups), 0)
    g = jax.lax.broadcasted_iota(jnp.int32, (P * C, n_groups), 1)
    return (((r % C) // (C // n_groups)) == g).astype(jnp.float32)


def _seg_matrix(S: int, transpose: bool = False):
    """(S*L, S) 0/1 lane-segment membership (or its (S, S*L) transpose):
    lane l belongs to slab l // L.  Built from iota in-kernel."""
    shape = (S, S * L) if transpose else (S * L, S)
    lane_dim, slab_dim = (1, 0) if transpose else (0, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, lane_dim)
    slab = jax.lax.broadcasted_iota(jnp.int32, shape, slab_dim)
    return ((lane // L) == slab).astype(jnp.float32)


def _gn_stats(h, C: int, P: int, valid, n_groups: int, S: int = 1):
    """Per-(group, slab) mean / rsqrt(var + eps) as (n_groups, S) blocks.

    Two selector matmuls replace the round-3 per-(plane, group) scalar-sum
    loops (2*P*n_groups tiny reductions; the GN chains cost ~5 ms of the
    36 ms eval dispatch in the r4 ablation): a lane-segment matmul gives
    per-slab row sums, a channel-group selector contracts the rows.  Slab
    statistics stay independent (GroupNorm is per (image, class) slab).
    Mosaic note: multi-axis keepdims reductions over >2D reshapes crash
    layout inference (seen on v5e) — everything here stays 2D.
    """
    if _ABLATE == "nogn":
        return (jnp.zeros((n_groups, S), jnp.float32),
                jnp.ones((n_groups, S), jnp.float32))
    hm = jnp.where(valid, h, jnp.zeros((), h.dtype))
    sel = _gn_selT(C, P, n_groups)                            # (P*C, G)
    cnt = float(P * (C // n_groups) * (BASE * BASE))
    if S == 1:
        # dtype= widens bf16 rows into an fp32 accumulator in the reduce
        # itself (the bf16 GN chain halves the stats passes' VPU bytes)
        rs1 = jnp.sum(hm, axis=1, keepdims=True, dtype=jnp.float32)
        rs2 = jnp.sum(hm * hm, axis=1, keepdims=True, dtype=jnp.float32)
    else:
        # per-slab row sums via L-aligned lane slices + plain lane
        # reductions.  The r4 form was a (P*C, S*L) @ (S*L, S) segment
        # matmul whose N = S output lanes pad to 128 on the MXU — each of
        # the two stats matmuls cost as much as a full 128-wide gemm
        # (~4.7 ms of the 23 ms eval decoder in the r5 ablation, the
        # second-largest component after the convs themselves).
        hm2 = hm * hm
        rs1 = jnp.concatenate(
            [jnp.sum(hm[:, i * L:(i + 1) * L], axis=1, keepdims=True)
             for i in range(S)], axis=1)                      # (P*C, S)
        rs2 = jnp.concatenate(
            [jnp.sum(hm2[:, i * L:(i + 1) * L], axis=1, keepdims=True)
             for i in range(S)], axis=1)
    mean = jax.lax.dot_general(sel, rs1, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) / cnt
    s2 = jax.lax.dot_general(sel, rs2, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / cnt
    var = s2 - mean * mean                                    # (G, S)
    return mean, jax.lax.rsqrt(var + 1e-5)


def _group_norm_relu(h, C: int, P: int, g_ref, b_ref, valid, n_groups: int,
                     stats=None, S: int = 1):
    """GroupNorm(n_groups, C) + ReLU over phased planes, zeroing pad regions.

    h: (P*C, S*L) fp32 conv output (+bias/guidance already added).  Stats
    run over each channel group across ALL planes and valid lanes of each
    slab segment (the planes jointly tile that slab's native image).  g/b
    refs: (C, 1).  The normalize runs as ONE fused affine pass: per-row,
    per-slab scale/shift expanded to lanes by a segment matmul.
    """
    if _ABLATE == "nogn":
        return jnp.where(valid, jnp.maximum(h, 0.0), 0.0).astype(h.dtype)
    if stats is None:
        stats = _gn_stats(h, C, P, valid, n_groups, S)
    mean, inv = stats                                         # (G, S) each
    selT = _gn_selT(C, P, n_groups)                           # (P*C, G)
    meanr = jax.lax.dot_general(selT, mean, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (P*C, S)
    invr = jax.lax.dot_general(selT, inv, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    gain = jnp.tile(g_ref[:].astype(jnp.float32), (P, 1))     # (P*C, 1)
    bias = jnp.tile(b_ref[:].astype(jnp.float32), (P, 1))
    scale = invr * gain                                       # (P*C, S)
    shift = bias - meanr * scale
    if S == 1:
        scale_l, shift_l = scale, shift                       # broadcast (.,1)
    else:
        segT = _seg_matrix(S, transpose=True)                 # (S, S*L)
        scale_l = jax.lax.dot_general(scale, segT, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        shift_l = jax.lax.dot_general(shift, segT, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    y = jnp.maximum(h * scale_l + shift_l, 0.0)
    # carry the GN chain in h's dtype: on the compiled bf16 path the whole
    # stats/affine/mask chain then moves 2-byte data (the GN passes were
    # ~20% of the eval kernel, VPU-bandwidth-bound)
    return jnp.where(valid, y, 0.0).astype(h.dtype)


def _gn_relu_bwd(dh, c, stats, g_ref, b_ref, valid, C: int, P: int,
                 n_groups: int):
    """Backward of _group_norm_relu given upstream dh and the pre-GN input c.

    Returns (dc, dgain (C, 1), dbias (C, 1)); all fp32.
    """
    gs = C // n_groups
    cnt = float(P * gs * (BASE * BASE))
    mean_col, inv_col = stats                                 # (G, 1) each
    # Vectorized over the full (P*C, L) block with the forward's selector
    # matmuls — the r4 form looped Python-over (P, G) slices (32 chains of
    # small VPU ops per GN; the decoder backward measured ~1.5x its own
    # forward at train shapes largely here).
    selT = _gn_selT(C, P, n_groups)                           # (P*C, G)
    mean_r = jax.lax.dot_general(selT, mean_col, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (P*C, 1)
    inv_r = jax.lax.dot_general(selT, inv_col, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    gain_r = jnp.tile(g_ref[:].astype(jnp.float32), (P, 1))   # (P*C, 1)
    bias_r = jnp.tile(b_ref[:].astype(jnp.float32), (P, 1))
    xhat = (c - mean_r) * inv_r
    y = xhat * gain_r + bias_r
    dy = jnp.where(valid & (y > 0), dh, 0.0)
    dyg = dy * gain_r
    rs_dyg = jnp.sum(dyg, axis=1, keepdims=True)              # (P*C, 1)
    rs_dygx = jnp.sum(dyg * xhat, axis=1, keepdims=True)
    s1 = jax.lax.dot_general(selT, rs_dyg, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # (G, 1)
    s2 = jax.lax.dot_general(selT, rs_dygx, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s1_r = jax.lax.dot_general(selT, s1, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    s2_r = jax.lax.dot_general(selT, s2, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dc_all = jnp.where(valid, inv_r * (dyg - s1_r / cnt - xhat * (s2_r / cnt)), 0.0)
    # per-channel (C, 1) grads: fold the P plane blocks of the row sums
    rs_dyx = jnp.sum(dy * xhat, axis=1, keepdims=True)        # (P*C, 1)
    rs_dy = jnp.sum(dy, axis=1, keepdims=True)
    dgain = sum(rs_dyx[p * C:(p + 1) * C] for p in range(P))
    dbias = sum(rs_dy[p * C:(p + 1) * C] for p in range(P))
    return dc_all, dgain, dbias


def _up1_planes(x, up1, up1bm, valid, dtype, cdt=jnp.float32):
    """x (128, L) -> u1 (4*96, L) cdt: the 24->48 ConvT as phase matmuls.

    ``up1bm`` is the lane-MASKED bias plane (4*96, L) precomputed once per
    grid step: x's invalid lanes are exactly zero (to_planes / GN masking),
    so the matmul output is already zero there and bias*valid replaces the
    old add + where(valid) full-plane pass — bit-identical at valid lanes,
    one pass cheaper.  ``cdt`` carries bf16 on the compiled bf16 path."""
    u1 = jnp.concatenate([
        jax.lax.dot_general(up1[p].astype(x.dtype), x, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for p in range(4)], axis=0)
    return u1.astype(cdt) + up1bm


# depth-2 plane (py2*4 + px2) draws ConvT plane (al*2+be) applied to stage-1
# plane (a*2+b), with py2 = 2a + al, px2 = 2b + be
_UP2_MAP = [((py2 % 2) * 2 + px2 % 2, (py2 // 2) * 2 + px2 // 2)
            for py2 in range(4) for px2 in range(4)]


def _up2_planes(planes1, up2, up2bm, valid, dtype, cdt=jnp.float32):
    """4 stage-1 planes (64, L) bf16 -> u2 (16*48, L) cdt (48->96 ConvT).

    Same masked-bias fold as :func:`_up1_planes` (planes1 invalid lanes are
    zero via the GN mask)."""
    u2 = jnp.concatenate([
        jax.lax.dot_general(up2[w].astype(dtype), planes1[src],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for (w, src) in _UP2_MAP], axis=0)
    return u2.astype(cdt) + up2bm


def _add_masked_up_biases(W, valid, cdt):
    """Stash the lane-masked ConvT bias planes (see _up1_planes) in W."""
    b1 = W["up1b"][:]
    b2 = W["up2b"][:]
    W["up1bm"] = jnp.where(valid, jnp.tile(b1, (4, 1)), 0.0).astype(cdt)
    W["up2bm"] = jnp.where(valid, jnp.tile(b2, (16, 1)), 0.0).astype(cdt)


def _slab_forward(x, hg1, hg2, W, masks, dtype, keep=False, S: int = 1,
                  fast_roll: bool = False):
    """Full decoder forward on phase planes for S lane-concatenated slabs.

    x: (128, S*L); hg1/hg2: per-image guidance planes already tiled to S*L.
    W: dict of loaded weight arrays/refs (refs for the (C,1) columns).
    Returns the (16, S*L) head output planes, plus every pre-GN activation
    and GN stats when ``keep`` (for the backward's reverse sweep, S=1).

    Slabs ride the LANE axis (not an unrolled Python loop): every grouped
    conv matmul gets an S-times wider N, per-step overheads amortize over S
    slabs, and Mosaic compile time no longer grows with S (the round-3
    kernel's unrolled body capped S at 2 for compile time).
    """
    valid, left, right = masks
    conv = lambda *a: _phased_conv_grouped(*a, fast_roll=fast_roll)
    # GN-chain carrier dtype: bf16 on the compiled bf16 path (keyed on
    # fast_roll, the same predicate as the roll trick) — the pre-GN
    # activations and GN outputs then move half the VPU bytes; stats still
    # accumulate fp32 (see _gn_stats).  fp32 otherwise (oracle parity).
    cdt = dtype if fast_roll else jnp.float32
    u1 = _up1_planes(x, W["up1"], W["up1bm"], valid, dtype, cdt)
    c1 = (conv(u1, 96, 1, W["c11"], left, right, dtype) + hg1).astype(cdt)
    st1 = _gn_stats(c1, 64, 4, valid, 4, S)
    h1 = _group_norm_relu(c1, 64, 4, W["gn11g"], W["gn11b"], valid, 4, st1, S)
    c2 = conv(h1, 64, 1, W["c12"], left, right, dtype).astype(cdt)
    st2 = _gn_stats(c2, 64, 4, valid, 4, S)
    h2 = _group_norm_relu(c2, 64, 4, W["gn12g"], W["gn12b"], valid, 4, st2, S)

    planes1 = [h2[p * 64:(p + 1) * 64].astype(dtype) for p in range(4)]
    u2 = _up2_planes(planes1, W["up2"], W["up2bm"], valid, dtype, cdt)
    c3 = (conv(u2, 48, 2, W["c21"], left, right, dtype) + hg2).astype(cdt)
    st3 = _gn_stats(c3, 32, 16, valid, 2, S)
    h3 = _group_norm_relu(c3, 32, 16, W["gn21g"], W["gn21b"], valid, 2, st3, S)
    c4 = conv(h3, 32, 2, W["c22"], left, right, dtype).astype(cdt)
    st4 = _gn_stats(c4, 32, 16, valid, 2, S)
    h4 = _group_norm_relu(c4, 32, 16, W["gn22g"], W["gn22b"], valid, 2, st4, S)

    if _ABLATE == "nohead":
        out = h4[:16]
    else:
        out = _phased_conv_grouped(h4, 32, 2, W["hw"], left, right, dtype,
                                   fast_roll=fast_roll, allp=True) + W["hb"][:]
    if keep:
        return out, (u1, c1, st1, h1, c2, st2, h2, u2, c3, st3, h3, c4, st4, h4)
    return out


_W_KEYS = ("up1", "up1b", "c11", "gn11g", "gn11b", "c12", "gn12g", "gn12b",
           "up2", "up2b", "c21", "gn21g", "gn21b", "c22", "gn22g", "gn22b",
           "hw", "hb")


def _load_weights(refs):
    """Weight refs -> dict; matmul weight tensors loaded, (C,1) columns kept
    as refs (loaded lazily where used)."""
    W = dict(zip(_W_KEYS, refs))
    for k in ("up1", "up2", "c11", "c12", "c21", "c22", "hw"):
        W[k] = W[k][:]
    return W


def _kernel(x_ref, hg1_ref, hg2_ref, *rest, dtype, slabs: int,
            fast_roll: bool = False):
    # slabs are processed as an unrolled loop of L-wide bodies: the
    # lane-concatenated alternative (S slabs on the lane axis, one S*L-wide
    # body) was built and measured SLOWER at every S (31-35 ms vs 26.6 ms at
    # eval shapes) — the input concat + per-image guidance tiling to S*L
    # cost more VPU copies than the wider matmul N saved.
    refs, o_ref = rest[:-1], rest[-1]
    masks = _lane_masks()
    W = _load_weights(refs)
    _add_masked_up_biases(W, masks[0], dtype if fast_roll else jnp.float32)
    # unrolled on purpose: a fori body with dynamic x_ref[s] indexing was
    # measured SLOWER at every S (4.65/4.50/4.46 ms at S=2/6/25 vs 4.31
    # unrolled, B=2 eval dims, r5) — dynamic-slice blocks cost more than the
    # grid-step overhead they avoid
    for s in range(slabs):
        out = _slab_forward(x_ref[s], hg1_ref[0].astype(jnp.float32),
                            hg2_ref[0].astype(jnp.float32), W, masks, dtype,
                            fast_roll=fast_roll)
        o_ref[s] = out.astype(o_ref.dtype)


# ----------------------------------------------------------------- backward


def _conv_bwd(dY, X, wt, cin: int, cout: int, depth: int, masks, dtype):
    """Backward of _phased_conv.  dY (P*cout, L) fp32, X (P*cin, L) fp32
    pre-conv input, wt = _conv_w_mat_T weights (cin, 9*cout).

    Returns (dX (P*cin, L) fp32, dW (cout, 9*cin) fp32).  The input gradient
    is itself a phased 3x3 conv (flipped taps / transposed channels) so it
    reuses the forward machinery; the weight gradient contracts each output
    plane against its im2col stack over the lane dim.
    """
    valid, left, right = masks
    dYm = jnp.where(valid, dY, 0.0)
    dX = _phased_conv(dYm, cout, depth, wt, left, right, dtype)
    P = (1 << depth) ** 2
    # saved activations may be bf16 (the forward's GN-chain carrier);
    # _phased_xcols' plain path rolls with pltpu.roll, which is 32-bit only
    xcols = _phased_xcols(X.astype(jnp.float32), cin, depth, left, right, dtype)
    dW = jnp.float32(0.0)
    for p in range(P):
        dYp = dYm[p * cout:(p + 1) * cout].astype(dtype)
        dW = dW + jax.lax.dot_general(
            dYp, xcols[p], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return dX, dW


def _plane_bias_grad(d, C: int, P: int):
    """(P*C, L) fp32 -> (C, 1): per-channel sums across planes and lanes."""
    acc = None
    for p in range(P):
        rows = jnp.sum(d[p * C:(p + 1) * C], axis=1, keepdims=True)
        acc = rows if acc is None else acc + rows
    return acc


def _bwd_kernel(x_ref, hg1_ref, hg2_ref, do_ref, *rest, dtype, t_steps: int,
                fast_roll: bool = False):
    (refs, dx_ref, dhg1_ref, dhg2_ref,
     dup1_ref, dup1b_ref, dc11_ref, dgn11g_ref, dgn11b_ref,
     dc12_ref, dgn12g_ref, dgn12b_ref,
     dup2_ref, dup2b_ref, dc21_ref, dgn21g_ref, dgn21b_ref,
     dc22_ref, dgn22g_ref, dgn22b_ref,
     dhw_ref, dhb_ref) = rest[:-21], *rest[-21:]
    masks = _lane_masks()
    valid, left, right = masks
    f32 = jnp.float32
    W = _load_weights(refs[:len(_W_KEYS)])
    # transposed-conv weights for the input gradients (precomputed outside)
    wt11, wt12, wt21, wt22, wth = (r[:] for r in refs[len(_W_KEYS):])

    _add_masked_up_biases(W, valid, dtype if fast_roll else jnp.float32)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init_weight_grads():
        for r in (dup1_ref, dup1b_ref, dc11_ref, dgn11g_ref, dgn11b_ref,
                  dc12_ref, dgn12g_ref, dgn12b_ref, dup2_ref, dup2b_ref,
                  dc21_ref, dgn21g_ref, dgn21b_ref, dc22_ref, dgn22g_ref,
                  dgn22b_ref, dhw_ref, dhb_ref):
            r[:] = jnp.zeros_like(r)

    @pl.when(i % t_steps == 0)
    def _init_image_grads():
        dhg1_ref[0] = jnp.zeros_like(dhg1_ref[0])
        dhg2_ref[0] = jnp.zeros_like(dhg2_ref[0])

    x = x_ref[0]
    hg1 = hg1_ref[0].astype(f32)
    hg2 = hg2_ref[0].astype(f32)
    _, saved = _slab_forward(x, hg1, hg2, W, masks, dtype, keep=True,
                             fast_roll=fast_roll)
    (u1, c1, st1, h1, c2, st2, h2, u2, c3, st3, h3, c4, st4, h4) = saved

    dout = jnp.where(valid, do_ref[0].astype(f32), 0.0)   # (16, L)
    dhb_ref[:] += jnp.sum(dout)

    # head
    dh4, dhw = _conv_bwd(dout, h4, wth, 32, 1, 2, masks, dtype)
    dhw_ref[:] += dhw
    # stage-2 conv2 + GN
    dc4, dg, db = _gn_relu_bwd(dh4, c4, st4, W["gn22g"], W["gn22b"], valid, 32, 16, 2)
    dgn22g_ref[:] += dg
    dgn22b_ref[:] += db
    dh3, dw = _conv_bwd(dc4, h3, wt22, 32, 32, 2, masks, dtype)
    dc22_ref[:] += dw
    # stage-2 conv1 + GN (+ guidance)
    dc3, dg, db = _gn_relu_bwd(dh3, c3, st3, W["gn21g"], W["gn21b"], valid, 32, 16, 2)
    dgn21g_ref[:] += dg
    dgn21b_ref[:] += db
    dhg2_ref[0] += dc3.astype(dhg2_ref.dtype)
    du2, dw = _conv_bwd(dc3, u2, wt21, 48, 32, 2, masks, dtype)
    dc21_ref[:] += dw
    du2 = jnp.where(valid, du2, 0.0)
    dup2b_ref[:] += _plane_bias_grad(du2, 48, 16)
    # up2: dh2 (stage-1 output grad) + dup2 weights.  Each depth-2 plane i2
    # is up2[w] @ planes1[src]; its grad flows back as up2[w]^T @ du2_plane
    # (contract the ConvT's 48 output channels) into stage-1 plane src.
    planes1 = [h2[p * 64:(p + 1) * 64].astype(dtype) for p in range(4)]
    dh2p = [jnp.float32(0.0)] * 4
    dup2_acc = [jnp.float32(0.0)] * 4
    for i2, (w_idx, src) in enumerate(_UP2_MAP):
        dpl = du2[i2 * 48:(i2 + 1) * 48].astype(dtype)
        dh2p[src] = dh2p[src] + jax.lax.dot_general(
            W["up2"][w_idx].astype(dtype), dpl, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        dup2_acc[w_idx] = dup2_acc[w_idx] + jax.lax.dot_general(
            dpl, planes1[src], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
    dh2_all = jnp.concatenate(dh2p, axis=0)       # (4*64, L)
    for w_idx in range(4):
        dup2_ref[w_idx] += dup2_acc[w_idx]

    # stage-1 conv2 + GN
    dc2, dg, db = _gn_relu_bwd(dh2_all, c2, st2, W["gn12g"], W["gn12b"], valid, 64, 4, 4)
    dgn12g_ref[:] += dg
    dgn12b_ref[:] += db
    dh1, dw = _conv_bwd(dc2, h1, wt12, 64, 64, 1, masks, dtype)
    dc12_ref[:] += dw
    # stage-1 conv1 + GN (+ guidance)
    dc1, dg, db = _gn_relu_bwd(dh1, c1, st1, W["gn11g"], W["gn11b"], valid, 64, 4, 4)
    dgn11g_ref[:] += dg
    dgn11b_ref[:] += db
    dhg1_ref[0] += dc1.astype(dhg1_ref.dtype)
    du1, dw = _conv_bwd(dc1, u1, wt11, 96, 64, 1, masks, dtype)
    dc11_ref[:] += dw
    du1 = jnp.where(valid, du1, 0.0)
    dup1b_ref[:] += _plane_bias_grad(du1, 96, 4)
    # up1: dx + dup1 weights
    dx = jnp.float32(0.0)
    for p in range(4):
        dpl = du1[p * 96:(p + 1) * 96].astype(dtype)
        dx = dx + jax.lax.dot_general(
            W["up1"][p].astype(dtype), dpl, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)
        dup1_ref[p] += jax.lax.dot_general(
            dpl, x.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ------------------------------------------------------------------ driver


def _xla_reference(x, g1, g2, d1, d2, head, B, T):
    from ..core.aggregator import _up_tail

    h = _up_tail(x, (g1,) if g1 is not None else (), d1, None, B, T)
    return _up_tail(h, (g2,) if g2 is not None else (), d2, head, B, T)


def _prep_guidance_w(wg, g, depth: int, dtype):
    """conv1's per-image guidance half as phased fp32 planes (differentiable
    in both the guidance slice of conv1_w and the guidance tensor)."""
    from ..ops.conv import conv2d

    hg = conv2d(g.astype(dtype), wg, None, padding=1)     # (B, H, W, mid)
    return to_planes(hg.astype(jnp.float32), depth)       # (B, P*mid, L)


def _prep_guidance(dp, g, depth: int, T: int, cup: int, dtype):
    """Per-image guidance half of conv1 as phased planes, broadcast over the
    class axis at the kernel's index_map (not here)."""
    cg = g.shape[-1]
    return _prep_guidance_w(dp["conv1_w"][:, :, cup:cup + cg], g, depth, dtype)


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
    # (conv1/conv2 are bias-free in the reference DoubleConv, model.py:523-531)
    wops, wspecs = _weight_operands(d1, d2, head, dtype)

    # Slabs per grid step: amortizes per-step DMA/dispatch overhead.  S must
    # divide T so a step never spans two images (the hg blocks are per-image).
    # Capped at 2: the body is unrolled per slab and Mosaic compile time
    # grows superlinearly with it (S=5 took >20 min on the v5e).
    S = next(s for s in (2, 1) if T % s == 0 and N % s == 0)
    interpret = jax.default_backend() != "tpu"
    # bf16 lane rolls via int32 sublane-pair bitcast: compiled Mosaic only
    # (interpret mode and fp32 keep the roll-then-cast path)
    fast_roll = (not interpret) and dtype == jnp.bfloat16
    kernel = functools.partial(_kernel, dtype=dtype, slabs=S,
                               fast_roll=fast_roll)
    TS = T // S

    out = pl.pallas_call(
        kernel,
        grid=(N // S,),
        in_specs=[
            pl.BlockSpec((S, 128, L), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 4 * 64, L), lambda i: (i // TS, 0, 0)),
            pl.BlockSpec((1, 16 * 32, L), lambda i: (i // TS, 0, 0)),
        ] + wspecs,
        out_specs=pl.BlockSpec((S, 16, L), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 16, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, hg1, hg2, *wops)

    return from_planes(out, 2)[..., 0]


def _fused_fwd(x, g1, g2, d1, d2, head, B, T):
    return fused_decoder(x, g1, g2, d1, d2, head, B, T), (x, g1, g2, d1, d2, head)


def _weight_operands(d1, d2, head, dtype):
    """Shared fwd/bwd weight operand list in _W_KEYS order (+ specs).

    Conv weights ship in the grouped block form (_conv_w_grouped) consumed by
    _phased_conv_grouped — both the forward kernel and the backward's
    recompute sweep run the grouped convs."""
    col = lambda v: v.reshape(-1, 1).astype(jnp.float32)
    cup1 = d1["up_w"].shape[-1]
    cup2 = d2["up_w"].shape[-1]
    grp = lambda w, cin, depth: _conv_w_grouped(_conv_w_mat(w), cin, depth).astype(dtype)
    ops = [
        _up_w_planes(d1["up_w"]).astype(dtype), col(d1["up_b"]),
        grp(d1["conv1_w"][:, :, :cup1], cup1, 1),
        col(d1["gn1"]["g"]), col(d1["gn1"]["b"]),
        grp(d1["conv2_w"], 64, 1),
        col(d1["gn2"]["g"]), col(d1["gn2"]["b"]),
        _up_w_planes(d2["up_w"]).astype(dtype), col(d2["up_b"]),
        grp(d2["conv1_w"][:, :, :cup2], cup2, 2),
        col(d2["gn1"]["g"]), col(d2["gn1"]["b"]),
        grp(d2["conv2_w"], 32, 2),
        col(d2["gn2"]["g"]), col(d2["gn2"]["b"]),
        _conv_w_grouped(_conv_w_mat(head["w"]), 32, 2, allp=True).astype(dtype),
        col(head["b"]),
    ]
    specs = [pl.BlockSpec(o.shape, (lambda nd: (lambda i: (0,) * nd))(o.ndim))
             for o in ops]
    return ops, specs


def _fused_bwd(B, T, res, gout):
    """Analytic backward: one reverse-sweep Pallas kernel per slab.

    Recomputes the forward in VMEM, reverses every stage (input-gradient
    convs reuse the phased-conv machinery with flipped/transposed weights),
    and accumulates weight gradients across grid steps.
    """
    x, g1, g2, d1, d2, head = res
    N = x.shape[0]
    dtype = x.dtype
    cup1 = d1["up_w"].shape[-1]
    cup2 = d2["up_w"].shape[-1]

    xp = to_planes(x, 0)
    prep1 = lambda wg, g: _prep_guidance_w(wg, g, 1, dtype)
    prep2 = lambda wg, g: _prep_guidance_w(wg, g, 2, dtype)
    wg1 = d1["conv1_w"][:, :, cup1:]
    wg2 = d2["conv1_w"][:, :, cup2:]
    hg1, vjp_hg1 = jax.vjp(prep1, wg1, g1)
    hg2, vjp_hg2 = jax.vjp(prep2, wg2, g2)
    dop = to_planes(gout[..., None].astype(jnp.float32), 2)   # (N, 16, L)

    wops, wspecs = _weight_operands(d1, d2, head, dtype)
    wt_ops = [
        _conv_w_mat_T(d1["conv1_w"][:, :, :cup1]).astype(dtype),
        _conv_w_mat_T(d1["conv2_w"]).astype(dtype),
        _conv_w_mat_T(d2["conv1_w"][:, :, :cup2]).astype(dtype),
        _conv_w_mat_T(d2["conv2_w"]).astype(dtype),
        _conv_w_mat_T(head["w"]).astype(dtype),
    ]
    wt_specs = [pl.BlockSpec(o.shape, lambda i: (0, 0)) for o in wt_ops]

    f32 = jnp.float32
    out_shapes = [
        jax.ShapeDtypeStruct((N, 128, L), f32),           # dx
        jax.ShapeDtypeStruct((g1.shape[0], 4 * 64, L), f32),   # dhg1
        jax.ShapeDtypeStruct((g2.shape[0], 16 * 32, L), f32),  # dhg2
        jax.ShapeDtypeStruct((4, cup1, 128), f32),        # dup1
        jax.ShapeDtypeStruct((cup1, 1), f32),             # dup1b
        jax.ShapeDtypeStruct((64, 9 * cup1), f32),        # dc11
        jax.ShapeDtypeStruct((64, 1), f32),               # dgn11g
        jax.ShapeDtypeStruct((64, 1), f32),
        jax.ShapeDtypeStruct((64, 9 * 64), f32),          # dc12
        jax.ShapeDtypeStruct((64, 1), f32),
        jax.ShapeDtypeStruct((64, 1), f32),
        jax.ShapeDtypeStruct((4, cup2, 64), f32),         # dup2
        jax.ShapeDtypeStruct((cup2, 1), f32),
        jax.ShapeDtypeStruct((32, 9 * cup2), f32),        # dc21
        jax.ShapeDtypeStruct((32, 1), f32),
        jax.ShapeDtypeStruct((32, 1), f32),
        jax.ShapeDtypeStruct((32, 9 * 32), f32),          # dc22
        jax.ShapeDtypeStruct((32, 1), f32),
        jax.ShapeDtypeStruct((32, 1), f32),
        jax.ShapeDtypeStruct((1, 9 * 32), f32),           # dhw
        jax.ShapeDtypeStruct((1, 1), f32),                # dhb
    ]
    const_out = lambda o: pl.BlockSpec(
        o.shape, (lambda nd: (lambda i: (0,) * nd))(len(o.shape)))
    out_specs = [pl.BlockSpec((1, 128, L), lambda i: (i, 0, 0)),
                 pl.BlockSpec((1, 4 * 64, L), lambda i: (i // T, 0, 0)),
                 pl.BlockSpec((1, 16 * 32, L), lambda i: (i // T, 0, 0))]
    out_specs += [const_out(o) for o in out_shapes[3:]]

    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_bwd_kernel, dtype=dtype, t_steps=T,
                               fast_roll=(not interpret) and dtype == jnp.bfloat16)
    outs = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 128, L), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 4 * 64, L), lambda i: (i // T, 0, 0)),
            pl.BlockSpec((1, 16 * 32, L), lambda i: (i // T, 0, 0)),
            pl.BlockSpec((1, 16, L), lambda i: (i, 0, 0)),
        ] + wspecs + wt_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, hg1, hg2, dop, *wops, *wt_ops)

    (dxp, dhg1, dhg2, dup1, dup1b, dc11, dgn11g, dgn11b, dc12, dgn12g,
     dgn12b, dup2, dup2b, dc21, dgn21g, dgn21b, dc22, dgn22g, dgn22b,
     dhw, dhb) = outs

    dx = from_planes(dxp, 0).astype(x.dtype)
    dwg1, dg1 = vjp_hg1(dhg1)
    dwg2, dg2 = vjp_hg2(dhg2)

    unup = lambda d: d.reshape(2, 2, d.shape[1], d.shape[2]).transpose(3, 0, 1, 2)
    dd1 = {
        "up_w": unup(dup1), "up_b": dup1b.reshape(-1),
        "conv1_w": jnp.concatenate([_conv_w_mat_inv(dc11, cup1), dwg1], axis=2),
        "conv2_w": _conv_w_mat_inv(dc12, 64),
        "gn1": {"g": dgn11g.reshape(-1), "b": dgn11b.reshape(-1)},
        "gn2": {"g": dgn12g.reshape(-1), "b": dgn12b.reshape(-1)},
    }
    dd2 = {
        "up_w": unup(dup2), "up_b": dup2b.reshape(-1),
        "conv1_w": jnp.concatenate([_conv_w_mat_inv(dc21, cup2), dwg2], axis=2),
        "conv2_w": _conv_w_mat_inv(dc22, 32),
        "gn1": {"g": dgn21g.reshape(-1), "b": dgn21b.reshape(-1)},
        "gn2": {"g": dgn22g.reshape(-1), "b": dgn22b.reshape(-1)},
    }
    dhead = {"w": _conv_w_mat_inv(dhw, 32), "b": dhb.reshape(-1)}
    dd1 = jax.tree.map(lambda a, b: a.astype(b.dtype), dd1, d1)
    dd2 = jax.tree.map(lambda a, b: a.astype(b.dtype), dd2, d2)
    dhead = jax.tree.map(lambda a, b: a.astype(b.dtype), dhead, head)
    return dx, dg1.astype(g1.dtype), dg2.astype(g2.dtype), dd1, dd2, dhead


fused_decoder.defvjp(_fused_fwd, _fused_bwd)


def decoder_kernel_applicable(x, d1, d2) -> bool:
    """Kernel geometry: 24^2 base, decoder dims (96, 64) / (48, 32)."""
    return (x.shape[1] == BASE and x.shape[2] == BASE and x.shape[3] == 128
            and d1["up_w"].shape[-1] == 96 and d1["conv1_w"].shape[-1] == 64
            and d2["up_w"].shape[-1] == 48 and d2["conv1_w"].shape[-1] == 32)
