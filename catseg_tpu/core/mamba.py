"""MambaIR-style 2D selective-scan (SS2D / VSSBlock).

The reference vendors MambaIR's VSS blocks (cat_seg/mambaIR.py; dead code in
the fork — imported nowhere active, SURVEY.md §2.4 — but part of its research
surface).  The reference relies on the CUDA ``mamba_ssm`` selective-scan
kernel; here the linear SSM recurrence h_t = exp(Δ_t A) h_{t-1} + Δ_t B_t x_t
runs as a ``jax.lax.associative_scan`` over the sequence axis — the
TPU-idiomatic O(log L)-depth formulation.

SS2D (mambaIR.py:105-277): in-proj to 2x inner, depthwise conv + SiLU, four
scan directions (row-major, column-major, and both reversed), shared
per-direction x/dt projections, sum of direction outputs, LayerNorm, SiLU(z)
gate, out-proj.  VSSBlock (mambaIR.py:280-309): LN -> SS2D with skip scale,
LN -> CAB conv-attention block with a second skip scale.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import layer_norm


@dataclasses.dataclass(frozen=True)
class SS2DConfig:
    d_model: int
    d_state: int = 16
    expand: float = 2.0
    d_conv: int = 3

    @property
    def d_inner(self) -> int:
        return int(self.expand * self.d_model)

    @property
    def dt_rank(self) -> int:
        return math.ceil(self.d_model / 16)


def selective_scan(xs, dts, A, Bs, Cs, D, delta_bias):
    """Mamba selective scan via associative_scan.

    xs/dts: (B, D', L); A: (D', N); Bs/Cs: (B, G, N, L) with D' = G*Dg;
    D: (D',); delta_bias: (D',).  Returns (B, D', L) fp32.
    """
    Bsz, Dp, L = xs.shape
    G = Bs.shape[1]
    Dg = Dp // G
    delta = jax.nn.softplus(dts.astype(jnp.float32) + delta_bias[None, :, None])
    deltaA = jnp.exp(delta[..., None] * A[None, :, None, :])  # (B, D', L, N)
    Bs_e = jnp.repeat(Bs, Dg, axis=1).transpose(0, 1, 3, 2)  # (B, D', L, N)
    deltaBu = delta[..., None] * Bs_e * xs.astype(jnp.float32)[..., None]

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (deltaA, deltaBu), axis=2)
    Cs_e = jnp.repeat(Cs, Dg, axis=1).transpose(0, 1, 3, 2)  # (B, D', L, N)
    y = jnp.sum(h * Cs_e, axis=-1)  # (B, D', L)
    return y + D[None, :, None] * xs.astype(jnp.float32)


def _depthwise_conv(x, w, b, pad):
    """(B, H, W, C) depthwise conv (groups == C)."""
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    return out + b


def ss2d_forward(p: dict, x: jnp.ndarray, cfg: SS2DConfig) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, C) (mambaIR.py:261-277)."""
    B, H, W, C = x.shape
    L = H * W
    Din = cfg.d_inner
    xz = x @ p["in_proj_w"]
    xs, z = xz[..., :Din], xz[..., Din:]
    xs = _depthwise_conv(xs, p["conv_w"], p["conv_b"], (cfg.d_conv - 1) // 2)
    xs = jax.nn.silu(xs)

    # four scan directions (mambaIR.py:230-236): rows, columns, and reversals
    x_flat = xs.reshape(B, L, Din).transpose(0, 2, 1)  # (B, Din, L) row-major
    x_t = xs.transpose(0, 2, 1, 3).reshape(B, L, Din).transpose(0, 2, 1)  # column-major
    x4 = jnp.stack([x_flat, x_t, x_flat[..., ::-1], x_t[..., ::-1]], axis=1)  # (B, 4, Din, L)

    x_dbl = jnp.einsum("bkdl,kcd->bkcl", x4, p["x_proj_w"])
    dt, Bs, Cs = jnp.split(x_dbl, [cfg.dt_rank, cfg.dt_rank + cfg.d_state], axis=2)
    dt = jnp.einsum("bkrl,kdr->bkdl", dt, p["dt_proj_w"])

    K = 4
    xs_f = x4.reshape(B, K * Din, L)
    dt_f = dt.reshape(B, K * Din, L)
    A = -jnp.exp(p["A_log"].astype(jnp.float32)).reshape(K * Din, cfg.d_state)
    out = selective_scan(xs_f, dt_f, A, Bs, Cs, p["D"].reshape(-1), p["dt_proj_b"].reshape(-1))
    out = out.reshape(B, K, Din, L)

    y1 = out[:, 0]
    inv = out[:, 2:4][..., ::-1]
    y3 = inv[:, 0]
    y2 = out[:, 1].reshape(B, Din, W, H).transpose(0, 1, 3, 2).reshape(B, Din, L)
    y4 = inv[:, 1].reshape(B, Din, W, H).transpose(0, 1, 3, 2).reshape(B, Din, L)
    y = (y1 + y2 + y3 + y4).transpose(0, 2, 1).reshape(B, H, W, Din)
    y = layer_norm(y.astype(x.dtype), p["out_norm"]["g"], p["out_norm"]["b"])
    y = y * jax.nn.silu(z)
    return y @ p["out_proj_w"]


def vss_block_forward(p: dict, x: jnp.ndarray, cfg: SS2DConfig) -> jnp.ndarray:
    """(B, H, W, C) VSSBlock (mambaIR.py:301-309)."""
    h = layer_norm(x, p["ln_1"]["g"], p["ln_1"]["b"], eps=1e-6)
    x = x * p["skip_scale"] + ss2d_forward(p["ss2d"], h, cfg)
    h = layer_norm(x, p["ln_2"]["g"], p["ln_2"]["b"])
    # CAB: conv3x3 -> GELU -> conv3x3 -> channel attention (mambaIR.py:17-50)
    from ..ops.conv import conv2d

    c = conv2d(h, p["cab_conv1_w"], p["cab_conv1_b"], padding=1)
    c = jax.nn.gelu(c, approximate=False)
    c = conv2d(c, p["cab_conv2_w"], p["cab_conv2_b"], padding=1)
    att = jnp.mean(c, axis=(1, 2), keepdims=True)
    att = att @ p["ca_fc1_w"] + p["ca_fc1_b"]
    att = jax.nn.relu(att) @ p["ca_fc2_w"] + p["ca_fc2_b"]
    c = c * jax.nn.sigmoid(att)
    return x * p["skip_scale2"] + c


def init_vss_block(rng, cfg: SS2DConfig, compress_ratio: int = 3, squeeze: int = 30) -> dict:
    C = cfg.d_model
    Din = cfg.d_inner
    N = cfg.d_state
    R = cfg.dt_rank
    ks = iter(jax.random.split(rng, 16))

    def r(*s, scale=0.02):
        return jax.random.normal(next(ks), s) * scale

    A = jnp.tile(jnp.arange(1, N + 1, dtype=jnp.float32)[None], (Din, 1))
    ss2d = {
        "in_proj_w": r(C, 2 * Din),
        "conv_w": r(cfg.d_conv, cfg.d_conv, 1, Din),
        "conv_b": jnp.zeros(Din),
        "x_proj_w": r(4, R + 2 * N, Din),
        "dt_proj_w": r(4, Din, R, scale=R**-0.5),
        "dt_proj_b": jnp.log(jnp.expm1(jnp.full((4, Din), 1e-2))),  # mamba dt init
        "A_log": jnp.log(jnp.tile(A[None], (4, 1, 1))),
        "D": jnp.ones((4, Din)),
        "out_norm": {"g": jnp.ones(Din), "b": jnp.zeros(Din)},
        "out_proj_w": r(Din, C),
    }
    mid = C // compress_ratio
    return {
        "ln_1": {"g": jnp.ones(C), "b": jnp.zeros(C)},
        "ss2d": ss2d,
        "skip_scale": jnp.ones(C),
        "ln_2": {"g": jnp.ones(C), "b": jnp.zeros(C)},
        "skip_scale2": jnp.ones(C),
        "cab_conv1_w": r(3, 3, C, mid),
        "cab_conv1_b": jnp.zeros(mid),
        "cab_conv2_w": r(3, 3, mid, C),
        "cab_conv2_b": jnp.zeros(C),
        "ca_fc1_w": r(C, max(C // squeeze, 1)),
        "ca_fc1_b": jnp.zeros(max(C // squeeze, 1)),
        "ca_fc2_w": r(max(C // squeeze, 1), C),
        "ca_fc2_b": jnp.zeros(C),
    }
