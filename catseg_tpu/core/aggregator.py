"""Cost-volume aggregation: correlation, spatial (Swin) and class attention,
and the guidance-conditioned upsampling decoder.

TPU-first re-design of the reference Aggregator
(cat_seg/modeling/transformer/model.py:558-725):

- Activations live in channels-last layouts; the per-class batch (B*T) is the
  leading dim so every stage is one large MXU-friendly batch.
- The class-attention stage always runs at a *static* pad_len tokens: classes
  are either top-k truncated (T > pad_len, model.py:694-702) before entry or
  padded with the learnable padding token (model.py:397-410) — so XLA
  compiles exactly one shape per benchmark.
- Swin shift masks and window partitions are trace-time constants.
- Linear class attention (elu+1 kernel, model.py:260-286) keeps the class
  axis O(T); its KV/K-sum contractions are also the natural cut points for
  class-axis model parallelism (see catseg_tpu.parallel).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import CATSegConfig
from ..ops import (
    avg_pool2d,
    conv2d,
    conv_transpose2d_nonoverlap,
    group_norm,
    layer_norm,
    resize_bilinear,
    window_partition,
    window_reverse,
)


def _linear(x, w, b=None):
    y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def correlation(img_feats: jnp.ndarray, text_feats: jnp.ndarray) -> jnp.ndarray:
    """Cosine cost volume (model.py:648-652).

    img_feats: (B, H, W, C); text_feats: (B, T, P, C) -> (B, T, H, W, P).
    """
    img = l2_normalize(img_feats, axis=-1)
    txt = l2_normalize(text_feats, axis=-1)
    return jnp.einsum("bhwc,btpc->bthwp", img, txt, preferred_element_type=jnp.float32).astype(img.dtype)


def topk_classes(corr: jnp.ndarray, pad_len: int) -> jnp.ndarray:
    """Select the pad_len highest-scoring classes by max corr over (H, W, P)
    (model.py:694-696).  Returns (B, pad_len) int32 indices."""
    scores = jnp.max(corr.astype(jnp.float32), axis=(2, 3, 4))  # (B, T)
    _, idx = jax.lax.top_k(scores, pad_len)
    return idx


def gather_classes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the class axis (axis=1) with per-batch indices."""
    expand = (slice(None), slice(None)) + (None,) * (x.ndim - 2)
    return jnp.take_along_axis(x, idx[expand], axis=1)


def scatter_full_logits(logits: jnp.ndarray, idx: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Scatter (B, pad_len, H, W) back into (B, T, H, W) filled with -100
    (model.py:721-724)."""
    B, _, H, W = logits.shape
    out = jnp.full((B, num_classes, H, W), -100.0, dtype=logits.dtype)
    return out.at[jnp.arange(B)[:, None], idx].set(logits)


# ------------------------------------------------------------------ swin


@functools.lru_cache(maxsize=None)
def _shift_mask_ids(H: int, W: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, N) region ids per window token (model.py:161-175)."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    nh, nw = H // window, W // window
    return (img.reshape(nh, window, nw, window).transpose(0, 2, 1, 3)
            .reshape(-1, window * window).astype(np.int8))


def _shift_mask(H: int, W: int, window: int, shift: int) -> jnp.ndarray:
    """Additive (num_windows, N, N) mask for shifted-window attention
    (model.py:161-179), expanded IN-GRAPH from the (nW, N) region-id rows —
    a dense (4, 144, 144) f32 literal costs ~330 KB of serialized HLO per
    instance and the tunneled remote-compile endpoint caps request size."""
    ids = jnp.asarray(_shift_mask_ids(H, W, window, shift))
    return jnp.where(ids[:, None, :] != ids[:, :, None], -100.0, 0.0).astype(jnp.float32)


def _swin_block(
    x: jnp.ndarray,
    guidance: jnp.ndarray | None,
    bp: dict,
    cfg: CATSegConfig,
    shift: int,
) -> jnp.ndarray:
    """One Swin block over (B, T, H, W, C) with guidance on q/k (model.py:185-225).

    The reference concatenates guidance onto q/k inputs per (B*T) sequence
    (model.py:94-96, 193-195).  Since ``linear(concat(x, g)) == linear_x(x) +
    linear_g(g)`` and the guidance is identical across the T classes, we
    compute the guidance half of the q/k projections once per *image* and
    broadcast — cutting the projection FLOPs roughly in half at T=150 and
    eliminating the (B*T, H, W, C+Cg) concat buffer entirely.
    """
    B, T, H, W, C = x.shape
    window = cfg.window_size
    heads = cfg.num_heads
    D = C // heads
    mask = _shift_mask(H, W, window, shift) if shift > 0 else None

    shortcut = x
    x = layer_norm(x, bp["norm1"]["g"], bp["norm1"]["b"])

    def _shift_part(t, n_batch):
        if shift > 0:
            t = jnp.roll(t, (-shift, -shift), axis=(1, 2))
        return window_partition(t, window).reshape(n_batch, -1, window * window, t.shape[-1])

    xw = _shift_part(x.reshape(B * T, H, W, C), B * T)  # (BT, nW, N, C)
    nW, N = xw.shape[1], xw.shape[2]

    # q/k/v all read the same windowed tokens -> one fused gemm
    qkv_w = jnp.concatenate([bp["q_w"][:C], bp["k_w"][:C], bp["v_w"]], axis=1)
    qkv_b = jnp.concatenate([bp["q_b"], bp["k_b"], bp["v_b"]])
    qkv = _linear(xw, qkv_w, qkv_b)
    q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
    if guidance is not None:
        gw = _shift_part(guidance, B)  # (B, nW, N, Cg)
        qg = _linear(gw, bp["q_w"][C:])  # bias already added via x-part
        kg = _linear(gw, bp["k_w"][C:])
        q = (q.reshape(B, T, nW, N, C) + qg[:, None]).reshape(B * T, nW, N, C)
        k = (k.reshape(B, T, nW, N, C) + kg[:, None]).reshape(B * T, nW, N, C)

    from ..kernels import fused_window_attention

    add_mask = mask if mask is not None else jnp.zeros((nW, N, N), dtype=jnp.float32)
    out = fused_window_attention(
        q.reshape(-1, N, C),
        k.reshape(-1, N, C),
        v.reshape(-1, N, C),
        jnp.asarray(add_mask),
        cfg.num_heads,
        D**-0.5,
    )
    out = _linear(out, bp["proj_w"], bp["proj_b"])

    out = window_reverse(out.reshape(B * T * nW, N, C), window, H, W)
    if shift > 0:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    x = shortcut + out.reshape(B, T, H, W, C)
    y = layer_norm(x, bp["norm2"]["g"], bp["norm2"]["b"])
    from ..kernels.mlp import fused_mlp

    return x + fused_mlp(y, bp["fc1_w"], bp["fc1_b"], bp["fc2_w"], bp["fc2_b"], "gelu")


def spatial_aggregation(
    x: jnp.ndarray,
    appearance_guidance: jnp.ndarray | None,
    layer: dict,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """Swin pair (shift 0 then window/2) on the (B*T) spatial batch
    (model.py:228-253).  x: (B, T, H, W, C); guidance: (B, H, W, Cg)."""
    guid = None
    if appearance_guidance is not None:
        guid = layer_norm(appearance_guidance, layer["guidance_norm"]["g"], layer["guidance_norm"]["b"])

    from ..parallel.mesh import mesh_divides, shard_kernel

    B, T, H, W, C = x.shape
    win = cfg.window_size
    if (C % 128 == 0 and H % win == 0 and W % win == 0 and C % cfg.num_heads == 0
            and mesh_divides(B, T)):
        # whole-pair fused kernel: one VMEM-resident (H, W, C) slab per
        # (image, class), both blocks end to end — see kernels/swin_block.py.
        # Under a mesh the dispatch enters a shard_map manual region (the
        # kernel is per-(image, class) local, so each device runs it on its
        # (B/data, T/class) slab unchanged — GSPMD never sees the opaque call)
        from ..kernels.swin_block import fused_swin_pair

        def pack(bp):
            return {
                "ln1_g": bp["norm1"]["g"], "ln1_b": bp["norm1"]["b"],
                "qkv_w": jnp.concatenate([bp["q_w"][:C], bp["k_w"][:C], bp["v_w"]], axis=1),
                "qkv_b": jnp.concatenate([bp["q_b"], bp["k_b"], bp["v_b"]]),
                "proj_w": bp["proj_w"], "proj_b": bp["proj_b"],
                "ln2_g": bp["norm2"]["g"], "ln2_b": bp["norm2"]["b"],
                "fc1_w": bp["fc1_w"], "fc1_b": bp["fc1_b"],
                "fc2_w": bp["fc2_w"], "fc2_b": bp["fc2_b"],
            }

        guid4 = None
        if guid is not None:
            b1, b2 = layer["swin1"], layer["swin2"]
            guid4 = (
                _linear(guid, b1["q_w"][C:]), _linear(guid, b1["k_w"][C:]),
                _linear(guid, b2["q_w"][C:]), _linear(guid, b2["k_w"][C:]),
            )
        mask = jnp.asarray(_shift_mask(H, W, win, win // 2))
        from jax.sharding import PartitionSpec as P

        return shard_kernel(
            lambda x, g4, p1, p2, m: fused_swin_pair(x, g4, p1, p2, m,
                                                     cfg.num_heads, win),
            x, guid4, pack(layer["swin1"]), pack(layer["swin2"]), mask,
            specs=(P("data", "class"), P("data"), P(), P(), P()),
            out_spec=P("data", "class"))

    x = _swin_block(x, guid, layer["swin1"], cfg, shift=0)
    x = _swin_block(x, guid, layer["swin2"], cfg, shift=cfg.window_size // 2)
    return x


# ---------------------------------------------------------- class attention


def _linear_attention(q, k, v, eps: float = 1e-6):
    """Kernelized attention, elu+1 feature map (model.py:260-286).

    q: (N, L, H, D); k, v: (N, S, H, D).  O(S) in the class count; the KV and
    K-sum contractions psum cleanly when the S axis is sharded.
    """
    Q = jax.nn.elu(q.astype(jnp.float32)) + 1.0
    K = jax.nn.elu(k.astype(jnp.float32)) + 1.0
    S = v.shape[1]
    v32 = v.astype(jnp.float32) / S
    KV = jnp.einsum("nshd,nshv->nhdv", K, v32)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * S
    return out.astype(q.dtype)


def _full_attention(q, k, v):
    """Softmax attention over the class axis (model.py:289-320)."""
    D = q.shape[-1]
    logits = jnp.einsum("nlhd,nshd->nlsh", q, k, preferred_element_type=jnp.float32) * (D**-0.5)
    attn = jax.nn.softmax(logits, axis=2).astype(q.dtype)
    return jnp.einsum("nlsh,nshd->nlhd", attn, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _class_attention_inner(
    x: jnp.ndarray,
    guidance: jnp.ndarray | None,
    cp: dict,
    cfg: CATSegConfig,
    n_pos: int = 1,
) -> jnp.ndarray:
    """AttentionLayer (model.py:323-354): q/k see text guidance concat, v does not.

    x: (N, T, C); guidance: (N // n_pos, T, Cg) or None — the text guidance is
    identical across the n_pos pooled spatial positions of each image, so its
    share of the q/k projections (``linear(concat) == linear_x + linear_g``)
    is computed once per (image, class) and broadcast.
    """
    heads = cfg.num_heads
    N, T, C = x.shape
    q = _linear(x, cp["q_w"][:C], cp["q_b"])
    k = _linear(x, cp["k_w"][:C], cp["k_b"])
    if guidance is not None:
        g = guidance.astype(x.dtype)
        qg = _linear(g, cp["q_w"][C:])
        kg = _linear(g, cp["k_w"][C:])
        q = (q.reshape(-1, n_pos, T, C) + qg[:, None]).reshape(N, T, C)
        k = (k.reshape(-1, n_pos, T, C) + kg[:, None]).reshape(N, T, C)
    v = _linear(x, cp["v_w"], cp["v_b"])
    if cfg.attention_type == "linear":
        from ..kernels.linear_attn import fused_linear_attention

        return fused_linear_attention(q, k, v, heads)
    if cfg.attention_type == "full":
        out = _full_attention(
            q.reshape(N, T, heads, -1), k.reshape(N, T, heads, -1), v.reshape(N, T, heads, -1)
        )
        return out.reshape(N, T, -1)
    raise NotImplementedError(cfg.attention_type)


def class_aggregation(
    x: jnp.ndarray,
    text_guidance: jnp.ndarray | None,
    layer: dict,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """ClassTransformerLayer (model.py:357-424).

    x: (B, T, H, W, C); text_guidance: (B, T, Cg).  Pools spatially, pads the
    class axis to pad_len with the learnable token, attends across classes at
    every pooled position, MLPs, upsamples back (bilinear, align_corners=True)
    and adds residually.
    """
    cp = layer["class"]
    B, T, H, W, C = x.shape
    ph, pw = cfg.pooling_size

    import os

    from ..parallel.mesh import mesh_divides, shard_kernel

    fused_ok = (cfg.attention_type == "linear" and C % 128 == 0
                and C % cfg.num_heads == 0 and mesh_divides(B)
                and H % ph == 0 and W % pw == 0
                and not os.environ.get("CATSEG_NO_PALLAS_CLASS"))
    if fused_ok:
        # Whole layer in one fused kernel; the learnable pad rows enter as
        # precomputed constant KV/Ksum terms (see kernels/class_layer.py).
        # At eval pooling (1, 1) the kernel runs on x directly; at train
        # pooling the kernel runs on the avg-pooled grid and the result is
        # bilinearly upsampled back (align_corners=True), exactly the
        # legacy composition below (model.py:357-424 semantics).
        # Under a mesh the dispatch enters a shard_map manual region with the
        # class axis GATHERED (in_spec P("data")): the attention reduces over
        # T, so each device runs the kernel on the full class list of its
        # local images — the per-layer all-gather of the (B/data, T, H, W, C)
        # slab costs far less than losing the fused path (ICI-bandwidth ~ms
        # vs the ~2x plain-XLA stage regression measured in round 3)
        from ..kernels.class_layer import fused_class_layer, pad_contributions

        Tp = max(cfg.pad_len, T) if cfg.pad_len > 0 else T
        p = {
            "ln1_g": cp["norm1"]["g"], "ln1_b": cp["norm1"]["b"],
            "q_w": cp["q_w"], "q_b": cp["q_b"],
            "k_w": cp["k_w"], "k_b": cp["k_b"],
            "v_w": cp["v_w"], "v_b": cp["v_b"],
            "ln2_g": cp["norm2"]["g"], "ln2_b": cp["norm2"]["b"],
            "mlp1_w": cp["mlp1_w"], "mlp1_b": cp["mlp1_b"],
            "mlp2_w": cp["mlp2_w"], "mlp2_b": cp["mlp2_b"],
        }
        qg = kg = None
        if text_guidance is not None:
            tg = text_guidance.astype(x.dtype)
            qg = _linear(tg, cp["q_w"][C:])
            kg = _linear(tg, cp["k_w"][C:])
        if Tp > T:
            pad_guid = cp.get("padding_guidance") if text_guidance is not None else None
            if pad_guid is not None:
                pad_guid = pad_guid.reshape(-1)
            pad_kv, pad_ksum = pad_contributions(
                cp["padding_tokens"].reshape(-1), pad_guid, p, Tp - T, Tp, cfg.num_heads)
        else:
            pad_kv = jnp.zeros((C, C), jnp.float32)
            pad_ksum = jnp.zeros((1, C), jnp.float32)
        from jax.sharding import PartitionSpec as P

        xk = x
        if (ph, pw) != (1, 1):
            xk = avg_pool2d(x.reshape(B * T, H, W, C), (ph, pw))
            Hp, Wp = xk.shape[1], xk.shape[2]
            xk = xk.reshape(B, T, Hp, Wp, C)
        out = shard_kernel(
            lambda x, qg, kg, pkv, pks, p: fused_class_layer(
                x, qg, kg, pkv, pks, p, cfg.num_heads, Tp),
            xk, qg, kg, pad_kv, pad_ksum, p,
            specs=(P("data"), P("data"), P("data"), P(), P(), P()),
            out_spec=P("data"))
        if (ph, pw) != (1, 1):
            out = resize_bilinear(
                out.reshape(B * T, *out.shape[2:]), (H, W), align_corners=True)
            out = out.reshape(B, T, H, W, C)
        return x + out

    xp = avg_pool2d(x.reshape(B * T, H, W, C), (ph, pw))
    Hp, Wp = xp.shape[1], xp.shape[2]
    xp = xp.reshape(B, T, Hp, Wp, C)

    pad = cfg.pad_len - T if cfg.pad_len > 0 else 0
    if pad > 0:
        pad_tok = jnp.broadcast_to(cp["padding_tokens"].astype(xp.dtype), (B, pad, Hp, Wp, C))
        xp = jnp.concatenate([xp, pad_tok], axis=1)
        if text_guidance is not None:
            pad_guid = jnp.broadcast_to(
                cp["padding_guidance"].astype(text_guidance.dtype), (B, pad, text_guidance.shape[-1])
            )
            text_guidance = jnp.concatenate([text_guidance, pad_guid], axis=1)
    Tp = xp.shape[1]

    # (B, Tp, Hp, Wp, C) -> (B*Hp*Wp, Tp, C); guidance stays (B, Tp, Cg)
    seq = xp.transpose(0, 2, 3, 1, 4).reshape(B * Hp * Wp, Tp, C)

    normed = layer_norm(seq, cp["norm1"]["g"], cp["norm1"]["b"])
    seq = seq + _class_attention_inner(normed, text_guidance, cp, cfg, n_pos=Hp * Wp)
    normed = layer_norm(seq, cp["norm2"]["g"], cp["norm2"]["b"])
    from ..kernels.mlp import fused_mlp

    seq = seq + fused_mlp(normed, cp["mlp1_w"], cp["mlp1_b"], cp["mlp2_w"], cp["mlp2_b"], "relu")

    out = seq.reshape(B, Hp, Wp, Tp, C).transpose(0, 3, 1, 2, 4)[:, :T]  # drop padding
    out = out.reshape(B * T, Hp, Wp, C)
    out = resize_bilinear(out, (H, W), align_corners=True)
    return x + out.reshape(B, T, H, W, C)


# ------------------------------------------------------------------ decoder


def _double_conv(x: jnp.ndarray, dp: dict, guidances: tuple = ()) -> jnp.ndarray:
    """(conv3x3 -> GroupNorm(C/16) -> ReLU) x2 (model.py:520-537).

    The reference concatenates per-image guidance channels before the first
    conv (model.py:549-555).  Since conv(concat(x, g)) == conv_x(x) +
    conv_g(g) and the guidance is identical across the T classes, the
    guidance slices of conv1 run once per *image* and broadcast — removing
    both the (B*T)-sized concat buffer and T-fold redundant guidance FLOPs.
    ``guidances``: per-image (B, H, W, Cg_i) tensors matching the channel
    slices of conv1_w after x's channels.
    """
    mid = dp["conv1_w"].shape[-1]
    Cx = x.shape[-1]
    h = conv2d(x, dp["conv1_w"][:, :, :Cx], None, padding=1)
    ofs = Cx
    for g in guidances:
        Cg = g.shape[-1]
        hg = conv2d(g.astype(x.dtype), dp["conv1_w"][:, :, ofs : ofs + Cg], None, padding=1)
        T = h.shape[0] // hg.shape[0]
        h = (h.reshape(hg.shape[0], T, *h.shape[1:]) + hg[:, None]).reshape(h.shape)
        ofs += Cg
    x = jax.nn.relu(group_norm(h, mid // 16, dp["gn1"]["g"], dp["gn1"]["b"]))
    x = conv2d(x, dp["conv2_w"], None, padding=1)
    return jax.nn.relu(group_norm(x, mid // 16, dp["gn2"]["g"], dp["gn2"]["b"]))


def _up_tail(
    x: jnp.ndarray,
    guidances: tuple,
    dp: dict,
    head: dict | None,
    B: int,
    T: int,
) -> jnp.ndarray:
    """ConvT(k2 s2) -> DoubleConv [+ head conv] (model.py:540-555,632-634).

    x: (B*T, H, W, Cin); returns (B*T, H', W', mid), or fp32 (B*T, H', W')
    when ``head`` is given.  Plain-XLA reference formulation; the production
    forward uses :func:`_up_tail_s2d` (same math, space-to-depth layout).
    A fully fused per-slab Pallas version was also tried and measured 3.8x
    SLOWER (70 ms vs 18.6 ms at eval shapes) — 3x3 convs at 32-64 channels
    pad the MXU's 128-wide tiles per tap; a VPU 9-tap head kernel also lost
    (13 ms vs ~3 ms).  B/T are taken for signature parity with the fused
    aggregator stages.
    """
    del B, T
    x = conv_transpose2d_nonoverlap(x, dp["up_w"], dp["up_b"], kernel=2)
    h = _double_conv(x, dp, guidances=tuple(guidances))
    if head is not None:
        return conv2d(h, head["w"], head["b"], padding=1)[..., 0].astype(jnp.float32)
    return h


def _up_tail_s2d(
    x: jnp.ndarray,
    guidances: tuple,
    dp: dict,
    head: dict | None,
    B: int,
    T: int,
) -> jnp.ndarray:
    """Space-to-depth formulation of :func:`_up_tail` (same math, equivalence
    and gradient tested in tests/test_s2d.py).

    The ConvT(k2 s2) is a matmul that *natively* emits S2D layout; both 3x3
    convs (and the head) then run as 2x2-kernel convs on the half-resolution,
    4x-channel image — K/N each 4x larger, so MXU tiles fill (vs the N=32
    util ceiling of the plain form).  Measured at eval shapes in plain XLA it
    LOSES (38 ms vs 12.4 ms for the decoder2 tail): the per-phase output
    slicing/concat in conv3x3_s2d materializes four shifted HBM copies per
    conv, swamping the MXU win.  Kept as the tested reference semantics for
    an in-VMEM (Pallas) version, where those slices are register moves.  See
    catseg_tpu/ops/s2d.py for the re-blocking derivation; reference semantics
    per model.py:540-555.
    """
    from ..ops.s2d import (
        conv3x3_s2d,
        group_norm_s2d,
        s2d_conv3x3_weights,
        space_to_depth,
        depth_to_space,
        up_matmul_s2d,
    )

    del B
    mid = dp["conv1_w"].shape[-1]
    h = up_matmul_s2d(x, dp["up_w"], dp["up_b"])  # (N, H, W, 4*Cup) S2D
    cup = dp["up_w"].shape[-1]
    acc = conv3x3_s2d(h, s2d_conv3x3_weights(dp["conv1_w"][:, :, :cup]), mid)
    ofs = cup
    for g in guidances:
        cg = g.shape[-1]
        wg = s2d_conv3x3_weights(dp["conv1_w"][:, :, ofs : ofs + cg])
        hg = conv3x3_s2d(space_to_depth(g).astype(x.dtype), wg, mid)
        t = acc.shape[0] // hg.shape[0]
        acc = (acc.reshape(hg.shape[0], t, *acc.shape[1:]) + hg[:, None]).reshape(acc.shape)
        ofs += cg
    acc = jax.nn.relu(group_norm_s2d(acc, mid // 16, dp["gn1"]["g"], dp["gn1"]["b"]))
    acc = conv3x3_s2d(acc, s2d_conv3x3_weights(dp["conv2_w"]), mid)
    acc = jax.nn.relu(group_norm_s2d(acc, mid // 16, dp["gn2"]["g"], dp["gn2"]["b"]))
    if head is not None:
        out = conv3x3_s2d(acc, s2d_conv3x3_weights(head["w"]), 1)
        out = out.astype(jnp.float32) + head["b"].astype(jnp.float32)
        return depth_to_space(out)[..., 0]
    return depth_to_space(acc)


def conv_decoder(x: jnp.ndarray, guidance: list, agg: dict,
                 use_fused: bool = True) -> jnp.ndarray:
    """(B, T, 24, 24, C) -> (B, T, 96, 96) per-class logits (model.py:674-681).

    On TPU at the flagship geometry both Up stages + head run as one fused
    phase-plane Pallas kernel (kernels/decoder.py; same math, ~1.7x faster
    than the XLA conv path); other shapes use the plain-XLA _up_tail pair.
    ``use_fused=False`` (training: cfg.fused_decoder) keeps the XLA path.
    """
    import os

    B, T, H, W, C = x.shape
    if (use_fused and guidance[0] is not None and guidance[1] is not None
            and not os.environ.get("CATSEG_NO_PALLAS_DECODER")):
        from ..kernels.decoder import decoder_kernel_applicable, fused_decoder
        from ..parallel.mesh import mesh_divides, shard_kernel

        # TPU only (the phase-plane kernel is Mosaic-compiled; interpret mode
        # is far slower than the XLA conv path); under a mesh the dispatch
        # enters a shard_map manual region — the decoder is per-(image,
        # class) local, so each device runs the kernel on its (B/data,
        # T/class) slab with its images' guidance planes
        if decoder_kernel_applicable(
                x.reshape(B * T, H, W, C), agg["decoder1"], agg["decoder2"]
        ) and jax.default_backend() == "tpu" and mesh_divides(B, T):
            from jax.sharding import PartitionSpec as P

            def run(x5, g1, g2, d1, d2, head):
                b, t = x5.shape[0], x5.shape[1]
                out = fused_decoder(x5.reshape(b * t, H, W, C), g1, g2,
                                    d1, d2, head, b, t)
                return out.reshape(b, t, out.shape[1], out.shape[2])

            return shard_kernel(
                run, x, guidance[0], guidance[1],
                agg["decoder1"], agg["decoder2"], agg["head"],
                specs=(P("data", "class"), P("data"), P("data"), P(), P(), P()),
                out_spec=P("data", "class"))
    x = x.reshape(B * T, H, W, C)
    g1 = (guidance[0],) if guidance[0] is not None else ()
    g2 = (guidance[1],) if guidance[1] is not None else ()
    x = _up_tail(x, g1, agg["decoder1"], None, B, T)
    x = _up_tail(x, g2, agg["decoder2"], agg["head"], B, T)
    return x.reshape(B, T, x.shape[1], x.shape[2]).astype(jnp.float32)


# ------------------------------------------------------------------ forward


def corr_embed(corr: jnp.ndarray, agg: dict) -> jnp.ndarray:
    """Per-class 7x7 conv embedding P -> hidden (model.py:613,654-659).

    corr: (B, T, H, W, P) -> (B, T, H, W, C)."""
    B, T, H, W, P = corr.shape
    x = conv2d(corr.reshape(B * T, H, W, P), agg["conv1"]["w"], agg["conv1"]["b"], padding=3)
    return x.reshape(B, T, H, W, -1)


def aggregator_forward(
    agg: dict,
    img_feats: jnp.ndarray,
    text_feats: jnp.ndarray,
    appearance_guidance: tuple,
    cfg: CATSegConfig,
    return_classes: bool = False,
) -> jnp.ndarray:
    """Full Aggregator forward (model.py:683-725).

    img_feats: (B, 24, 24, C_embed); text_feats: (B, T, P, C_embed);
    appearance_guidance: (res3 (B,24,24,Cg), res4 (B,48,48,256), res5 (B,96,96,128)).
    Returns (B, T, 96, 96) fp32 logits; when T > pad_len only the top-k
    classes are aggregated, the rest receive -100.

    With ``return_classes`` the -100 scatter is left to the caller: returns
    ``(logits, classes)`` where logits covers only the kept classes
    ((B, pad_len, 96, 96) when truncation fired, classes (B, pad_len) int32;
    otherwise the full (B, T, ...) and classes None) — for downstream stages
    that must process the kept classes only (e.g. SAM mask refinement).
    """
    T = text_feats.shape[1]
    import os

    from ..kernels.corr_embed import corr_embed_applicable, fused_corr_embed
    from ..parallel.mesh import mesh_divides, shard_kernel

    B = img_feats.shape[0]
    fused_ok = (corr_embed_applicable(img_feats, text_feats, agg["conv1"]["w"])
                and jax.default_backend() in ("tpu", "cpu")
                and mesh_divides(B)
                and not os.environ.get("CATSEG_NO_PALLAS_CORR"))

    def _embed_fused(img_feats, text_n):
        from jax.sharding import PartitionSpec as P

        return shard_kernel(
            lambda i, t, w, b: fused_corr_embed(i, t, w, b),
            img_feats, text_n, agg["conv1"]["w"], agg["conv1"]["b"],
            specs=(P("data"), P("data"), P(), P()),
            out_spec=P("data"))

    classes = None
    if cfg.pad_len > 0 and T > cfg.pad_len:
        corr = correlation(img_feats, text_feats)  # full-T cost for top-k
        classes = topk_classes(corr, cfg.pad_len)
        text_feats = gather_classes(l2_normalize(text_feats, axis=-1), classes)
        if fused_ok:
            # re-derive the kept classes' cost inside the fused kernel
            # (normalize + one matmul — far cheaper than gathering the
            # (B, T, H, W, P) volume through HBM)
            x = _embed_fused(img_feats, text_feats)
        else:
            x = corr_embed(gather_classes(corr, classes), agg)
    elif fused_ok:
        x = _embed_fused(img_feats, l2_normalize(text_feats, axis=-1))
    else:
        x = corr_embed(correlation(img_feats, text_feats), agg)

    # keep the class axis distributed across the mesh's "class" dimension
    # (no-op without an active mesh; see catseg_tpu.parallel.mesh)
    from ..parallel.mesh import constrain_class_axis

    x = constrain_class_axis(x)

    proj_guid = None
    if "guidance_proj" in agg:
        proj_guid = jax.nn.relu(conv2d(appearance_guidance[0], agg["guidance_proj"]["w"], agg["guidance_proj"]["b"], padding=1))
    dec_guid = [None, None]
    if "decoder_guidance_proj" in agg:
        dec_guid = [
            jax.nn.relu(conv2d(g, p["w"], p["b"], padding=1))
            for p, g in zip(agg["decoder_guidance_proj"], appearance_guidance[1:])
        ]
    text_guid = None
    if "text_guidance_proj" in agg:
        tf = jnp.mean(text_feats.astype(jnp.float32), axis=-2)
        tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
        text_guid = jax.nn.relu(_linear(tf.astype(x.dtype), agg["text_guidance_proj"]["w"], agg["text_guidance_proj"]["b"]))

    for layer in agg["layers"]:
        x = spatial_aggregation(x, proj_guid, layer, cfg)
        x = constrain_class_axis(x)
        x = class_aggregation(x, text_guid, layer, cfg)
        x = constrain_class_axis(x)

    logits = conv_decoder(x, dec_guid, agg,
                          use_fused=getattr(cfg, "fused_decoder", True))
    if return_classes:
        return logits, classes
    if classes is not None:
        logits = scatter_full_logits(logits, classes, T)
    return logits


# ------------------------------------------------------------------ init


def _init_linear(rng, fan_in, fan_out, bias=True):
    k1, k2 = jax.random.split(rng)
    bound = (1.0 / fan_in) ** 0.5
    p = {"w": jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
    return p


def _init_conv(rng, kh, kw, cin, cout, bias=True):
    k1, k2 = jax.random.split(rng)
    fan_in = kh * kw * cin
    bound = (1.0 / fan_in) ** 0.5
    p = {"w": jax.random.uniform(k1, (kh, kw, cin, cout), minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (cout,), minval=-bound, maxval=bound)
    return p


def _init_swin_block(rng, dim, guid_dim, mlp_ratio=4):
    ks = jax.random.split(rng, 6)
    qk = _init_linear(ks[0], dim + guid_dim, dim)
    kk = _init_linear(ks[1], dim + guid_dim, dim)
    vv = _init_linear(ks[2], dim, dim)
    proj = _init_linear(ks[3], dim, dim)
    fc1 = _init_linear(ks[4], dim, dim * mlp_ratio)
    fc2 = _init_linear(ks[5], dim * mlp_ratio, dim)
    return {
        "norm1": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
        "q_w": qk["w"], "q_b": qk["b"],
        "k_w": kk["w"], "k_b": kk["b"],
        "v_w": vv["w"], "v_b": vv["b"],
        "proj_w": proj["w"], "proj_b": proj["b"],
        "norm2": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
        "fc1_w": fc1["w"], "fc1_b": fc1["b"],
        "fc2_w": fc2["w"], "fc2_b": fc2["b"],
    }


def _init_class_layer(rng, dim, guid_dim, pad_len):
    ks = jax.random.split(rng, 5)
    q = _init_linear(ks[0], dim + guid_dim, dim)
    k = _init_linear(ks[1], dim + guid_dim, dim)
    v = _init_linear(ks[2], dim, dim)
    m1 = _init_linear(ks[3], dim, dim * 4)
    m2 = _init_linear(ks[4], dim * 4, dim)
    out = {
        "norm1": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
        "norm2": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
        "q_w": q["w"], "q_b": q["b"],
        "k_w": k["w"], "k_b": k["b"],
        "v_w": v["w"], "v_b": v["b"],
        "mlp1_w": m1["w"], "mlp1_b": m1["b"],
        "mlp2_w": m2["w"], "mlp2_b": m2["b"],
    }
    if pad_len > 0:
        out["padding_tokens"] = jnp.zeros(dim)
        if guid_dim > 0:
            out["padding_guidance"] = jnp.zeros(guid_dim)
    return out


def init_aggregator_params(rng, cfg: CATSegConfig) -> dict:
    hd = cfg.hidden_dim
    ks = jax.random.split(rng, 12)
    agg: dict = {
        "conv1": _init_conv(ks[0], 7, 7, cfg.prompt_channel, hd),
        "head": _init_conv(ks[1], 3, 3, cfg.decoder_dims[1], 1),
    }
    if cfg.appearance_guidance_dim > 0:
        agg["guidance_proj"] = _init_conv(ks[2], 3, 3, cfg.appearance_guidance_dim, cfg.appearance_guidance_proj_dim)
    if cfg.text_guidance_dim > 0:
        agg["text_guidance_proj"] = _init_linear(ks[3], cfg.text_guidance_dim, cfg.text_guidance_proj_dim)
    if cfg.decoder_guidance_dims[0] > 0:
        agg["decoder_guidance_proj"] = [
            _init_conv(k, 3, 3, d, dp)
            for k, d, dp in zip(jax.random.split(ks[4], 2), cfg.decoder_guidance_dims, cfg.decoder_guidance_proj_dims)
        ]
    layers = []
    for k in jax.random.split(ks[5], cfg.num_layers):
        k1, k2, k3 = jax.random.split(k, 3)
        layers.append(
            {
                "swin1": _init_swin_block(k1, hd, cfg.appearance_guidance_proj_dim),
                "swin2": _init_swin_block(k2, hd, cfg.appearance_guidance_proj_dim),
                "guidance_norm": {
                    "g": jnp.ones(cfg.appearance_guidance_proj_dim),
                    "b": jnp.zeros(cfg.appearance_guidance_proj_dim),
                },
                "class": _init_class_layer(k3, hd, cfg.text_guidance_proj_dim, cfg.pad_len),
            }
        )
    agg["layers"] = layers

    def _up_params(rng, cin, cout, guid):
        k1, k1b, k2, k3 = jax.random.split(rng, 4)
        upc = cin - guid
        fan_in = cin  # torch ConvT fan_in is Cin * k * k / groups... uses Cin*k*k
        bound = (1.0 / (cin * 4)) ** 0.5
        return {
            "up_w": jax.random.uniform(k1, (cin, 2, 2, upc), minval=-bound, maxval=bound),
            "up_b": jax.random.uniform(k1b, (upc,), minval=-bound, maxval=bound),
            "conv1_w": _init_conv(k2, 3, 3, cin, cout, bias=False)["w"],
            "gn1": {"g": jnp.ones(cout), "b": jnp.zeros(cout)},
            "conv2_w": _init_conv(k3, 3, 3, cout, cout, bias=False)["w"],
            "gn2": {"g": jnp.ones(cout), "b": jnp.zeros(cout)},
        }

    agg["decoder1"] = _up_params(ks[6], hd, cfg.decoder_dims[0], cfg.decoder_guidance_proj_dims[0])
    agg["decoder2"] = _up_params(ks[7], cfg.decoder_dims[0], cfg.decoder_dims[1], cfg.decoder_guidance_proj_dims[1])
    return agg
