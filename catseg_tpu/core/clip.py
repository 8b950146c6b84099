"""OpenAI-style CLIP encoders as pure functions over parameter pytrees.

Reproduces the behavior of the reference's vendored VPT-capable CLIP
(cat_seg/third_party/model_vpt.py) the TPU way:

- transformer blocks are *stacked* along a leading layer axis and driven by
  ``lax.scan`` (one compiled block body instead of L unrolled copies);
  guidance taps split the scan into segments so intermediate activations are
  captured without materializing every layer;
- the final visual block uses the "dense trick" (model_vpt.py:219-240): only
  the value path + out-projection is computed, with the *pre-block CLS row*
  broadcast as the residual — yielding per-patch embeddings aligned with CLS
  semantics;
- positional embeddings are bicubically resized in-graph when the input grid
  differs from the pretrain grid (model_vpt.py:294-297,316-329) — they are
  finetuned parameters, so the resize must stay differentiable;
- LayerNorm statistics and attention softmax run in float32; matmuls run in
  the configured compute dtype (bfloat16 on TPU) with fp32 accumulation.

Parameter layout: linear weights are (in, out); conv weights HWIO.  The
torch-checkpoint converter (catseg_tpu.weights.convert) produces this layout,
including the reference's split q/k/v projection names
(model_vpt.py:169-183).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CLIPVariant
from ..ops import layer_norm, resize_bicubic
from ..ops.conv import patchify


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _act_fn(variant: CLIPVariant):
    """OpenAI checkpoints use QuickGELU; open_clip H/G use exact GELU
    (torch nn.GELU default, erf form)."""
    if variant.act == "quick_gelu":
        return quick_gelu
    return functools.partial(jax.nn.gelu, approximate=False)


def _linear(x, w, b=None):
    y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _mha(x: jnp.ndarray, bp: dict, heads: int, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Multi-head self-attention over (B, T, W) with fp32 softmax."""
    B, T, W = x.shape
    D = W // heads
    from ..kernels.clip_attn import dense_attention_applicable, fused_dense_attention

    if dense_attention_applicable(W, heads, mask):
        # maskless dense encode at head_dim 64 (ViT-B/L): fused Pallas
        # attention — the (B, heads, T, T) fp32 logits never touch HBM
        # (falls back to the identical-math XLA form off-TPU / under GSPMD)
        q = _linear(x, bp["q_w"], bp["q_b"])
        k = _linear(x, bp["k_w"], bp["k_b"])
        v = _linear(x, bp["v_w"], bp["v_b"])
        out = fused_dense_attention(q, k, v, heads)
        return _linear(out, bp["out_w"], bp["out_b"])
    q = _linear(x, bp["q_w"], bp["q_b"]).reshape(B, T, heads, D)
    k = _linear(x, bp["k_w"], bp["k_b"]).reshape(B, T, heads, D)
    v = _linear(x, bp["v_w"], bp["v_b"]).reshape(B, T, heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * (1.0 / np.sqrt(D))
    if mask is not None:
        logits = logits + mask
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, T, W)
    return _linear(out, bp["out_w"], bp["out_b"])


def _mlp(x: jnp.ndarray, bp: dict, act=quick_gelu) -> jnp.ndarray:
    return _linear(act(_linear(x, bp["fc_w"], bp["fc_b"])), bp["proj_w"], bp["proj_b"])


def _block(x: jnp.ndarray, bp: dict, heads: int, mask: jnp.ndarray | None, act=quick_gelu) -> jnp.ndarray:
    x = x + _mha(layer_norm(x, bp["ln_1"]["g"], bp["ln_1"]["b"]), bp, heads, mask)
    x = x + _mlp(layer_norm(x, bp["ln_2"]["g"], bp["ln_2"]["b"]), bp, act)
    return x


def _scan_blocks(x: jnp.ndarray, stacked: dict, heads: int, mask: jnp.ndarray | None, act=quick_gelu) -> jnp.ndarray:
    """Run a stack of identical blocks with one compiled body."""

    def body(carry, bp):
        return _block(carry, bp, heads, mask, act), None

    out, _ = jax.lax.scan(body, x, stacked)
    return out


def _slice_layers(stacked: dict, start: int, stop: int) -> dict:
    return jax.tree.map(lambda a: a[start:stop], stacked)


def _layer(stacked: dict, i: int) -> dict:
    return jax.tree.map(lambda a: a[i], stacked)


def _dense_final_block(x: jnp.ndarray, bp: dict, act=quick_gelu) -> jnp.ndarray:
    """The dense trick (model_vpt.py:219-240): value path + out-proj only,
    residual is the pre-block CLS row broadcast over all tokens."""
    y = layer_norm(x, bp["ln_1"]["g"], bp["ln_1"]["b"])
    v = _linear(y, bp["v_w"], bp["v_b"])
    v = _linear(v, bp["out_w"], bp["out_b"])
    v = v + x[:, :1]
    v = v + _mlp(layer_norm(v, bp["ln_2"]["g"], bp["ln_2"]["b"]), bp, act)
    return v


def resized_pos_embed(pe: jnp.ndarray, pretrain_grid: int, grid: int) -> jnp.ndarray:
    """Bicubic grid resize of a (1 + S², W) positional embedding."""
    if grid == pretrain_grid:
        return pe
    W = pe.shape[-1]
    cls_pos = pe[:1]
    grid_pos = pe[1:].reshape(1, pretrain_grid, pretrain_grid, W)
    grid_pos = resize_bicubic(grid_pos.astype(jnp.float32), (grid, grid))
    return jnp.concatenate([cls_pos, grid_pos.reshape(grid * grid, W).astype(pe.dtype)], axis=0)


def encode_image(
    params: dict,
    images: jnp.ndarray,
    variant: CLIPVariant,
    dense: bool = True,
    taps: tuple[int, ...] = (),
    compute_dtype=jnp.float32,
):
    """Dense CLIP image encoding.

    Args:
      params: ``params['visual']`` subtree.
      images: (B, H, W, 3) normalized images, H == W, divisible by patch.
      taps: indices of transformer blocks whose *outputs* to also return
        (the reference grabs these with forward hooks, cat_seg_model.py:84-87).

    Returns:
      (tokens, tapped): tokens (B, 1+G², embed_dim) after ln_post+proj (all
      tokens when dense, matching encode_image(..., dense=True)); tapped is a
      list of (B, 1+G², width) block outputs for each requested tap.
    """
    p = params["visual"]
    act = _act_fn(variant)
    B, H, _, _ = images.shape
    grid = H // variant.patch

    x = patchify(images.astype(compute_dtype), p["conv1_w"], variant.patch)
    cls_tok = jnp.broadcast_to(p["class_embedding"].astype(compute_dtype), (B, 1, variant.width))
    x = jnp.concatenate([cls_tok, x], axis=1)
    pe = resized_pos_embed(p["positional_embedding"], variant.pretrain_grid, grid)
    x = x + pe.astype(compute_dtype)
    x = layer_norm(x, p["ln_pre"]["g"], p["ln_pre"]["b"])

    blocks = p["blocks"]
    n = variant.layers

    # Visual prompt tokens (VPT, model_vpt.py:250-264): for the first
    # prompt_depth layers, prompts are inserted after the CLS token, the
    # block runs, and they are stripped again.  prompt_depth=0 in every
    # released config; the capability is kept for the "prompt" finetune mode.
    prompt_tokens = p.get("prompt_tokens")
    n_prompted = 0 if prompt_tokens is None else prompt_tokens.shape[0]
    tapped_by_index = {}
    for i in range(n_prompted):
        if i == n - 1:
            break
        L = prompt_tokens.shape[1]
        prompts = jnp.broadcast_to(prompt_tokens[i].astype(x.dtype), (B, L, variant.width))
        xp = jnp.concatenate([x[:, :1], prompts, x[:, 1:]], axis=1)
        xp = _block(xp, _layer(blocks, i), variant.heads, None, act)
        x = jnp.concatenate([xp[:, :1], xp[:, 1 + L :]], axis=1)
        tapped_by_index[i] = x

    # segment boundaries: one scan per gap between taps, always ending just
    # before the final block (which runs separately, dense or standard).  A
    # tap at the final layer is captured AFTER that block — same as the
    # reference's forward hook on the last resblock, which sees the dense
    # output when the dense trick is active.
    pre = set(t + 1 for t in taps if t + 1 > n_prompted and t < n - 1)
    bounds = sorted(pre | {n - 1})
    start = n_prompted
    for stop in bounds:
        if stop > start:
            x = _scan_blocks(x, _slice_layers(blocks, start, stop), variant.heads, None, act)
        tapped_by_index[stop - 1] = x
        start = stop

    if dense:
        x = _dense_final_block(x, _layer(blocks, n - 1), act)
    else:
        x = _block(x, _layer(blocks, n - 1), variant.heads, None, act)
    if (n - 1) in taps:
        tapped_by_index[n - 1] = x

    x = layer_norm(x, p["ln_post"]["g"], p["ln_post"]["b"])
    if not dense:
        x = x[:, 0]
    x = _linear(x, p["proj"])
    tapped = [tapped_by_index[t] for t in taps]
    return x, tapped


def encode_image_attn_maps(
    params: dict,
    images: jnp.ndarray,
    variant: CLIPVariant,
    attn_layers: tuple[int, ...],
    compute_dtype=jnp.float32,
) -> list[jnp.ndarray]:
    """Attention probability maps of selected visual blocks.

    The functional equivalent of viz_atten.py's forward hooks on the
    attention softmax: returns, for each requested layer, the (B, heads,
    1+G², 1+G²) attention matrix.  Layers run unrolled (this is a debug path).
    """
    p = params["visual"]
    B, H, _, _ = images.shape
    grid = H // variant.patch
    x = patchify(images.astype(compute_dtype), p["conv1_w"], variant.patch)
    cls_tok = jnp.broadcast_to(p["class_embedding"].astype(compute_dtype), (B, 1, variant.width))
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + resized_pos_embed(p["positional_embedding"], variant.pretrain_grid, grid).astype(compute_dtype)
    x = layer_norm(x, p["ln_pre"]["g"], p["ln_pre"]["b"])

    maps = {}
    heads = variant.heads
    # all layers run the standard softmax block here (this debug path mirrors
    # the reference's hooks on a CLS forward, where the final block DOES have
    # softmax attention — the v-only dense trick has none to visualize)
    for i in range(variant.layers):
        bp = _layer(p["blocks"], i)
        y = layer_norm(x, bp["ln_1"]["g"], bp["ln_1"]["b"])
        T = y.shape[1]
        D = variant.width // heads
        q = _linear(y, bp["q_w"], bp["q_b"]).reshape(B, T, heads, D)
        k = _linear(y, bp["k_w"], bp["k_b"]).reshape(B, T, heads, D)
        v = _linear(y, bp["v_w"], bp["v_b"]).reshape(B, T, heads, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(D)
        attn = jax.nn.softmax(logits, axis=-1)
        if i in attn_layers:
            maps[i] = attn
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(x.dtype), v, preferred_element_type=jnp.float32)
        out = _linear(out.astype(x.dtype).reshape(B, T, variant.width), bp["out_w"], bp["out_b"])
        x = x + out
        x = x + _mlp(layer_norm(x, bp["ln_2"]["g"], bp["ln_2"]["b"]), bp, _act_fn(variant))
    return [maps[i] for i in sorted(set(attn_layers)) if i in maps]


@functools.lru_cache(maxsize=4)
def _causal_mask(T: int) -> np.ndarray:
    # cached as numpy (a trace-time constant); caching a jnp array here would
    # leak tracers across jit scopes
    return np.triu(np.full((T, T), -np.inf, dtype=np.float32), k=1)


def truncate_context(token_ids: np.ndarray, multiple: int = 8) -> np.ndarray:
    """Statically truncate (N, 77) prompts to max(EOT)+1 rounded up.

    The text transformer is causally masked, so positions <= EOT never see
    later (all-zero pad) positions and EOT pooling is exact — the reference
    simply always pays for context 77 (simple_tokenizer pads to
    context_length; model_vpt.py:421-438 runs the full length).  Prompt
    templates peak around 16 tokens, so this cuts per-step text-encoder
    FLOPs ~4x in training, where text re-encodes every iteration."""
    ids = np.asarray(token_ids)
    eot = int(ids.argmax(axis=-1).max())
    n = min(ids.shape[-1], -(-(eot + 1) // multiple) * multiple)
    return ids[..., :n]


def encode_text(
    params: dict,
    token_ids: jnp.ndarray,
    variant: CLIPVariant,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Text encoding with causal mask and EOT pooling (model_vpt.py:421-438).

    token_ids: (N, context) int32.  Returns (N, embed_dim).
    """
    p = params["text"]
    x = p["token_embedding"][token_ids].astype(compute_dtype)
    # support statically truncated contexts (see truncate_context): with a
    # causal mask, positions <= EOT are bit-identical to the full-77 run
    x = x + p["positional_embedding"][: token_ids.shape[-1]].astype(compute_dtype)
    x = _scan_blocks(x, p["blocks"], variant.text_heads, _causal_mask(token_ids.shape[-1]),
                     _act_fn(variant))
    x = layer_norm(x, p["ln_final"]["g"], p["ln_final"]["b"])
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return _linear(pooled, p["text_projection"])


# ---------------------------------------------------------------- init


def _init_block(rng, width: int, mlp: int | None = None) -> dict:
    mlp = 4 * width if mlp is None else mlp
    ks = jax.random.split(rng, 6)
    attn_std = width**-0.5
    fc_std = (2 * width) ** -0.5
    proj_std = width**-0.5  # single-model init; torch scales by layers, immaterial here
    return {
        "q_w": jax.random.normal(ks[0], (width, width)) * attn_std,
        "k_w": jax.random.normal(ks[1], (width, width)) * attn_std,
        "v_w": jax.random.normal(ks[2], (width, width)) * attn_std,
        "q_b": jnp.zeros(width),
        "k_b": jnp.zeros(width),
        "v_b": jnp.zeros(width),
        "out_w": jax.random.normal(ks[3], (width, width)) * proj_std,
        "out_b": jnp.zeros(width),
        "fc_w": jax.random.normal(ks[4], (width, mlp)) * fc_std,
        "fc_b": jnp.zeros(mlp),
        "proj_w": jax.random.normal(ks[5], (mlp, width)) * proj_std,
        "proj_b": jnp.zeros(width),
        "ln_1": {"g": jnp.ones(width), "b": jnp.zeros(width)},
        "ln_2": {"g": jnp.ones(width), "b": jnp.zeros(width)},
    }


def _stack_blocks(rng, n: int, width: int, mlp: int | None = None) -> dict:
    blocks = [_init_block(k, width, mlp) for k in jax.random.split(rng, n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_clip_params(rng, variant: CLIPVariant) -> dict:
    kv, kt, k1, k2, k3, k4, k5, k6, k7 = jax.random.split(rng, 9)
    w = variant.width
    scale = w**-0.5
    visual = {
        "conv1_w": jax.random.normal(k1, (variant.patch, variant.patch, 3, w)) * scale,
        "class_embedding": jax.random.normal(k2, (w,)) * scale,
        "positional_embedding": jax.random.normal(k3, (variant.pretrain_grid**2 + 1, w)) * scale,
        "ln_pre": {"g": jnp.ones(w), "b": jnp.zeros(w)},
        "blocks": _stack_blocks(kv, variant.layers, w, variant.mlp_width),
        "ln_post": {"g": jnp.ones(w), "b": jnp.zeros(w)},
        "proj": jax.random.normal(k4, (w, variant.embed_dim)) * scale,
    }
    tw = variant.text_width
    text = {
        "token_embedding": jax.random.normal(k5, (variant.vocab_size, tw)) * 0.02,
        "positional_embedding": jax.random.normal(k6, (variant.context, tw)) * 0.01,
        "blocks": _stack_blocks(kt, variant.text_layers, tw),
        "ln_final": {"g": jnp.ones(tw), "b": jnp.zeros(tw)},
        "text_projection": jax.random.normal(k7, (tw, variant.embed_dim)) * tw**-0.5,
    }
    return {"visual": visual, "text": text, "logit_scale": jnp.zeros(())}
