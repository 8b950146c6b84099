"""Class-name -> text-feature pipelines.

Mirrors the two text paths of the reference predictor
(cat_seg/modeling/transformer/cat_seg_predictor.py):

- ``class_embeddings_ensemble`` (init-time, lines 164-188): synonyms split on
  ", ", every template formatted with every synonym, per-synonym embeddings
  averaged then re-normalized -> (T, P, E).
- ``forward_text_embeds`` (steady-state get_text_embeds, lines 190-224): only
  the *first* synonym, one embedding per template, L2-normalized ->
  (T, P, E).  This is what the aggregator consumes; at eval time it is
  computed once per (class list, weights) — the functional equivalent of the
  reference's forever-cache.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import CLIPVariant
from ..core.clip import encode_text, truncate_context
from . import templates as _templates
from .tokenizer import ClipBPE, tokenize


@functools.lru_cache(maxsize=None)
def _jitted_encode(variant: CLIPVariant, dtype_name: str):
    """One persistent jitted text encoder per (variant, dtype): a fresh
    jax.jit wrapper per call would recompile for every benchmark in a
    multi-benchmark eval run (jit caches on wrapper identity)."""
    return jax.jit(functools.partial(
        encode_text, variant=variant, compute_dtype=jnp.dtype(dtype_name)))


def encode_texts_batched(
    clip_params: dict,
    token_ids: np.ndarray,
    variant: CLIPVariant,
    batch: int = 256,
    compute_dtype=jnp.float32,
) -> np.ndarray:
    """Encode (N, 77) token rows in fixed-size jitted batches -> (N, E) fp32."""
    # causal mask => truncating past max(EOT) is exact (see truncate_context)
    token_ids = truncate_context(token_ids)
    fn = _jitted_encode(variant, jnp.dtype(compute_dtype).name)
    N = token_ids.shape[0]
    outs = []
    for i in range(0, N, batch):
        chunk = token_ids[i : i + batch]
        pad = batch - chunk.shape[0]
        if pad and N > batch:
            chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[1]), chunk.dtype)], 0)
            chunk[-pad:, 0] = 1  # harmless non-empty rows, discarded below
        out = np.asarray(fn(clip_params, jnp.asarray(chunk)), dtype=np.float32)
        outs.append(out[: batch - pad] if pad and N > batch else out)
    return np.concatenate(outs, axis=0)


def _l2(x: np.ndarray, axis=-1) -> np.ndarray:
    return x / np.linalg.norm(x, axis=axis, keepdims=True)


def forward_text_embeds(
    clip_params: dict,
    class_names: list[str],
    template_set: str | tuple[str, ...],
    variant: CLIPVariant,
    tokenizer: ClipBPE | None = None,
    compute_dtype=jnp.float32,
) -> np.ndarray:
    """(T, P, E) normalized text features, forward-path semantics."""
    temps = _templates.get(template_set) if isinstance(template_set, str) else template_set
    texts = []
    for name in class_names:
        first = name.split(", ")[0] if ", " in name else name
        texts.extend(_templates.format_template(t, first) for t in temps)
    tokens = tokenize(texts, tokenizer=tokenizer)
    emb = encode_texts_batched(clip_params, tokens, variant, compute_dtype=compute_dtype)
    emb = _l2(emb)
    return emb.reshape(len(class_names), len(temps), -1)


def class_embeddings_ensemble(
    clip_params: dict,
    class_names: list[str],
    template_set: str | tuple[str, ...],
    variant: CLIPVariant,
    tokenizer: ClipBPE | None = None,
    compute_dtype=jnp.float32,
) -> np.ndarray:
    """(T, P, E) synonym-ensembled text features, init-path semantics."""
    temps = _templates.get(template_set) if isinstance(template_set, str) else template_set
    P = len(temps)
    texts = []
    counts = []
    for name in class_names:
        splits = name.split(", ") if ", " in name else [name]
        counts.append(len(splits))
        for t in temps:
            for s in splits:
                texts.append(_templates.format_template(t, s))
    tokens = tokenize(texts, tokenizer=tokenizer)
    emb = _l2(encode_texts_batched(clip_params, tokens, variant, compute_dtype=compute_dtype))
    out = np.zeros((len(class_names), P, emb.shape[-1]), dtype=np.float32)
    ofs = 0
    for i, S in enumerate(counts):
        rows = emb[ofs : ofs + P * S].reshape(P, S, -1)
        ofs += P * S
        out[i] = _l2(rows.mean(axis=1)) if S > 1 else rows[:, 0]
    return out
