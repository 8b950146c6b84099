"""Ahead-of-time export: serialize the serving pipeline to StableHLO.

The reference ships an ONNX export path for its vendored SAM
(cat_seg/segment_anything/utils/onnx.py — wraps the decoder in
``SamOnnxModel`` so it runs without the Python model code).  The TPU-native
equivalent is ``jax.export``: the complete serving graph — canvas upload ->
on-device torch-exact resizes -> sliding-window forward -> fold/average ->
resize-argmax — with the weights embedded as constants, serialized as a
self-contained StableHLO artifact.  Any XLA runtime (Python-less C++ PJRT
included) can load and run it; ``load_exported`` round-trips it in JAX.

Shapes are static by design (one artifact per benchmark preset), matching
how the eval pipelines already compile one executable per benchmark.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import CATSegConfig


@dataclasses.dataclass(frozen=True)
class ExportSpec:
    """Static geometry of one exported serving function."""

    input_canvas: tuple[int, int]  # (Hc, Wc) padded uint8 input
    out_canvas: tuple[int, int]  # (Ho, Wo) padded argmax output
    num_classes: int


def make_serve_fn(params: dict, cfg: CATSegConfig, text_feats, spec: ExportSpec):
    """(canvas uint8 (Hc,Wc,3), hw int32 (2,), out_hw int32 (2,)) -> argmax
    (Ho, Wo) int32.  Weights and text features are closed over (exported as
    constants, like ONNX initializers)."""
    from .pipeline import resize_argmax_dynamic, sliding_window_probs_from_canvas

    tf = jnp.asarray(text_feats)

    def serve(canvas, hw, out_hw):
        probs = sliding_window_probs_from_canvas(params, canvas, hw, tf, cfg)
        return resize_argmax_dynamic(probs, out_hw, spec.out_canvas)

    return serve


def export_serving(
    params: dict,
    cfg: CATSegConfig,
    text_feats,
    spec: ExportSpec,
    path: str,
    platforms: tuple[str, ...] | None = None,
) -> "jax.export.Exported":
    """Serialize the serving function for ``spec`` to ``path``.

    platforms: lowering targets (default: the current backend).  Returns the
    in-memory Exported as well.
    """
    from jax import export as jexport

    serve = make_serve_fn(params, cfg, text_feats, spec)
    Hc, Wc = spec.input_canvas
    args = (
        jax.ShapeDtypeStruct((Hc, Wc, 3), jnp.uint8),
        jax.ShapeDtypeStruct((2,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.int32),
    )
    kw = {}
    if platforms is not None:
        kw["platforms"] = list(platforms)
    exported = jexport.export(jax.jit(serve), **kw)(*args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return exported


def load_exported(path: str):
    """Deserialize a serving artifact; returns a callable
    (canvas, hw, out_hw) -> (Ho, Wo) int32 argmax map."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    def call(canvas, hw, out_hw):
        return exported.call(jnp.asarray(canvas), jnp.asarray(hw, jnp.int32),
                             jnp.asarray(out_hw, jnp.int32))

    return call
