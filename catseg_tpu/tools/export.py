"""Export CLI — serialize a serving pipeline to a StableHLO artifact.

    python -m catseg_tpu.tools.export --config vitb384 --checkpoint model.npz \
        --classes "sky,building,road" --canvas 1024x1024 --out-canvas 768x768 \
        --output catseg_b16.hlo

TPU-native counterpart of the reference's ONNX export capability
(cat_seg/segment_anything/utils/onnx.py wraps SAM for ONNX runtimes): the
full serving graph — canvas -> on-device resizes -> sliding-window forward
-> fold/average -> resize-argmax — with weights and text features embedded,
runnable by any XLA/PJRT runtime without this package.  `--check` reloads
the artifact and verifies it against the live pipeline on one random image.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..data.catalogs import load_class_names
from ..infer.export import ExportSpec, export_serving, load_exported
from .common import add_device_arg, apply_device, load_params, resolve_config


def _hw(s: str) -> tuple[int, int]:
    h, _, w = s.partition("x")
    return int(h), int(w)


def main(argv=None):
    ap = argparse.ArgumentParser()
    add_device_arg(ap)
    ap.add_argument("--config", default="vitb384")
    ap.add_argument("--checkpoint", default=None)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--classes", default=None, help="comma-separated class names")
    src.add_argument("--class-json", default=None)
    ap.add_argument("--canvas", default="1024x1024", help="static input canvas HxW")
    ap.add_argument("--out-canvas", default="768x768", help="static argmax canvas HxW")
    ap.add_argument("--output", default="catseg_serving.hlo")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets (e.g. tpu,cpu); default: current backend")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and compare against the live pipeline")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    apply_device(args)

    cfg = resolve_config(args.config, args.overrides).replace(
        sliding_window=True, pooling_size=(1, 1))
    params = load_params(args.checkpoint, cfg)
    names = (args.classes.split(",") if args.classes
             else load_class_names(args.class_json))

    from ..text.embed import forward_text_embeds
    import jax.numpy as jnp

    text_feats = forward_text_embeds(
        params["clip"], [n.strip() for n in names], cfg.prompt_ensemble_type,
        cfg.clip, compute_dtype=jnp.dtype(cfg.compute_dtype))

    spec = ExportSpec(input_canvas=_hw(args.canvas), out_canvas=_hw(args.out_canvas),
                      num_classes=len(names))
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    exported = export_serving(params, cfg, text_feats, spec, args.output,
                              platforms=platforms)
    import os

    print(f"exported {args.output} ({os.path.getsize(args.output) / 1e6:.1f} MB, "
          f"platforms {list(exported.platforms)}, "
          f"T={len(names)}, canvas {spec.input_canvas} -> {spec.out_canvas})")

    if args.check:
        from ..infer.export import make_serve_fn

        rng = np.random.RandomState(0)
        Hc, Wc = spec.input_canvas
        h, w = int(Hc * 0.7), int(Wc * 0.9)
        canvas = np.zeros((Hc, Wc, 3), np.uint8)
        canvas[:h, :w] = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        hw = np.asarray([h, w], np.int32)
        out_hw = np.asarray([int(h * 0.8), int(w * 0.8)], np.int32)
        got = np.asarray(load_exported(args.output)(canvas, hw, out_hw))
        want = np.asarray(make_serve_fn(params, cfg, text_feats, spec)(canvas, hw, out_hw))
        if not np.array_equal(got, want):
            raise SystemExit(f"artifact mismatch: {np.mean(got != want):.2%} of pixels differ")
        print("check OK: artifact == live pipeline")
    return 0


if __name__ == "__main__":
    main()
