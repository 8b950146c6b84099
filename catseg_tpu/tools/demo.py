"""Demo CLI — the demo/demo.py equivalent.

    python -m catseg_tpu.tools.demo --config vitb384 --checkpoint model.npz \
        --input img1.jpg img2.jpg --output out/ \
        (--class-json datasets/ade150.json | --classes "cat,dog,sky")

Open-vocabulary segmentation of arbitrary images against an arbitrary class
list, with color-overlay outputs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..data.catalogs import load_class_names
from ..data.loader import load_image, resize_shortest_edge
from ..infer.pipeline import Predictor
from ..infer.tta import TTAPredictor
from ..infer.visualize import build_palette, overlay
from .common import load_params, resolve_config


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="vitb384")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--input", nargs="+", required=True)
    ap.add_argument("--output", default="demo_out")
    ap.add_argument("--classes", default=None, help="comma-separated class names")
    ap.add_argument("--class-json", default=None)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    cfg = resolve_config(args.config, args.overrides).replace(sliding_window=True, pooling_size=(1, 1))
    params = load_params(args.checkpoint, cfg)
    if args.classes:
        class_names = [c.strip() for c in args.classes.split(",")]
    elif args.class_json:
        class_names = load_class_names(args.class_json)
    else:
        raise SystemExit("pass --classes or --class-json")

    predictor = Predictor(params, cfg, class_names)
    if args.tta:
        predictor = TTAPredictor(predictor)
    palette = build_palette(len(class_names))
    os.makedirs(args.output, exist_ok=True)

    from PIL import Image

    for path in args.input:
        img = load_image(path)
        resized = resize_shortest_edge(img, cfg.min_size_test, cfg.max_size_test)
        result = predictor.predict(resized, out_hw=img.shape[:2])
        pred = result["sem_seg"].argmax(axis=0)
        vis = overlay(img, pred, palette, alpha=args.alpha)
        out_path = os.path.join(args.output, os.path.basename(path))
        Image.fromarray(vis).save(out_path)
        top = np.bincount(pred.reshape(-1), minlength=len(class_names)).argsort()[::-1][:5]
        print(f"{path} -> {out_path}; top classes: {[class_names[i] for i in top]}")


if __name__ == "__main__":
    main()
