"""Demo CLI — the demo/demo.py equivalent.

    python -m catseg_tpu.tools.demo --config vitb384 --checkpoint model.npz \
        --input img1.jpg img2.jpg --output out/ \
        (--class-json datasets/ade150.json | --classes "cat,dog,sky")

Open-vocabulary segmentation of arbitrary images against an arbitrary class
list, with color-overlay outputs.  `--video-input f.mp4` / `--webcam N`
mirror demo/demo.py:31-47,129-194: every frame is segmented and written to
an output video (or displayed when no --output is given).
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
from .common import add_device_arg, apply_device, load_params, probe_device, resolve_config


def main(argv=None):
    ap = argparse.ArgumentParser()
    add_device_arg(ap)
    ap.add_argument("--config", default="vitb384")
    ap.add_argument("--checkpoint", default=None)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", nargs="+")
    src.add_argument("--video-input", default=None, help="video file to segment frame-by-frame")
    src.add_argument("--webcam", nargs="?", const=0, type=int, default=None,
                     help="camera index to stream from")
    ap.add_argument("--output", default="demo_out")
    ap.add_argument("--frame-stride", type=int, default=1,
                    help="segment every Nth video frame (intermediate frames reuse the last mask)")
    ap.add_argument("--classes", default=None, help="comma-separated class names")
    ap.add_argument("--class-json", default=None)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--parallel", action="store_true",
                    help="pipeline host prep with device execution (AsyncPredictor)")
    ap.add_argument("--shard-tiles", action="store_true",
                    help="shard each image's sliding-window tiles over all "
                         "devices (single-image latency parallelism)")
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    apply_device(args)
    probe_device()

    cfg = resolve_config(args.config, args.overrides).replace(sliding_window=True, pooling_size=(1, 1))
    params = load_params(args.checkpoint, cfg)
    if args.classes:
        class_names = [c.strip() for c in args.classes.split(",")]
    elif args.class_json:
        class_names = load_class_names(args.class_json)
    else:
        raise SystemExit("pass --classes or --class-json")

    mesh = None
    if args.shard_tiles:
        import jax

        from ..parallel.mesh import make_mesh

        if len(jax.devices()) > 1:
            mesh = make_mesh(n_data=len(jax.devices()))
        else:
            print("--shard-tiles: only one device visible, running unsharded")
    predictor = Predictor(params, cfg, class_names, mesh=mesh)
    if args.tta:
        predictor = TTAPredictor(predictor)
    palette = build_palette(len(class_names))

    if args.video_input is not None or args.webcam is not None:
        _run_video(args, predictor, palette, class_names)
        return

    os.makedirs(args.output, exist_ok=True)

    from PIL import Image

    def emit(path, img, pred):
        vis = overlay(img, pred, palette, alpha=args.alpha)
        out_path = os.path.join(args.output, os.path.basename(path))
        Image.fromarray(vis).save(out_path)
        top = np.bincount(pred.reshape(-1), minlength=len(class_names)).argsort()[::-1][:5]
        print(f"{path} -> {out_path}; top classes: {[class_names[i] for i in top]}")

    if args.parallel and len(args.input) > 1:
        # demo/predictor.py:132-219 (--parallel): overlap host prep with the
        # device; async dispatch replaces the reference's per-GPU processes
        from ..infer.async_predictor import AsyncPredictor

        ap_exec = AsyncPredictor(predictor)  # TTAPredictor also exposes probs_sliding
        meta = []
        for path in args.input:
            img = load_image(path)
            resized = resize_shortest_edge(img, cfg.min_size_test, cfg.max_size_test)
            ap_exec.put(resized)
            meta.append((path, img))
        results = {}
        for _ in meta:
            idx, probs = ap_exec.get()
            results[idx] = probs
        ap_exec.shutdown()
        from ..infer.pipeline import resize_argmax_dynamic

        for idx, (path, img) in enumerate(meta):
            h, w = img.shape[:2]
            canvas = (-(-h // 256) * 256, -(-w // 256) * 256)
            import jax.numpy as jnp

            pred = np.asarray(resize_argmax_dynamic(
                results[idx], jnp.asarray([h, w], np.int32), canvas))[:h, :w]
            emit(path, img, pred)
        return

    for path in args.input:
        img = load_image(path)
        resized = resize_shortest_edge(img, cfg.min_size_test, cfg.max_size_test)
        result = predictor.predict(resized, out_hw=img.shape[:2])
        pred = result["sem_seg"].argmax(axis=0)
        emit(path, img, pred)


def _run_video(args, predictor, palette, class_names):
    """Frame loop for --video-input / --webcam (demo/demo.py:129-194)."""
    import cv2

    cap = cv2.VideoCapture(args.video_input if args.video_input is not None else args.webcam)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video source "
                         f"{args.video_input if args.video_input is not None else args.webcam}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    writer = None
    if args.output and args.video_input is not None:
        out_path = args.output
        if os.path.isdir(out_path) or not os.path.splitext(out_path)[1]:
            os.makedirs(out_path, exist_ok=True)
            out_path = os.path.join(out_path, os.path.basename(args.video_input))
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    n = 0
    pred = None
    try:
        while True:
            ok, frame_bgr = cap.read()
            if not ok:
                break
            if pred is None or n % args.frame_stride == 0:
                img = frame_bgr[:, :, ::-1]  # model consumes RGB
                resized = resize_shortest_edge(img, predictor.cfg.min_size_test,
                                               predictor.cfg.max_size_test)
                result = predictor.predict(resized, out_hw=img.shape[:2])
                pred = result["sem_seg"].argmax(axis=0)
            vis = overlay(frame_bgr[:, :, ::-1], pred, palette, alpha=args.alpha)
            if writer is not None:
                writer.write(vis[:, :, ::-1])
            else:
                cv2.imshow("catseg_tpu demo", vis[:, :, ::-1])
                if cv2.waitKey(1) == 27:  # ESC
                    break
            n += 1
    finally:
        cap.release()
        if writer is not None:
            writer.release()
            print(f"{n} frames -> {out_path}")


if __name__ == "__main__":
    main()
