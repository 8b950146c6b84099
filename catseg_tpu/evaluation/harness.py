"""Benchmark evaluation harness: the eval.sh protocol end-to-end.

For a (checkpoint, benchmark) pair: build text features for the benchmark's
class JSON, stream the validation set through the sliding-window pipeline,
resize-argmax on a static padded canvas, accumulate the confusion matrix on
device, report detectron2-identical metrics.  One XLA compile per benchmark.
"""

from __future__ import annotations

import math
import time

import numpy as np
import jax.numpy as jnp

from ..configs import CATSegConfig, eval_preset
from ..data.catalogs import get_dataset, load_class_names
from ..data.loader import (
    Prefetcher, list_dataset, load_gt, load_image, resize_shortest_edge, shortest_edge_size)
from ..infer.pipeline import Predictor, resize_argmax_dynamic
from .miou import ConfusionAccumulator, gt_upload_dtype


def _canvas(sizes, step: int = 256) -> tuple[int, int]:
    hm = max(s[0] for s in sizes)
    wm = max(s[1] for s in sizes)
    return (math.ceil(hm / step) * step, math.ceil(wm / step) * step)


def _evaluate_benchmark_sharded(params, cfg, spec, class_names, pairs, load,
                                in_canvas, out_canvas, verbose,
                                per_device_batch=2) -> dict:
    """Mesh-sharded benchmark loop: one SPMD program over the data axis."""
    import jax

    from ..parallel.mesh import make_mesh
    from ..text.embed import forward_text_embeds
    from .distributed import evaluate_sharded
    from .miou import semseg_metrics

    mesh = make_mesh(n_data=len(jax.devices()))
    text_feats = forward_text_embeds(
        params["clip"], list(class_names), cfg.prompt_ensemble_type, cfg.clip,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
    )
    t0 = time.time()
    cm = evaluate_sharded(
        params, cfg, mesh, Prefetcher(pairs, load), text_feats,
        input_canvas=in_canvas, out_canvas=out_canvas,
        num_classes=spec.num_classes, ignore=spec.ignore_label,
        clamp_background=spec.evaluator == "sem_seg_background",
        per_device_batch=per_device_batch,
    )
    metrics = semseg_metrics(cm)
    metrics["_conf"] = cm
    metrics["num_images"] = len(pairs)
    metrics["images_per_sec"] = len(pairs) / (time.time() - t0)
    if verbose:
        print(
            f"[{spec.name}] ({mesh.shape['data']}-way sharded) mIoU {metrics['mIoU']:.2f} "
            f"fwIoU {metrics['fwIoU']:.2f} mACC {metrics['mACC']:.2f} "
            f"pACC {metrics['pACC']:.2f} ({metrics['images_per_sec']:.2f} im/s)"
        )
    return metrics


def _evaluate_benchmark_batched(predictor, acc, spec, pairs, load, out_canvas,
                                gt_dtype, batch, verbose) -> dict:
    """Single-device loop at a fixed batch size: one 5B-tile model dispatch,
    one vmapped resize-argmax dispatch, and one confusion update per B
    images.  The tail batch is padded by repeating the last image with
    all-ignore GT (ignore rows land in the cm's void column, which every
    metric excludes)."""
    Hc, Wc = out_canvas
    t0 = time.time()
    n = 0
    buf: list = []

    def flush(items):
        nonlocal n
        n_real = len(items)
        while len(items) < batch:
            img, _ = items[-1]
            items = items + [(img, None)]  # pad: duplicate image, ignore GT
        hws = np.array(
            [(g.shape if g is not None else (1, 1)) for _, g in items], np.int32)
        preds = predictor.preds_sliding_batch([im for im, _ in items], hws, (Hc, Wc))
        gt_pads = np.full((batch, Hc, Wc), spec.ignore_label, dtype=gt_dtype)
        for i, (_, gt) in enumerate(items[:n_real]):
            H, W = gt.shape
            gt_pads[i, :H, :W] = gt
        acc.update(preds, gt_pads)
        n += n_real
        if verbose and (n // batch) % max(1, 100 // batch) == 0:
            print(f"  [{spec.name}] {n}/{len(pairs)} images, "
                  f"{n / (time.time() - t0):.2f} im/s")

    for item in Prefetcher(pairs, load):
        buf.append(item)
        if len(buf) == batch:
            flush(buf)
            buf = []
    if buf:
        flush(buf)
    metrics = acc.metrics()
    metrics["_conf"] = acc.matrix()
    metrics["images_per_sec"] = n / (time.time() - t0)
    metrics["num_images"] = n
    if verbose:
        print(
            f"[{spec.name}] (batch {batch}) mIoU {metrics['mIoU']:.2f} "
            f"fwIoU {metrics['fwIoU']:.2f} mACC {metrics['mACC']:.2f} "
            f"pACC {metrics['pACC']:.2f} ({metrics['images_per_sec']:.2f} im/s)"
        )
    return metrics


def evaluate_benchmark(
    params: dict,
    cfg: CATSegConfig,
    benchmark: str,
    root: str | None = None,
    limit: int | None = None,
    verbose: bool = True,
    sliding: bool = True,
    dump_visuals: int = 0,
    visuals_dir: str = "eval_visuals",
    dump_predictions: str | None = None,
    tta: bool = False,
    eval_batch: int = 2,
) -> dict:
    """Run one eval.sh benchmark; returns the metrics dict (+ images/sec).

    sliding=False uses the whole-image branch (the reference's
    train-time-eval / demo default, cat_seg_model.py:147-155); tta applies
    hflip probability averaging (SemanticSegmentorWithTTA)."""
    cfg = eval_preset(cfg) if sliding else cfg.replace(sliding_window=False)
    spec = get_dataset(benchmark)
    class_names = load_class_names(spec.class_json)
    pairs = list_dataset(spec, root=root, limit=limit)
    if not pairs:
        raise FileNotFoundError(f"no data for {spec.name} under root {root}")

    def load(pair):
        img = load_image(pair[0])
        gt = load_gt(pair[1])
        return resize_shortest_edge(img, cfg.min_size_test, cfg.max_size_test), gt

    # probe sizes for the static canvases (GT carries the original size);
    # header-only reads, disk-cached next to the dataset
    import os

    from ..data.catalogs import dataset_root
    from ..data.loader import probe_sizes

    cache_path = os.path.join(root or dataset_root(), ".catseg_cache",
                              f"{spec.name}_gt_sizes.json")
    sizes = probe_sizes([g for _, g in pairs], cache_path=cache_path)
    Hc, Wc = _canvas(sizes)

    def _resized(hw):
        # same rounding as the actual resize (loader.shortest_edge_size) —
        # a one-pixel drift would break the canvas fill mid-benchmark
        return shortest_edge_size(hw[0], hw[1], cfg.min_size_test, cfg.max_size_test)

    if tta:
        # the TTA wrapper rescales originals to each DatasetMapperTTA scale;
        # the static input canvas must cover the LARGEST scale's extent
        from ..infer.tta import D2_TTA_MAX_SIZE, D2_TTA_MIN_SIZES

        tta_sizes = [shortest_edge_size(h, w, s, D2_TTA_MAX_SIZE)
                     for (h, w) in sizes for s in D2_TTA_MIN_SIZES]
        in_canvas = _canvas(tta_sizes, step=256 if sliding else cfg.crop_size)
    else:
        in_canvas = _canvas([_resized(s) for s in sizes], step=256 if sliding else cfg.crop_size)

    # Multi-chip: shard the image stream over the mesh's data axis and psum
    # the confusion matrix (reference shards eval across DDP ranks,
    # plain_train_net.py:136-146).  The per-image dump/TTA paths stay
    # sequential — they need host-side predictions per image.
    import jax as _jax

    n_dev = len(_jax.devices())
    if (sliding and not tta and dump_visuals == 0 and dump_predictions is None
            and n_dev > 1):
        return _evaluate_benchmark_sharded(params, cfg, spec, class_names, pairs, load,
                                           in_canvas, (Hc, Wc), verbose,
                                           per_device_batch=max(1, eval_batch))
    if n_dev > 1:
        # never fall back silently: an 8-chip eval quietly going single-device
        # is exactly the failure mode that wastes the big runs
        blockers = [flag for flag, on in [
            ("--tta", tta), ("--dump-visuals", dump_visuals != 0),
            ("--dump-predictions", dump_predictions is not None),
            ("whole-image mode (no sliding)", not sliding)] if on]
        print(f"[harness] WARNING: {n_dev} devices visible but "
              f"{', '.join(blockers) or 'this mode'} forces the sequential "
              f"single-device path (per-image host-side output)", flush=True)

    predictor = Predictor(params, cfg, class_names, input_canvas=in_canvas)
    if tta:
        from ..infer.tta import TTAPredictor

        predictor = TTAPredictor(predictor)
        # DatasetMapperTTA scales the ORIGINAL image (the wrapper applies
        # ResizeShortestEdge per scale itself), so the per-image load skips
        # the eval pre-resize in TTA mode

        def load(pair):  # noqa: F811 — intentional TTA override
            return load_image(pair[0]), load_gt(pair[1])

    acc = ConfusionAccumulator(spec.num_classes, spec.ignore_label,
                               clamp_background=spec.evaluator == "sem_seg_background")
    dumper = None
    if dump_predictions:
        from .coco_dump import PredictionDumper, dataset_id_map

        dumper = PredictionDumper(dump_predictions, id_map=dataset_id_map(spec))

    gt_dtype = gt_upload_dtype(spec.num_classes, spec.ignore_label)

    if (sliding and not tta and dump_visuals == 0 and dumper is None
            and eval_batch > 1 and len(pairs) > 1):
        return _evaluate_benchmark_batched(
            predictor, acc, spec, pairs, load, (Hc, Wc), gt_dtype,
            eval_batch, verbose)

    t0 = time.time()
    n = 0
    for (img, gt) in Prefetcher(pairs, load):
        H, W = gt.shape
        probs = predictor.probs(img)
        pred = resize_argmax_dynamic(probs, jnp.asarray([H, W], np.int32), (Hc, Wc))
        gt_pad = np.full((Hc, Wc), spec.ignore_label, dtype=gt_dtype)
        gt_pad[:H, :W] = gt
        acc.update(pred, gt_pad)
        if n < dump_visuals or dumper is not None:
            # pred/GT overlay dumps (viz.py TestAndViz, OVRSSS_Visualizer.save_visual)
            pred_np = np.asarray(pred)[:H, :W]
            if n < dump_visuals:
                import os

                from ..infer.visualize import save_visual
                from PIL import Image as _I

                os.makedirs(visuals_dir, exist_ok=True)
                img_full = np.asarray(_I.fromarray(img).resize((W, H)))
                save_visual(img_full, pred_np, gt, os.path.join(visuals_dir, f"{spec.name}_{n:04d}.jpg"),
                            spec.num_classes, spec.ignore_label)
            if dumper is not None:
                dumper.add(pred_np, pairs[n][0])
        n += 1
        if verbose and n % 100 == 0:
            print(f"  [{spec.name}] {n}/{len(pairs)} images, {n / (time.time() - t0):.2f} im/s")
    if dumper is not None:
        dumper.write()
    metrics = acc.metrics()
    metrics["_conf"] = acc.matrix()  # raw confusion matrix (gzero splits etc.)
    metrics["images_per_sec"] = n / (time.time() - t0)
    metrics["num_images"] = n
    if verbose:
        print(
            f"[{spec.name}] mIoU {metrics['mIoU']:.2f} fwIoU {metrics['fwIoU']:.2f} "
            f"mACC {metrics['mACC']:.2f} pACC {metrics['pACC']:.2f} "
            f"({metrics['images_per_sec']:.2f} im/s)"
        )
    return metrics
