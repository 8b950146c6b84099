"""Per-stage wall-clock profile of the eval hot path on the current backend.

The sliding-window eval pipeline compiles into one executable
(infer.pipeline.sliding_window_preds_from_canvas_batch), so XLA's own
profiler attributes time to fused HLO ops, not model stages.  This tool
times each stage as its own jitted dispatch — CLIP guidance encode,
correlation, corr-embed, guidance projections, one swin pair, one class
layer, the fused decoder, the sigmoid/fold tail, the dynamic resize-argmax —
plus the end-to-end pipeline and a host loop including h2d upload, using
queue-drain timing (submit N, fetch one scalar; ``block_until_ready`` does
not block under tunneled runtimes).

The stage sum exceeding the end-to-end time is expected: XLA fuses across
stage boundaries inside the single executable.

Replaces ad-hoc profiling scripts; the reference ships only a CUDA-tensor
memory tracker (cat_seg/gpu_mem_track.py — see utils/profiling.py for that
equivalent), no stage timer.

Usage: python -m catseg_tpu.tools.profile_stages [--config vitb384] [-T 150]
       [--batch 2] [--device cpu|tpu] [--reps 20]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", default="vitb384")
    ap.add_argument("-T", type=int, default=150, help="class count")
    ap.add_argument("--batch", type=int, default=2, help="images per dispatch")
    ap.add_argument("--reps", type=int, default=20)
    from .common import add_device_arg, apply_device, probe_device

    add_device_arg(ap)
    args = ap.parse_args(argv)
    apply_device(args)
    probe_device()

    import jax
    import jax.numpy as jnp

    from .. import configs
    from ..core import catseg
    from ..core.aggregator import (
        aggregator_forward, class_aggregation, conv_decoder, corr_embed,
        correlation, spatial_aggregation, _linear,
    )
    from ..infer import pipeline as pl
    from ..ops import conv2d, fold_divisor, fold_tiles, resize_bilinear

    T, BATCH = args.T, args.batch
    cfg = configs.eval_preset(getattr(configs, args.config)())
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    text = jnp.asarray(text)

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    def bench(name, fn, *fargs, n=args.reps):
        out = fn(*fargs)
        sync(out)  # compile + drain
        t0 = time.time()
        for _ in range(n):
            out = fn(*fargs)
        sync(out)
        dt = (time.time() - t0) / n * 1000
        print(f"{name:34s} {dt:8.2f} ms")
        return out

    k, s, out_res = cfg.sw_kernel, cfg.sw_stride, cfg.sw_out_res
    nt = ((out_res - k) // s + 1) ** 2
    B = (nt + 1) * BATCH
    dtype = jnp.dtype(cfg.compute_dtype)

    canvases = jnp.asarray(rng.randint(0, 255, (BATCH, 1024, 1024, 3), dtype=np.uint8))
    hws = jnp.asarray(np.array([[640, 853]] * BATCH, np.int32))
    tiles = jnp.asarray(rng.rand(B, k, k, 3).astype(np.float32) * 255)

    R = cfg.clip_resolution

    @jax.jit
    def stage_clip(params, imgs):
        x = catseg.normalize_clip(imgs)
        x = jax.image.resize(x, (B, R, R, 3), "bilinear")
        return catseg.clip_guidance_features(params, x, cfg)

    img_feats, guidance = stage_clip(params, tiles)
    sync(img_feats)
    textB = jnp.broadcast_to(text[None], (B,) + text.shape).astype(dtype)
    print(f"--- stages ({B} tiles = {BATCH} images x {nt + 1}, T={T}, "
          f"{jax.default_backend()}) ---")
    bench(f"clip_guidance ({B} tiles)", stage_clip, params, tiles)
    corr = bench("correlation", jax.jit(correlation), img_feats, textB)
    agg = params["agg"]
    x0 = bench("corr_embed 7x7", jax.jit(lambda c: corr_embed(c, agg)), corr)

    @jax.jit
    def stage_guid_proj(guidance):
        pg = jax.nn.relu(conv2d(guidance[0], agg["guidance_proj"]["w"],
                                agg["guidance_proj"]["b"], padding=1))
        dg = [jax.nn.relu(conv2d(g, p["w"], p["b"], padding=1))
              for p, g in zip(agg["decoder_guidance_proj"], guidance[1:])]
        return pg, dg

    pg, dg = stage_guid_proj(guidance)
    sync(pg)
    bench("guidance projections", stage_guid_proj, guidance)

    tf = jnp.mean(textB.astype(jnp.float32), axis=-2)
    tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
    text_guid = jax.nn.relu(_linear(tf.astype(dtype), agg["text_guidance_proj"]["w"],
                                    agg["text_guidance_proj"]["b"]))

    x1 = bench("swin pair (one layer)",
               jax.jit(lambda x, pg: spatial_aggregation(x, pg, agg["layers"][0], cfg)),
               x0, pg)
    x2 = bench("class layer (one)",
               jax.jit(lambda x, tg: class_aggregation(x, tg, agg["layers"][0], cfg)),
               x1, text_guid)
    logits = bench("decoder (fused)",
                   jax.jit(lambda x, d0, d1: conv_decoder(x, [d0, d1], agg, use_fused=True)),
                   x2, dg[0], dg[1])
    bench("aggregator_forward (all)",
          jax.jit(lambda f, t, g0, g1, g2: aggregator_forward(agg, f, t, (g0, g1, g2), cfg)),
          img_feats, textB, *guidance)

    @jax.jit
    def stage_tail(logits):
        lg = logits.transpose(0, 2, 3, 1)
        per_image = jnp.concatenate(
            [lg[: nt * BATCH].reshape(nt, BATCH, *lg.shape[1:]).transpose(1, 0, 2, 3, 4),
             lg[nt * BATCH:][:, None]], axis=1)

        def tail(pi):
            l2 = resize_bilinear(pi, (k, k))
            probs = jax.nn.sigmoid(l2.astype(jnp.float32))
            folded = fold_tiles(probs[:nt], (out_res, out_res), k, s)[0]
            folded = folded / jnp.asarray(fold_divisor((out_res, out_res), k, s))
            gup = resize_bilinear(probs[nt:], (out_res, out_res))[0]
            return (folded + gup) / 2.0

        return jax.lax.map(tail, per_image)

    logits_in = jnp.asarray(rng.randn(B, T, 96, 96).astype(np.float32))
    probs = bench("tail (up+sigmoid+fold)", stage_tail, logits_in)
    bench("resize_argmax (dynamic)",
          jax.jit(lambda p, h: pl.resize_argmax_dynamic_batch(p, h, (768, 768))),
          probs, hws)

    print(f"--- end to end (device-resident canvases, per dispatch of {BATCH}) ---")
    out_hws = jnp.asarray(np.array([[512, 683]] * BATCH, np.int32))

    def full(canvases, hws):
        return pl.sliding_window_preds_from_canvas_batch(
            params, canvases, hws, out_hws, text, cfg, (768, 768))

    bench("full pipeline (preds path)", full, canvases, hws, n=max(args.reps // 2, 4))

    imgs = [rng.randint(0, 255, (640, 853, 3), dtype=np.uint8) for _ in range(8)]
    predictor = pl.Predictor(params, cfg, [f"c{i}" for i in range(T)],
                             text_feats=np.asarray(text), input_canvas=(1024, 1024))
    ohws = np.array([[512, 683]] * BATCH, np.int32)
    for _ in range(2):
        sync(predictor.preds_sliding_batch(imgs[:BATCH], ohws, (768, 768)))
    t0 = time.time()
    NR = 8
    pred = None
    for i in range(NR):
        pred = predictor.preds_sliding_batch(
            [imgs[(i + j) % 8] for j in range(BATCH)], ohws, (768, 768))
    sync(pred)
    dt = (time.time() - t0) / (NR * BATCH) * 1000
    print(f"{'host loop incl. h2d upload':34s} {dt:8.2f} ms/image  ({1000 / dt:.1f} im/s)")


if __name__ == "__main__":
    main()
