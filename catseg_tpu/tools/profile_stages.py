"""Per-stage wall-clock + roofline profile of the eval hot path.

The sliding-window eval pipeline compiles into one executable
(infer.pipeline.sliding_window_preds_from_canvas_batch), so XLA's own
profiler attributes time to fused HLO ops, not model stages.  This tool
times each stage as its own jitted dispatch — CLIP guidance encode,
correlation, corr-embed, guidance projections, one swin pair, one class
layer, the fused decoder, the sigmoid/fold tail, the dynamic resize-argmax —
plus the end-to-end pipeline and a host loop including h2d upload, using
queue-drain timing (submit N, fetch one scalar; ``block_until_ready`` does
not block under tunneled runtimes).

Each stage record also carries XLA's own cost analysis (FLOPs, HBM bytes
accessed) and the roofline time those imply at the assumed chip peaks:
``roofline_ms = max(flops/peak_flops, bytes/peak_bw)``, and
``roofline_frac = roofline_ms / measured_ms`` (1.0 = at the hardware bound;
low values mean launch overhead / poor tiling / serialization headroom).
``bound`` says which wall is closer ("flops" or "hbm").

The stage sum exceeding the end-to-end time is expected: XLA fuses across
stage boundaries inside the single executable.

Replaces ad-hoc profiling scripts; the reference ships only a CUDA-tensor
memory tracker (cat_seg/gpu_mem_track.py — see utils/profiling.py for that
equivalent), no stage timer.

Usage: python -m catseg_tpu.tools.profile_stages [--config vitb384] [-T 150]
       [--batch 2] [--device cpu|tpu] [--reps 20] [--json]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

# assumed chip peaks for the roofline columns (v5e); override via CLI if
# profiling elsewhere.  fp32 stages on the MXU run at roughly half bf16.
PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBPS = 819.0


def _cost(fn, *fargs):
    """(flops, bytes_accessed) from XLA's cost analysis; (None, None) if the
    backend doesn't expose it."""
    try:
        import jax

        compiled = jax.jit(fn).lower(*fargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        nbytes = float(cost.get("bytes accessed", 0.0))
        return (flops or None), (nbytes or None)
    except Exception:
        return None, None


def collect_stage_records(cfg, T, batch, reps=20, peak_tflops=PEAK_TFLOPS_BF16,
                          peak_gbps=PEAK_HBM_GBPS, log=None, on_record=None):
    """Measure every eval-path stage; return a list of record dicts.

    Records: {stage, ms, gflop, gbytes, roofline_ms, roofline_frac, bound}.
    Ends with an ``end_to_end`` record (device-resident canvases) — per
    dispatch of ``batch`` images, so divide by batch for per-image ms.
    ``on_record(records_so_far)`` fires after every completed stage so a
    caller with a wall deadline keeps partial results (bench.py streams
    them as JSON lines).
    """
    import jax
    import jax.numpy as jnp

    from .. import configs  # noqa: F401  (kept for parity with CLI use)
    from ..core import catseg
    from ..core.aggregator import (
        aggregator_forward, class_aggregation, conv_decoder, corr_embed,
        correlation, spatial_aggregation, _linear,
    )
    from ..infer import pipeline as pl
    from ..ops import conv2d, fold_divisor, fold_tiles, resize_bilinear

    # jitted init: eager init issues one ~0.5 s tunnel RPC per parameter
    params = jax.jit(lambda r: catseg.init_catseg_params(r, cfg))(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    text = jnp.asarray(text)

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    records = []

    def drain_rt():
        # empty-queue scalar-fetch round trip: the tunneled sync costs
        # ~45-50 ms, which at small rep counts used to inflate every stage
        # by sync/n (reps=6 -> +8 ms — the round-3 stage records' apparent
        # "7-30% of roofline" was largely this artifact)
        z = jnp.ones((8, 8))
        sync(z)
        t0 = time.time()
        sync(z)
        return time.time() - t0

    def bench(name, fn, *fargs, n=reps, prejit=False, alg_flops=None):
        # prejit: fn is already a jitted callable taking params as an
        # ARGUMENT — re-wrapping a params-closure in jax.jit would inline
        # every weight as an HLO literal (a ~300 MB program the tunnel's
        # remote-compile endpoint rejects with HTTP 413)
        jfn = fn if prejit else jax.jit(fn)
        out = jfn(*fargs)
        sync(out)  # compile + drain
        d = min(drain_rt() for _ in range(2))
        t0 = time.time()
        for _ in range(n):
            out = jfn(*fargs)
        sync(out)
        dt = time.time() - t0
        ms = (dt - min(d, dt / 3)) / n * 1000
        if prejit:
            flops, nbytes = None, None
            try:
                cost = jfn.lower(*fargs).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0)) or None
                nbytes = float(cost.get("bytes accessed", 0.0)) or None
            except Exception:
                pass
        else:
            flops, nbytes = _cost(fn, *fargs)
        rec = {"stage": name, "ms": round(ms, 2)}
        if flops is not None or nbytes is not None:
            t_flops = (flops or 0.0) / (peak_tflops * 1e12)
            t_hbm = (nbytes or 0.0) / (peak_gbps * 1e9)
            roof = max(t_flops, t_hbm)
            rec.update({
                "gflop": round((flops or 0.0) / 1e9, 1),
                "gbytes": round((nbytes or 0.0) / 1e9, 3),
                "roofline_ms": round(roof * 1000, 2),
                "roofline_frac": round(roof * 1000 / ms, 3) if ms > 0 else None,
                "bound": "flops" if t_flops >= t_hbm else "hbm",
            })
        if alg_flops is not None:
            # USEFUL-flop efficiency (verdict r4 item 7): the algorithmic
            # FLOPs of the math the stage computes, as the reference's
            # formulation counts them — no lane-mask head redundancy, no
            # permutation matmuls, no im2col re-stacking.  ``alg_frac`` is
            # distance from the honest speed-of-light; ``roofline_frac``
            # above uses XLA's executed-FLOP count, which credits a kernel
            # for its own redundant work.
            t_alg = max(alg_flops / (peak_tflops * 1e12),
                        (nbytes or 0.0) / (peak_gbps * 1e9))
            rec.update({
                "alg_gflop": round(alg_flops / 1e9, 1),
                "alg_frac": round(t_alg * 1000 / ms, 3) if ms > 0 else None,
            })
        records.append(rec)
        if on_record:
            on_record(records)
        if log:
            log(f"{name:34s} {ms:8.2f} ms  "
                + (f"[{rec.get('gflop', 0):8.1f} GF {rec.get('gbytes', 0):7.3f} GB "
                   f"roof {rec.get('roofline_ms', 0):6.2f} ms "
                   f"({100 * (rec.get('roofline_frac') or 0):4.0f}% {rec.get('bound', '?')})]"
                   if "roofline_ms" in rec else "")
                + (f" [useful {rec['alg_gflop']:7.1f} GF -> "
                   f"{100 * (rec.get('alg_frac') or 0):4.0f}% of light]"
                   if "alg_gflop" in rec else ""))
        return out

    k, s, out_res = cfg.sw_kernel, cfg.sw_stride, cfg.sw_out_res
    nt = ((out_res - k) // s + 1) ** 2
    B = (nt + 1) * batch
    dtype = jnp.dtype(cfg.compute_dtype)

    canvases = jnp.asarray(rng.randint(0, 255, (batch, 1024, 1024, 3), dtype=np.uint8))
    hws = jnp.asarray(np.array([[640, 853]] * batch, np.int32))
    tiles = jnp.asarray(rng.rand(B, k, k, 3).astype(np.float32) * 255)

    R = cfg.clip_resolution

    def stage_clip(params, imgs):
        x = catseg.normalize_clip(imgs)
        x = jax.image.resize(x, (B, R, R, 3), "bilinear")
        return catseg.clip_guidance_features(params, x, cfg)

    img_feats, guidance = jax.jit(stage_clip)(params, tiles)
    sync(img_feats)
    textB = jnp.broadcast_to(text[None], (B,) + text.shape).astype(dtype)
    # weights ride as ARGUMENTS everywhere below: a weights-closure gets its
    # constants inlined/hashed per compile (slow lookups, and the re-jitted
    # full pipeline even drew the tunnel's HTTP 413 size limit)
    bench(f"clip_guidance ({B} tiles)", stage_clip, params, tiles)
    agg = params["agg"]
    from ..core.aggregator import l2_normalize
    from ..kernels.corr_embed import corr_embed_applicable, fused_corr_embed

    if corr_embed_applicable(img_feats, textB, agg["conv1"]["w"]):
        # the production path: normalize + cosine cost + 7x7 embed in one
        # Pallas dispatch (kernels/corr_embed.py)
        text_n = l2_normalize(textB, axis=-1)
        x0 = bench("corr+embed (fused)",
                   lambda a, i, t: fused_corr_embed(i, t, a["conv1"]["w"],
                                                    a["conv1"]["b"]),
                   agg, img_feats, text_n)
    else:
        corr = bench("correlation", correlation, img_feats, textB)
        x0 = bench("corr_embed 7x7", lambda a, c: corr_embed(c, a), agg, corr)

    def stage_guid_proj(agg, guidance):
        pg = jax.nn.relu(conv2d(guidance[0], agg["guidance_proj"]["w"],
                                agg["guidance_proj"]["b"], padding=1))
        dg = [jax.nn.relu(conv2d(g, p["w"], p["b"], padding=1))
              for p, g in zip(agg["decoder_guidance_proj"], guidance[1:])]
        return pg, dg

    pg, dg = jax.jit(stage_guid_proj)(agg, guidance)
    sync(pg)
    bench("guidance projections", stage_guid_proj, agg, guidance)

    tf = jnp.mean(textB.astype(jnp.float32), axis=-2)
    tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
    text_guid = jax.nn.relu(_linear(tf.astype(dtype), agg["text_guidance_proj"]["w"],
                                    agg["text_guidance_proj"]["b"]))

    # algorithmic (useful) FLOPs per stage — the reference formulation's own
    # MAC count x2, with the per-image guidance/projection shares counted
    # per image (the algebraic split is real work avoided, not redundancy)
    C = cfg.hidden_dim
    HW, win = 24 * 24, cfg.window_size
    N, nW = win * win, HW // (win * win)
    heads, D = cfg.num_heads, C // cfg.num_heads
    swin_alg = 2 * B * T * 2 * (HW * C * (3 * C + C + 8 * C)
                                + nW * heads * 2 * N * N * D)
    cls_alg = 2 * B * HW * T * (C * (3 * C + 8 * C) + 2 * C * D + 2 * C)
    d1c, d2c = cfg.decoder_dims
    g1c, g2c = cfg.decoder_guidance_proj_dims
    up1, up2 = C - g1c, d1c - g2c
    dec_alg = 2 * B * T * (
        48 * 48 * (up1 * C + 9 * up1 * d1c + 9 * d1c * d1c)
        + 96 * 96 * (up2 * d1c + 9 * up2 * d2c + 9 * d2c * d2c + 9 * d2c)
    ) + 2 * B * (48 * 48 * 9 * g1c * d1c + 96 * 96 * 9 * g2c * d2c)

    x1 = bench("swin pair (one layer)",
               lambda l, x, pg: spatial_aggregation(x, pg, l, cfg),
               agg["layers"][0], x0, pg, alg_flops=swin_alg)
    x2 = bench("class layer (one)",
               lambda l, x, tg: class_aggregation(x, tg, l, cfg),
               agg["layers"][0], x1, text_guid, alg_flops=cls_alg)
    bench("decoder (fused)",
          lambda a, x, d0, d1: conv_decoder(x, [d0, d1], a, use_fused=True),
          agg, x2, dg[0], dg[1], alg_flops=dec_alg)
    bench("aggregator_forward (all)",
          lambda a, f, t, g0, g1, g2: aggregator_forward(a, f, t, (g0, g1, g2), cfg),
          agg, img_feats, textB, *guidance)

    def stage_tail(logits):
        # mirrors pipeline.sliding_window_probs_batch's tail incl. the bf16
        # probability carrier on bf16 compute (see pipeline.py)
        fast = dtype == jnp.bfloat16
        lg = logits.transpose(0, 2, 3, 1)
        per_image = jnp.concatenate(
            [lg[: nt * batch].reshape(nt, batch, *lg.shape[1:]).transpose(1, 0, 2, 3, 4),
             lg[nt * batch:][:, None]], axis=1)
        div = jnp.asarray(fold_divisor((out_res, out_res), k, s))
        if fast:
            div = div.astype(dtype)

        def tail(pi):
            l2 = resize_bilinear(pi.astype(dtype) if fast else pi, (k, k))
            probs = jax.nn.sigmoid(l2.astype(jnp.float32))
            if fast:
                probs = probs.astype(dtype)
            folded = fold_tiles(probs[:nt], (out_res, out_res), k, s)[0]
            folded = folded / div
            gup = resize_bilinear(probs[nt:], (out_res, out_res))[0]
            return (folded + gup) / 2.0

        return jax.lax.map(tail, per_image)

    logits_in = jnp.asarray(rng.randn(B, T, 96, 96).astype(np.float32))
    probs = bench("tail (up+sigmoid+fold)", stage_tail, logits_in)
    bench("resize_argmax (dynamic)",
          lambda p, h: pl.resize_argmax_dynamic_batch(p, h, (768, 768)),
          probs, hws)

    out_hws = jnp.asarray(np.array([[512, 683]] * batch, np.int32))

    bench("end_to_end", pl.sliding_window_preds_from_canvas_batch,
          params, canvases, hws, out_hws, text, cfg, (768, 768),
          n=max(reps // 2, 4), prejit=True)
    return records


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", default="vitb384")
    ap.add_argument("-T", type=int, default=150, help="class count")
    ap.add_argument("--batch", type=int, default=2, help="images per dispatch")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--json", action="store_true", help="emit records as JSON")
    ap.add_argument("--skip-host-loop", action="store_true")
    from .common import add_device_arg, apply_device, probe_device

    add_device_arg(ap)
    args = ap.parse_args(argv)
    apply_device(args)
    probe_device()

    import jax
    import jax.numpy as jnp

    from .. import configs
    from ..infer import pipeline as pl

    T, BATCH = args.T, args.batch
    cfg = configs.eval_preset(getattr(configs, args.config)())
    k, s, out_res = cfg.sw_kernel, cfg.sw_stride, cfg.sw_out_res
    nt = ((out_res - k) // s + 1) ** 2
    B = (nt + 1) * BATCH
    print(f"--- stages ({B} tiles = {BATCH} images x {nt + 1}, T={T}, "
          f"{jax.default_backend()}) ---")
    records = collect_stage_records(
        cfg, T, BATCH, reps=args.reps,
        log=None if args.json else (lambda m: print(m, flush=True)))
    if args.json:
        import json

        print(json.dumps(records, indent=1))
    if args.skip_host_loop:
        return

    from ..core import catseg  # noqa: F401

    rng = np.random.RandomState(0)
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    params = __import__("catseg_tpu.core.catseg", fromlist=["x"]).init_catseg_params(
        jax.random.PRNGKey(0), cfg)

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

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
