"""Mesh-sharded benchmark evaluation.

The reference shards eval images across DDP ranks and all_gathers confusion
matrices (plain_train_net.py:136-146).  Single-controller equivalent: the
batch axis is split over EVERY mesh device inside one `jax.shard_map`
manual region — each device runs the UNCHANGED single-chip batched pipeline
(sliding-window forward + tail + resize-argmax + confusion update, the same
executable bench.py times, fused Pallas kernels included) on its local
images, and one psum of the tiny (K+1)² confusion matrix replaces DDP's
all_gather.  GSPMD never partitions the model itself, so distribution never
changes the per-device kernels — the reference's DDP property
(train_net.py:317-324).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs import CATSegConfig
from ..infer.pipeline import sliding_window_preds_from_canvas_batch
from ..parallel.mesh import local_region, replicate


_step_cache: dict = {}

# each flush indexes bsz*Ho*Wo counts (canvas padding rides the ignore
# column); the device matrix spills to a host int64 before any int32 cell
# could overflow at benchmark scale (TPU x64 is off, so the device matrix
# cannot simply be widened)
SPILL_PIXELS = 1_500_000_000


def make_sharded_eval_step(cfg: CATSegConfig, mesh, text_feats, out_canvas, num_classes,
                           ignore, clamp_background=False):
    """Returns step(params, canvases (B,...), hws (B,2), out_hws (B,2), gts)
    -> replicated (K+1, K+1) int32 cm summed over the batch.

    The jitted step is cached per (cfg, mesh, shapes): pjit caches on function
    identity, so a fresh closure per call would recompile the whole sliding
    pipeline (~minutes) for every benchmark and every periodic training eval.
    Text features enter as a replicated *argument* (same-shape class lists
    reuse the executable across benchmarks)."""
    text_feats = jnp.asarray(text_feats)
    key = (cfg, mesh, out_canvas, num_classes, ignore, clamp_background,
           text_feats.shape, str(text_feats.dtype))
    cached = _step_cache.get(key)
    if cached is None:
        axes = tuple(mesh.axis_names)  # ("data", "class"): both carry images

        def local_step(params, text, canvases, hws, out_hws, gts):
            # per-device body == the single-chip batched eval pipeline
            # (identical executable to the bench/eval_batch path, Pallas
            # kernels live); local_region() marks manual-SPMD land so model
            # code never emits GSPMD constraints here
            with local_region():
                preds = sliding_window_preds_from_canvas_batch(
                    params, canvases, hws, out_hws, text, cfg, out_canvas)
                K = num_classes
                if clamp_background:
                    preds = jnp.minimum(preds, 20)
                gts = gts.astype(jnp.int32)  # host uploads the smallest dtype
                g = jnp.where(gts == ignore, K, jnp.clip(gts, 0, K - 1))
                idx = (preds * (K + 1) + g).reshape(-1)
                cm = jnp.zeros(((K + 1) * (K + 1),), jnp.int32).at[idx].add(1)
            return jax.lax.psum(cm.reshape(K + 1, K + 1), axes)

        bs = NamedSharding(mesh, P(axes))
        rep = replicate(mesh)
        step = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P(axes), P(axes), P(axes), P(axes)),
            out_specs=P(), check_vma=False)
        cached = jax.jit(step, in_shardings=(rep, rep, bs, bs, bs, bs), out_shardings=rep)
        _step_cache[key] = cached

    return lambda params, canvases, hws, out_hws, gts: cached(
        params, text_feats, canvases, hws, out_hws, gts)


def evaluate_sharded(params, cfg: CATSegConfig, mesh, items, text_feats, *,
                     input_canvas, out_canvas, num_classes, ignore,
                     clamp_background=False, per_device_batch=2):
    """items: iterable of (image (h,w,3) uint8, gt (H,W) int32).  Returns the
    accumulated confusion matrix (numpy int64).

    per_device_batch images ride each device per dispatch (the single-chip
    batched loop's amortization, multiplied across every mesh device): the
    batch axis is mesh.size * per_device_batch, split over all axes."""
    bsz = mesh.size * max(1, per_device_batch)
    step = make_sharded_eval_step(cfg, mesh, jnp.asarray(text_feats), out_canvas,
                                  num_classes, ignore, clamp_background)
    Hc, Wc = input_canvas
    Ho, Wo = out_canvas
    cm = jnp.zeros((num_classes + 1, num_classes + 1), jnp.int32)
    cm_host = np.zeros((num_classes + 1, num_classes + 1), np.int64)
    px_since_spill = 0

    from .miou import gt_upload_dtype

    gt_dtype = gt_upload_dtype(num_classes, ignore)
    batch_canvases = np.zeros((bsz, Hc, Wc, 3), np.uint8)
    batch_hws = np.zeros((bsz, 2), np.int32)
    batch_out = np.zeros((bsz, 2), np.int32)
    batch_gts = np.full((bsz, Ho, Wo), ignore, gt_dtype)
    fill = 0

    def flush():
        nonlocal fill, cm, cm_host, px_since_spill
        if fill == 0:
            return
        if px_since_spill + bsz * Ho * Wo > SPILL_PIXELS:
            cm_host += np.asarray(cm, dtype=np.int64)
            cm = jnp.zeros((num_classes + 1, num_classes + 1), jnp.int32)
            px_since_spill = 0
        px_since_spill += bsz * Ho * Wo
        # unused slots keep gt==ignore everywhere -> contribute only to the
        # excluded (pred, K) column
        cm = cm + step(params, jnp.asarray(batch_canvases), jnp.asarray(batch_hws),
                       jnp.asarray(batch_out), jnp.asarray(batch_gts))
        batch_canvases[:] = 0
        batch_gts[:] = ignore
        fill = 0

    for img, gt in items:
        h, w = img.shape[:2]
        H, W = gt.shape
        batch_canvases[fill, :h, :w] = img[..., :3]
        batch_hws[fill] = (h, w)
        batch_out[fill] = (H, W)
        batch_gts[fill, :H, :W] = gt
        fill += 1
        if fill == bsz:
            flush()
    flush()
    return cm_host + np.asarray(cm, dtype=np.int64)
