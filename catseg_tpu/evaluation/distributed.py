"""Mesh-sharded benchmark evaluation.

The reference shards eval images across DDP ranks and all_gathers confusion
matrices (plain_train_net.py:136-146).  Single-controller equivalent: images
are batched along the mesh "data" axis, the whole
(resize -> sliding-window -> resize-argmax -> confusion-update) pipeline is
one jitted SPMD program, and the per-image confusion matrices are summed by
XLA's partitioner into a replicated accumulator — the collective all_gather
becomes an implicit psum.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from ..configs import CATSegConfig
from ..infer.pipeline import resize_argmax_dynamic, sliding_window_probs_from_canvas
from ..parallel.mesh import batch_sharding, replicate


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
        def one(params, text, canvas, hw, out_hw, gt):
            probs = sliding_window_probs_from_canvas(params, canvas, hw, text, cfg)
            pred = resize_argmax_dynamic(probs, out_hw, out_canvas)
            K = num_classes
            if clamp_background:
                pred = jnp.minimum(pred, 20)
            gt = gt.astype(jnp.int32)  # host uploads the smallest dtype that fits
            g = jnp.where(gt == ignore, K, jnp.clip(gt, 0, K - 1))
            idx = (pred * (K + 1) + g).reshape(-1)
            return jnp.zeros(((K + 1) * (K + 1),), jnp.int32).at[idx].add(1).reshape(K + 1, K + 1)

        def step(params, text, canvases, hws, out_hws, gts):
            cms = jax.vmap(one, in_axes=(None, None, 0, 0, 0, 0))(
                params, text, canvases, hws, out_hws, gts)
            return jnp.sum(cms, axis=0)

        bs = batch_sharding(mesh)
        rep = replicate(mesh)
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
    batched loop's amortization, multiplied across the data axis): the batch
    axis is n_data * per_device_batch, sharded on "data"."""
    bsz = mesh.shape["data"] * max(1, per_device_batch)
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
