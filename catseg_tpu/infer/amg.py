"""Automatic mask generation (SamAutomaticMaskGenerator equivalent).

Reference: cat_seg/segment_anything/automatic_mask_generator.py (+ amg.py
utils) — a point grid is prompted through the SAM decoder, masks are scored
(predicted IoU + stability), thresholded, deduplicated with box NMS, and
emitted as RLE records.

TPU re-design: all points decode in fixed-size batches inside one jitted
scan (image embedding computed once); IoU/stability scoring and
thresholding happen on device; only the surviving masks' boxes/scores come
to the host for NMS; RLE encoding uses the native C++ codec.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core import sam as jsam
from ..core.sam_decoder import dense_pe, embed_points, mask_decoder, no_mask_embed
from ..native import rle_encode


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n², 2) points in [0,1]² (amg.py build_point_grid semantics)."""
    offset = 1.0 / (2 * n_per_side)
    side = np.linspace(offset, 1.0 - offset, n_per_side)
    xs, ys = np.meshgrid(side, side)
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(np.float32)


def stability_score(mask_logits: jnp.ndarray, mask_threshold: float = 0.0, offset: float = 1.0) -> jnp.ndarray:
    """IoU between the mask thresholded at +-offset around the cutoff
    (amg.py calculate_stability_score)."""
    hi = jnp.sum((mask_logits > (mask_threshold + offset)), axis=(-1, -2)).astype(jnp.float32)
    lo = jnp.sum((mask_logits > (mask_threshold - offset)), axis=(-1, -2)).astype(jnp.float32)
    return hi / jnp.maximum(lo, 1.0)


@functools.partial(jax.jit, static_argnames=("chunk", "input_size"))
def _decode_point_grid(pe, dec, sam_feat, points_px, input_size: tuple[int, int], chunk: int = 64):
    """Decode all grid points in chunks; returns (masks (P,3,4h,4w) logits,
    iou (P,3), stability (P,3))."""
    gh, gw = sam_feat.shape[1:3]
    P0 = points_px.shape[0]
    Pp = -(-P0 // chunk) * chunk
    if Pp != P0:
        points_px = jnp.concatenate(
            [points_px, jnp.zeros((Pp - P0, 2), points_px.dtype)], axis=0)
    P = points_px.shape[0]
    pad = jnp.zeros((P, 1, 2), points_px.dtype)
    pad_label = jnp.full((P, 1), -1, jnp.int32)
    pts = jnp.concatenate([points_px[:, None, :], pad], axis=1)
    labels = jnp.concatenate([jnp.ones((P, 1), jnp.int32), pad_label], axis=1)
    sparse = embed_points(pe, pts, labels, input_size)
    dense = jnp.broadcast_to(no_mask_embed(pe, (gh, gw)), (chunk, gh, gw, sparse.shape[-1]))
    pe_grid = dense_pe(pe["gauss"], (gh, gw))
    feat = jnp.broadcast_to(sam_feat, (chunk,) + sam_feat.shape[1:])

    n_chunks = P // chunk

    def body(_, sp):
        masks, iou = mask_decoder(dec, feat, pe_grid, sp, dense, multimask_output=True)
        stab = stability_score(masks)
        return None, (masks, iou, stab)

    _, (masks, iou, stab) = jax.lax.scan(body, None, sparse.reshape(n_chunks, chunk, 2, -1))
    masks = masks.reshape(P, -1, *masks.shape[3:])[:P0]
    return (masks, iou.reshape(P, -1)[:P0], stab.reshape(P, -1)[:P0])


def _boxes_from_masks(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) bool -> (N, 4) xyxy boxes."""
    N, H, W = masks.shape
    boxes = np.zeros((N, 4), np.float32)
    for i in range(N):
        ys, xs = np.nonzero(masks[i])
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    return boxes


def _nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> list[int]:
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        if len(order) == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a + b - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return keep


class AutomaticMaskGenerator:
    def __init__(
        self,
        sam_params: dict,
        pe: dict,
        dec: dict,
        variant: jsam.SAMVariant = jsam.SAM_VITB,
        points_per_side: int = 32,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        box_nms_thresh: float = 0.7,
        min_mask_area: int = 0,
    ):
        self.sam_params = sam_params
        self.pe = pe
        self.dec = dec
        self.variant = variant
        self.points_per_side = points_per_side
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_area = min_mask_area

    def generate(self, image_normalized: np.ndarray) -> list[dict]:
        """image: (H, W, 3) SAM-normalized, H=W=variant.img_size ideally.
        Returns [{segmentation(RLE), bbox, predicted_iou, stability_score,
        point_coords}] sorted by predicted IoU."""
        H, W = image_normalized.shape[:2]
        feat = jsam.encode_image(self.sam_params, jnp.asarray(image_normalized)[None], self.variant)
        grid01 = build_point_grid(self.points_per_side)
        points_px = grid01 * np.asarray([W, H], np.float32)
        masks, iou, stab = _decode_point_grid(
            self.pe, self.dec, feat, jnp.asarray(points_px), (H, W), chunk=64
        )
        masks = np.asarray(masks, np.float32).reshape(-1, *masks.shape[2:])  # (P*3, h, w)
        iou = np.asarray(iou).reshape(-1)
        stab = np.asarray(stab).reshape(-1)
        pts = np.repeat(points_px, 3, axis=0)

        keep = (iou > self.pred_iou_thresh) & (stab > self.stability_score_thresh)
        masks, iou, stab, pts = masks[keep], iou[keep], stab[keep], pts[keep]
        binary = masks > 0.0
        if self.min_mask_area:
            area = binary.sum(axis=(1, 2))
            sel = area >= self.min_mask_area
            binary, iou, stab, pts = binary[sel], iou[sel], stab[sel], pts[sel]
        if len(binary) == 0:
            return []
        boxes = _boxes_from_masks(binary)
        kept = _nms(boxes, iou, self.box_nms_thresh)
        records = []
        for i in kept:
            records.append(
                {
                    "segmentation": rle_encode(binary[i]),
                    "bbox": boxes[i].tolist(),
                    "predicted_iou": float(iou[i]),
                    "stability_score": float(stab[i]),
                    "point_coords": pts[i].tolist(),
                }
            )
        records.sort(key=lambda r: -r["predicted_iou"])
        return records
