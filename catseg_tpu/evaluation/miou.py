"""Semantic-segmentation metrics with on-device confusion accumulation.

Semantics match detectron2's SemSegEvaluator (the reference's metric path,
SURVEY.md §2.2): confusion matrix conf[pred, gt] of shape (K+1, K+1) where
gt == ignore_label maps to K; metrics (mIoU/fwIoU/mACC/pACC) from the
[:K, :K] block.  The VOCb rule (train_net.py:57-69) clamps predictions >= 20
to 20 before accumulation.  ``gzero_metrics`` reproduces the fork's
seen/unseen/harmonic-mean evaluator (plain_train_net.py:48-228).

The accumulator is a pure jittable update so eval sharding can psum it
across devices instead of gathering predictions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_classes", "clamp_background"))
def confusion_update(
    cm: jnp.ndarray,
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    ignore_mask: jnp.ndarray,
    num_classes: int,
    clamp_background: bool = False,
) -> jnp.ndarray:
    """Add one image's (pred, gt) pair into conf (K+1, K+1) int32.

    pred/gt: int32 arrays of the same shape; ignore_mask: bool, True where gt
    is void (or padding).
    """
    K = num_classes
    if clamp_background:
        pred = jnp.minimum(pred, 20)
    gt = jnp.where(ignore_mask, K, jnp.clip(gt, 0, K - 1))
    idx = (pred * (K + 1) + gt).reshape(-1)
    upd = jnp.zeros(((K + 1) * (K + 1),), jnp.int32).at[idx].add(1)
    return cm + upd.reshape(K + 1, K + 1)


class ConfusionAccumulator:
    # spill the on-device int32 matrix to a host int64 before the counts
    # indexed since the last spill could push any cell past int32 (TPU x64
    # is off, so the device matrix cannot simply be widened); one (K+1)^2
    # fetch per ~1.5e9 pixels is amortized to nothing
    _SPILL_PIXELS = 1_500_000_000

    def __init__(self, num_classes: int, ignore_label: int, clamp_background: bool = False):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.clamp_background = clamp_background
        self.cm = jnp.zeros((num_classes + 1, num_classes + 1), jnp.int32)
        self._host = np.zeros((num_classes + 1, num_classes + 1), np.int64)
        self._px = 0

    def update(self, pred, gt) -> None:
        pred = jnp.asarray(pred, jnp.int32)
        gt = jnp.asarray(gt, jnp.int32)
        if self._px + pred.size > self._SPILL_PIXELS:
            self._spill()
        self._px += pred.size
        ignore = gt == self.ignore_label
        self.cm = confusion_update(self.cm, pred, gt, ignore, self.num_classes, self.clamp_background)

    def _spill(self) -> None:
        self._host += np.asarray(self.cm, dtype=np.int64)
        self.cm = jnp.zeros((self.num_classes + 1, self.num_classes + 1), jnp.int32)
        self._px = 0

    def matrix(self) -> np.ndarray:
        return self._host + np.asarray(self.cm, dtype=np.int64)

    def metrics(self) -> dict:
        return semseg_metrics(self.matrix())


def semseg_metrics(conf: np.ndarray) -> dict:
    """detectron2-identical mIoU/fwIoU/mACC/pACC + per-class IoU/ACC."""
    conf = np.asarray(conf, dtype=np.float64)
    K = conf.shape[0] - 1
    acc = np.full(K, np.nan)
    iou = np.full(K, np.nan)
    tp = conf.diagonal()[:-1]
    pos_gt = conf[:-1, :-1].sum(axis=0)
    class_weights = pos_gt / max(pos_gt.sum(), 1)
    pos_pred = conf[:-1, :-1].sum(axis=1)
    acc_valid = pos_gt > 0
    acc[acc_valid] = tp[acc_valid] / pos_gt[acc_valid]
    union = pos_gt + pos_pred - tp
    iou_valid = np.logical_and(acc_valid, union > 0)
    iou[iou_valid] = tp[iou_valid] / union[iou_valid]
    macc = np.sum(acc[acc_valid]) / max(acc_valid.sum(), 1)
    miou = np.sum(iou[iou_valid]) / max(iou_valid.sum(), 1)
    fiou = np.sum(iou[iou_valid] * class_weights[iou_valid])
    pacc = tp.sum() / max(pos_gt.sum(), 1)
    return {
        "mIoU": 100 * miou,
        "fwIoU": 100 * fiou,
        "mACC": 100 * macc,
        "pACC": 100 * pacc,
        "IoU": 100 * iou,
        "ACC": 100 * acc,
    }


def gzero_metrics(conf: np.ndarray, seen: list[int], unseen: list[int]) -> dict:
    """Generalized zero-shot split metrics (plain_train_net.py:99-205):
    per-class IoU partitioned into seen/unseen + harmonic mean."""
    m = semseg_metrics(conf)
    iou = m["IoU"]
    seen_iou = np.nanmean(iou[list(seen)])
    unseen_iou = np.nanmean(iou[list(unseen)])
    harmonic = 2 * seen_iou * unseen_iou / max(seen_iou + unseen_iou, 1e-12)
    m.update({"mIoU_seen": seen_iou, "mIoU_unseen": unseen_iou, "hIoU": harmonic})
    return m


def gt_upload_dtype(num_classes: int, ignore: int):
    """Smallest numpy dtype that can carry GT labels (and the ignore value)
    to the device — the tunnel's h2d path is the eval bottleneck, labels
    widen to int32 on device.  A negative/oversized ignore label falls back
    to int32 instead of silently wrapping in the unsigned dtypes."""
    if num_classes <= 255 and 0 <= ignore <= 255:
        return np.uint8
    if num_classes <= 65535 and 0 <= ignore <= 65535:
        return np.uint16
    return np.int32
