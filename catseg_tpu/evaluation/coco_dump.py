"""COCO-format prediction dump (sem_seg_predictions.json).

Mirrors the reference evaluators' side output (SemSegEvaluator /
SemSegGzeroEvaluator, plain_train_net.py:148-228): for each image, one
record per predicted category with an uncompressed RLE of its binary mask.
Uses the native RLE codec (catseg_tpu.native).
"""

from __future__ import annotations

import json

import numpy as np

from ..native import rle_encode


def predictions_to_coco(pred: np.ndarray, file_name: str) -> list[dict]:
    """(H, W) argmax map -> list of per-category RLE records."""
    out = []
    for cat in np.unique(pred):
        mask = (pred == cat).astype(np.uint8)
        out.append(
            {
                "file_name": file_name,
                "category_id": int(cat),
                "segmentation": rle_encode(mask),
            }
        )
    return out


class PredictionDumper:
    def __init__(self, path: str):
        self.path = path
        self.records: list[dict] = []

    def add(self, pred: np.ndarray, file_name: str) -> None:
        self.records.extend(predictions_to_coco(pred, file_name))

    def write(self) -> None:
        with open(self.path, "w") as f:
            json.dump(self.records, f)
