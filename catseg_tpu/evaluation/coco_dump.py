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


def predictions_to_coco(pred: np.ndarray, file_name: str,
                        id_map: dict[int, int] | None = None) -> list[dict]:
    """(H, W) argmax map -> list of per-category RLE records.

    ``id_map`` maps contiguous train ids back to dataset category ids
    (the inverse of stuff_dataset_id_to_contiguous_id metadata) — the
    reference evaluator applies it before dumping
    (plain_train_net.py:210-216), so COCO-stuff/ADE-847 dumps carry the
    original non-contiguous ids."""
    out = []
    for cat in np.unique(pred):
        mask = (pred == cat).astype(np.uint8)
        out.append(
            {
                "file_name": file_name,
                "category_id": int(id_map[int(cat)]) if id_map else int(cat),
                "segmentation": rle_encode(mask),
            }
        )
    return out


def dataset_id_map(spec) -> dict[int, int] | None:
    """contiguous -> dataset-id map for a DatasetSpec (None = identity)."""
    if getattr(spec, "idmap_json", None) is None:
        return None
    import json as _json
    import os as _os

    path = _os.path.join(_os.path.dirname(__file__), "..", "data", "idmaps",
                         spec.idmap_json)
    with open(path) as f:
        fwd = _json.load(f)  # dataset_id (str) -> contiguous
    return {int(v): int(k) for k, v in fwd.items()}


class PredictionDumper:
    def __init__(self, path: str, id_map: dict[int, int] | None = None):
        self.path = path
        self.id_map = id_map
        self.records: list[dict] = []

    def add(self, pred: np.ndarray, file_name: str) -> None:
        self.records.extend(predictions_to_coco(pred, file_name, self.id_map))

    def write(self) -> None:
        with open(self.path, "w") as f:
            json.dump(self.records, f)
