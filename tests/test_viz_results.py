"""Round-trip: predictions dump -> viz_results re-render (the reference's
visualize_json_results.py capability)."""

import json
import os

import numpy as np
from PIL import Image

from catseg_tpu.evaluation.coco_dump import PredictionDumper
from catseg_tpu.tools.viz_results import render_predictions_json


def test_dump_render_roundtrip(tmp_path):
    root = str(tmp_path)
    img_dir = os.path.join(root, "VOCdevkit/VOC2012/JPEGImages")
    gt_dir = os.path.join(root, "VOCdevkit/VOC2012/annotations_detectron2/val")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    rng = np.random.RandomState(0)
    img_paths = []
    for i, (h, w) in enumerate([(40, 60), (50, 30)]):
        p = os.path.join(img_dir, f"im{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        Image.fromarray(rng.randint(0, 20, (h, w)).astype(np.uint8)).save(
            os.path.join(gt_dir, f"im{i}.png"))
        img_paths.append(p)

    dump = str(tmp_path / "preds.json")
    d = PredictionDumper(dump)
    preds = {}
    for p, (h, w) in zip(img_paths, [(40, 60), (50, 30)]):
        preds[p] = rng.randint(0, 20, (h, w)).astype(np.int32)
        d.add(preds[p], p)
    d.write()

    out = str(tmp_path / "viz")
    n = render_predictions_json(dump, out, "voc20", root=root)
    assert n == 2
    files = sorted(os.listdir(out))
    assert files == ["im0.jpg", "im1.jpg"]
    panel = np.asarray(Image.open(os.path.join(out, "im0.jpg")))
    assert panel.shape == (40, 3 * 60, 3)  # [image | pred | gt]

    # the rebuilt argmax map must equal the dumped prediction: re-decode
    from catseg_tpu.native import rle_decode

    recs = [r for r in json.load(open(dump)) if r["file_name"] == img_paths[0]]
    sem = np.full((40, 60), 255, np.int32)
    for r in recs:
        sem[rle_decode(r["segmentation"]).astype(bool)] = r["category_id"]
    np.testing.assert_array_equal(sem, preds[img_paths[0]])


def test_dump_uses_dataset_ids_and_viz_inverts():
    """COCO-stuff/ADE-847 dumps carry DATASET category ids (the reference
    evaluator maps contiguous -> dataset before dumping,
    plain_train_net.py:210-216); the renderer inverts them back."""
    from catseg_tpu.data.catalogs import DATASETS
    from catseg_tpu.evaluation.coco_dump import dataset_id_map, predictions_to_coco

    spec = DATASETS["coco_2017_test_stuff_all_sem_seg"]
    id_map = dataset_id_map(spec)
    assert id_map is not None and len(id_map) == 171
    # contiguous 11 maps to dataset id 12 (COCO stuff skips id 11)
    assert id_map[11] == 12 and id_map[0] == 0

    pred = np.zeros((4, 4), np.int32)
    pred[2:] = 11
    recs = predictions_to_coco(pred, "x.jpg", id_map)
    assert sorted(r["category_id"] for r in recs) == [0, 12]

    # datasets without registered metadata keep contiguous ids
    assert dataset_id_map(DATASETS["ade20k_150_test_sem_seg"]) is None
