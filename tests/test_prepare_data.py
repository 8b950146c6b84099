"""GT-preparation converters (tools/prepare_data.py) on synthetic inputs.

Each converter's remap rule is checked against the reference prepare script
semantics (datasets/prepare_*.py); ade847 additionally covers the R/G seg-png
decoding and the short-side-512 resize rule (prepare_ade20k_full.py:932-1010).
"""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from catseg_tpu.tools import prepare_data


def test_remap_defaults_to_ignore():
    mask = np.array([[0, 1], [2, 200]], dtype=np.uint8)
    out = prepare_data.remap(mask, {0: 5, 2: 7})
    assert out.tolist() == [[5, 255], [7, 255]]


def test_ade847_idmap_table():
    with open(os.path.join(prepare_data.IDMAP_DIR, "ade847.json")) as f:
        idmap = {int(k): int(v) for k, v in json.load(f).items()}
    assert len(idmap) == 847
    assert sorted(idmap.values()) == list(range(847))
    # spot values from prepare_ade20k_full.py's table
    assert idmap[2978] == 0      # wall
    assert idmap[312] == 1       # building, edifice
    assert idmap[3148] == 846    # adding machine


def _write_ade847_fixture(root, fname, size, raw_ids):
    """Create <root>/ADE20K_val/<fname> (+ _seg.png) holding raw_ids."""
    folder = "ADE20K_val"
    os.makedirs(os.path.join(root, folder), exist_ok=True)
    h, w = size
    img = np.random.RandomState(0).randint(0, 255, (h, w, 3), dtype=np.uint8)
    Image.fromarray(img).save(os.path.join(root, folder, fname))
    raw = np.asarray(raw_ids, dtype=np.int32)
    seg = np.zeros((h, w, 3), dtype=np.uint8)
    seg[:, :, 0] = (raw // 256) * 10
    seg[:, :, 1] = raw % 256
    Image.fromarray(seg).save(os.path.join(root, folder, fname.replace(".jpg", "_seg.png")))
    return folder


def test_prepare_ade847(tmp_path):
    root = str(tmp_path)
    base = os.path.join(root, "ADE20K_2021_17_01")
    os.makedirs(base)

    # small val image: 2978 -> 0, 312 -> 1, 9 (unmapped) -> 65535
    raw = np.array([[2978, 312], [312, 9]], dtype=np.int32)
    raw = np.kron(raw, np.ones((8, 8), dtype=np.int32))  # 16x16
    f_small = _write_ade847_fixture(root, "ADE_val_00000001.jpg", raw.shape, raw)
    # large val image (600x700): short side > 512 triggers the resize
    big = np.full((600, 700), 2978, dtype=np.int32)
    f_big = _write_ade847_fixture(root, "ADE_val_00000002.jpg", big.shape, big)
    # train image must be skipped
    f_train = _write_ade847_fixture(root, "ADE_train_00000003.jpg", (8, 8),
                                    np.full((8, 8), 312, np.int32))

    index = {
        "folder": [f_small, f_big, f_train],
        "filename": ["ADE_val_00000001.jpg", "ADE_val_00000002.jpg", "ADE_train_00000003.jpg"],
    }
    with open(os.path.join(base, "index_ade20k.pkl"), "wb") as f:
        pickle.dump(index, f)

    prepare_data.prepare_ade847(root)

    ann = os.path.join(base, "annotations_detectron2", "validation")
    imgs = os.path.join(base, "images_detectron2", "validation")
    assert sorted(os.listdir(ann)) == ["ADE_val_00000001.tif", "ADE_val_00000002.tif"]

    lab = np.asarray(Image.open(os.path.join(ann, "ADE_val_00000001.tif")))
    assert lab.dtype == np.uint16
    assert lab[0, 0] == 0 and lab[0, 15] == 1 and lab[15, 15] == 65535

    lab2 = np.asarray(Image.open(os.path.join(ann, "ADE_val_00000002.tif")))
    img2 = np.asarray(Image.open(os.path.join(imgs, "ADE_val_00000002.jpg")))
    assert lab2.shape == (512, round(700 / 600 * 512))
    assert img2.shape[:2] == lab2.shape
    assert (lab2 == 0).all()


def test_prepare_ade150(tmp_path):
    base = os.path.join(str(tmp_path), "ADEChallengeData2016")
    src = os.path.join(base, "annotations", "validation")
    os.makedirs(src)
    m = np.array([[0, 1], [2, 151]], dtype=np.uint8)  # 0 -> 255 (ignore)
    Image.fromarray(m).save(os.path.join(src, "a.png"))
    prepare_data.prepare_ade150(str(tmp_path))
    out = np.asarray(Image.open(os.path.join(base, "annotations_detectron2", "validation", "a.png")))
    assert out.tolist() == [[255, 0], [1, 150]]


@pytest.mark.parametrize("background,expect0", [(False, 255), (True, 20)])
def test_prepare_voc(tmp_path, background, expect0):
    base = os.path.join(str(tmp_path), "VOCdevkit", "VOC2012")
    src = os.path.join(base, "SegmentationClassAug")
    os.makedirs(src)
    m = np.array([[0, 1], [20, 255]], dtype=np.uint8)
    Image.fromarray(m).save(os.path.join(src, "a.png"))
    prepare_data.prepare_voc(str(tmp_path), background=background)
    sub = "annotations_detectron2_bg" if background else "annotations_detectron2"
    out = np.asarray(Image.open(os.path.join(base, sub, "val", "a.png")))
    assert out[0, 0] == expect0      # background
    assert out[0, 1] == 0            # class 1 -> trainId 0
    assert out[1, 0] == 19           # class 20 -> trainId 19
    assert out[1, 1] == 255          # ignore stays ignore
