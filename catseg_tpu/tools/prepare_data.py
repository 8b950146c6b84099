"""Ground-truth preparation — the datasets/prepare_*.py equivalents.

    python -m catseg_tpu.tools.prepare_data --dataset coco|ade150|voc|vocb|pc59|pc459 \
        [--root $DETECTRON2_DATASETS]

Converts raw dataset annotations into the contiguous-trainId PNG/TIFF layout
the catalogs expect (catseg_tpu/data/catalogs.py documents every directory).
Remap tables extracted from the reference prepare scripts live as JSON data
in catseg_tpu/data/idmaps/.

Per-dataset rules (reference file cited):
- coco   (prepare_coco_stuff.py): stuffthingmaps id -> trainId via the
  171-entry table; unmapped ids -> 255.
- ade150 (prepare_ade20k_150.py): annotations/*.png minus 1 (0/ignore wraps
  to 255).
- voc / vocb (prepare_voc.py): SegmentationClassAug ids 1..20 -> 0..19;
  background 0 -> 255 (voc) or 20 (vocb); 255 stays ignore.
- pc59  (prepare_pascal_context_59.py): trainval_merged.json mask ids
  through the sorted 60-id table (background -> 255).
- pc459 (prepare_pascal_context_459.py): scipy .mat LabelMap minus 1, saved
  as 16-bit TIFF.
- ade847 (prepare_ade20k_full.py): *_seg.png R/G channels decode to raw class
  ids ((R/10)*256 + G); 847-entry id -> trainId table, unmapped -> 65535;
  images and labels resized so the short side is <= 512; 16-bit TIFF labels.
  Validation split only (same as the reference, prepare_ade20k_full.py:944+).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image

IDMAP_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "idmaps")


def _load_idmap(name: str) -> dict[int, int]:
    with open(os.path.join(IDMAP_DIR, name)) as f:
        return {int(k): int(v) for k, v in json.load(f).items()}


def remap(mask: np.ndarray, idmap: dict[int, int], default: int = 255) -> np.ndarray:
    lut = np.full(max(max(idmap) + 1, 256), default, dtype=np.int32)
    for k, v in idmap.items():
        lut[k] = v
    return lut[np.clip(mask, 0, len(lut) - 1)].astype(np.uint8)


def _convert_dir(src: str, dst: str, fn, src_ext=".png", dst_ext=".png"):
    os.makedirs(dst, exist_ok=True)
    files = sorted(f for f in os.listdir(src) if f.endswith(src_ext))
    for i, f in enumerate(files):
        out = fn(os.path.join(src, f))
        out_name = f[: -len(src_ext)] + dst_ext
        Image.fromarray(out).save(os.path.join(dst, out_name))
        if (i + 1) % 500 == 0:
            print(f"  {i + 1}/{len(files)}")
    print(f"converted {len(files)} masks -> {dst}")


def prepare_coco(root: str) -> None:
    idmap = _load_idmap("coco_stuff_171.json")
    for split in ("train2017", "val2017"):
        src = os.path.join(root, "coco-stuff", "stuffthingmaps", split)
        dst = os.path.join(root, "coco-stuff", "annotations_detectron2", split)
        _convert_dir(src, dst, lambda p: remap(np.asarray(Image.open(p)), idmap))


def prepare_ade150(root: str) -> None:
    base = os.path.join(root, "ADEChallengeData2016")
    src = os.path.join(base, "annotations", "validation")
    dst = os.path.join(base, "annotations_detectron2", "validation")
    _convert_dir(src, dst, lambda p: (np.asarray(Image.open(p)).astype(np.int32) - 1).astype(np.uint8))


def prepare_voc(root: str, background: bool = False) -> None:
    idmap = _load_idmap("voc20b.json" if background else "voc20.json")
    base = os.path.join(root, "VOCdevkit", "VOC2012")
    src = os.path.join(base, "SegmentationClassAug")
    sub = "annotations_detectron2_bg" if background else "annotations_detectron2"
    dst = os.path.join(base, sub, "val")
    _convert_dir(src, dst, lambda p: remap(np.asarray(Image.open(p)), idmap))


def prepare_pc59(root: str) -> None:
    idmap = _load_idmap("pc59.json")
    base = os.path.join(root, "VOCdevkit", "VOC2010")
    src = os.path.join(base, "SegmentationClassContext")
    dst = os.path.join(base, "annotations_detectron2", "pc59_val")
    _convert_dir(src, dst, lambda p: remap(np.asarray(Image.open(p)), idmap))


def prepare_pc459(root: str) -> None:
    import scipy.io

    base = os.path.join(root, "VOCdevkit", "VOC2010")
    src = os.path.join(base, "trainval")
    dst = os.path.join(base, "annotations_detectron2", "pc459_val")
    os.makedirs(dst, exist_ok=True)
    files = sorted(f for f in os.listdir(src) if f.endswith(".mat"))
    for f in files:
        mask = scipy.io.loadmat(os.path.join(src, f))["LabelMap"].astype(np.int32) - 1
        assert mask.min() >= 0
        Image.fromarray(mask.astype(np.uint16)).save(os.path.join(dst, f[:-4] + ".tif"), "TIFF")
    print(f"converted {len(files)} masks -> {dst}")


def prepare_ade847(root: str) -> None:
    """ADE20K-full validation GT (prepare_ade20k_full.py:932-1010).

    Reads index_ade20k.pkl for the file list, decodes each *_seg.png's R/G
    channels into raw ADE class ids, remaps through the 847-entry table
    (unmapped -> 65535), downscales images/labels whose short side exceeds
    512 (cv2 linear / nearest, matching the reference), and writes uint16
    TIFF labels + jpg images into the detectron2 layout."""
    import pickle

    import cv2

    idmap = _load_idmap("ade847.json")
    lut = np.full(3500, 65535, dtype=np.uint16)
    for k, v in idmap.items():
        lut[k] = v

    base = os.path.join(root, "ADE20K_2021_17_01")
    with open(os.path.join(base, "index_ade20k.pkl"), "rb") as f:
        index = pickle.load(f)

    img_dir = os.path.join(base, "images_detectron2", "validation")
    ann_dir = os.path.join(base, "annotations_detectron2", "validation")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    n = 0
    for folder, fname in zip(index["folder"], index["filename"]):
        if fname.split("_")[1] != "val":
            continue
        img_path = os.path.join(root, folder, fname)
        seg = np.asarray(Image.open(img_path.replace(".jpg", "_seg.png")))
        raw = (seg[:, :, 0] // 10).astype(np.int32) * 256 + seg[:, :, 1].astype(np.int32)
        img = np.asarray(Image.open(img_path))

        h, w = img.shape[:2]
        if min(h, w) > 512:
            if w >= h:
                h2, w2 = 512, round(w / h * 512)
            else:
                h2, w2 = round(h / w * 512), 512
            img = cv2.resize(img, (w2, h2), interpolation=cv2.INTER_LINEAR)
            raw = cv2.resize(raw, (w2, h2), interpolation=cv2.INTER_NEAREST)

        Image.fromarray(img).save(os.path.join(img_dir, fname))
        Image.fromarray(lut[np.clip(raw, 0, len(lut) - 1)]).save(
            os.path.join(ann_dir, fname.replace(".jpg", ".tif")), "TIFF")
        n += 1
    print(f"converted {n} masks -> {ann_dir}")


PREPARERS = {
    "coco": prepare_coco,
    "ade847": prepare_ade847,
    "ade150": prepare_ade150,
    "voc": lambda r: prepare_voc(r, background=False),
    "vocb": lambda r: prepare_voc(r, background=True),
    "pc59": prepare_pc59,
    "pc459": prepare_pc459,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, choices=sorted(PREPARERS))
    ap.add_argument("--root", default=os.environ.get("DETECTRON2_DATASETS", "datasets"))
    args = ap.parse_args(argv)
    PREPARERS[args.dataset](args.root)


if __name__ == "__main__":
    main()
