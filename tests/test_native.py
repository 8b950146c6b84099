"""Native C++ codecs: build, roundtrip, and parity with numpy fallbacks."""

import numpy as np

from catseg_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of the native library failed"


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(37, 53) > 0.7).astype(np.uint8)
    rle = native.rle_encode(mask)
    assert rle["size"] == [37, 53]
    assert sum(rle["counts"]) == 37 * 53
    back = native.rle_decode(rle)
    np.testing.assert_array_equal(back, mask)


def test_rle_matches_numpy_fallback():
    rng = np.random.RandomState(1)
    mask = (rng.rand(24, 31) > 0.5).astype(np.uint8)
    got = native.rle_encode(mask)
    # independent reference: column-major runs
    flat = mask.T.reshape(-1)
    runs, cur, run = [], 0, 0
    for v in flat:
        if v == cur:
            run += 1
        else:
            runs.append(run)
            cur, run = v, 1
    runs.append(run)
    assert got["counts"] == runs


def test_rle_all_ones_starts_with_zero_run():
    mask = np.ones((4, 4), np.uint8)
    rle = native.rle_encode(mask)
    assert rle["counts"][0] == 0  # counts always start with the zero run
    np.testing.assert_array_equal(native.rle_decode(rle), mask)


def test_confusion_update_host_matches_device_semantics():
    rng = np.random.RandomState(2)
    K = 9
    pred = rng.randint(0, K, (40, 40)).astype(np.int32)
    gt = rng.randint(0, K, (40, 40)).astype(np.int32)
    gt[:3] = 255
    conf = np.zeros((K + 1, K + 1), np.int64)
    native.confusion_update_host(conf, pred, gt, ignore=255)

    want = np.zeros((K + 1, K + 1), np.int64)
    g = gt.astype(np.int64).copy()
    g[g == 255] = K
    np.add.at(want, (pred.reshape(-1), g.reshape(-1)), 1)
    np.testing.assert_array_equal(conf, want)


def test_coco_dump(tmp_path):
    from catseg_tpu.evaluation.coco_dump import PredictionDumper

    pred = np.zeros((10, 10), np.int64)
    pred[:5] = 3
    d = PredictionDumper(str(tmp_path / "preds.json"))
    d.add(pred, "img0.jpg")
    d.write()
    import json

    records = json.load(open(tmp_path / "preds.json"))
    assert {r["category_id"] for r in records} == {0, 3}
    m3 = native.rle_decode(records[1]["segmentation"])
    np.testing.assert_array_equal(m3, (pred == 3).astype(np.uint8))
