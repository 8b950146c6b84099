"""Automatic mask generator smoke + components."""

import numpy as np

import jax

from catseg_tpu.core import sam as jsam
from catseg_tpu.core.sam_decoder import init_sam_prompt_decoder
from catseg_tpu.infer.amg import AutomaticMaskGenerator, build_point_grid, stability_score, _nms

import jax.numpy as jnp


def test_point_grid():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert 0 < g.min() and g.max() < 1


def test_stability_score():
    logits = jnp.asarray(np.full((1, 8, 8), 5.0, np.float32))
    s = stability_score(logits)
    assert float(s[0]) == 1.0  # far above threshold: fully stable


def test_nms():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [20, 20, 30, 30]], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    keep = _nms(boxes, scores, 0.5)
    assert keep == [0, 2]


def test_amg_end_to_end_small():
    var = jsam.SAMVariant(img_size=64, patch=8, width=32, layers=2, heads=4,
                          out_chans=32, window=2, global_blocks=(1,))
    sam_params = jsam.init_sam_params(jax.random.PRNGKey(0), var)
    pe, dec = init_sam_prompt_decoder(jax.random.PRNGKey(1), dim=32, depth=2, mlp_dim=64)
    amg = AutomaticMaskGenerator(sam_params, pe, dec, var, points_per_side=3,
                                 pred_iou_thresh=-1e9, stability_score_thresh=-1e9,
                                 box_nms_thresh=0.9)
    img = np.random.RandomState(0).randn(64, 64, 3).astype(np.float32)
    records = amg.generate(img)
    assert len(records) >= 1
    r = records[0]
    assert set(r) == {"segmentation", "bbox", "predicted_iou", "stability_score", "point_coords"}
    assert r["segmentation"]["size"] == [32, 32]  # 4 * grid (64/8=8 -> 32)
