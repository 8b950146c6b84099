"""Mesh-sharded eval: 8 virtual devices, cm identical to sequential path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from catseg_tpu.core import catseg
from catseg_tpu.evaluation.distributed import evaluate_sharded
from catseg_tpu.evaluation.miou import ConfusionAccumulator
from catseg_tpu.infer.pipeline import Predictor, resize_argmax_dynamic
from catseg_tpu.parallel.mesh import make_mesh

from test_catseg_model import mini_cfg


# n_images: non-multiple and multiple of the dispatch batch (4 devices x pdb);
# pdb=2 is the product default (per-device batching), 9 images = 2 flushes + tail
@pytest.mark.parametrize("n_images,pdb", [(3, 1), (4, 1), (9, 2)])
def test_sharded_eval_matches_sequential(n_images, pdb):
    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    T = 6
    text = rng.randn(T, 1, 48).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    items = []
    for i in range(n_images):
        h, w = (200 + 4 * i, 260 - 10 * i)
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        gt = rng.randint(0, T, (h + 20, w + 20)).astype(np.int32)
        gt[:5] = 255
        items.append((img, gt))

    mesh = make_mesh(n_data=4, n_class=1)
    cm = evaluate_sharded(
        params, cfg, mesh, items, text,
        input_canvas=(256, 512), out_canvas=(256, 512),
        num_classes=T, ignore=255, per_device_batch=pdb,
    )

    # sequential reference
    pred_seq = Predictor(params, cfg, [f"c{i}" for i in range(T)], text_feats=text,
                         input_canvas=(256, 512))
    acc = ConfusionAccumulator(T, 255)
    for img, gt in items:
        H, W = gt.shape
        probs = pred_seq.probs_sliding(img)
        pred = resize_argmax_dynamic(probs, jnp.asarray([H, W], np.int32), (256, 512))
        gt_pad = np.full((256, 512), 255, np.int32)
        gt_pad[:H, :W] = gt
        acc.update(pred, gt_pad)
    want = acc.matrix()
    # padding slots in the sharded path add counts only to the ignore column K.
    # vmap reorders fp accumulation, which can flip an argmax near-tie on a
    # handful of pixels — allow a sub-ppm count drift, not exact equality.
    got = cm[:, :T]
    ref = want[:, :T]
    assert got.sum() == ref.sum()
    assert np.abs(got - ref).sum() <= 8, (got - ref)
