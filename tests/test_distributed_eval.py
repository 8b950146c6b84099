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


def test_gt_upload_dtype_policy():
    """Smallest-dtype GT upload policy; a negative or oversized ignore label
    must fall back to int32 instead of wrapping in the unsigned dtypes."""
    from catseg_tpu.evaluation.miou import gt_upload_dtype

    assert gt_upload_dtype(20, 255) == np.uint8
    assert gt_upload_dtype(459, 459) == np.uint16
    assert gt_upload_dtype(847, 65535) == np.uint16
    assert gt_upload_dtype(20, -1) == np.int32
    assert gt_upload_dtype(300, 255) == np.uint16


def test_sharded_eval_step_cached():
    """make_sharded_eval_step reuses one jitted executable per (cfg, mesh,
    shapes) — pjit caches on function identity, so a fresh closure per call
    would recompile the sliding pipeline for every benchmark/periodic eval."""
    from catseg_tpu.evaluation import distributed as D

    mesh = make_mesh(n_data=len(jax.devices()))
    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    rng = np.random.RandomState(0)
    text = rng.randn(7, 1, 48).astype(np.float32)
    before = len(D._step_cache)
    D.make_sharded_eval_step(cfg, mesh, text, (96, 96), 7, 255)
    assert len(D._step_cache) == before + 1
    # same key (different text *values*, same shape) -> no new executable
    D.make_sharded_eval_step(cfg, mesh, rng.randn(7, 1, 48).astype(np.float32),
                             (96, 96), 7, 255)
    assert len(D._step_cache) == before + 1
    # different class count -> new executable
    D.make_sharded_eval_step(cfg, mesh, rng.randn(9, 1, 48).astype(np.float32),
                             (96, 96), 9, 255)
    assert len(D._step_cache) == before + 2


def test_confusion_accumulator_spill(monkeypatch):
    """The int32 device matrix spills to a host int64 before overflow-scale
    counts accumulate; the summed matrix is unchanged by where spills land."""
    from catseg_tpu.evaluation.miou import ConfusionAccumulator

    rng = np.random.RandomState(0)
    preds = [rng.randint(0, 5, (16, 16)) for _ in range(5)]
    gts = [rng.randint(0, 6, (16, 16)) for _ in range(5)]  # 5 == ignore col via label 5? no: use ignore=7
    gts = [np.where(g == 5, 7, g) for g in gts]

    ref = ConfusionAccumulator(5, 7)
    for p, g in zip(preds, gts):
        ref.update(p, g)
    want = ref.matrix()

    acc = ConfusionAccumulator(5, 7)
    monkeypatch.setattr(ConfusionAccumulator, "_SPILL_PIXELS", 300)  # spill every ~2 updates
    for p, g in zip(preds, gts):
        acc.update(p, g)
    assert acc._host.sum() > 0  # spills actually happened
    np.testing.assert_array_equal(acc.matrix(), want)


def test_sharded_eval_spill(monkeypatch):
    """evaluate_sharded's host-spill path yields the same matrix as the
    unspilled run (threshold shrunk so every flush spills first)."""
    import catseg_tpu.evaluation.distributed as D

    mesh = make_mesh(n_data=len(jax.devices()))
    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    text = rng.randn(7, 1, 48).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    items = [
        (rng.randint(0, 255, (100, 120, 3)).astype(np.uint8),
         rng.randint(0, 7, (80, 96)).astype(np.int32))
        for _ in range(2 * len(jax.devices()))
    ]
    kw = dict(input_canvas=(128, 128), out_canvas=(96, 96), num_classes=7,
              ignore=255, per_device_batch=1)
    want = D.evaluate_sharded(params, cfg, mesh, items, text, **kw)
    monkeypatch.setattr(D, "SPILL_PIXELS", 1)
    got = D.evaluate_sharded(params, cfg, mesh, items, text, **kw)
    np.testing.assert_array_equal(got, want)
