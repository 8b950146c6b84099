"""Tests: confusion/mIoU math, static-canvas resize-argmax, sliding-window
pipeline composition, text embedding pipeline."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from catseg_tpu.evaluation.miou import ConfusionAccumulator, semseg_metrics, gzero_metrics
from catseg_tpu.infer.pipeline import resize_argmax, resize_weights, sliding_window_probs, host_resize_bilinear
from catseg_tpu.ops import unfold_tiles, fold_tiles, fold_divisor
from catseg_tpu.core import catseg

from test_catseg_model import mini_cfg


def _reference_metrics(pred, gt, K, ignore):
    """detectron2-style numpy reference for the metric math."""
    conf = np.zeros((K + 1, K + 1), dtype=np.int64)
    g = gt.copy()
    g[g == ignore] = K
    np.add.at(conf, (pred.reshape(-1), g.reshape(-1)), 1)
    tp = conf.diagonal()[:-1].astype(np.float64)
    pos_gt = conf[:-1, :-1].sum(0).astype(np.float64)
    pos_pred = conf[:-1, :-1].sum(1).astype(np.float64)
    valid = pos_gt > 0
    iou = tp[valid] / (pos_gt[valid] + pos_pred[valid] - tp[valid])
    return 100 * iou.mean(), conf


def test_confusion_and_miou():
    rng = np.random.RandomState(0)
    K = 7
    pred = rng.randint(0, K, (50, 60)).astype(np.int32)
    gt = rng.randint(0, K, (50, 60)).astype(np.int32)
    gt[:5] = 255
    acc = ConfusionAccumulator(K, 255)
    acc.update(pred, gt)
    want_miou, want_conf = _reference_metrics(pred, gt, K, 255)
    np.testing.assert_array_equal(acc.matrix(), want_conf)
    got = acc.metrics()
    np.testing.assert_allclose(got["mIoU"], want_miou, rtol=1e-9)
    assert 0 <= got["pACC"] <= 100


def test_vocb_clamp():
    K = 21
    pred = np.full((4, 4), 25, np.int32)  # background prompt variants >= 20
    gt = np.full((4, 4), 20, np.int32)
    acc = ConfusionAccumulator(K, 255, clamp_background=True)
    acc.update(pred, gt)
    m = acc.metrics()
    assert m["pACC"] == 100.0  # all clamped to 20 == background gt


def test_gzero_metrics():
    conf = np.zeros((5, 5), dtype=np.int64)
    conf[0, 0] = 10
    conf[1, 1] = 5
    conf[1, 2] = 5  # class 2 half-confused
    conf[2, 2] = 5
    conf[3, 3] = 10
    m = gzero_metrics(conf, seen=[0, 1], unseen=[2, 3])
    # class0 IoU=1, class1 tp=5 gt=5 pred=10 -> 0.5; class2 tp=5 gt=10 pred=5 -> 0.5; class3=1
    assert m["mIoU_seen"] == pytest.approx(100 * (1.0 + 0.5) / 2)
    assert m["mIoU_unseen"] == pytest.approx(100 * (0.5 + 1.0) / 2)
    h = 2 * m["mIoU_seen"] * m["mIoU_unseen"] / (m["mIoU_seen"] + m["mIoU_unseen"])
    assert m["hIoU"] == pytest.approx(h)


def test_resize_argmax_matches_torch():
    rng = np.random.RandomState(1)
    T, h, w = 37, 20, 20
    H, W, Hc, Wc = 53, 47, 64, 64
    probs = rng.rand(h, w, T).astype(np.float32)
    want = F.interpolate(torch.from_numpy(probs).permute(2, 0, 1)[None], size=(H, W),
                         mode="bilinear", align_corners=False)[0].argmax(0).numpy()
    pred = resize_argmax(jnp.asarray(probs), jnp.asarray(resize_weights(h, H, Hc)),
                         jnp.asarray(resize_weights(w, W, Wc)), chunk=8)
    got = np.asarray(pred)[:H, :W]
    # ties under fp reordering are astronomically unlikely with random floats
    np.testing.assert_array_equal(got, want)


def test_dynamic_weights_match_host():
    from catseg_tpu.ops.resize import bilinear_row_weights_dynamic, _linear_weights

    for in_size, out_size, pad in [(640, 384, 1024), (427, 640, 512), (96, 53, 96), (64, 64, 64)]:
        got = np.asarray(bilinear_row_weights_dynamic(out_size, jnp.asarray(in_size), pad))
        want = np.zeros((out_size, pad), np.float32)
        want[:, :in_size] = _linear_weights(in_size, out_size, False)
        np.testing.assert_allclose(got, want, atol=1e-6)
    # row masking for padded output canvases
    got = np.asarray(bilinear_row_weights_dynamic(64, jnp.asarray(32), 64, valid_out=jnp.asarray(40)))
    assert (got[40:] == 0).all() and (np.abs(got[:40]).sum(axis=1) > 0).all()


def test_resize_argmax_dynamic_matches_static():
    from catseg_tpu.infer.pipeline import resize_argmax_dynamic

    rng = np.random.RandomState(5)
    probs = rng.rand(20, 20, 9).astype(np.float32)
    want = F.interpolate(torch.from_numpy(probs).permute(2, 0, 1)[None], size=(33, 47),
                         mode="bilinear", align_corners=False)[0].argmax(0).numpy()
    pred = resize_argmax_dynamic(jnp.asarray(probs), jnp.asarray([33, 47], np.int32), (64, 64), chunk=4)
    np.testing.assert_array_equal(np.asarray(pred)[:33, :47], want)


def test_host_resize_matches_torch():
    rng = np.random.RandomState(2)
    img = rng.rand(37, 53, 3).astype(np.float32) * 255
    want = F.interpolate(torch.from_numpy(img).permute(2, 0, 1)[None], size=(64, 64),
                         mode="bilinear", align_corners=False)[0].permute(1, 2, 0).numpy()
    got = host_resize_bilinear(img, (64, 64))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


def test_sliding_window_composition():
    """Pipeline == manual composition of (unfold -> model -> fold/avg)."""
    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    assert cfg.sw_stride == 64
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (200, 300, 3)).astype(np.float32)
    text = rng.randn(6, 1, 48).astype(np.float32)

    img640 = host_resize_bilinear(img, (256, 256))
    imgk = host_resize_bilinear(img, (128, 128))
    got = sliding_window_probs(params, jnp.asarray(img640), jnp.asarray(imgk), jnp.asarray(text), cfg)
    assert got.shape == (256, 256, 6)

    # manual: tiles through the plain forward
    tiles = np.asarray(unfold_tiles(jnp.asarray(img640[None]), 128, 64))
    batch = np.concatenate([tiles, imgk[None]], axis=0)
    logits = np.asarray(catseg.forward(params, jnp.asarray(batch), jnp.asarray(text), cfg))
    lt = F.interpolate(torch.from_numpy(logits), size=(128, 128), mode="bilinear", align_corners=False)
    probs = torch.sigmoid(lt).permute(0, 2, 3, 1).numpy()
    folded = np.asarray(fold_tiles(jnp.asarray(probs[:-1]), (256, 256), 128, 64))[0]
    folded = folded / fold_divisor((256, 256), 128, 64)
    glob = F.interpolate(torch.sigmoid(lt[-1:]), size=(256, 256), mode="bilinear", align_corners=False)
    want = (folded + glob[0].permute(1, 2, 0).numpy()) / 2
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_sliding_window_batch_matches_single():
    """probs_sliding_batch / resize_argmax_dynamic_batch == per-image paths."""
    from catseg_tpu.infer.pipeline import (
        Predictor, resize_argmax_dynamic, resize_argmax_dynamic_batch)

    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(5)
    text = rng.randn(6, 1, 48).astype(np.float32)
    images = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
              for h, w in [(200, 300), (250, 140)]]
    pred = Predictor(params, cfg, [f"c{i}" for i in range(6)], text_feats=text,
                     input_canvas=(256, 512))

    batched = np.asarray(pred.probs_sliding_batch(images))
    singles = np.stack([np.asarray(pred.probs_sliding(im)) for im in images])
    np.testing.assert_allclose(batched, singles, atol=2e-5, rtol=1e-4)

    hws = np.array([[180, 270], [230, 120]], np.int32)
    am_b = np.asarray(resize_argmax_dynamic_batch(
        jnp.asarray(batched), jnp.asarray(hws), (256, 512)))
    for i in range(2):
        am_s = np.asarray(resize_argmax_dynamic(
            jnp.asarray(singles[i]), jnp.asarray(hws[i]), (256, 512)))
        np.testing.assert_array_equal(am_b[i], am_s)


def test_text_embed_pipeline():
    from catseg_tpu.core.clip import init_clip_params
    from catseg_tpu.text.embed import forward_text_embeds, class_embeddings_ensemble
    from test_clip_parity import VARIANT

    # tiny vocab forces a stub tokenizer; use the real one but truncate ids
    pytest.importorskip("regex")
    from catseg_tpu.configs import CLIPVariant

    var = CLIPVariant("mini", 8, 64, 2, 4, 32, 32, 48, 4, 2, vocab_size=49408, context=77)
    params = init_clip_params(jax.random.PRNGKey(0), var)
    names = ["cat", "dog, puppy"]
    fw = forward_text_embeds(params["clip"] if "clip" in params else params, names, "single", var)
    assert fw.shape == (2, 1, 32)
    np.testing.assert_allclose(np.linalg.norm(fw, axis=-1), 1.0, rtol=1e-5)
    ens = class_embeddings_ensemble(params, names, "single", var)
    assert ens.shape == (2, 1, 32)
    # first class has one synonym: forward path and ensemble agree
    np.testing.assert_allclose(fw[0], ens[0], atol=1e-5)


def test_whole_image_probs_matches_reference_composition():
    """Non-sliding branch == normalize -> zero-pad to 384-divisible ->
    resize to clip_res -> forward -> sigmoid (cat_seg_model.py:147-155)."""
    from catseg_tpu.infer.pipeline import whole_image_probs_from_canvas
    from catseg_tpu.configs import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD

    cfg = mini_cfg(crop_size=64)  # SIZE_DIVISIBILITY 64 for the mini model
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    h, w = 100, 150
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    text = rng.randn(5, 1, 48).astype(np.float32)

    canvas = np.zeros((128, 192, 3), np.float32)
    canvas[:h, :w] = img
    got = whole_image_probs_from_canvas(
        params, jnp.asarray(canvas), jnp.asarray([h, w], np.int32), jnp.asarray(text), cfg
    )
    assert got.shape == (cfg.feature_resolution[0] * 4, cfg.feature_resolution[1] * 4, 5)

    # reference composition: normalized pad to ceil-div (128, 192) then resize
    mean = np.asarray(CLIP_PIXEL_MEAN, np.float32)
    std = np.asarray(CLIP_PIXEL_STD, np.float32)
    norm = np.zeros((128, 192, 3), np.float32)
    norm[:h, :w] = (img - mean) / std
    t_in = F.interpolate(torch.from_numpy(norm).permute(2, 0, 1)[None],
                         size=(cfg.clip_resolution, cfg.clip_resolution),
                         mode="bilinear", align_corners=False)[0].permute(1, 2, 0).numpy()
    from catseg_tpu.core.catseg import clip_guidance_features
    from catseg_tpu.core.aggregator import aggregator_forward

    feats, guid = clip_guidance_features(params, jnp.asarray(t_in)[None], cfg)
    logits = aggregator_forward(params["agg"], feats, jnp.asarray(text)[None], guid, cfg)[0]
    want = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32))).transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_train_checkpoint_resume_roundtrip(tmp_path):
    from catseg_tpu.train import init_train_state
    from catseg_tpu.train.checkpoint import save_train_state, load_train_state, latest_checkpoint

    cfg = mini_cfg()
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    path = save_train_state(str(tmp_path), state.params, state.opt_state, 42)
    assert latest_checkpoint(str(tmp_path)) == path

    state2, _ = init_train_state(jax.random.PRNGKey(1), cfg)
    params, opt_state, step = load_train_state(path, state2.params, state2.opt_state)
    assert step == 42
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_event_writer(tmp_path):
    from catseg_tpu.utils.events import EventWriter
    import json as _json

    w = EventWriter(str(tmp_path))
    w.write(1, loss_sem_seg=0.5, lr=1e-4)
    w.write(2, loss_sem_seg=0.4)
    w.close()
    lines = open(tmp_path / "metrics.json").read().strip().split("\n")
    assert len(lines) == 2
    rec = _json.loads(lines[0])
    assert rec["iteration"] == 1 and rec["loss_sem_seg"] == 0.5
    assert (tmp_path / "log.txt").exists()


def test_tta_probs_flip_consistency():
    """TTAPredictor.probs averages hflip probabilities: on a horizontally
    symmetric image the TTA output must itself be symmetric, and TTA of any
    image must equal manual flip-averaging of the base predictor."""
    import jax
    from catseg_tpu.core import catseg
    from catseg_tpu.infer.pipeline import Predictor
    from catseg_tpu.infer.tta import TTAPredictor
    from test_catseg_model import mini_cfg

    cfg = mini_cfg().replace(sliding_window=False)
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    T = 5
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    pred = Predictor(params, cfg, [f"c{i}" for i in range(T)], text_feats=text,
                     input_canvas=(128, 128))
    tta = TTAPredictor(pred, min_sizes=None)  # cheap single-scale mode
    img = rng.randint(0, 255, (128, 128, 3), dtype=np.uint8)

    base = np.asarray(pred.probs(img))
    base_f = np.asarray(pred.probs(np.ascontiguousarray(img[:, ::-1])))
    want = (base + base_f[:, ::-1]) / 2.0
    got = np.asarray(tta.probs(img))
    np.testing.assert_allclose(got, want, atol=1e-6)

    sym = np.concatenate([img[:, :64], img[:, :64][:, ::-1]], axis=1)
    p_sym = np.asarray(tta.probs(np.ascontiguousarray(sym)))
    np.testing.assert_allclose(p_sym, p_sym[:, ::-1], atol=1e-5)

    # sliding branch: TTA rides the 2-image batch path (one dispatch) and
    # must equal manual flip-averaging of the per-image sliding pipeline
    cfg_s = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    pred_s = Predictor(params, cfg_s, [f"c{i}" for i in range(T)], text_feats=text,
                       input_canvas=(256, 256))
    tta_s = TTAPredictor(pred_s, min_sizes=None)
    img2 = rng.randint(0, 255, (200, 230, 3), dtype=np.uint8)
    base = np.asarray(pred_s.probs_sliding(img2))
    base_f = np.asarray(pred_s.probs_sliding(np.ascontiguousarray(img2[:, ::-1])))
    want = (base + base_f[:, ::-1]) / 2.0
    got = np.asarray(tta_s.probs(img2))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_train_interrupt_saves_checkpoint(tmp_path):
    """KeyboardInterrupt mid-loop leaves a resumable checkpoint on disk."""
    from catseg_tpu.train import init_train_state
    from catseg_tpu.train.checkpoint import latest_checkpoint
    from catseg_tpu.train.loop import train

    cfg = mini_cfg()
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    tokens = np.zeros((cfg.num_classes, 16), np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1] = 49407

    def data():
        n = 0
        while True:
            if n >= 2:
                raise KeyboardInterrupt
            n += 1
            yield (rng.rand(1, cfg.crop_size, cfg.crop_size, 3).astype(np.float32) * 255,
                   rng.randint(0, cfg.num_classes, (1, cfg.crop_size, cfg.crop_size)).astype(np.int32))

    import pytest as _pytest

    with _pytest.raises(KeyboardInterrupt):
        train(state, tx, cfg, data(), tokens, num_steps=10, log_every=0,
              output_dir=str(tmp_path), checkpoint_every=10**9)
    assert latest_checkpoint(str(tmp_path)) is not None


def test_train_signal_deferred_checkpoint(tmp_path):
    """SIGINT landing mid-iteration — when params/opt_state may be bound to
    donated buffers — is deferred to the loop boundary, so the interrupt
    checkpoint is written from live arrays (and SIGTERM behaves the same:
    preemption leaves a resumable checkpoint)."""
    import signal

    from catseg_tpu.train import init_train_state
    from catseg_tpu.train.checkpoint import latest_checkpoint
    from catseg_tpu.train.loop import train

    cfg = mini_cfg()
    state, tx = init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    tokens = np.zeros((cfg.num_classes, 16), np.int32)
    tokens[:, 0] = 49406
    tokens[:, 1] = 49407

    def data():
        n = 0
        while True:
            n += 1
            if n == 2:
                # delivered synchronously to the deferring handler: must NOT
                # abort this iteration, must surface at the next loop top
                signal.raise_signal(signal.SIGINT)
            yield (rng.rand(1, cfg.crop_size, cfg.crop_size, 3).astype(np.float32) * 255,
                   rng.randint(0, cfg.num_classes, (1, cfg.crop_size, cfg.crop_size)).astype(np.int32))

    import pytest as _pytest

    prev = signal.getsignal(signal.SIGINT)
    with _pytest.raises(KeyboardInterrupt):
        train(state, tx, cfg, data(), tokens, num_steps=10, log_every=0,
              output_dir=str(tmp_path), checkpoint_every=10**9)
    assert latest_checkpoint(str(tmp_path)) is not None
    assert signal.getsignal(signal.SIGINT) is prev  # handler restored


def test_async_predictor_forwards_worker_exception():
    """A worker exception surfaces in get() instead of hanging the consumer."""
    import pytest as _pytest

    from catseg_tpu.infer.async_predictor import AsyncPredictor

    class Boom:
        def probs_sliding(self, image):
            raise ValueError("corrupt input")

    ap = AsyncPredictor.__new__(AsyncPredictor)
    import queue as _q
    import threading as _th

    ap.predictor = Boom()
    ap._tasks = _q.Queue(maxsize=2)
    ap._results = _q.Queue()
    ap._n_submitted = ap._n_collected = 0
    ap._thread = _th.Thread(target=ap._work, daemon=True)
    ap._thread.start()
    ap.put(np.zeros((8, 8, 3), np.uint8))
    with _pytest.raises(ValueError, match="corrupt"):
        ap.get()


def test_event_writer_skips_nonscalars(tmp_path):
    """eval_fn dicts with per-class ndarrays must not crash the writer."""
    import json as _json

    from catseg_tpu.utils.events import EventWriter

    w = EventWriter(str(tmp_path))
    w.write(1, loss=0.5, IoU=np.arange(3.0), pACC=np.float64(7.5),
            scalar_arr=np.asarray(2.0), note="ok")
    w.close()
    rec = _json.loads(open(tmp_path / "metrics.json").read().splitlines()[-1])
    assert rec["loss"] == 0.5 and rec["pACC"] == 7.5 and rec["scalar_arr"] == 2.0
    assert "IoU" not in rec and rec["note"] == "ok"


def test_predict_routes_whole_image_branch():
    """predict()/predict_argmax() follow cfg.sliding_window like the
    reference meta-arch, not hardcode the sliding branch."""
    from catseg_tpu.infer.pipeline import Predictor

    cfg = mini_cfg(sliding_window=False)
    from catseg_tpu.core import catseg as _catseg

    params = _catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    text = rng.randn(7, 1, 48).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    pred = Predictor(params, cfg, [f"c{i}" for i in range(7)], text_feats=text)
    img = rng.randint(0, 255, (100, 120, 3)).astype(np.uint8)
    whole = np.asarray(pred.probs_whole(img))
    sliding = np.asarray(pred.probs_sliding(img))
    assert whole.shape != sliding.shape or not np.allclose(whole, sliding)
    out = pred.predict_argmax(img)
    want = pred_argmax_from(whole, img.shape[:2])
    np.testing.assert_array_equal(out, want)


def pred_argmax_from(probs, hw):
    from catseg_tpu.infer.pipeline import resize_argmax_dynamic

    H, W = hw
    return np.asarray(resize_argmax_dynamic(
        jnp.asarray(probs), jnp.asarray([H, W], np.int32), (H, W)))[:H, :W]


def test_tta_multiscale_matches_manual_composition():
    """Default TTA = DatasetMapperTTA semantics: per-scale ResizeShortestEdge
    of the ORIGINAL image, {identity, hflip} per scale, mean over all copies
    (averaging in the sliding output space == averaging post-resize, both
    linear)."""
    import jax

    from catseg_tpu.core import catseg
    from catseg_tpu.data.loader import resize_shortest_edge
    from catseg_tpu.infer.pipeline import Predictor
    from catseg_tpu.infer.tta import TTAPredictor
    from test_catseg_model import mini_cfg

    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    T = 5
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    pred = Predictor(params, cfg, [f"c{i}" for i in range(T)], text_feats=text,
                     input_canvas=(320, 320))
    scales = (120, 200)
    tta = TTAPredictor(pred, min_sizes=scales, max_size=300)
    orig = rng.randint(0, 255, (180, 240, 3), dtype=np.uint8)

    acc = None
    for s in scales:
        img_s = resize_shortest_edge(orig, s, 300)
        p = np.asarray(pred.probs_sliding(img_s))
        pf = np.asarray(pred.probs_sliding(np.ascontiguousarray(img_s[:, ::-1])))
        ps = (p + pf[:, ::-1]) / 2.0
        acc = ps if acc is None else acc + ps
    want = acc / len(scales)
    got = np.asarray(tta.probs(orig))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
