"""Full-scale oracle parity for the remaining released/forked geometries.

test_fullscale_parity.py proves ViT-B/16 @ T=150; this file extends the same
converter-through-pipeline proof to (a) ViT-L/14@336 at its real geometry
(24 layers, width 1024, taps 7/15 — configs/vitl_336.yaml,
cat_seg_model.py:84) and (b) the T > pad_len top-k truncation + -100 scatter
path at the PC-459 class count (model.py:694-702,721-724).

Text features are precomputed (random, normalized) on both sides: the text
encoder pipeline is already proven at full scale by
test_fullscale_parity.test_text_pipeline_fullscale, and the top-k/scatter
behavior depends on (T, pad_len), not on where the embeddings came from.
"""

import numpy as np
import pytest
import torch

import jax

from catseg_tpu.configs import vitb384, vitl336, eval_preset
from catseg_tpu.core.catseg import init_catseg_params
from catseg_tpu.infer.pipeline import Predictor
from catseg_tpu.weights.convert import convert_catseg_checkpoint
from catseg_tpu.weights.export import export_catseg_checkpoint

from torch_oracle import catseg_sliding_window_torch


def _run_both(cfg, T, P, seed=3):
    params = init_catseg_params(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.from_numpy(v) for k, v in export_catseg_checkpoint(params).items()}

    rng = np.random.RandomState(seed)
    text = rng.randn(T, P, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    img = rng.randint(0, 255, (427, 640, 3)).astype(np.float32)
    predictor = Predictor(params, cfg, [f"class{i}" for i in range(T)],
                          text_feats=text)
    got = np.asarray(predictor.probs_sliding(img))

    with torch.no_grad():
        want = catseg_sliding_window_torch(
            sd, torch.from_numpy(img), torch.from_numpy(text),
            clip_patch=cfg.clip.patch, clip_layers=cfg.clip.layers,
            clip_heads=cfg.clip.heads, clip_pretrain_grid=cfg.clip.pretrain_grid,
            guidance_layers=cfg.guidance_layers, heads=cfg.num_heads,
            window=cfg.window_size, pad_len=cfg.pad_len,
            num_layers=cfg.num_layers, clip_resolution=cfg.clip_resolution,
            kernel=cfg.sw_kernel, stride=cfg.sw_stride, out_res=cfg.sw_out_res,
            pool=cfg.pooling_size, attention_type=cfg.attention_type,
        ).numpy()
    return params, sd, got, want


def test_vitl336_sliding_window_fullscale():
    """CAT-Seg (L) at real geometry: ViT-L/14 @ 336, taps 7/15, width 1024."""
    cfg = eval_preset(vitl336(compute_dtype="float32"))
    assert cfg.clip.layers == 24 and cfg.clip.width == 1024
    assert cfg.guidance_layers == (7, 15) and cfg.clip_resolution == 336
    params, sd, got, want = _run_both(cfg, T=150, P=1)

    # converter round trip at L-scale too
    back = convert_catseg_checkpoint({k: v.numpy() for k, v in sd.items()},
                                     num_layers=cfg.num_layers)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, dtype=np.float32),
                                      np.asarray(b), err_msg=str(pa))

    assert got.shape == want.shape == (640, 640, 150)
    diff = np.abs(got - want)
    assert diff.max() < 5e-4, (diff.max(), diff.mean())
    assert diff.mean() < 2e-5, diff.mean()


def test_topk_truncation_fullscale():
    """PC-459 protocol: T=459 > pad_len=256 exercises per-class max scoring,
    top-256 gather, subset recompute, and the -100 scatter at full B/16
    geometry (model.py:694-702,721-724).

    torch's topk has no tie-order guarantee vs jax.lax.top_k, so assert the
    kept-class SET per tile matches, then the full scattered output (dropped
    classes are sigmoid(-100) ~= 0 on both sides, so a full compare is safe
    once the sets agree)."""
    T = 459
    cfg = eval_preset(vitb384(compute_dtype="float32"))
    assert cfg.pad_len == 256
    params, sd, got, want = _run_both(cfg, T=T, P=1, seed=11)

    assert got.shape == want.shape == (640, 640, T)
    # kept-set check: classes surviving on either side (prob mass above the
    # scatter floor anywhere in the image)
    kept_got = set(np.where(got.max(axis=(0, 1)) > 1e-20)[0])
    kept_want = set(np.where(want.max(axis=(0, 1)) > 1e-20)[0])
    assert kept_got == kept_want
    diff = np.abs(got - want)
    assert diff.max() < 5e-4, (diff.max(), diff.mean())
    assert diff.mean() < 2e-5, diff.mean()


def test_fusion_ver31_fullscale():
    """Ver31 dual-encoder fusion at real geometry: RemoteCLIP ViT-B/32 @
    768² (grid 24) + DINO ViT-B/8 @ 384² (grid 48), dual correlation with
    SEPARATE classes/classes_dino top-k gathers (T=300 > pad_len=256),
    fusion conv + residual, FusionUP dual-guidance decoder
    (implicit_fusion_Ver31.py:226-330, FusionAggregatorVer31.py:199-273).

    Also proves the Ver31 checkpoint format round trip: export -> Ver31
    module names -> convert -> identical pytree."""
    from catseg_tpu.configs import fusion_ver31
    from catseg_tpu.core.fusion import fusion_forward, init_fusion_params

    from torch_oracle import fusion_ver31_forward_torch

    T = 300
    cfg = eval_preset(fusion_ver31(compute_dtype="float32"))
    assert cfg.clip.patch == 32 and cfg.fusion.clip_resolution == 768
    params = init_fusion_params(jax.random.PRNGKey(0), cfg)
    sd_np = export_catseg_checkpoint(params)

    # converter round trip at fusion geometry
    back = convert_catseg_checkpoint(dict(sd_np), num_layers=cfg.num_layers)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, dtype=np.float32),
                                      np.asarray(b), err_msg=str(pa))

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (1, 768, 768, 3)).astype(np.float32)
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    import jax.numpy as jnp

    got = np.asarray(jax.jit(
        lambda im, tx: fusion_forward(params, im, tx, cfg)
    )(jnp.asarray(img), jnp.asarray(text)))

    sd = {k: torch.from_numpy(v) for k, v in sd_np.items()}
    dvar_patch, dvar_layers = 8, 12
    with torch.no_grad():
        want = fusion_ver31_forward_torch(
            sd, torch.from_numpy(img), torch.from_numpy(text),
            clip_patch=cfg.clip.patch, clip_layers=cfg.clip.layers,
            clip_heads=cfg.clip.heads, clip_pretrain_grid=cfg.clip.pretrain_grid,
            dino_patch=dvar_patch, dino_layers=dvar_layers, dino_heads=12,
            dino_pretrain_grid=28, guidance_layers=cfg.guidance_layers,
            dino_guidance_blocks=cfg.fusion.guidance_blocks,
            heads=cfg.num_heads, window=cfg.window_size, pad_len=cfg.pad_len,
            num_layers=cfg.num_layers,
            clip_resolution=cfg.fusion.clip_resolution,
            dino_resolution=cfg.fusion.encoder_resolution,
            pool=cfg.pooling_size, attention_type=cfg.attention_type,
        ).numpy()

    assert got.shape == want.shape == (1, T, 96, 96)
    kept_got = set(np.where(got.max(axis=(0, 2, 3)) > -99.0)[0])
    kept_want = set(np.where(want.max(axis=(0, 2, 3)) > -99.0)[0])
    assert kept_got == kept_want
    mask = want > -99.0
    diff = np.abs(got - want)[mask]
    assert diff.max() < 5e-4, diff.max()


def test_bf16_drift_fullscale():
    """Quantifies the accuracy cost of the PRODUCTION dtype: the TPU numbers
    are measured with compute_dtype=bfloat16 (configs.py default) while the
    oracle parity tests force float32.  Runs the full-scale B/16 sliding
    pipeline both ways and bounds the drift.

    Measured on this geometry (random weights): max|Δprob| ≈ 3.4e-3, mean
    ≈ 4e-4.  Raw argmax agreement is ~80% — but that is a random-weights
    artifact: the median top-2 prob gap is ~7e-4 (150 near-tied classes), so
    near-zero drift still flips near-ties.  The meaningful statement is
    conditional: where the fp32 decision margin exceeds 0.01, bf16 agrees
    >99% of the time."""
    T = 150
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (427, 640, 3)).astype(np.float32)
    text = rng.randn(T, 1, 512).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)

    probs = {}
    for dt in ("float32", "bfloat16"):
        cfg = eval_preset(vitb384(compute_dtype=dt))
        params = init_catseg_params(jax.random.PRNGKey(0), cfg)
        pred = Predictor(params, cfg, [f"c{i}" for i in range(T)], text_feats=text)
        probs[dt] = np.asarray(pred.probs_sliding(img))

    a, b = probs["float32"], probs["bfloat16"]
    d = np.abs(a - b)
    assert d.max() < 0.02, d.max()
    assert d.mean() < 2e-3, d.mean()
    srt = np.sort(a, axis=-1)
    gap = srt[..., -1] - srt[..., -2]
    decided = gap > 0.01
    assert decided.any()
    agree = (a.argmax(-1) == b.argmax(-1))[decided].mean()
    assert agree > 0.99, agree
