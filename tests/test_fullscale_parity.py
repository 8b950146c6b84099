"""Full-scale end-to-end oracle parity at released-model geometry.

The strongest parity statement possible without the released weights/datasets:
a synthetic checkpoint with the exact reference key names at REAL ViT-B/16
shapes (12 layers, width 768, 577 tokens, 2-layer aggregator at hidden 128,
T=150 classes, imagenet_select P=8 templates) goes through
``convert_catseg_checkpoint`` and the full sliding-window pipeline
(640-canvas -> 5 tiles -> dense CLIP -> aggregator -> fold), and the result
is compared against a torch oracle that composes the reference semantics
(cat_seg_model.py:115-229, model.py:683-725) directly from the same state
dict.  The converter, the exporter, and every model stage are proven jointly
at the shapes the released checkpoints will arrive in.
"""

import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from catseg_tpu.configs import vitb384, eval_preset
from catseg_tpu.core.catseg import init_catseg_params
from catseg_tpu.infer.pipeline import Predictor
from catseg_tpu.text import templates as tmpl
from catseg_tpu.text.embed import forward_text_embeds
from catseg_tpu.text.tokenizer import tokenize
from catseg_tpu.weights.convert import convert_catseg_checkpoint
from catseg_tpu.weights.export import export_catseg_checkpoint

from torch_oracle import catseg_sliding_window_torch, clip_text, fuse_split_qkv

T = 150  # ADE-150-sized class list: padded (T < pad_len=256) eval path
P_SET = "imagenet_select"  # 8 templates (cat_seg_predictor.py:80-87)


@pytest.fixture(scope="module")
def cfg():
    return eval_preset(vitb384(compute_dtype="float32", prompt_ensemble_type=P_SET))


@pytest.fixture(scope="module")
def params(cfg):
    return init_catseg_params(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def sd(params):
    return {k: torch.from_numpy(v) for k, v in export_catseg_checkpoint(params).items()}


@pytest.fixture(scope="module")
def class_names():
    with open("/root/reference/datasets/ade150.json") as f:
        names = json.load(f)
    assert len(names) == T
    return names


def test_converter_roundtrip_exact(params, sd, cfg):
    """convert(export(params)) reproduces the pytree bit-exactly at full scale."""
    back = convert_catseg_checkpoint({k: v.numpy() for k, v in sd.items()},
                                     num_layers=cfg.num_layers)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b, _ = jax.tree_util.tree_flatten_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, dtype=np.float32), np.asarray(b),
                                      err_msg=str(pa))


@pytest.fixture(scope="module")
def text_feats(params, sd, cfg, class_names):
    """(jax (T, P, E), torch (T, P, E)) — each side encodes from its own weights."""
    jx = forward_text_embeds(params["clip"], class_names, P_SET, cfg.clip)

    temps = tmpl.get(P_SET)
    texts = []
    for name in class_names:
        first = name.split(", ")[0] if ", " in name else name
        texts.extend(tmpl.format_template(t, first) for t in temps)
    tokens = tokenize(texts)
    clip_sd = fuse_split_qkv({k[len("sem_seg_head.predictor.clip_model."):]: v
                              for k, v in sd.items()
                              if k.startswith("sem_seg_head.predictor.clip_model.")})
    with torch.no_grad():
        emb = clip_text(clip_sd, torch.from_numpy(tokens.astype(np.int64)),
                        layers=cfg.clip.text_layers, heads=cfg.clip.text_heads)
    emb = F.normalize(emb, dim=-1).reshape(T, len(temps), -1)
    return np.asarray(jx), emb


def test_text_pipeline_fullscale(text_feats):
    jx, th = text_feats
    assert jx.shape == tuple(th.shape) == (T, 8, 512)
    np.testing.assert_allclose(jx, th.numpy(), atol=3e-4, rtol=1e-3)


def test_sliding_window_fullscale(params, sd, cfg, class_names, text_feats):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (427, 640, 3)).astype(np.float32)

    jx_text, th_text = text_feats
    predictor = Predictor(params, cfg, class_names, text_feats=jx_text)
    got = np.asarray(predictor.probs_sliding(img))  # (640, 640, T)

    with torch.no_grad():
        want = catseg_sliding_window_torch(
            sd, torch.from_numpy(img), th_text,
            clip_patch=cfg.clip.patch, clip_layers=cfg.clip.layers,
            clip_heads=cfg.clip.heads, clip_pretrain_grid=cfg.clip.pretrain_grid,
            guidance_layers=cfg.guidance_layers, heads=cfg.num_heads,
            window=cfg.window_size, pad_len=cfg.pad_len,
            num_layers=cfg.num_layers, clip_resolution=cfg.clip_resolution,
            kernel=cfg.sw_kernel, stride=cfg.sw_stride, out_res=cfg.sw_out_res,
            pool=cfg.pooling_size, attention_type=cfg.attention_type,
        ).numpy()

    assert got.shape == want.shape == (640, 640, T)
    diff = np.abs(got - want)
    assert diff.max() < 5e-4, (diff.max(), diff.mean())
    assert diff.mean() < 2e-5, diff.mean()
