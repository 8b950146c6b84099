"""Aggregator parity: JAX implementation + converter vs torch oracle,
covering both the padded (T < pad_len) and top-k truncated (T > pad_len)
class-axis paths, linear and full attention."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from catseg_tpu.configs import CATSegConfig
from catseg_tpu.core.aggregator import aggregator_forward
from catseg_tpu.weights.convert import convert_aggregator_state_dict

from torch_oracle import aggregator_torch

HID = 32
HEADS = 4
WINDOW = 4
RES = (8, 8)
POOL = (2, 2)
PAD_LEN = 8
P = 2
APP_G, APP_P = 24, 16
TXT_G, TXT_P = 48, 16  # text guidance dim == text embedding dim (as in the real model)
DEC_DIMS = (32, 16)
DEC_G = (24, 12)
DEC_P = (8, 4)


def _cfg(**kw):
    base = dict(
        hidden_dim=HID,
        num_heads=HEADS,
        window_size=WINDOW,
        feature_resolution=RES,
        pooling_size=POOL,
        pad_len=PAD_LEN,
        appearance_guidance_dim=APP_G,
        appearance_guidance_proj_dim=APP_P,
        text_guidance_dim=TXT_G,
        text_guidance_proj_dim=TXT_P,
        decoder_dims=DEC_DIMS,
        decoder_guidance_dims=DEC_G,
        decoder_guidance_proj_dims=DEC_P,
        num_layers=2,
        compute_dtype="float32",
    )
    base.update(kw)
    return CATSegConfig(**base)


def _agg_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*s):
        return torch.randn(*s, generator=g) * 0.1

    sd = {
        "conv1.weight": r(HID, P, 7, 7),
        "conv1.bias": r(HID),
        "guidance_projection.0.weight": r(APP_P, APP_G, 3, 3),
        "guidance_projection.0.bias": r(APP_P),
        "text_guidance_projection.0.weight": r(TXT_P, TXT_G),
        "text_guidance_projection.0.bias": r(TXT_P),
        "head.weight": r(1, DEC_DIMS[1], 3, 3),
        "head.bias": r(1),
    }
    for i, (d, dp) in enumerate(zip(DEC_G, DEC_P)):
        sd[f"decoder_guidance_projection.{i}.0.weight"] = r(dp, d, 3, 3)
        sd[f"decoder_guidance_projection.{i}.0.bias"] = r(dp)

    def swin(prefix):
        sd[f"{prefix}.norm1.weight"] = 1 + 0.1 * r(HID)
        sd[f"{prefix}.norm1.bias"] = 0.1 * r(HID)
        sd[f"{prefix}.attn.q.weight"] = r(HID, HID + APP_P)
        sd[f"{prefix}.attn.q.bias"] = 0.1 * r(HID)
        sd[f"{prefix}.attn.k.weight"] = r(HID, HID + APP_P)
        sd[f"{prefix}.attn.k.bias"] = 0.1 * r(HID)
        sd[f"{prefix}.attn.v.weight"] = r(HID, HID)
        sd[f"{prefix}.attn.v.bias"] = 0.1 * r(HID)
        sd[f"{prefix}.attn.proj.weight"] = r(HID, HID)
        sd[f"{prefix}.attn.proj.bias"] = 0.1 * r(HID)
        sd[f"{prefix}.norm2.weight"] = 1 + 0.1 * r(HID)
        sd[f"{prefix}.norm2.bias"] = 0.1 * r(HID)
        sd[f"{prefix}.mlp.fc1.weight"] = r(4 * HID, HID)
        sd[f"{prefix}.mlp.fc1.bias"] = 0.1 * r(4 * HID)
        sd[f"{prefix}.mlp.fc2.weight"] = r(HID, 4 * HID)
        sd[f"{prefix}.mlp.fc2.bias"] = 0.1 * r(HID)

    for i in range(2):
        swin(f"layers.{i}.swin_block.block_1")
        swin(f"layers.{i}.swin_block.block_2")
        sd[f"layers.{i}.swin_block.guidance_norm.weight"] = 1 + 0.1 * r(APP_P)
        sd[f"layers.{i}.swin_block.guidance_norm.bias"] = 0.1 * r(APP_P)
        p = f"layers.{i}.attention"
        sd[f"{p}.norm1.weight"] = 1 + 0.1 * r(HID)
        sd[f"{p}.norm1.bias"] = 0.1 * r(HID)
        sd[f"{p}.norm2.weight"] = 1 + 0.1 * r(HID)
        sd[f"{p}.norm2.bias"] = 0.1 * r(HID)
        sd[f"{p}.attention.q.weight"] = r(HID, HID + TXT_P)
        sd[f"{p}.attention.q.bias"] = 0.1 * r(HID)
        sd[f"{p}.attention.k.weight"] = r(HID, HID + TXT_P)
        sd[f"{p}.attention.k.bias"] = 0.1 * r(HID)
        sd[f"{p}.attention.v.weight"] = r(HID, HID)
        sd[f"{p}.attention.v.bias"] = 0.1 * r(HID)
        sd[f"{p}.MLP.0.weight"] = r(4 * HID, HID)
        sd[f"{p}.MLP.0.bias"] = 0.1 * r(4 * HID)
        sd[f"{p}.MLP.2.weight"] = r(HID, 4 * HID)
        sd[f"{p}.MLP.2.bias"] = 0.1 * r(HID)
        sd[f"{p}.padding_tokens"] = 0.1 * r(1, 1, HID)
        sd[f"{p}.padding_guidance"] = 0.1 * r(1, 1, TXT_P)

    # decoder1: Up(HID, DEC_DIMS[0], DEC_P[0]); decoder2: Up(DEC_DIMS[0], DEC_DIMS[1], DEC_P[1])
    def up(prefix, cin, cout, gch):
        sd[f"{prefix}.up.weight"] = r(cin, cin - gch, 2, 2)
        sd[f"{prefix}.up.bias"] = 0.1 * r(cin - gch)
        sd[f"{prefix}.conv.double_conv.0.weight"] = r(cout, cin, 3, 3)
        sd[f"{prefix}.conv.double_conv.1.weight"] = 1 + 0.1 * r(cout)
        sd[f"{prefix}.conv.double_conv.1.bias"] = 0.1 * r(cout)
        sd[f"{prefix}.conv.double_conv.3.weight"] = r(cout, cout, 3, 3)
        sd[f"{prefix}.conv.double_conv.4.weight"] = 1 + 0.1 * r(cout)
        sd[f"{prefix}.conv.double_conv.4.bias"] = 0.1 * r(cout)

    up("decoder1", HID, DEC_DIMS[0], DEC_P[0])
    up("decoder2", DEC_DIMS[0], DEC_DIMS[1], DEC_P[1])
    return sd


@pytest.fixture(scope="module")
def sd():
    return _agg_state_dict()


@pytest.fixture(scope="module")
def params(sd):
    return convert_aggregator_state_dict({k: t.numpy() for k, t in sd.items()}, num_layers=2)


def _inputs(T, seed=1):
    rng = np.random.RandomState(seed)
    B = 2
    H, W = RES
    img = rng.randn(B, H, W, 48).astype(np.float32)
    txt = rng.randn(B, T, P, 48).astype(np.float32)
    res3 = rng.randn(B, H, W, APP_G).astype(np.float32)
    res4 = rng.randn(B, 2 * H, 2 * W, DEC_G[0]).astype(np.float32)
    res5 = rng.randn(B, 4 * H, 4 * W, DEC_G[1]).astype(np.float32)
    return img, txt, (res3, res4, res5)


@pytest.mark.parametrize("T,attn", [(5, "linear"), (PAD_LEN, "linear"), (13, "linear"), (5, "full")])
def test_aggregator_parity(sd, params, T, attn):
    img, txt, guid = _inputs(T)
    cfg = _cfg(attention_type=attn)
    want = aggregator_torch(
        sd,
        torch.from_numpy(img),
        torch.from_numpy(txt),
        (
            torch.from_numpy(guid[0]),
            torch.from_numpy(guid[1]).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(guid[2]).permute(0, 3, 1, 2).contiguous(),
        ),
        heads=HEADS, window=WINDOW, pool=POOL, pad_len=PAD_LEN,
        num_layers=2, attention_type=attn,
    )
    got = aggregator_forward(params, jnp.asarray(img), jnp.asarray(txt), tuple(map(jnp.asarray, guid)), cfg)
    assert got.shape == want.shape == (2, T, 4 * RES[0], 4 * RES[1])
    if T > PAD_LEN:
        # top-k ties may order differently; compare only non-(-100) agreement
        got_np, want_np = np.asarray(got), want.numpy()
        sel_g, sel_w = got_np > -100.0, want_np > -100.0
        np.testing.assert_array_equal(sel_g, sel_w)
        np.testing.assert_allclose(got_np[sel_g], want_np[sel_w], atol=5e-4, rtol=1e-3)
    else:
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-4, rtol=1e-3)


def test_convert_infers_layer_count(sd):
    """The converter reads the aggregator depth from the checkpoint keys
    (the fork's base config trains NUM_LAYERS=4): default infers, an
    explicit mismatching count raises instead of silently truncating."""
    np_sd = {k: t.numpy() for k, t in sd.items()}
    agg = convert_aggregator_state_dict(np_sd)
    assert len(agg["layers"]) == 2
    with pytest.raises(ValueError, match="2 aggregator layers"):
        convert_aggregator_state_dict(np_sd, num_layers=4)
