"""SAM prompt-encoder / mask-decoder parity vs torch oracle."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from catseg_tpu.core import sam_decoder as jd
from torch_oracle import sam_mask_decoder

DIM = 32
HEADS = 4
DEPTH = 2
MLP = 64
GRID = 8
NUM_MASK = 4


def _sd(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*s):
        return torch.randn(*s, generator=g) * 0.05

    sd = {
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix": torch.randn(2, DIM // 2, generator=g),
        "prompt_encoder.not_a_point_embed.weight": r(1, DIM),
        "prompt_encoder.no_mask_embed.weight": r(1, DIM),
        "prompt_encoder.mask_downscaling.0.weight": r(4, 1, 2, 2),
        "prompt_encoder.mask_downscaling.0.bias": 0.1 * r(4),
        "prompt_encoder.mask_downscaling.1.weight": 1 + 0.1 * r(4),
        "prompt_encoder.mask_downscaling.1.bias": 0.1 * r(4),
        "prompt_encoder.mask_downscaling.3.weight": r(16, 4, 2, 2),
        "prompt_encoder.mask_downscaling.3.bias": 0.1 * r(16),
        "prompt_encoder.mask_downscaling.4.weight": 1 + 0.1 * r(16),
        "prompt_encoder.mask_downscaling.4.bias": 0.1 * r(16),
        "prompt_encoder.mask_downscaling.6.weight": r(DIM, 16, 1, 1),
        "prompt_encoder.mask_downscaling.6.bias": 0.1 * r(DIM),
    }
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = r(1, DIM)

    def attn(prefix, inner):
        sd[prefix + ".q_proj.weight"] = r(inner, DIM)
        sd[prefix + ".q_proj.bias"] = 0.1 * r(inner)
        sd[prefix + ".k_proj.weight"] = r(inner, DIM)
        sd[prefix + ".k_proj.bias"] = 0.1 * r(inner)
        sd[prefix + ".v_proj.weight"] = r(inner, DIM)
        sd[prefix + ".v_proj.bias"] = 0.1 * r(inner)
        sd[prefix + ".out_proj.weight"] = r(DIM, inner)
        sd[prefix + ".out_proj.bias"] = 0.1 * r(DIM)

    def ln(prefix):
        sd[prefix + ".weight"] = 1 + 0.1 * r(DIM)
        sd[prefix + ".bias"] = 0.1 * r(DIM)

    for i in range(DEPTH):
        lp = f"mask_decoder.transformer.layers.{i}"
        attn(lp + ".self_attn", DIM)
        ln(lp + ".norm1")
        attn(lp + ".cross_attn_token_to_image", DIM // 2)
        ln(lp + ".norm2")
        sd[lp + ".mlp.lin1.weight"] = r(MLP, DIM)
        sd[lp + ".mlp.lin1.bias"] = 0.1 * r(MLP)
        sd[lp + ".mlp.lin2.weight"] = r(DIM, MLP)
        sd[lp + ".mlp.lin2.bias"] = 0.1 * r(DIM)
        ln(lp + ".norm3")
        attn(lp + ".cross_attn_image_to_token", DIM // 2)
        ln(lp + ".norm4")
    attn("mask_decoder.transformer.final_attn_token_to_image", DIM // 2)
    ln("mask_decoder.transformer.norm_final_attn")

    sd["mask_decoder.iou_token.weight"] = r(1, DIM)
    sd["mask_decoder.mask_tokens.weight"] = r(NUM_MASK, DIM)
    sd["mask_decoder.output_upscaling.0.weight"] = r(DIM, DIM // 4, 2, 2)
    sd["mask_decoder.output_upscaling.0.bias"] = 0.1 * r(DIM // 4)
    sd["mask_decoder.output_upscaling.1.weight"] = 1 + 0.1 * r(DIM // 4)
    sd["mask_decoder.output_upscaling.1.bias"] = 0.1 * r(DIM // 4)
    sd["mask_decoder.output_upscaling.3.weight"] = r(DIM // 4, DIM // 8, 2, 2)
    sd["mask_decoder.output_upscaling.3.bias"] = 0.1 * r(DIM // 8)
    for i in range(NUM_MASK):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        dims = [DIM, DIM, DIM, DIM // 8]
        for j in range(3):
            sd[f"{p}.layers.{j}.weight"] = r(dims[j + 1], dims[j])
            sd[f"{p}.layers.{j}.bias"] = 0.1 * r(dims[j + 1])
    dims = [DIM, 64, 64, NUM_MASK]
    for j in range(3):
        sd[f"mask_decoder.iou_prediction_head.layers.{j}.weight"] = r(dims[j + 1], dims[j])
        sd[f"mask_decoder.iou_prediction_head.layers.{j}.bias"] = 0.1 * r(dims[j + 1])
    return sd


def test_mask_decoder_parity():
    sd = _sd()
    pe, dec = jd.convert_sam_prompt_decoder({k: t.numpy() for k, t in sd.items()})
    rng = np.random.RandomState(5)
    B = 3
    img = rng.randn(B, GRID, GRID, DIM).astype(np.float32)
    masks_in = rng.randn(B, 4 * GRID, 4 * GRID, 1).astype(np.float32)

    dense = jd.embed_masks(pe, jnp.asarray(masks_in))
    pe_grid = jd.dense_pe(jnp.asarray(pe["gauss"]), (GRID, GRID))
    sparse = jnp.zeros((B, 0, DIM))
    got_masks, got_iou = jd.mask_decoder(dec, jnp.asarray(img), pe_grid, sparse, dense)

    # torch oracle
    md = F_mask = None
    import torch.nn.functional as F

    t_mask = torch.from_numpy(masks_in).permute(0, 3, 1, 2)
    x = F.conv2d(t_mask, sd["prompt_encoder.mask_downscaling.0.weight"],
                 sd["prompt_encoder.mask_downscaling.0.bias"], stride=2)
    mu = x.mean(1, keepdim=True); var = ((x - mu) ** 2).mean(1, keepdim=True)
    x = (x - mu) / (var + 1e-6).sqrt() * sd["prompt_encoder.mask_downscaling.1.weight"][:, None, None] \
        + sd["prompt_encoder.mask_downscaling.1.bias"][:, None, None]
    x = F.gelu(x)
    x = F.conv2d(x, sd["prompt_encoder.mask_downscaling.3.weight"],
                 sd["prompt_encoder.mask_downscaling.3.bias"], stride=2)
    mu = x.mean(1, keepdim=True); var = ((x - mu) ** 2).mean(1, keepdim=True)
    x = (x - mu) / (var + 1e-6).sqrt() * sd["prompt_encoder.mask_downscaling.4.weight"][:, None, None] \
        + sd["prompt_encoder.mask_downscaling.4.bias"][:, None, None]
    x = F.gelu(x)
    x = F.conv2d(x, sd["prompt_encoder.mask_downscaling.6.weight"],
                 sd["prompt_encoder.mask_downscaling.6.bias"])
    dense_t = x.permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(dense), dense_t.numpy(), atol=2e-4, rtol=1e-3)

    want_masks, want_iou = sam_mask_decoder(
        sd, torch.from_numpy(img), torch.from_numpy(np.asarray(pe_grid)),
        torch.zeros(B, 0, DIM), dense_t, heads=HEADS, depth=DEPTH, num_mask_tokens=NUM_MASK,
    )
    np.testing.assert_allclose(np.asarray(got_masks), want_masks.numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(), atol=5e-4, rtol=1e-3)


def test_point_and_box_prompts_run():
    pe, dec = jd.init_sam_prompt_decoder(jax.random.PRNGKey(0), dim=DIM, depth=2,
                                         mlp_dim=MLP, num_mask_tokens=NUM_MASK)
    pts = jnp.asarray([[[10.0, 20.0], [5.0, 5.0]]])
    labels = jnp.asarray([[1, -1]])
    se = jd.embed_points(pe, pts, labels, (64, 64))
    assert se.shape == (1, 2, DIM)
    be = jd.embed_boxes(pe, jnp.asarray([[4.0, 4.0, 30.0, 30.0]]), (64, 64))
    assert be.shape == (1, 2, DIM)
    img = jnp.asarray(np.random.RandomState(0).randn(1, GRID, GRID, DIM).astype(np.float32))
    dense = jd.no_mask_embed(pe, (GRID, GRID))
    dense = jnp.broadcast_to(dense, (1, GRID, GRID, DIM))
    pe_grid = jd.dense_pe(pe["gauss"], (GRID, GRID))
    masks, iou = jd.mask_decoder(dec, img, pe_grid, se, dense, multimask_output=True)
    assert masks.shape == (1, NUM_MASK - 1, 4 * GRID, 4 * GRID)
    assert iou.shape == (1, NUM_MASK - 1)


def test_sam_mask_refine_shapes():
    from catseg_tpu.core.fusion import sam_mask_refine

    pe, dec = jd.init_sam_prompt_decoder(jax.random.PRNGKey(0), dim=DIM, depth=2,
                                         mlp_dim=MLP, num_mask_tokens=NUM_MASK)
    rng = np.random.RandomState(1)
    B, T = 2, 5
    coarse = jnp.asarray(rng.randn(B, T, 16, 16).astype(np.float32))
    sam_feat = jnp.asarray(rng.randn(B, GRID, GRID, DIM).astype(np.float32))
    refined = sam_mask_refine(None, pe, dec, coarse, sam_feat, chunk=4)
    assert refined.shape == (B, T, 4 * GRID, 4 * GRID)
    assert np.isfinite(np.asarray(refined)).all()
    # chunk size must not change results (padding correctness)
    refined2 = sam_mask_refine(None, pe, dec, coarse, sam_feat, chunk=10)
    np.testing.assert_allclose(np.asarray(refined), np.asarray(refined2), atol=1e-5)


def test_sam_predictor_end_to_end():
    from catseg_tpu.core import sam as jsam
    from catseg_tpu.infer.sam_predictor import SamPredictor, resize_longest_side

    # get_preprocess_shape semantics (utils/transforms.py:97-104)
    assert resize_longest_side(480, 640, 1024) == (768, 1024)
    assert resize_longest_side(33, 17, 32) == (32, 16)

    var = jsam.SAMVariant(img_size=32, patch=8, width=32, layers=2, heads=4,
                          out_chans=DIM, window=2, global_blocks=(1,))
    params = jsam.init_sam_params(jax.random.PRNGKey(0), var)
    pe, dec = jd.init_sam_prompt_decoder(jax.random.PRNGKey(1), dim=DIM, depth=2,
                                         mlp_dim=MLP, num_mask_tokens=NUM_MASK)
    pred = SamPredictor(params, pe, dec, var)
    img = np.random.RandomState(0).randint(0, 255, (40, 30, 3), np.uint8)
    pred.set_image(img)
    assert pred.input_size == (32, 24)
    assert pred.get_image_embedding().shape == (1, 4, 4, DIM)

    masks, iou, low = pred.predict(point_coords=np.array([[15.0, 20.0]]),
                                   point_labels=np.array([1]))
    assert masks.shape == (NUM_MASK - 1, 40, 30) and masks.dtype == bool
    assert iou.shape == (NUM_MASK - 1,)
    assert low.shape == (NUM_MASK - 1, 16, 16)

    m2, i2, low2 = pred.predict(box=np.array([2.0, 2.0, 28.0, 38.0]),
                                mask_input=low[:1], multimask_output=False,
                                return_logits=True)
    assert m2.shape == (1, 40, 30) and m2.dtype == np.float32
    assert i2.shape == (1,)
    # prompts must change the output
    assert not np.allclose(low2[0], low[0])
