"""SAM image encoder parity vs torch oracle (windowed + global blocks,
decomposed relative position biases, neck)."""

import numpy as np
import torch

import jax.numpy as jnp

from catseg_tpu.core import sam as jsam
from torch_oracle import sam_encoder

MINI = jsam.SAMVariant(img_size=32, patch=8, width=32, layers=3, heads=4,
                       out_chans=16, window=2, global_blocks=(1,))


def _mini_sam_sd(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*s):
        return torch.randn(*s, generator=g) * 0.05

    w = MINI.width
    sd = {
        "patch_embed.proj.weight": r(w, 3, MINI.patch, MINI.patch),
        "patch_embed.proj.bias": 0.1 * r(w),
        "pos_embed": r(1, MINI.grid, MINI.grid, w),
        "neck.0.weight": r(MINI.out_chans, w, 1, 1),
        "neck.1.weight": 1 + 0.1 * r(MINI.out_chans),
        "neck.1.bias": 0.1 * r(MINI.out_chans),
        "neck.2.weight": r(MINI.out_chans, MINI.out_chans, 3, 3),
        "neck.3.weight": 1 + 0.1 * r(MINI.out_chans),
        "neck.3.bias": 0.1 * r(MINI.out_chans),
    }
    for i in range(MINI.layers):
        p = f"blocks.{i}"
        size = MINI.grid if i in MINI.global_blocks else MINI.window
        sd[p + ".norm1.weight"] = 1 + 0.1 * r(w)
        sd[p + ".norm1.bias"] = 0.1 * r(w)
        sd[p + ".attn.qkv.weight"] = r(3 * w, w)
        sd[p + ".attn.qkv.bias"] = 0.1 * r(3 * w)
        sd[p + ".attn.proj.weight"] = r(w, w)
        sd[p + ".attn.proj.bias"] = 0.1 * r(w)
        sd[p + ".attn.rel_pos_h"] = r(2 * size - 1, w // MINI.heads)
        sd[p + ".attn.rel_pos_w"] = r(2 * size - 1, w // MINI.heads)
        sd[p + ".norm2.weight"] = 1 + 0.1 * r(w)
        sd[p + ".norm2.bias"] = 0.1 * r(w)
        sd[p + ".mlp.lin1.weight"] = r(4 * w, w)
        sd[p + ".mlp.lin1.bias"] = 0.1 * r(4 * w)
        sd[p + ".mlp.lin2.weight"] = r(w, 4 * w)
        sd[p + ".mlp.lin2.bias"] = 0.1 * r(w)
    return sd


def test_sam_encoder_parity():
    sd = _mini_sam_sd()
    params = jsam.convert_sam_state_dict({k: t.numpy() for k, t in sd.items()}, MINI)
    rng = np.random.RandomState(4)
    imgs = rng.randn(2, 32, 32, 3).astype(np.float32)
    want_neck, want_outs = sam_encoder(
        sd, torch.from_numpy(imgs).permute(0, 3, 1, 2).contiguous(),
        patch=MINI.patch, layers=MINI.layers, heads=MINI.heads,
        window=MINI.window, global_blocks=MINI.global_blocks,
    )
    got_neck, got_outs = jsam.encode_image(params, jnp.asarray(imgs), MINI, intermediates=True)
    np.testing.assert_allclose(np.asarray(got_neck), want_neck.detach().numpy(), atol=3e-4, rtol=1e-3)
    for g_, w_ in zip(got_outs, want_outs):
        np.testing.assert_allclose(np.asarray(g_), w_.detach().numpy(), atol=3e-4, rtol=1e-3)


def test_sam_nondivisible_window_padding():
    """grid 4 with window 3 forces the pad/crop path."""
    var = jsam.SAMVariant(img_size=32, patch=8, width=32, layers=2, heads=4,
                          out_chans=16, window=3, global_blocks=(1,))
    import jax

    params = jsam.init_sam_params(jax.random.PRNGKey(0), var)
    imgs = np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32)
    out = jsam.encode_image(params, jnp.asarray(imgs), var)
    assert out.shape == (1, 4, 4, 16)
    assert np.isfinite(np.asarray(out)).all()
