"""CLIP encoder parity: JAX implementation + converter vs torch oracle."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from catseg_tpu.configs import CLIPVariant
from catseg_tpu.core import clip as jclip
from catseg_tpu.weights import convert_clip_state_dict

from torch_oracle import clip_visual_dense, clip_text

VARIANT = CLIPVariant(
    name="mini",
    patch=8,
    width=64,
    layers=4,
    heads=4,
    embed_dim=32,
    pretrain_res=32,  # grid 4 -> pos-embed resize exercised at 64x64 input
    text_width=48,
    text_heads=4,
    text_layers=3,
    vocab_size=120,
    context=16,
)


def _mini_clip_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    v = VARIANT

    def r(*s):
        return torch.randn(*s, generator=g) * 0.05

    sd = {
        "visual.conv1.weight": r(v.width, 3, v.patch, v.patch),
        "visual.class_embedding": r(v.width),
        "visual.positional_embedding": r(v.pretrain_grid**2 + 1, v.width),
        "visual.ln_pre.weight": 1 + 0.1 * r(v.width),
        "visual.ln_pre.bias": 0.1 * r(v.width),
        "visual.ln_post.weight": 1 + 0.1 * r(v.width),
        "visual.ln_post.bias": 0.1 * r(v.width),
        "visual.proj": r(v.width, v.embed_dim),
        "token_embedding.weight": r(v.vocab_size, v.text_width),
        "positional_embedding": r(v.context, v.text_width),
        "ln_final.weight": 1 + 0.1 * r(v.text_width),
        "ln_final.bias": 0.1 * r(v.text_width),
        "text_projection": r(v.text_width, v.embed_dim),
        "logit_scale": torch.zeros(()),
    }

    def block(prefix, w):
        sd[f"{prefix}.attn.in_proj_weight"] = r(3 * w, w)
        sd[f"{prefix}.attn.in_proj_bias"] = 0.1 * r(3 * w)
        sd[f"{prefix}.attn.out_proj.weight"] = r(w, w)
        sd[f"{prefix}.attn.out_proj.bias"] = 0.1 * r(w)
        sd[f"{prefix}.ln_1.weight"] = 1 + 0.1 * r(w)
        sd[f"{prefix}.ln_1.bias"] = 0.1 * r(w)
        sd[f"{prefix}.ln_2.weight"] = 1 + 0.1 * r(w)
        sd[f"{prefix}.ln_2.bias"] = 0.1 * r(w)
        sd[f"{prefix}.mlp.c_fc.weight"] = r(4 * w, w)
        sd[f"{prefix}.mlp.c_fc.bias"] = 0.1 * r(4 * w)
        sd[f"{prefix}.mlp.c_proj.weight"] = r(w, 4 * w)
        sd[f"{prefix}.mlp.c_proj.bias"] = 0.1 * r(w)

    for i in range(v.layers):
        block(f"visual.transformer.resblocks.{i}", v.width)
    for i in range(v.text_layers):
        block(f"transformer.resblocks.{i}", v.text_width)
    return sd


@pytest.fixture(scope="module")
def sd():
    return _mini_clip_state_dict()


@pytest.fixture(scope="module")
def params(sd):
    return convert_clip_state_dict({k: t.numpy() for k, t in sd.items()})


def test_visual_dense_parity(sd, params):
    rng = np.random.RandomState(7)
    imgs = rng.randn(2, 64, 64, 3).astype(np.float32)
    taps = (1, 2)
    want_tokens, want_taps = clip_visual_dense(
        sd, torch.from_numpy(imgs).permute(0, 3, 1, 2).contiguous(),
        patch=VARIANT.patch, layers=VARIANT.layers, heads=VARIANT.heads,
        pretrain_grid=VARIANT.pretrain_grid, taps=taps,
    )
    got_tokens, got_taps = jclip.encode_image(params, jnp.asarray(imgs), VARIANT, dense=True, taps=taps)
    np.testing.assert_allclose(np.asarray(got_tokens), want_tokens.numpy(), atol=2e-4, rtol=1e-3)
    assert len(got_taps) == 2
    for got, want in zip(got_taps, want_taps):
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)


def test_text_parity(sd, params):
    rng = np.random.RandomState(11)
    N = 5
    tokens = np.zeros((N, VARIANT.context), dtype=np.int64)
    for i in range(N):
        L = rng.randint(3, VARIANT.context)
        tokens[i, 0] = VARIANT.vocab_size - 2  # pretend SOT
        tokens[i, 1 : L - 1] = rng.randint(1, VARIANT.vocab_size - 2, L - 2)
        tokens[i, L - 1] = VARIANT.vocab_size - 1  # EOT = max id
    want = clip_text(sd, torch.from_numpy(tokens), layers=VARIANT.text_layers, heads=VARIANT.text_heads)
    got = jclip.encode_text(params, jnp.asarray(tokens.astype(np.int32)), VARIANT)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)


def test_split_qkv_keys_equivalent(sd, params):
    """The reference checkpoints carry split q/k/v names (model_vpt.py:169-183)."""
    split_sd = {}
    for k, t in sd.items():
        if k.endswith("attn.in_proj_weight"):
            q, kk, v = t.chunk(3, dim=0)
            split_sd[k.replace("in_proj_weight", "q_proj_weight")] = q.numpy()
            split_sd[k.replace("in_proj_weight", "k_proj_weight")] = kk.numpy()
            split_sd[k.replace("in_proj_weight", "v_proj_weight")] = v.numpy()
        else:
            split_sd[k] = t.numpy()
    params2 = convert_clip_state_dict(split_sd)
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vpt_prompt_tokens(params):
    """VPT: prompts are inserted for the first prompt_depth layers and
    stripped after each block — output shape is unchanged, values differ."""
    import jax
    import copy

    rng = np.random.RandomState(9)
    imgs = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    base_tokens, base_taps = jclip.encode_image(params, imgs, VARIANT, dense=True, taps=(1,))

    p2 = dict(params)
    p2["visual"] = dict(params["visual"])
    p2["visual"]["prompt_tokens"] = jnp.asarray(
        rng.randn(2, 3, VARIANT.width).astype(np.float32) * 0.1
    )  # depth 2, length 3
    tokens, taps = jclip.encode_image(p2, imgs, VARIANT, dense=True, taps=(1,))
    assert tokens.shape == base_tokens.shape
    assert taps[0].shape == base_taps[0].shape
    assert not np.allclose(np.asarray(tokens), np.asarray(base_tokens))

    # zero prompts at depth 2, length L: output differs from no-prompt run only
    # through the attention over extra (zero+bias) tokens — still finite
    assert np.isfinite(np.asarray(tokens)).all()


def test_truncated_context_exact(params):
    """Causal mask => encode_text on truncate_context(tokens) equals the
    full-77 run bit-for-bit up to fusion-order fp drift."""
    rng = np.random.RandomState(3)
    N = 7
    tokens = np.zeros((N, VARIANT.context), dtype=np.int32)
    for i in range(N):
        L = rng.randint(3, 8)  # EOT index <= 6 -> truncates below the mini context=16
        tokens[i, 0] = VARIANT.vocab_size - 2
        tokens[i, 1 : L - 1] = rng.randint(1, VARIANT.vocab_size - 2, L - 2)
        tokens[i, L - 1] = VARIANT.vocab_size - 1  # EOT = max id
    short = jclip.truncate_context(tokens)
    assert short.shape[-1] < VARIANT.context and short.shape[-1] % 8 == 0
    full = np.asarray(jclip.encode_text(params, jnp.asarray(tokens), VARIANT))
    trunc = np.asarray(jclip.encode_text(params, jnp.asarray(short), VARIANT))
    np.testing.assert_allclose(trunc, full, atol=1e-5, rtol=1e-5)


def test_tap_at_final_layer(params):
    """A tap at the last block must not re-run that block or clobber other
    taps: tapped[i] for i < n-1 is identical whether or not n-1 is also
    tapped, and the final-layer tap equals the dense-final block output
    (= what the reference's forward hook on the last resblock captures)."""
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    n = VARIANT.layers

    _, tapped_a = jclip.encode_image(params, imgs, VARIANT, dense=True, taps=(1,))
    _, tapped_b = jclip.encode_image(params, imgs, VARIANT, dense=True, taps=(1, n - 1))
    np.testing.assert_array_equal(np.asarray(tapped_a[0]), np.asarray(tapped_b[0]))
    assert tapped_b[1].shape == tapped_b[0].shape
    # the final tap differs from the penultimate output (the block did run)
    _, tapped_pen = jclip.encode_image(params, imgs, VARIANT, dense=True, taps=(n - 2,))
    assert not np.allclose(np.asarray(tapped_b[1]), np.asarray(tapped_pen[0]))


def test_torchscript_archive_loading(sd, params, tmp_path):
    """The OpenAI zoo ships TorchScript archives (ViT-B-16.pt); the reference
    loads them via torch.jit.load (third_party/clip.py:70-84).
    load_torch_checkpoint must accept such an archive and yield the same
    converted params as a bare state dict."""
    import torch

    from catseg_tpu.weights.convert import load_torch_checkpoint

    # build a buffer-tree module whose state_dict equals the mini-CLIP sd,
    # then save it as a TorchScript archive like the zoo's artifacts
    class _Holder(torch.nn.Module):
        def forward(self):
            return torch.zeros(1)

    root = _Holder()
    for k, t in sd.items():
        parts = k.split(".")
        m = root
        for p in parts[:-1]:
            if not hasattr(m, p):
                m.add_module(p, torch.nn.Module())
            m = getattr(m, p)
        m.register_buffer(parts[-1], t)
    path = str(tmp_path / "mini_clip_jit.pt")
    torch.jit.save(torch.jit.trace(root, (), strict=False), path)

    flat = load_torch_checkpoint(path)
    assert set(flat) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(flat[k], sd[k].numpy())
    params2 = convert_clip_state_dict(flat)
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
