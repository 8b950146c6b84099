"""One-step end-to-end training parity vs a torch oracle.

The optimizer semantics are proven piecewise in test_optim.py (decay groups,
clip masking, schedule arithmetic); this file proves the COMPOSITION: one
identical train step — text re-encode + whole-image forward + BCE
(cat_seg_model.py:115-203), AdamW group LRs with ×0.01 CLIP multiplier,
norm/embed zero decay, full-model grad clip 0.01 (train_net.py:174-258) —
run from the same converted checkpoint on both sides, asserting the updated
weights agree.

Mini geometry (the full-scale forward is proven separately in
test_fullscale_parity*.py): what matters here is that every step of the
recipe composes identically, including which leaves move at which LR.
"""

import numpy as np
import torch

import jax

from catseg_tpu.core.catseg import init_catseg_params
from catseg_tpu.train.loop import make_train_step
from catseg_tpu.train.optim import build_optimizer
from catseg_tpu.weights.export import export_catseg_checkpoint

from test_catseg_model import mini_cfg
from torch_oracle import catseg_train_loss_torch

T = 7


def _reference_groups(sd, base_lr, clip_mult, wd):
    """train_net.py:174-258 group assignment from flat released-style keys.

    Trainable = everything outside clip_model, plus (finetune mode
    "attention") the q/v projection weights inside both CLIP transformers
    (cat_seg_model.py:57-75; the "position" branch is dead).  Weight decay is
    zeroed for norm-module params (LayerNorm in swin/class blocks, GroupNorm
    in DoubleConv — detectron2 WEIGHT_DECAY_NORM=0) and embeddings
    (WEIGHT_DECAY_EMBED=0, config.py:26)."""
    CLIP_PREFIX = "sem_seg_head.predictor.clip_model."

    def is_norm(key):
        if ".double_conv." in key:  # Sequential idx 1/4 are the GroupNorms
            part = key.split(".double_conv.")[1].split(".")[0]
            return part in ("1", "4")
        mod = key.rsplit(".", 1)[0]
        return mod.endswith((".norm1", ".norm2", ".guidance_norm",
                             ".ln_1", ".ln_2", ".ln_pre", ".ln_post", "ln_final"))

    groups = {"main": [], "main_nodecay": [], "clip": []}
    frozen = []
    for key, t in sd.items():
        if key.startswith(CLIP_PREFIX):
            if key.endswith((".attn.q_proj_weight", ".attn.v_proj_weight")):
                groups["clip"].append((key, t))
            else:
                frozen.append((key, t))
        elif is_norm(key) or "token_embedding" in key:
            groups["main_nodecay"].append((key, t))
        else:
            groups["main"].append((key, t))
    return groups, frozen


def test_one_train_step_matches_torch_oracle():
    cfg = mini_cfg(num_classes=T, crop_size=128, base_lr=2e-4,
                   weight_decay=1e-4, clip_multiplier=0.01,
                   grad_clip_norm=0.01, max_iter=80000)
    rng = np.random.RandomState(0)

    params = init_catseg_params(jax.random.PRNGKey(0), cfg)
    sd0 = export_catseg_checkpoint(params)

    # tokens: SOT, a few ids, EOT (= max id, argmax pooling both sides)
    tokens = np.zeros((T, cfg.clip.context), np.int64)
    for t in range(T):
        ln = rng.randint(4, 9)
        tokens[t, 0] = cfg.clip.vocab_size - 2
        tokens[t, 1:ln] = rng.randint(1, cfg.clip.vocab_size - 2, ln - 1)
        tokens[t, ln] = cfg.clip.vocab_size - 1
    images = rng.randint(0, 255, (2, cfg.crop_size, cfg.crop_size, 3)).astype(np.float32)
    targets = rng.randint(0, T, (2, cfg.crop_size, cfg.crop_size)).astype(np.int32)
    targets[:, :13, :] = cfg.ignore_value  # some void pixels

    # ---- jax side: one step through the product path
    tx = build_optimizer(cfg, params)
    step = make_train_step(cfg, tx, tokens.astype(np.int32))
    new_params, _, loss = step(params, tx.init(params),
                               jax.numpy.asarray(images), jax.numpy.asarray(targets))
    loss = float(loss)
    sd1 = export_catseg_checkpoint(jax.tree.map(np.asarray, new_params))

    # ---- torch side: oracle forward + reference optimizer recipe
    sd_t = {k: torch.from_numpy(v.copy()) for k, v in sd0.items()}
    groups, frozen = _reference_groups(sd_t, cfg.base_lr, cfg.clip_multiplier,
                                       cfg.weight_decay)
    trainable = [t for g in groups.values() for _, t in g]
    for t in trainable:
        t.requires_grad_(True)

    tloss = catseg_train_loss_torch(
        sd_t, torch.from_numpy(images), torch.from_numpy(tokens),
        torch.from_numpy(targets.astype(np.int64)),
        clip_patch=cfg.clip.patch, clip_layers=cfg.clip.layers,
        clip_heads=cfg.clip.heads, clip_text_layers=cfg.clip.text_layers,
        clip_text_heads=cfg.clip.text_heads,
        clip_pretrain_grid=cfg.clip.pretrain_grid,
        guidance_layers=cfg.guidance_layers, heads=cfg.num_heads,
        window=cfg.window_size, pad_len=cfg.pad_len,
        num_layers=cfg.num_layers, clip_resolution=cfg.clip_resolution,
        pool=cfg.pooling_size, attention_type=cfg.attention_type,
        ignore_value=cfg.ignore_value,
    )
    assert abs(tloss.item() - loss) < 1e-5, (tloss.item(), loss)
    tloss.backward()

    # FullModelGradientClippingOptimizer: one clip over every optimizer param
    torch.nn.utils.clip_grad_norm_(trainable, cfg.grad_clip_norm)
    opt = torch.optim.AdamW([
        {"params": [t for _, t in groups["main"]], "lr": cfg.base_lr,
         "weight_decay": cfg.weight_decay},
        {"params": [t for _, t in groups["main_nodecay"]], "lr": cfg.base_lr,
         "weight_decay": 0.0},
        {"params": [t for _, t in groups["clip"]],
         "lr": cfg.base_lr * cfg.clip_multiplier,
         "weight_decay": cfg.weight_decay},
    ])
    opt.step()

    # ---- compare every leaf: trainables moved identically, frozen untouched
    assert groups["clip"], "finetune policy should train clip q/v weights"
    moved = 0
    for name, t in [(n, t) for g in groups.values() for n, t in g]:
        want = t.detach().numpy()
        got = sd1[name]
        np.testing.assert_allclose(got, want, atol=5e-7, rtol=1e-5, err_msg=name)
        if not np.array_equal(got, sd0[name]):
            moved += 1
    assert moved > 0.9 * sum(len(g) for g in groups.values())
    for name, t in frozen:
        np.testing.assert_array_equal(sd1[name], sd0[name], err_msg=name)
