"""Optimizer: the reference training recipe in optax.

Reproduces train_net.py:174-258: AdamW (base LR 2e-4, cosine, no warmup),
CLIP parameters at LR x CLIP_MULTIPLIER (0.01), the CLIP finetune policy
(mode "attention": only q/v projection *weights* inside both CLIP
transformers train — cat_seg_model.py:57-75; everything else in CLIP is
frozen), and full-model gradient-norm clipping at 0.01 applied before the
update (FullModelGradientClippingOptimizer).
"""

from __future__ import annotations

import math

import jax
import optax

from ..configs import CATSegConfig


# dict keys whose leaves are torch norm-module parameters (LayerNorm gains/
# biases in CLIP + swin/class blocks, GroupNorm in the decoder DoubleConvs)
_NORM_KEYS = frozenset(
    {"gn1", "gn2", "norm1", "norm2", "guidance_norm", "ln_1", "ln_2",
     "ln_final", "ln_post", "ln_pre",
     # SAM mask-decoder / prompt-encoder norms (sam_refine fusion mode)
     "norm3", "norm4", "norm_final", "up_ln", "mask_ln1", "mask_ln2"}
)

# leaves that are nn.Embedding weights in the reference (WEIGHT_DECAY_EMBED=0,
# config.py:26): CLIP token embedding; SAM iou/mask output tokens
_EMBED_KEYS = frozenset({"token_embedding", "iou_token", "mask_tokens"})


def _label_for_path(path: tuple, clip_finetune: str) -> str:
    keys = tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path)

    def with_decay(base: str) -> str:
        # the reference zeroes weight decay for norm-module params
        # (train_net.py:218-220, WEIGHT_DECAY_NORM=0 detectron2 default) and
        # nn.Embedding weights (config.py:26, WEIGHT_DECAY_EMBED=0)
        if any(k in _NORM_KEYS for k in keys) or keys[-1] in _EMBED_KEYS:
            return base + "_nodecay"
        return base

    if keys and keys[0] in ("dino", "sam"):
        # second encoders are frozen in every fusion variant
        # (BuildDINO: implicit_fusion_Ver31.py:23-51; SAM encoder:
        # implicit_fusion_Ver14.py:32-33)
        return "frozen"
    if keys and keys[0] == "sam_pe":
        # prompt encoder trains EXCEPT point_embeddings / no_mask_embed /
        # not_a_point_embed (implicit_fusion_Ver14.py:36-43); the gaussian
        # PE matrix is a torch buffer (never a parameter)
        if keys[-1] in ("point_embeds", "no_mask", "not_a_point", "gauss"):
            return "frozen"
        return with_decay("main")
    if keys and keys[0] == "sam_dec":
        # mask decoder trains except the iou_prediction_head
        # (implicit_fusion_Ver14.py:34-37)
        if "iou_head" in keys:
            return "frozen"
        return with_decay("main")
    if not keys or keys[0] != "clip":
        return with_decay("main")
    inside_transformer = "blocks" in keys
    if clip_finetune == "attention":
        # q/v projection weights only (not biases, not k, not out-proj)
        if inside_transformer and keys[-1] in ("q_w", "v_w"):
            return "clip"
        return "frozen"
    if clip_finetune == "full":
        return with_decay("clip") if inside_transformer else "frozen"
    # "prompt" (VPT) or "none": nothing of CLIP trains (prompt tokens are the
    # VPT path, prompt_depth=0 in every released config)
    return "frozen"


def finetune_label_tree(params, clip_finetune: str):
    return jax.tree_util.tree_map_with_path(lambda p, _: _label_for_path(p, clip_finetune), params)


def cosine_lr(base_lr: float, max_iter: int, warmup_iters: int = 0, warmup_factor: float = 1.0):
    """detectron2 WarmupCosineLR (released configs: no warmup)."""

    def sched(step):
        import jax.numpy as jnp

        t = jnp.minimum(step, max_iter) / max_iter
        lr = base_lr * 0.5 * (1.0 + jnp.cos(math.pi * t))
        if warmup_iters > 0:
            alpha = jnp.minimum(step / warmup_iters, 1.0)
            lr = lr * (warmup_factor * (1 - alpha) + alpha)
        return lr

    return sched


def auto_scale_config(cfg: CATSegConfig, num_devices: int, ref_batch: int | None = None) -> CATSegConfig:
    """detectron2 auto_scale_workers semantics (plain_train_net.py:279): scale
    batch size with the device count and LR/iters/warmup inversely, keeping
    total-epoch behavior fixed."""
    ref_batch = ref_batch or cfg.batch_size
    new_batch = ref_batch * num_devices
    scale = new_batch / ref_batch
    return cfg.replace(
        batch_size=new_batch,
        base_lr=cfg.base_lr * scale,
        max_iter=int(round(cfg.max_iter / scale)),
    )


def build_optimizer(cfg: CATSegConfig, params) -> optax.GradientTransformation:
    labels = finetune_label_tree(params, cfg.clip_finetune)

    def adamw(mult: float, wd: float):
        return optax.adamw(
            learning_rate=cosine_lr(cfg.base_lr * mult, cfg.max_iter),
            weight_decay=wd,
        )

    # The reference's FullModelGradientClippingOptimizer computes the global
    # norm over the optimizer's param groups only — params with
    # requires_grad=False never enter them (train_net.py:203-204,240-242) —
    # so the clip must exclude frozen leaves.  Masking also keeps the frozen
    # backward dead code: no transform consumes those grads, letting XLA
    # eliminate their computation entirely.
    trainable = jax.tree.map(lambda lbl: lbl != "frozen", labels)
    return optax.chain(
        optax.masked(optax.clip_by_global_norm(cfg.grad_clip_norm), trainable),
        optax.multi_transform(
            {
                "main": adamw(1.0, cfg.weight_decay),
                "main_nodecay": adamw(1.0, 0.0),
                "clip": adamw(cfg.clip_multiplier, cfg.weight_decay),
                "clip_nodecay": adamw(cfg.clip_multiplier, 0.0),
                "frozen": optax.set_to_zero(),
            },
            labels,
        ),
    )
