"""torch checkpoint -> parameter-pytree conversion.

Maps the exact key names of (a) OpenAI CLIP state dicts (as rebuilt by the
reference loader, cat_seg/third_party/clip.py:70-134 — including the split
``q_proj_weight/k_proj_weight/v_proj_weight`` introduced by the Attention
subclass, model_vpt.py:169-183) and (b) full released CAT-Seg checkpoints
(``model_base.pth`` / ``model_large.pth``: ``{"model": state_dict, ...}``
with ``sem_seg_head.predictor.*`` / ``upsample{1,2}.*`` prefixes) into this
framework's pytrees.

Layout conventions: linear (in, out); conv HWIO; conv-transpose
(Cin, kh, kw, Cout); transformer blocks stacked on a leading layer axis.
Everything is pure numpy — no torch import needed when fed arrays (a helper
loads .pth via torch CPU when available).
"""

from __future__ import annotations

import numpy as np


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear (out, in) -> (in, out)."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convt(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (Cin, Cout, kh, kw) -> (Cin, kh, kw, Cout)."""
    return np.ascontiguousarray(np.transpose(w, (0, 2, 3, 1)))


def _ln(sd: dict, prefix: str) -> dict:
    return {"g": sd[prefix + ".weight"], "b": sd[prefix + ".bias"]}


def _attn_qkv(sd: dict, prefix: str) -> dict:
    """Handle both fused in_proj and split q/k/v projection weights."""
    out = {}
    if prefix + ".in_proj_weight" in sd:
        w = sd[prefix + ".in_proj_weight"]
        b = sd[prefix + ".in_proj_bias"]
        d = w.shape[0] // 3
        qw, kw, vw = w[:d], w[d : 2 * d], w[2 * d :]
    else:
        qw = sd[prefix + ".q_proj_weight"]
        kw = sd[prefix + ".k_proj_weight"]
        vw = sd[prefix + ".v_proj_weight"]
        b = sd[prefix + ".in_proj_bias"]
        d = qw.shape[0]
    out["q_w"], out["k_w"], out["v_w"] = _t(qw), _t(kw), _t(vw)
    out["q_b"], out["k_b"], out["v_b"] = b[:d], b[d : 2 * d], b[2 * d :]
    out["out_w"] = _t(sd[prefix + ".out_proj.weight"])
    out["out_b"] = sd[prefix + ".out_proj.bias"]
    return out


def _clip_block(sd: dict, prefix: str) -> dict:
    bp = _attn_qkv(sd, prefix + ".attn")
    bp["ln_1"] = _ln(sd, prefix + ".ln_1")
    bp["ln_2"] = _ln(sd, prefix + ".ln_2")
    bp["fc_w"] = _t(sd[prefix + ".mlp.c_fc.weight"])
    bp["fc_b"] = sd[prefix + ".mlp.c_fc.bias"]
    bp["proj_w"] = _t(sd[prefix + ".mlp.c_proj.weight"])
    bp["proj_b"] = sd[prefix + ".mlp.c_proj.bias"]
    return bp


def _stack(blocks: list[dict]) -> dict:
    out = {}
    for key in blocks[0]:
        if isinstance(blocks[0][key], dict):
            out[key] = _stack([b[key] for b in blocks])
        else:
            out[key] = np.stack([np.asarray(b[key], dtype=np.float32) for b in blocks])
    return out


def _count_layers(sd: dict, stem: str) -> int:
    n = -1
    probe = f"{stem}.resblocks."
    for k in sd:
        if k.startswith(probe):
            n = max(n, int(k[len(probe) :].split(".")[0]))
    return n + 1


def convert_clip_state_dict(sd: dict) -> dict:
    """OpenAI CLIP state dict (numpy values, no prefix) -> clip pytree."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    n_vis = _count_layers(sd, "visual.transformer")
    n_txt = _count_layers(sd, "transformer")
    visual: dict = {
        "conv1_w": _conv(sd["visual.conv1.weight"]),
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": _stack([_clip_block(sd, f"visual.transformer.resblocks.{i}") for i in range(n_vis)]),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
    }
    if "visual.transformer.prompt_tokens" in sd:  # VPT (model_vpt.py:252)
        visual["prompt_tokens"] = sd["visual.transformer.prompt_tokens"]
    text = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "blocks": _stack([_clip_block(sd, f"transformer.resblocks.{i}") for i in range(n_txt)]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    return {"visual": visual, "text": text, "logit_scale": np.asarray(sd.get("logit_scale", 0.0), dtype=np.float32)}


def resize_pos_embed_grid(pe: np.ndarray, target_grid: int) -> np.ndarray:
    """open_clip ``resize_pos_embed`` semantics at conversion time.

    Published laion2b ViT-H/G checkpoints ship 224-res (16x16 grid) visual
    positional embeddings; the reference loads them with
    ``force_image_size=336`` (cat_seg_predictor.py:64-76), which makes
    open_clip bicubically resize the grid part to 24x24 (align_corners=False;
    torch antialias is a no-op when upscaling).  ``pe``: (1 + S^2, W)."""
    n_extra = pe.shape[0] - int(round((pe.shape[0] - 1) ** 0.5)) ** 2
    grid = int(round((pe.shape[0] - n_extra) ** 0.5))
    if grid == target_grid:
        return pe
    from ..ops.resize import _cubic_weights

    tok, img = pe[:n_extra], pe[n_extra:]
    img = img.reshape(grid, grid, -1).astype(np.float64)
    w = _cubic_weights(grid, target_grid, False)  # (target, grid)
    img = np.einsum("hwc,oh->owc", img, w)
    img = np.einsum("hwc,ow->hoc", img, w)
    out = np.concatenate([tok, img.reshape(target_grid * target_grid, -1).astype(pe.dtype)])
    return np.ascontiguousarray(out)


def convert_openclip_state_dict(sd: dict, target_grid: int | None = None) -> dict:
    """open_clip CLIP state dict (ViT-H-14 / ViT-bigG-14 laion2b) -> clip
    pytree.

    open_clip's classic CLIP class keeps OpenAI key names (fused
    ``attn.in_proj_weight``, top-level text keys) plus non-parameter buffers
    (``attn_mask``, sometimes ``logit_bias``) that must be dropped; the visual
    positional embedding is grid-resized to ``target_grid`` per
    force_image_size (see resize_pos_embed_grid)."""
    sd = {
        k: np.asarray(v, dtype=np.float32)
        for k, v in sd.items()
        if not (k.endswith("attn_mask") or k == "logit_bias")
    }
    params = convert_clip_state_dict(sd)
    if target_grid is not None:
        params["visual"]["positional_embedding"] = resize_pos_embed_grid(
            params["visual"]["positional_embedding"], target_grid
        )
    return params


# --------------------------------------------------------------- aggregator


def _swin_block(sd: dict, prefix: str) -> dict:
    return {
        "norm1": _ln(sd, prefix + ".norm1"),
        "q_w": _t(sd[prefix + ".attn.q.weight"]),
        "q_b": sd[prefix + ".attn.q.bias"],
        "k_w": _t(sd[prefix + ".attn.k.weight"]),
        "k_b": sd[prefix + ".attn.k.bias"],
        "v_w": _t(sd[prefix + ".attn.v.weight"]),
        "v_b": sd[prefix + ".attn.v.bias"],
        "proj_w": _t(sd[prefix + ".attn.proj.weight"]),
        "proj_b": sd[prefix + ".attn.proj.bias"],
        "norm2": _ln(sd, prefix + ".norm2"),
        "fc1_w": _t(sd[prefix + ".mlp.fc1.weight"]),
        "fc1_b": sd[prefix + ".mlp.fc1.bias"],
        "fc2_w": _t(sd[prefix + ".mlp.fc2.weight"]),
        "fc2_b": sd[prefix + ".mlp.fc2.bias"],
    }


def _class_layer(sd: dict, prefix: str) -> dict:
    out = {
        "norm1": _ln(sd, prefix + ".norm1"),
        "norm2": _ln(sd, prefix + ".norm2"),
        "q_w": _t(sd[prefix + ".attention.q.weight"]),
        "q_b": sd[prefix + ".attention.q.bias"],
        "k_w": _t(sd[prefix + ".attention.k.weight"]),
        "k_b": sd[prefix + ".attention.k.bias"],
        "v_w": _t(sd[prefix + ".attention.v.weight"]),
        "v_b": sd[prefix + ".attention.v.bias"],
        "mlp1_w": _t(sd[prefix + ".MLP.0.weight"]),
        "mlp1_b": sd[prefix + ".MLP.0.bias"],
        "mlp2_w": _t(sd[prefix + ".MLP.2.weight"]),
        "mlp2_b": sd[prefix + ".MLP.2.bias"],
    }
    if prefix + ".padding_tokens" in sd:
        out["padding_tokens"] = sd[prefix + ".padding_tokens"].reshape(-1)
    if prefix + ".padding_guidance" in sd:
        out["padding_guidance"] = sd[prefix + ".padding_guidance"].reshape(-1)
    return out


def _double_conv(sd: dict, prefix: str) -> dict:
    return {
        "conv1_w": _conv(sd[prefix + ".double_conv.0.weight"]),
        "gn1": _ln(sd, prefix + ".double_conv.1"),
        "conv2_w": _conv(sd[prefix + ".double_conv.3.weight"]),
        "gn2": _ln(sd, prefix + ".double_conv.4"),
    }


def _up(sd: dict, prefix: str) -> dict:
    out = {"up_w": _convt(sd[prefix + ".up.weight"]), "up_b": sd[prefix + ".up.bias"]}
    out.update(_double_conv(sd, prefix + ".conv"))
    return out


def convert_aggregator_state_dict(sd: dict, num_layers: int | None = None) -> dict:
    """Aggregator (cat_seg/modeling/transformer/model.py:558) state dict ->
    aggregator pytree.  ``sd`` keys are unprefixed (conv1.weight, ...).

    ``num_layers`` defaults to the count present in the checkpoint (the
    fork's base config trains NUM_LAYERS=4 — silently reading only the
    first 2 would yield a wrong model with no error); passing an explicit
    count that disagrees with the checkpoint raises."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    in_ckpt = 1 + max(
        (int(k.split(".")[1]) for k in sd if k.startswith("layers.")), default=-1)
    if num_layers is None:
        num_layers = in_ckpt
    elif in_ckpt and num_layers != in_ckpt:
        raise ValueError(
            f"checkpoint has {in_ckpt} aggregator layers, num_layers={num_layers}")
    agg: dict = {
        "conv1": {"w": _conv(sd["conv1.weight"]), "b": sd["conv1.bias"]},
        "decoder1": _up(sd, "decoder1"),
        "decoder2": _up(sd, "decoder2"),
        "head": {"w": _conv(sd["head.weight"]), "b": sd["head.bias"]},
    }
    if "guidance_projection.0.weight" in sd:
        agg["guidance_proj"] = {
            "w": _conv(sd["guidance_projection.0.weight"]),
            "b": sd["guidance_projection.0.bias"],
        }
    if "text_guidance_projection.0.weight" in sd:
        agg["text_guidance_proj"] = {
            "w": _t(sd["text_guidance_projection.0.weight"]),
            "b": sd["text_guidance_projection.0.bias"],
        }
    if "decoder_guidance_projection.0.0.weight" in sd:
        agg["decoder_guidance_proj"] = [
            {
                "w": _conv(sd[f"decoder_guidance_projection.{i}.0.weight"]),
                "b": sd[f"decoder_guidance_projection.{i}.0.bias"],
            }
            for i in range(2)
        ]
    layers = []
    for i in range(num_layers):
        layers.append(
            {
                "swin1": _swin_block(sd, f"layers.{i}.swin_block.block_1"),
                "swin2": _swin_block(sd, f"layers.{i}.swin_block.block_2"),
                "guidance_norm": _ln(sd, f"layers.{i}.swin_block.guidance_norm"),
                "class": _class_layer(sd, f"layers.{i}.attention"),
            }
        )
    agg["layers"] = layers
    return agg


def convert_fusion_aggregator_state_dict(sd: dict, num_layers: int | None = None) -> dict:
    """FusionAggregatorVer31 state dict -> fusion aggregator pytree
    (FusionAggregatorVer31.py:58-99 module names: conv1/conv2/fusion_corr,
    CLIP_/DINO_decoder_guidance_projection, Fusiondecoder1/2)."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    in_ckpt = 1 + max(
        (int(k.split(".")[1]) for k in sd if k.startswith("layers.")), default=-1)
    if num_layers is None:
        num_layers = in_ckpt
    elif in_ckpt and num_layers != in_ckpt:
        raise ValueError(
            f"checkpoint has {in_ckpt} aggregator layers, num_layers={num_layers}")
    agg: dict = {
        "conv1": {"w": _conv(sd["conv1.weight"]), "b": sd["conv1.bias"]},
        "conv2": {"w": _conv(sd["conv2.weight"]), "b": sd["conv2.bias"]},
        "fusion_corr": {"w": _conv(sd["fusion_corr.weight"]), "b": sd["fusion_corr.bias"]},
        "decoder1": _up(sd, "Fusiondecoder1"),
        "decoder2": _up(sd, "Fusiondecoder2"),
        "head": {"w": _conv(sd["head.weight"]), "b": sd["head.bias"]},
    }
    if "guidance_projection.0.weight" in sd:
        agg["guidance_proj"] = {
            "w": _conv(sd["guidance_projection.0.weight"]),
            "b": sd["guidance_projection.0.bias"],
        }
    if "text_guidance_projection.0.weight" in sd:
        agg["text_guidance_proj"] = {
            "w": _t(sd["text_guidance_projection.0.weight"]),
            "b": sd["text_guidance_projection.0.bias"],
        }
    for key, name in (("clip_decoder_guidance_proj", "CLIP"),
                      ("dino_decoder_guidance_proj", "DINO")):
        agg[key] = [
            {
                "w": _conv(sd[f"{name}_decoder_guidance_projection.{i}.0.weight"]),
                "b": sd[f"{name}_decoder_guidance_projection.{i}.0.bias"],
            }
            for i in range(2)
        ]
    agg["layers"] = [
        {
            "swin1": _swin_block(sd, f"layers.{i}.swin_block.block_1"),
            "swin2": _swin_block(sd, f"layers.{i}.swin_block.block_2"),
            "guidance_norm": _ln(sd, f"layers.{i}.swin_block.guidance_norm"),
            "class": _class_layer(sd, f"layers.{i}.attention"),
        }
        for i in range(num_layers)
    ]
    return agg


def convert_catseg_checkpoint(sd: dict, num_layers: int | None = None) -> dict:
    """Full released-checkpoint state dict -> CATSeg params pytree.

    ``sd``: flat dict of numpy arrays with the detectron2 key names (pass
    ``torch.load(path, map_location='cpu')['model']`` through numpy first).
    Ver31 fusion checkpoints (dino_model./dino_down_sample/dino_decod_proj
    meta-arch keys, implicit_fusion_Ver31.py:111,154-159) are detected and
    converted to the fusion pytree layout.
    """
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    clip_sd = {
        k[len("sem_seg_head.predictor.clip_model.") :]: v
        for k, v in sd.items()
        if k.startswith("sem_seg_head.predictor.clip_model.")
    }
    agg_sd = {
        k[len("sem_seg_head.predictor.transformer.") :]: v
        for k, v in sd.items()
        if k.startswith("sem_seg_head.predictor.transformer.")
    }
    # drop non-parameter buffers (swin attn_mask is recomputed statically)
    agg_sd = {k: v for k, v in agg_sd.items() if not k.endswith("attn_mask")}
    agg_convert = (convert_fusion_aggregator_state_dict
                   if "fusion_corr.weight" in agg_sd else convert_aggregator_state_dict)
    params = {
        "clip": convert_clip_state_dict(clip_sd),
        "agg": agg_convert(agg_sd, num_layers=num_layers),
        "upsample1": {"w": _convt(sd["upsample1.weight"]), "b": sd["upsample1.bias"]},
        "upsample2": {"w": _convt(sd["upsample2.weight"]), "b": sd["upsample2.bias"]},
    }
    if any(k.startswith("dino_model.") for k in sd):
        # Ver31 fusion checkpoint: meta-arch DINO modules
        # (implicit_fusion_Ver31.py:111,154-159)
        from ..core.dino import convert_dino_state_dict

        params["dino"] = convert_dino_state_dict(
            {k[len("dino_model."):]: v for k, v in sd.items()
             if k.startswith("dino_model.")})
        params["dino_down"] = {"w": _conv(sd["dino_down_sample.weight"]),
                               "b": sd["dino_down_sample.bias"]}
        params["dino_proj1"] = {"w": _conv(sd["dino_decod_proj1.weight"]),
                                "b": sd["dino_decod_proj1.bias"]}
        params["dino_proj2"] = {"w": _convt(sd["dino_decod_proj2.weight"]),
                                "b": sd["dino_decod_proj2.bias"]}
    if any(k.startswith("sam_encoder.") for k in sd):
        # Ver14 sam_refine checkpoint: meta-arch-level SAM modules
        # (implicit_fusion_Ver14.py:123-125 sam_encoder/sam_prompt_encoder/
        # sam_decoder attributes)
        import dataclasses
        import re

        from ..core.sam import SAM_VARIANTS, SAM_VITB, convert_sam_state_dict
        from ..core.sam_decoder import convert_sam_prompt_decoder

        enc_sd = {k[len("sam_encoder."):]: v for k, v in sd.items() if k.startswith("sam_encoder.")}
        n_blocks = 1 + max(
            int(m.group(1)) for k in enc_sd if (m := re.match(r"blocks\.(\d+)\.", k))
        )
        svar = next((v for v in SAM_VARIANTS.values() if v.layers == n_blocks),
                    dataclasses.replace(SAM_VITB, layers=n_blocks))
        params["sam"] = convert_sam_state_dict(enc_sd, svar)
        pd_sd = {
            "prompt_encoder." + k[len("sam_prompt_encoder."):]: v
            for k, v in sd.items() if k.startswith("sam_prompt_encoder.")
        }
        pd_sd.update({k: v for k, v in sd.items() if k.startswith("sam_decoder.")})
        pd_sd = {k.replace("sam_decoder.", "mask_decoder."): v for k, v in pd_sd.items()}
        params["sam_pe"], params["sam_dec"] = convert_sam_prompt_decoder(pd_sd)
    return params


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth/.pt via torch CPU and return a flat numpy state dict.

    Handles both pickle checkpoints (released model_base.pth style) and the
    OpenAI zoo's TorchScript archives (ViT-B-16.pt etc.) — the reference
    consumes the latter with ``torch.jit.load`` at
    cat_seg/third_party/clip.py:70-84 and falls back to ``torch.load``;
    we try in the opposite order because our primary artifacts are pickles."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        # OpenAI zoo TorchScript archive: the state dict lives on the
        # scripted module (clip.py:75 `torch.jit.load(...).state_dict()`)
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    if isinstance(obj, torch.jit.ScriptModule):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items() if hasattr(v, "detach")}
