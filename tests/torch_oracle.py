"""Pure-functional torch oracles for parity tests.

These re-derive the reference semantics (documented in SURVEY.md with
file:line citations) directly with torch.nn.functional calls over a flat
torch-style state dict, independently of the JAX implementation.  Only used
by tests; torch never appears in the framework itself.
"""

import math

import torch
import torch.nn.functional as F


def _l(sd, name, x):
    return F.linear(x, sd[name + ".weight"], sd.get(name + ".bias"))


def _ln(sd, name, x):
    return F.layer_norm(x, (x.shape[-1],), sd[name + ".weight"], sd[name + ".bias"])


def _mha(sd, p, x, heads, mask=None):
    # x: (B, T, W); fused in_proj
    B, T, W = x.shape
    qkv = F.linear(x, sd[p + ".attn.in_proj_weight"], sd[p + ".attn.in_proj_bias"])
    q, k, v = qkv.chunk(3, dim=-1)
    D = W // heads
    q = q.view(B, T, heads, D).transpose(1, 2)
    k = k.view(B, T, heads, D).transpose(1, 2)
    v = v.view(B, T, heads, D).transpose(1, 2)
    logits = q @ k.transpose(-2, -1) / math.sqrt(D)
    if mask is not None:
        logits = logits + mask
    out = (logits.softmax(-1) @ v).transpose(1, 2).reshape(B, T, W)
    return _l(sd, p + ".attn.out_proj", out)


def _clip_mlp(sd, p, x, act="quick_gelu"):
    h = _l(sd, p + ".mlp.c_fc", x)
    # OpenAI CLIP: QuickGELU; open_clip H/G: exact nn.GELU
    h = h * torch.sigmoid(1.702 * h) if act == "quick_gelu" else F.gelu(h)
    return _l(sd, p + ".mlp.c_proj", h)


def _clip_block(sd, p, x, heads, mask=None, act="quick_gelu"):
    x = x + _mha(sd, p, _ln(sd, p + ".ln_1", x), heads, mask)
    x = x + _clip_mlp(sd, p, _ln(sd, p + ".ln_2", x), act)
    return x


def _dense_block(sd, p, x, act="quick_gelu"):
    # model_vpt.py:219-240 semantics: value path + out_proj, CLS-row residual
    y = _ln(sd, p + ".ln_1", x)
    W = x.shape[-1]
    vw = sd[p + ".attn.in_proj_weight"][2 * W :]
    vb = sd[p + ".attn.in_proj_bias"][2 * W :]
    v = F.linear(y, vw, vb)
    v = _l(sd, p + ".attn.out_proj", v)
    v = v + x[:, :1]
    v = v + _clip_mlp(sd, p, _ln(sd, p + ".ln_2", v), act)
    return v


def clip_visual_dense(sd, images_nchw, patch, layers, heads, pretrain_grid, taps=(), act="quick_gelu"):
    """Returns (tokens after ln_post @ proj, [tap outputs])."""
    x = F.conv2d(images_nchw, sd["visual.conv1.weight"], stride=patch)
    B, W, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)  # B, G², W
    cls = sd["visual.class_embedding"].expand(B, 1, W)
    x = torch.cat([cls, x], dim=1)
    pe = sd["visual.positional_embedding"]
    if x.shape[1] != pe.shape[0]:
        cls_pos, grid_pos = pe[:1], pe[1:]
        grid_pos = grid_pos.reshape(1, pretrain_grid, pretrain_grid, W).permute(0, 3, 1, 2)
        grid_pos = F.interpolate(grid_pos, size=(gh, gw), mode="bicubic", align_corners=False)
        pe = torch.cat([cls_pos, grid_pos.squeeze(0).reshape(W, -1).T], dim=0)
    x = x + pe
    x = _ln(sd, "visual.ln_pre", x)
    tapped = []
    for i in range(layers - 1):
        x = _clip_block(sd, f"visual.transformer.resblocks.{i}", x, heads, act=act)
        if i in taps:
            tapped.append(x)
    x = _dense_block(sd, f"visual.transformer.resblocks.{layers - 1}", x, act=act)
    x = _ln(sd, "visual.ln_post", x)
    x = x @ sd["visual.proj"]
    return x, tapped


def clip_text(sd, tokens, layers, heads, act="quick_gelu"):
    x = F.embedding(tokens, sd["token_embedding.weight"])
    x = x + sd["positional_embedding"]
    T = tokens.shape[-1]
    mask = torch.full((T, T), float("-inf")).triu_(1)
    for i in range(layers):
        x = _clip_block(sd, f"transformer.resblocks.{i}", x, heads, mask, act)
    x = _ln(sd, "ln_final", x)
    eot = tokens.argmax(dim=-1)
    return x[torch.arange(x.shape[0]), eot] @ sd["text_projection"]


# ------------------------------------------------------------- aggregator


def _win_part(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def _win_rev(w, ws, H, W):
    C = w.shape[-1]
    B = w.shape[0] // ((H // ws) * (W // ws))
    x = w.view(B, H // ws, W // ws, ws, ws, C).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _shift_mask_t(H, W, ws, shift):
    img = torch.zeros(1, H, W, 1)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wss, :] = cnt
            cnt += 1
    mw = _win_part(img, ws).view(-1, ws * ws)
    am = mw.unsqueeze(1) - mw.unsqueeze(2)
    return am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)


def _swin_block_t(sd, p, x, guid, heads, ws, shift):
    # x: (BT, H, W, C) channels-last; model.py:185-225
    BT, H, W, C = x.shape
    shortcut = x
    x = _ln(sd, p + ".norm1", x)
    if guid is not None:
        x = torch.cat([x, guid], dim=-1)
    if shift > 0:
        x = torch.roll(x, (-shift, -shift), dims=(1, 2))
    wins = _win_part(x, ws)
    q = _l(sd, p + ".attn.q", wins)
    k = _l(sd, p + ".attn.k", wins)
    v = _l(sd, p + ".attn.v", wins[..., :C])
    Bw, N, _ = q.shape
    D = C // heads
    q = q.view(Bw, N, heads, D).transpose(1, 2) * D**-0.5
    k = k.view(Bw, N, heads, D).transpose(1, 2)
    v = v.view(Bw, N, heads, D).transpose(1, 2)
    logits = q @ k.transpose(-2, -1)
    if shift > 0:
        m = _shift_mask_t(H, W, ws, shift)
        nW = m.shape[0]
        logits = logits.view(Bw // nW, nW, heads, N, N) + m.unsqueeze(1).unsqueeze(0)
        logits = logits.view(Bw, heads, N, N)
    out = (logits.softmax(-1) @ v).transpose(1, 2).reshape(Bw, N, C)
    out = _l(sd, p + ".attn.proj", out)
    x = _win_rev(out, ws, H, W)
    if shift > 0:
        x = torch.roll(x, (shift, shift), dims=(1, 2))
    x = shortcut + x
    y = _ln(sd, p + ".norm2", x)
    y = _l(sd, p + ".mlp.fc2", F.gelu(_l(sd, p + ".mlp.fc1", y)))
    return x + y


def _class_layer_t(sd, p, x, text_guid, heads, pool, pad_len, attention_type):
    # x: (B, T, H, W, C) channels-last; model.py:357-424
    B, T, H, W, C = x.shape
    xp = F.avg_pool2d(x.reshape(B * T, H, W, C).permute(0, 3, 1, 2), pool).permute(0, 2, 3, 1)
    Hp, Wp = xp.shape[1], xp.shape[2]
    xp = xp.reshape(B, T, Hp, Wp, C)
    if pad_len > 0 and T < pad_len:
        pt = sd[p + ".padding_tokens"].view(1, 1, 1, 1, C).expand(B, pad_len - T, Hp, Wp, C)
        xp = torch.cat([xp, pt], dim=1)
        if text_guid is not None:
            pg = sd[p + ".padding_guidance"].view(1, 1, -1).expand(B, pad_len - T, -1)
            text_guid = torch.cat([text_guid, pg], dim=1)
    Tp = xp.shape[1]
    seq = xp.permute(0, 2, 3, 1, 4).reshape(B * Hp * Wp, Tp, C)
    if text_guid is not None:
        guid = text_guid.unsqueeze(1).expand(B, Hp * Wp, Tp, text_guid.shape[-1]).reshape(B * Hp * Wp, Tp, -1)
    else:
        guid = None

    normed = _ln(sd, p + ".norm1", seq)
    qin = normed if guid is None else torch.cat([normed, guid], dim=-1)
    q = _l(sd, p + ".attention.q", qin).view(-1, Tp, heads, C // heads)
    k = _l(sd, p + ".attention.k", qin).view(-1, Tp, heads, C // heads)
    v = _l(sd, p + ".attention.v", normed).view(-1, Tp, heads, C // heads)
    if attention_type == "linear":
        Q = F.elu(q) + 1
        K = F.elu(k) + 1
        vl = v / Tp
        KV = torch.einsum("nshd,nshv->nhdv", K, vl)
        Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(1)) + 1e-6)
        att = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * Tp
    else:
        logits = torch.einsum("nlhd,nshd->nlsh", q, k) / math.sqrt(C // heads)
        att = torch.einsum("nlsh,nshd->nlhd", logits.softmax(2), v)
    seq = seq + att.reshape(-1, Tp, C)
    normed = _ln(sd, p + ".norm2", seq)
    seq = seq + _l(sd, p + ".MLP.2", F.relu(_l(sd, p + ".MLP.0", normed)))

    out = seq.view(B, Hp, Wp, Tp, C).permute(0, 3, 1, 2, 4)[:, :T]
    out = out.reshape(B * T, Hp, Wp, C).permute(0, 3, 1, 2)
    out = F.interpolate(out, size=(H, W), mode="bilinear", align_corners=True)
    out = out.permute(0, 2, 3, 1).reshape(B, T, H, W, C)
    return x + out


def _double_conv_t(sd, p, x):
    mid = sd[p + ".double_conv.0.weight"].shape[0]
    x = F.conv2d(x, sd[p + ".double_conv.0.weight"], padding=1)
    x = F.relu(F.group_norm(x, mid // 16, sd[p + ".double_conv.1.weight"], sd[p + ".double_conv.1.bias"]))
    x = F.conv2d(x, sd[p + ".double_conv.3.weight"], padding=1)
    x = F.relu(F.group_norm(x, mid // 16, sd[p + ".double_conv.4.weight"], sd[p + ".double_conv.4.bias"]))
    return x


def _up_t(sd, p, x, guid):
    x = F.conv_transpose2d(x, sd[p + ".up.weight"], sd[p + ".up.bias"], stride=2)
    if guid is not None:
        T = x.shape[0] // guid.shape[0]
        g = guid.unsqueeze(1).expand(-1, T, -1, -1, -1).reshape(-1, *guid.shape[1:])
        x = torch.cat([x, g], dim=1)
    return _double_conv_t(sd, p + ".conv", x)


def aggregator_torch(sd, img_feats, text_feats, guidance, *, heads, window, pool, pad_len,
                     num_layers, attention_type="linear"):
    """Full Aggregator oracle (model.py:683-725).

    img_feats: (B, H, W, C) channels-last; text_feats: (B, T, P, C);
    guidance: (res3 (B,H,W,Cg), res4 NCHW, res5 NCHW).  Returns (B,T,96-ish,96-ish).
    """
    B, H, W, C = img_feats.shape
    T = text_feats.shape[1]
    imgn = F.normalize(img_feats, dim=-1)
    txtn = F.normalize(text_feats, dim=-1)
    corr = torch.einsum("bhwc,btpc->bthwp", imgn, txtn)

    classes = None
    if pad_len > 0 and T > pad_len:
        scores = corr.amax(dim=(2, 3, 4))
        classes = scores.topk(pad_len, dim=-1).indices
        corr = torch.gather(corr, 1, classes[:, :, None, None, None].expand(-1, -1, H, W, corr.shape[-1]))
        text_feats = torch.gather(txtn, 1, classes[:, :, None, None].expand(-1, -1, *txtn.shape[2:]))

    Tc = corr.shape[1]
    x = F.conv2d(corr.reshape(B * Tc, H, W, -1).permute(0, 3, 1, 2), sd["conv1.weight"], sd["conv1.bias"], padding=3)
    Ch = x.shape[1]
    x = x.permute(0, 2, 3, 1).reshape(B, Tc, H, W, Ch)

    proj_guid = None
    if "guidance_projection.0.weight" in sd:
        g = F.conv2d(guidance[0].permute(0, 3, 1, 2), sd["guidance_projection.0.weight"],
                     sd["guidance_projection.0.bias"], padding=1)
        proj_guid = F.relu(g).permute(0, 2, 3, 1)
    dec_guid = [None, None]
    if "decoder_guidance_projection.0.0.weight" in sd:
        dec_guid = [
            F.relu(F.conv2d(guidance[1 + i], sd[f"decoder_guidance_projection.{i}.0.weight"],
                            sd[f"decoder_guidance_projection.{i}.0.bias"], padding=1))
            for i in range(2)
        ]
    text_guid = None
    if "text_guidance_projection.0.weight" in sd:
        tf = text_feats.mean(dim=-2)
        tf = tf / tf.norm(dim=-1, keepdim=True)
        text_guid = F.relu(_l(sd, "text_guidance_projection.0", tf))

    for i in range(num_layers):
        BT = B * Tc
        xs = x.reshape(BT, H, W, Ch)
        guid = None
        if proj_guid is not None:
            gn = _ln(sd, f"layers.{i}.swin_block.guidance_norm", proj_guid)
            guid = gn.unsqueeze(1).expand(B, Tc, H, W, -1).reshape(BT, H, W, -1)
        xs = _swin_block_t(sd, f"layers.{i}.swin_block.block_1", xs, guid, heads, window, 0)
        xs = _swin_block_t(sd, f"layers.{i}.swin_block.block_2", xs, guid, heads, window, window // 2)
        x = xs.reshape(B, Tc, H, W, Ch)
        x = _class_layer_t(sd, f"layers.{i}.attention", x, text_guid, heads, pool, pad_len, attention_type)

    xs = x.reshape(B * Tc, H, W, Ch).permute(0, 3, 1, 2)
    xs = _up_t(sd, "decoder1", xs, dec_guid[0])
    xs = _up_t(sd, "decoder2", xs, dec_guid[1])
    logit = F.conv2d(xs, sd["head.weight"], sd["head.bias"], padding=1)
    Ho, Wo = logit.shape[-2:]
    logit = logit.reshape(B, Tc, Ho, Wo)
    if classes is not None:
        out = torch.full((B, T, Ho, Wo), -100.0)
        out.scatter_(1, classes[:, :, None, None].expand(-1, -1, Ho, Wo), logit)
        logit = out
    return logit


# -------------------------------------------- full CATSeg eval composition

CLIP_PIXEL_MEAN = (122.7709383, 116.7460125, 104.09373615)
CLIP_PIXEL_STD = (68.5005327, 66.6321579, 70.3231630)


def fuse_split_qkv(clip_sd):
    """Released checkpoints carry split q/k/v_proj_weight (model_vpt.py:169-183);
    the block oracles above consume fused in_proj_weight."""
    if not any(k.endswith(".attn.q_proj_weight") for k in clip_sd):
        return clip_sd
    fused = {}
    for k, v in clip_sd.items():
        if k.endswith(".attn.q_proj_weight"):
            p = k[: -len(".q_proj_weight")]
            fused[p + ".in_proj_weight"] = torch.cat(
                [clip_sd[p + ".q_proj_weight"], clip_sd[p + ".k_proj_weight"],
                 clip_sd[p + ".v_proj_weight"]], dim=0)
        elif not (k.endswith(".attn.k_proj_weight") or k.endswith(".attn.v_proj_weight")):
            fused[k] = v
    return fused


def catseg_sliding_window_torch(
    sd, image_hw3, text_feats, *, clip_patch, clip_layers, clip_heads,
    clip_pretrain_grid, guidance_layers, heads, window, pad_len, num_layers,
    clip_resolution=384, kernel=384, stride=256, out_res=640,
    pool=(1, 1), attention_type="linear", act="quick_gelu",
):
    """Full sliding-window eval oracle (cat_seg_model.py:156-218).

    sd: flat torch state dict with the released-checkpoint key names
    (sem_seg_head.predictor.* / upsample{1,2}.*); image_hw3: (H, W, 3) float
    RGB in [0, 255]; text_feats: (T, P, E).  Returns (out_res, out_res, T)
    sigmoid probabilities.
    """
    clip_sd = {k[len("sem_seg_head.predictor.clip_model."):]: v for k, v in sd.items()
               if k.startswith("sem_seg_head.predictor.clip_model.")}
    agg_sd = {k[len("sem_seg_head.predictor.transformer."):]: v for k, v in sd.items()
              if k.startswith("sem_seg_head.predictor.transformer.")}
    clip_sd = fuse_split_qkv(clip_sd)

    img = image_hw3.permute(2, 0, 1)[None].float()
    im640 = F.interpolate(img, size=(out_res, out_res), mode="bilinear", align_corners=False)
    unf = F.unfold(im640, kernel_size=kernel, stride=stride)  # (1, 3*k*k, L)
    tiles = unf[0].T.reshape(-1, 3, kernel, kernel)  # '(C H W) L -> L C H W'
    glob = F.interpolate(img, size=(kernel, kernel), mode="bilinear", align_corners=False)
    batch = torch.cat([tiles, glob], dim=0)

    mean = torch.tensor(CLIP_PIXEL_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_PIXEL_STD).view(1, 3, 1, 1)
    clip_in = (batch - mean) / std
    clip_in = F.interpolate(clip_in, size=(clip_resolution, clip_resolution),
                            mode="bilinear", align_corners=False)

    feats, taps = clip_visual_dense(clip_sd, clip_in, patch=clip_patch, layers=clip_layers,
                                    heads=clip_heads, pretrain_grid=clip_pretrain_grid,
                                    taps=guidance_layers, act=act)
    B = feats.shape[0]
    G = clip_resolution // clip_patch
    res3 = feats[:, 1:, :].reshape(B, G, G, -1)  # channels-last
    res4 = taps[0][:, 1:, :].reshape(B, G, G, -1).permute(0, 3, 1, 2)
    res4 = F.conv_transpose2d(res4, sd["upsample1.weight"], sd["upsample1.bias"], stride=2)
    res5 = taps[1][:, 1:, :].reshape(B, G, G, -1).permute(0, 3, 1, 2)
    res5 = F.conv_transpose2d(res5, sd["upsample2.weight"], sd["upsample2.bias"], stride=4)

    tf = text_feats.unsqueeze(0).expand(B, -1, -1, -1)
    logits = aggregator_torch(agg_sd, res3, tf, (res3, res4, res5), heads=heads,
                              window=window, pool=pool, pad_len=pad_len,
                              num_layers=num_layers, attention_type=attention_type)

    logits = F.interpolate(logits, size=kernel, mode="bilinear", align_corners=False)
    probs = logits.sigmoid()
    glob_p = F.interpolate(probs[-1:], size=(out_res, out_res), mode="bilinear", align_corners=False)
    tile_p = probs[:-1]
    folded = F.fold(tile_p.flatten(1).T[None], (out_res, out_res), kernel_size=kernel, stride=stride)
    div = F.fold(F.unfold(torch.ones(1, 1, out_res, out_res), kernel_size=kernel, stride=stride),
                 (out_res, out_res), kernel_size=kernel, stride=stride)
    out = (folded / div + glob_p) / 2.0
    return out[0].permute(1, 2, 0)


# ----------------------------------------------------------------- DINO ViT


def dino_intermediate_layers(sd, images_nchw, patch, layers, heads, pretrain_grid, n):
    """facebookresearch/dino ViT oracle (vision_transformer.py semantics)."""
    x = F.conv2d(images_nchw, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
                 stride=patch)
    B, C, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)
    cls = sd["cls_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1)
    pe = sd["pos_embed"]
    if x.shape[1] != pe.shape[1]:
        cls_pe, grid_pe = pe[:, :1], pe[:, 1:]
        scale = (gh + 0.1) / pretrain_grid
        grid_pe = grid_pe.reshape(1, pretrain_grid, pretrain_grid, C).permute(0, 3, 1, 2)
        grid_pe = F.interpolate(grid_pe, scale_factor=(scale, scale), mode="bicubic",
                                recompute_scale_factor=False)
        pe = torch.cat([cls_pe, grid_pe.permute(0, 2, 3, 1).reshape(1, -1, C)], dim=1)
    x = x + pe
    outs = []
    for i in range(layers):
        p = f"blocks.{i}"
        y = _ln(sd, p + ".norm1", x)
        qkv = F.linear(y, sd[p + ".attn.qkv.weight"], sd[p + ".attn.qkv.bias"])
        N = x.shape[1]
        D = C // heads
        q, k, v = qkv.reshape(B, N, 3, heads, D).permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1) * D**-0.5).softmax(-1)
        out = (att @ v).transpose(1, 2).reshape(B, N, C)
        x = x + _l(sd, p + ".attn.proj", out)
        y = _ln(sd, p + ".norm2", x)
        x = x + _l(sd, p + ".mlp.fc2", F.gelu(_l(sd, p + ".mlp.fc1", y)))
        if layers - i <= n:
            outs.append(_ln(sd, "norm", x))
    return outs


# ----------------------------------------------------------------- SAM ViT


def _sam_get_rel_pos(q_size, k_size, rel_pos):
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        rel_pos = F.interpolate(rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
                                size=max_rel, mode="linear").reshape(-1, max_rel).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


def _sam_attention(sd, p, x, heads):
    B, H, W, C = x.shape
    D = C // heads
    qkv = F.linear(x.reshape(B, H * W, C), sd[p + ".attn.qkv.weight"], sd[p + ".attn.qkv.bias"])
    qkv = qkv.reshape(B, H * W, 3, heads, D).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = q @ k.transpose(-2, -1) * D**-0.5
    Rh = _sam_get_rel_pos(H, H, sd[p + ".attn.rel_pos_h"])
    Rw = _sam_get_rel_pos(W, W, sd[p + ".attn.rel_pos_w"])
    rq = q.reshape(B, heads, H, W, D)
    rel_h = torch.einsum("bnhwd,hkd->bnhwk", rq, Rh)
    rel_w = torch.einsum("bnhwd,wkd->bnhwk", rq, Rw)
    attn = attn.view(B, heads, H, W, H, W) + rel_h[..., :, None] + rel_w[..., None, :]
    attn = attn.view(B, heads, H * W, H * W).softmax(-1)
    out = (attn @ v).reshape(B, heads, H * W, D).permute(0, 2, 1, 3).reshape(B, H * W, C)
    return _l(sd, p + ".attn.proj", out).reshape(B, H, W, C)


def _sam_win_part(x, ws):
    B, H, W, C = x.shape
    ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C).permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _sam_win_unpart(w, ws, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    C = w.shape[-1]
    B = w.shape[0] // ((Hp // ws) * (Wp // ws))
    x = w.view(B, Hp // ws, Wp // ws, ws, ws, C).permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W]


def sam_encoder(sd, images_nchw, patch, layers, heads, window, global_blocks):
    x = F.conv2d(images_nchw, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"], stride=patch)
    x = x.permute(0, 2, 3, 1)  # B H W C
    x = x + sd["pos_embed"]
    outs = []
    for i in range(layers):
        p = f"blocks.{i}"
        ws = 0 if i in global_blocks else window
        shortcut = x
        y = _ln(sd, p + ".norm1", x)
        if ws > 0:
            y, pad_hw = _sam_win_part(y, ws)
        y = _sam_attention(sd, p, y, heads)
        if ws > 0:
            y = _sam_win_unpart(y, ws, pad_hw, x.shape[1:3])
        x = shortcut + y
        y = _ln(sd, p + ".norm2", x)
        x = x + _l(sd, p + ".mlp.lin2", F.gelu(_l(sd, p + ".mlp.lin1", y)))
        outs.append(x)
    n = x.permute(0, 3, 1, 2)
    n = F.conv2d(n, sd["neck.0.weight"])
    mu = n.mean(1, keepdim=True); var = ((n - mu) ** 2).mean(1, keepdim=True)
    n = (n - mu) / (var + 1e-6).sqrt() * sd["neck.1.weight"][:, None, None] + sd["neck.1.bias"][:, None, None]
    n = F.conv2d(n, sd["neck.2.weight"], padding=1)
    mu = n.mean(1, keepdim=True); var = ((n - mu) ** 2).mean(1, keepdim=True)
    n = (n - mu) / (var + 1e-6).sqrt() * sd["neck.3.weight"][:, None, None] + sd["neck.3.bias"][:, None, None]
    return n.permute(0, 2, 3, 1), outs


# ------------------------------------------------- SAM prompt/mask decoder


def _sam_dec_attn(sd, p, q, k, v, heads):
    qp = _l(sd, p + ".q_proj", q)
    kp = _l(sd, p + ".k_proj", k)
    vp = _l(sd, p + ".v_proj", v)
    B, Nq, Ci = qp.shape
    D = Ci // heads
    qp = qp.view(B, Nq, heads, D).transpose(1, 2) / math.sqrt(D)
    kp = kp.view(B, -1, heads, D).transpose(1, 2)
    vp = vp.view(B, -1, heads, D).transpose(1, 2)
    out = ((qp @ kp.transpose(-2, -1)).softmax(-1) @ vp).transpose(1, 2).reshape(B, Nq, Ci)
    return _l(sd, p + ".out_proj", out)


def sam_mask_decoder(sd, image_emb_bhwc, image_pe_hwc, sparse, dense_bhwc, heads=8,
                     depth=2, num_mask_tokens=4, multimask=False):
    m = "mask_decoder."
    B = sparse.shape[0]
    out_tokens = torch.cat([sd[m + "iou_token.weight"], sd[m + "mask_tokens.weight"]], dim=0)
    tokens = torch.cat([out_tokens.unsqueeze(0).expand(B, -1, -1), sparse], dim=1)
    src = image_emb_bhwc + dense_bhwc
    Bh, h, w, C = src.shape
    keys = src.reshape(B, h * w, C)
    key_pe = image_pe_hwc.reshape(1, h * w, C).expand(B, -1, -1)
    queries = tokens
    for i in range(depth):
        lp = m + f"transformer.layers.{i}"
        if i == 0:
            queries = _sam_dec_attn(sd, lp + ".self_attn", queries, queries, queries, heads)
        else:
            q = queries + tokens
            queries = queries + _sam_dec_attn(sd, lp + ".self_attn", q, q, queries, heads)
        queries = _ln(sd, lp + ".norm1", queries)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + _sam_dec_attn(sd, lp + ".cross_attn_token_to_image", q, k, keys, heads)
        queries = _ln(sd, lp + ".norm2", queries)
        mlp = _l(sd, lp + ".mlp.lin2", F.relu(_l(sd, lp + ".mlp.lin1", queries)))
        queries = _ln(sd, lp + ".norm3", queries + mlp)
        q = queries + tokens
        k = keys + key_pe
        keys = keys + _sam_dec_attn(sd, lp + ".cross_attn_image_to_token", k, q, queries, heads)
        keys = _ln(sd, lp + ".norm4", keys)
    q = queries + tokens
    k = keys + key_pe
    queries = queries + _sam_dec_attn(sd, m + "transformer.final_attn_token_to_image", q, k, keys, heads)
    queries = _ln(sd, m + "transformer.norm_final_attn", queries)

    iou_out = queries[:, 0]
    mask_tokens_out = queries[:, 1 : 1 + num_mask_tokens]
    up = keys.transpose(1, 2).reshape(B, C, h, w)
    up = F.conv_transpose2d(up, sd[m + "output_upscaling.0.weight"], sd[m + "output_upscaling.0.bias"], stride=2)
    mu = up.mean(1, keepdim=True); var = ((up - mu) ** 2).mean(1, keepdim=True)
    up = (up - mu) / (var + 1e-6).sqrt() * sd[m + "output_upscaling.1.weight"][:, None, None] + \
         sd[m + "output_upscaling.1.bias"][:, None, None]
    up = F.gelu(up)
    up = F.conv_transpose2d(up, sd[m + "output_upscaling.3.weight"], sd[m + "output_upscaling.3.bias"], stride=2)
    up = F.gelu(up)

    def mlp3(prefix, x):
        for j in range(3):
            x = _l(sd, f"{prefix}.layers.{j}", x)
            if j < 2:
                x = F.relu(x)
        return x

    hyper = torch.stack([mlp3(m + f"output_hypernetworks_mlps.{i}", mask_tokens_out[:, i])
                         for i in range(num_mask_tokens)], dim=1)
    Bc, Cu, hu, wu = up.shape
    masks = (hyper @ up.reshape(Bc, Cu, hu * wu)).reshape(B, -1, hu, wu)
    iou = mlp3(m + "iou_prediction_head", iou_out)
    if multimask:
        return masks[:, 1:], iou[:, 1:]
    return masks[:, :1], iou[:, :1]


# ------------------------------------------------ training-step composition


def catseg_train_loss_torch(
    sd, images_bhw3, tokens, targets, *, clip_patch, clip_layers, clip_heads,
    clip_text_layers, clip_text_heads, clip_pretrain_grid, guidance_layers,
    heads, window, pad_len, num_layers, clip_resolution, pool=(2, 2),
    attention_type="linear", ignore_value=255, act="quick_gelu",
):
    """The reference training branch as one differentiable composition:
    text re-encode each step (cat_seg_predictor.py:209-210), whole-image
    forward at train pooling, bilinear upsample to GT size, all-class BCE
    with ignore-as-all-negative supervision (cat_seg_model.py:115-155,
    189-203).  ``sd`` tensors may carry requires_grad — fuse_split_qkv uses
    torch.cat, so autograd reaches the split q/v leaves (the finetune
    policy's trainable CLIP subset)."""
    clip_sd = fuse_split_qkv({k[len("sem_seg_head.predictor.clip_model."):]: v
                              for k, v in sd.items()
                              if k.startswith("sem_seg_head.predictor.clip_model.")})
    agg_sd = {k[len("sem_seg_head.predictor.transformer."):]: v for k, v in sd.items()
              if k.startswith("sem_seg_head.predictor.transformer.")}

    emb = clip_text(clip_sd, tokens, layers=clip_text_layers, heads=clip_text_heads, act=act)
    emb = emb / emb.norm(dim=-1, keepdim=True)
    text_feats = emb[:, None, :]  # (T, 1, E)

    img = images_bhw3.permute(0, 3, 1, 2).float()
    mean = torch.tensor(CLIP_PIXEL_MEAN).view(1, 3, 1, 1)
    std = torch.tensor((68.5005327, 66.6321579, 70.3231630)).view(1, 3, 1, 1)
    clip_in = F.interpolate((img - mean) / std,
                            size=(clip_resolution, clip_resolution),
                            mode="bilinear", align_corners=False)
    feats, taps = clip_visual_dense(clip_sd, clip_in, patch=clip_patch,
                                    layers=clip_layers, heads=clip_heads,
                                    pretrain_grid=clip_pretrain_grid,
                                    taps=guidance_layers, act=act)
    B = feats.shape[0]
    G = clip_resolution // clip_patch
    res3 = feats[:, 1:, :].reshape(B, G, G, -1)
    res4 = taps[0][:, 1:, :].reshape(B, G, G, -1).permute(0, 3, 1, 2)
    res4 = F.conv_transpose2d(res4, sd["upsample1.weight"], sd["upsample1.bias"], stride=2)
    res5 = taps[1][:, 1:, :].reshape(B, G, G, -1).permute(0, 3, 1, 2)
    res5 = F.conv_transpose2d(res5, sd["upsample2.weight"], sd["upsample2.bias"], stride=4)

    tf = text_feats.unsqueeze(0).expand(B, -1, -1, -1)
    logits = aggregator_torch(agg_sd, res3, tf, (res3, res4, res5), heads=heads,
                              window=window, pool=pool, pad_len=pad_len,
                              num_layers=num_layers, attention_type=attention_type)

    x = F.interpolate(logits, size=targets.shape[-2:], mode="bilinear", align_corners=False)
    T = logits.shape[1]
    valid = targets != ignore_value
    onehot = F.one_hot(torch.where(valid, targets, torch.zeros_like(targets)), T)
    onehot = (onehot * valid.unsqueeze(-1)).permute(0, 3, 1, 2).float()
    return F.binary_cross_entropy_with_logits(x, onehot)


# ---------------------------------------------- Ver31 dual-encoder fusion


def _fusion_up_t(sd, p, x, clip_g, dino_g):
    """FusionUP (FusionAggregator.py:757-772): ConvT up then concat BOTH
    guidance pyramids into the DoubleConv."""
    x = F.conv_transpose2d(x, sd[p + ".up.weight"], sd[p + ".up.bias"], stride=2)
    if clip_g is not None:
        T = x.shape[0] // clip_g.shape[0]

        def rep(g):
            return g.unsqueeze(1).expand(-1, T, -1, -1, -1).reshape(-1, *g.shape[1:])

        x = torch.cat([x, rep(clip_g), rep(dino_g)], dim=1)
    return _double_conv_t(sd, p + ".conv", x)


def fusion_ver31_forward_torch(
    sd, images_bhw3, text_feats, *, clip_patch, clip_layers, clip_heads,
    clip_pretrain_grid, dino_patch, dino_layers, dino_heads,
    dino_pretrain_grid, guidance_layers, dino_guidance_blocks, heads, window,
    pad_len, num_layers, clip_resolution=768, dino_resolution=384,
    pool=(1, 1), attention_type="linear", act="quick_gelu",
):
    """ImplicitFusionCATSegVer31 whole-image forward oracle
    (implicit_fusion_Ver31.py:226-330 + FusionAggregatorVer31.py:199-273).

    images: (B, H, W, 3) raw RGB at any size (resized to clip_resolution²);
    text_feats: (T, P, E).  Returns (B, T, 96, 96) logits (with -100 in
    dropped classes when T > pad_len; note the reference's SEPARATE
    classes/classes_dino gathers, FusionAggregatorVer31.py:215-219)."""
    clip_sd = fuse_split_qkv({k[len("sem_seg_head.predictor.clip_model."):]: v
                              for k, v in sd.items()
                              if k.startswith("sem_seg_head.predictor.clip_model.")})
    agg = {k[len("sem_seg_head.predictor.transformer."):]: v for k, v in sd.items()
           if k.startswith("sem_seg_head.predictor.transformer.")}
    dino_sd = {k[len("dino_model."):]: v for k, v in sd.items()
               if k.startswith("dino_model.")}

    img = images_bhw3.permute(0, 3, 1, 2).float()
    mean = torch.tensor(CLIP_PIXEL_MEAN).view(1, 3, 1, 1)
    std = torch.tensor((68.5005327, 66.6321579, 70.3231630)).view(1, 3, 1, 1)
    clip_in = (img - mean) / std
    if clip_in.shape[-2:] != (clip_resolution, clip_resolution):
        clip_in = F.interpolate(clip_in, size=(clip_resolution, clip_resolution),
                                mode="bilinear", align_corners=False)
    # Ver31 sliding branch: DINO input = the CLIP-normalized image resized
    # (implicit_fusion_Ver31.py:260)
    dino_in = F.interpolate(clip_in, size=(dino_resolution, dino_resolution),
                            mode="bilinear", align_corners=False)

    feats, taps = clip_visual_dense(clip_sd, clip_in, patch=clip_patch,
                                    layers=clip_layers, heads=clip_heads,
                                    pretrain_grid=clip_pretrain_grid,
                                    taps=guidance_layers, act=act)
    B = feats.shape[0]
    G = clip_resolution // clip_patch
    res3 = feats[:, 1:, :].reshape(B, G, G, -1).permute(0, 3, 1, 2)
    res4 = taps[0][:, 1:, :].reshape(B, G, G, -1).permute(0, 3, 1, 2)
    res4 = F.conv_transpose2d(res4, sd["upsample1.weight"], sd["upsample1.bias"], stride=2)
    res5 = taps[1][:, 1:, :].reshape(B, G, G, -1).permute(0, 3, 1, 2)
    res5 = F.conv_transpose2d(res5, sd["upsample2.weight"], sd["upsample2.bias"], stride=4)

    dfeat = dino_intermediate_layers(dino_sd, dino_in, patch=dino_patch,
                                     layers=dino_layers, heads=dino_heads,
                                     pretrain_grid=dino_pretrain_grid, n=dino_layers)
    Gd = dino_resolution // dino_patch
    d_last = dfeat[-1][:, 1:, :].reshape(B, Gd, Gd, -1).permute(0, 3, 1, 2)
    dino_down = F.conv2d(d_last, sd["dino_down_sample.weight"],
                         sd["dino_down_sample.bias"], stride=Gd // G)
    dL4 = dfeat[dino_guidance_blocks[0]][:, 1:, :].reshape(B, Gd, Gd, -1).permute(0, 3, 1, 2)
    dL8 = dfeat[dino_guidance_blocks[1]][:, 1:, :].reshape(B, Gd, Gd, -1).permute(0, 3, 1, 2)
    dino_g1 = F.conv2d(dL4, sd["dino_decod_proj1.weight"], sd["dino_decod_proj1.bias"])
    dino_g2 = F.conv_transpose2d(dL8, sd["dino_decod_proj2.weight"],
                                 sd["dino_decod_proj2.bias"], stride=2)

    # --- FusionAggregatorVer31.forward (bpthw corr layout) ---
    tf = text_feats.unsqueeze(0).expand(B, -1, -1, -1)
    T = tf.shape[1]
    imn = F.normalize(res3, dim=1)
    dnn = F.normalize(dino_down, dim=1)
    txn = F.normalize(tf, dim=-1)
    corr = torch.einsum("bchw,btpc->bpthw", imn, txn)
    dino_corr = torch.einsum("bchw,btpc->bpthw", dnn, txn)

    classes = None
    if pad_len > 0 and T > pad_len:
        avg = corr.permute(0, 2, 1, 3, 4).flatten(-3).max(dim=-1)[0]
        avg_d = dino_corr.permute(0, 2, 1, 3, 4).flatten(-3).max(dim=-1)[0]
        classes = avg.topk(pad_len, dim=-1).indices
        classes_dino = avg_d.topk(pad_len, dim=-1).indices
        clip_txt = torch.gather(txn, 1, classes[..., None, None].expand(
            -1, -1, txn.size(-2), txn.size(-1)))
        dino_txt = torch.gather(txn, 1, classes_dino[..., None, None].expand(
            -1, -1, txn.size(-2), txn.size(-1)))
        corr = torch.einsum("bchw,btpc->bpthw", imn, clip_txt)
        dino_corr = torch.einsum("bchw,btpc->bpthw", dnn, dino_txt)
        tf = clip_txt  # text_feats continues as the CLIP-kept subset

    Tc = corr.shape[2]
    H = W = G

    def embed(c, conv):
        c = c.permute(0, 2, 1, 3, 4).reshape(B * Tc, -1, H, W)  # (B T) P H W
        return F.conv2d(c, agg[conv + ".weight"], agg[conv + ".bias"], padding=3)

    clip_embed = torch.sigmoid(embed(corr, "conv1"))
    dino_embed = torch.sigmoid(embed(dino_corr, "conv2"))
    fused = F.conv2d(torch.cat([clip_embed, dino_embed], dim=1),
                     agg["fusion_corr.weight"], agg["fusion_corr.bias"], padding=3)
    fused = torch.sigmoid(fused) + clip_embed  # residual (Ver31:237)
    Ch = fused.shape[1]
    x = fused.reshape(B, Tc, Ch, H, W).permute(0, 1, 3, 4, 2)  # (B,T,H,W,C)

    proj_guid = None
    if "guidance_projection.0.weight" in agg:
        g = F.conv2d(res3, agg["guidance_projection.0.weight"],
                     agg["guidance_projection.0.bias"], padding=1)
        proj_guid = F.relu(g).permute(0, 2, 3, 1)
    clip_dec = [F.relu(F.conv2d(g, agg[f"CLIP_decoder_guidance_projection.{i}.0.weight"],
                                agg[f"CLIP_decoder_guidance_projection.{i}.0.bias"],
                                padding=1))
                for i, g in enumerate((res4, res5))]
    dino_dec = [F.relu(F.conv2d(g, agg[f"DINO_decoder_guidance_projection.{i}.0.weight"],
                                agg[f"DINO_decoder_guidance_projection.{i}.0.bias"],
                                padding=1))
                for i, g in enumerate((dino_g1, dino_g2))]
    text_guid = None
    if "text_guidance_projection.0.weight" in agg:
        t = tf.mean(dim=-2)
        t = t / t.norm(dim=-1, keepdim=True)
        text_guid = F.relu(_l(agg, "text_guidance_projection.0", t))

    for i in range(num_layers):
        BT = B * Tc
        xs = x.reshape(BT, H, W, Ch)
        guid = None
        if proj_guid is not None:
            gn = _ln(agg, f"layers.{i}.swin_block.guidance_norm", proj_guid)
            guid = gn.unsqueeze(1).expand(B, Tc, H, W, -1).reshape(BT, H, W, -1)
        xs = _swin_block_t(agg, f"layers.{i}.swin_block.block_1", xs, guid, heads, window, 0)
        xs = _swin_block_t(agg, f"layers.{i}.swin_block.block_2", xs, guid, heads, window, window // 2)
        x = xs.reshape(B, Tc, H, W, Ch)
        x = _class_layer_t(agg, f"layers.{i}.attention", x, text_guid, heads, pool,
                           pad_len, attention_type)

    xs = x.reshape(B * Tc, H, W, Ch).permute(0, 3, 1, 2)
    xs = _fusion_up_t(agg, "Fusiondecoder1", xs, clip_dec[0], dino_dec[0])
    xs = _fusion_up_t(agg, "Fusiondecoder2", xs, clip_dec[1], dino_dec[1])
    logit = F.conv2d(xs, agg["head.weight"], agg["head.bias"], padding=1)
    Ho, Wo = logit.shape[-2:]
    logit = logit.reshape(B, Tc, Ho, Wo)
    if classes is not None:
        out = torch.full((B, T, Ho, Wo), -100.0)
        out.scatter_(1, classes[..., None, None].expand(-1, -1, Ho, Wo), logit)
        logit = out
    return logit
