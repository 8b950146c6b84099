"""Inference pipelines: whole-image and sliding-window, static shapes end-to-end.

Reproduces the reference inference contract (cat_seg/cat_seg_model.py:147-229):

sliding window (the eval.sh path, lines 156-218):
  resize to 640x640 -> unfold into 4 tiles (k=384, s=256) + 1 global 384 tile
  -> batch of 5 through the model -> per-tile logits upsampled to 384 ->
  sigmoid -> fold with overlap-count normalization -> average with the
  upsampled global tile -> resize to the original image size -> argmax.

TPU re-design: every device computation is compiled once per (benchmark, T):
- tiling/folding are static reshapes + adds (catseg_tpu.ops.unfold);
- the *final* resize to the original (H, W) — which varies per image — runs
  on device against a static padded canvas (Hmax, Wmax), taking the exact
  torch-bilinear interpolation weights as runtime inputs, with a lax.scan
  over class chunks feeding a running argmax.  No per-image recompiles, no
  giant host transfers: only the (Hmax, Wmax) argmax map leaves the device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import CATSegConfig
from ..core import catseg
from ..ops import resize_bilinear, unfold_tiles, fold_tiles, fold_divisor
from ..ops.resize import _linear_weights
from ..text.embed import forward_text_embeds


@functools.partial(jax.jit, static_argnames=("cfg",))
def _model_forward(params: dict, images: jnp.ndarray, text_feats: jnp.ndarray, cfg: CATSegConfig) -> jnp.ndarray:
    """Meta-architecture dispatch: plain CATSeg or the dual-encoder family."""
    if cfg.fusion is not None:
        from ..core.fusion import fusion_forward

        return fusion_forward(params, images, text_feats, cfg)
    return catseg.forward(params, images, text_feats, cfg)


def sliding_window_probs(
    params: dict,
    image640: jnp.ndarray,
    image_global: jnp.ndarray,
    text_feats: jnp.ndarray,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """(640,640,3) + (384,384,3) raw RGB -> (640,640,T) sigmoid probabilities."""
    return sliding_window_probs_batch(
        params, image640[None], image_global[None], text_feats, cfg)[0]


def sliding_window_probs_batch(
    params: dict,
    image640s: jnp.ndarray,
    image_globals: jnp.ndarray,
    text_feats: jnp.ndarray,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """Batched sliding window: (n,640,640,3) + (n,384,384,3) raw RGB ->
    (n,640,640,T) sigmoid probabilities.  Per-image results are identical to
    the n=1 path (the batch axis is independent); batching n images amortizes
    per-dispatch/tunnel overhead across one 5n-tile model forward."""
    k, s, out = cfg.sw_kernel, cfg.sw_stride, cfg.sw_out_res
    n = image640s.shape[0]
    nt = ((out - k) // s + 1) ** 2  # tiles per image (4 at the eval preset)
    tiles = unfold_tiles(image640s, k, s)  # (nt*n, 384, 384, 3), tile-major
    batch = jnp.concatenate([tiles, image_globals], axis=0)  # ((nt+1)*n, ...)
    logits = _model_forward(params, batch, text_feats, cfg)
    logits = logits.transpose(0, 2, 3, 1)  # ((nt+1)*n, 96, 96, T)

    # Probability carrier dtype: bf16 when the model computes in bf16 (the
    # tail + resize-argmax move ~1 GB of probabilities per 2-image dispatch
    # at T=150 and sit at ~50% of the HBM roofline in fp32 — halving the
    # bytes is worth the ~0.2% probability rounding, which is below the
    # bf16 model's own numeric noise).  fp32 compute keeps the exact-parity
    # fp32 tail (oracle tests unchanged); sigmoid and the torch-exact
    # bilinear coordinate math stay fp32 in both.
    pdt = jnp.dtype(cfg.compute_dtype)
    fast = pdt == jnp.bfloat16
    div = jnp.asarray(fold_divisor((out, out), k, s))
    if fast:
        div = div.astype(pdt)

    def tail(per_image):
        """(nt+1, 96, 96, T) -> (out, out, T); == the n=1 composition."""
        lg = resize_bilinear(per_image.astype(pdt) if fast else per_image, (k, k))
        probs = jax.nn.sigmoid(lg.astype(jnp.float32))
        if fast:
            probs = probs.astype(pdt)
        folded = fold_tiles(probs[:nt], (out, out), k, s)[0]
        folded = folded / div
        global_up = resize_bilinear(probs[nt:], (out, out))[0]
        return (folded + global_up) / 2.0

    # regroup tile-major -> per-image stacks; the 96 -> k upsample tail costs
    # (nt+1)*k*k*T floats per image, so at large T it runs as a sequential
    # lax.map to keep peak HBM at the single-image level
    per_image = jnp.concatenate(
        [logits[: nt * n].reshape(nt, n, *logits.shape[1:]).transpose(1, 0, 2, 3, 4),
         logits[nt * n :][:, None]], axis=1)  # (n, nt+1, 96, 96, T)
    if n == 1:
        return tail(per_image[0])[None]
    return jax.lax.map(tail, per_image)


@functools.partial(jax.jit, static_argnames=("cfg",))
def sliding_window_probs_from_canvas(
    params: dict,
    image_canvas: jnp.ndarray,
    hw: jnp.ndarray,
    text_feats: jnp.ndarray,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """Same as sliding_window_probs but the input resizes happen on device.

    image_canvas: (Hc, Wc, 3) raw RGB (uint8 preferred — 4x cheaper over the
    tunnel) zero-padded to a static canvas; hw: (2,) int32 true image size.
    The exact torch-bilinear interpolation weights are built *in-graph* from
    the runtime size (ops.resize.bilinear_row_weights_dynamic), so the only
    per-image host traffic is the image bytes themselves.
    """
    img640, imgk = canvas_to_sliding_inputs(image_canvas, hw, cfg)
    return sliding_window_probs(params, img640, imgk, text_feats, cfg)


def canvas_to_sliding_inputs(canvas: jnp.ndarray, hw: jnp.ndarray, cfg: CATSegConfig):
    """Zero-padded raw canvas -> (sw_out_res², sw_kernel²) sliding input pair.

    The torch-exact bilinear weights are built in-graph from the runtime true
    size ``hw`` (ops.resize.bilinear_row_weights_dynamic).  Single source of
    the canvas coordinate math for the single/batched/tile-sharded pipelines
    — any fix to the resize semantics lands in all three at once."""
    from ..ops.resize import bilinear_row_weights_dynamic

    Hc, Wc = canvas.shape[:2]
    img = canvas.astype(jnp.float32)
    out, k = cfg.sw_out_res, cfg.sw_kernel
    wh640 = bilinear_row_weights_dynamic(out, hw[0], Hc)
    ww640 = bilinear_row_weights_dynamic(out, hw[1], Wc)
    whk = bilinear_row_weights_dynamic(k, hw[0], Hc)
    wwk = bilinear_row_weights_dynamic(k, hw[1], Wc)
    img640 = jnp.einsum("hwc,Hh->Hwc", img, wh640)
    img640 = jnp.einsum("Hwc,Ww->HWc", img640, ww640)
    imgk = jnp.einsum("hwc,Hh->Hwc", img, whk)
    imgk = jnp.einsum("Hwc,Ww->HWc", imgk, wwk)
    return img640, imgk


@functools.partial(jax.jit, static_argnames=("cfg",))
def sliding_window_probs_from_canvas_batch(
    params: dict,
    image_canvases: jnp.ndarray,
    hws: jnp.ndarray,
    text_feats: jnp.ndarray,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """Batched :func:`sliding_window_probs_from_canvas`: (n, Hc, Wc, 3)
    canvases + (n, 2) true sizes -> (n, 640, 640, T) probabilities.  The
    per-image on-device resizes vmap over the batch; one model forward
    covers all 5n tiles."""
    img640s, imgks = jax.vmap(lambda c, hw: canvas_to_sliding_inputs(c, hw, cfg))(
        image_canvases, hws)
    return sliding_window_probs_batch(params, img640s, imgks, text_feats, cfg)


@functools.partial(jax.jit, static_argnames=("canvas", "chunk"))
def resize_argmax_dynamic_batch(
    probs: jnp.ndarray,
    out_hws: jnp.ndarray,
    canvas: tuple[int, int],
    chunk: int = 32,
) -> jnp.ndarray:
    """vmapped :func:`resize_argmax_dynamic`: (n, h, w, T) probs + (n, 2)
    true sizes -> (n, Hmax, Wmax) argmax maps in ONE dispatch."""
    return jax.vmap(lambda p, o: resize_argmax_dynamic(p, o, canvas, chunk))(probs, out_hws)


@functools.partial(jax.jit, static_argnames=("cfg", "canvas", "chunk"))
def sliding_window_preds_from_canvas_batch(
    params: dict,
    image_canvases: jnp.ndarray,
    hws: jnp.ndarray,
    out_hws: jnp.ndarray,
    text_feats: jnp.ndarray,
    cfg: CATSegConfig,
    canvas: tuple[int, int],
    chunk: int = 32,
) -> jnp.ndarray:
    """Canvas batch -> (n, Hmax, Wmax) argmax maps in ONE dispatch.

    The throughput eval path: model forward + probability tail + dynamic
    resize-argmax fuse into a single executable, so per-image probabilities
    never leave the chip and the tunneled runtime pays one dispatch per
    batch instead of two.  The final resize-argmax consumes the probs
    class-major (classes on the einsum batch axis — measured ~1 ms/img
    cheaper than the row-major form at T=150 on a v5e).  Results are
    identical to sliding_window_probs_from_canvas_batch +
    resize_argmax_dynamic_batch (equality tested in
    tests/test_preds_path.py).

    (A fused Pallas kernel for the tail was built and measured: ~64 ms/img
    vs ~8 ms for this XLA composition at T=150 — the tail is matmul-bound
    and XLA's own fusion already wins, so it was dropped.)"""
    img640s, imgks = jax.vmap(lambda c, hw: canvas_to_sliding_inputs(c, hw, cfg))(
        image_canvases, hws)
    probs = sliding_window_probs_batch(params, img640s, imgks, text_feats, cfg)
    probs_cm = probs.transpose(0, 3, 1, 2)
    return jax.vmap(
        lambda p, o: _resize_argmax_dynamic_cm(p, o, canvas, chunk))(probs_cm, out_hws)


def _resize_argmax_dynamic_cm(probs_cm, out_hw, canvas, chunk):
    """Class-major resize_argmax_dynamic: probs (T, h, w) + (2,) true size."""
    from ..ops.resize import bilinear_row_weights_dynamic_out

    h, w = probs_cm.shape[1:]
    wh = bilinear_row_weights_dynamic_out(canvas[0], out_hw[0], h)
    ww = bilinear_row_weights_dynamic_out(canvas[1], out_hw[1], w)
    if probs_cm.dtype == jnp.bfloat16:
        # keep the resize einsums on the bf16 MXU path (a bf16 x f32 dot
        # would silently promote to an fp32 matmul at a quarter rate); the
        # argmax compares run on the fp32 accumulations either way
        wh = wh.astype(jnp.bfloat16)
        ww = ww.astype(jnp.bfloat16)
    T = probs_cm.shape[0]
    Tp = -(-T // chunk) * chunk
    if Tp != T:
        probs_cm = jnp.concatenate(
            [probs_cm, jnp.full((Tp - T, h, w), -1.0, probs_cm.dtype)], axis=0)
    chunks = probs_cm.reshape(Tp // chunk, chunk, h, w)
    Hm, Wm = wh.shape[0], ww.shape[0]

    # bf16 probs keep a bf16 intermediate between the two resize einsums
    # (halves the (chunk, Hm, w) traffic); the final accumulation and the
    # argmax compares are fp32 in both modes
    mid_dt = probs_cm.dtype if probs_cm.dtype == jnp.bfloat16 else jnp.float32

    def body(carry, ch):
        best, best_idx, base = carry
        r = jnp.einsum("thw,Hh->tHw", ch, wh, preferred_element_type=mid_dt)
        r = jnp.einsum("tHw,Ww->tHW", r, ww, preferred_element_type=jnp.float32)
        cmax = jnp.max(r, axis=0)
        cidx = jnp.argmax(r, axis=0).astype(jnp.int32) + base
        take = cmax > best
        return (jnp.where(take, cmax, best), jnp.where(take, cidx, best_idx), base + chunk), None

    init = (jnp.full((Hm, Wm), -jnp.inf, jnp.float32),
            jnp.zeros((Hm, Wm), jnp.int32), jnp.int32(0))
    (_, pred, _), _ = jax.lax.scan(body, init, chunks)
    return pred


@functools.partial(jax.jit, static_argnames=("cfg",))
def whole_image_probs_from_canvas(
    params: dict,
    image_canvas: jnp.ndarray,
    hw: jnp.ndarray,
    text_feats: jnp.ndarray,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """Whole-image branch (cat_seg_model.py:147-155,220-229) with static shapes.

    The reference pads the *normalized* image to size-divisibility 384 with
    zeros (ImageList) and resizes the whole padded tensor to clip_resolution;
    here the canvas is zero-padded raw RGB, so after normalization the pad
    region is re-zeroed, and the resize maps the true padded extent
    (ceil(hw/384)*384) via runtime weights.  Returns (96, 96, T) sigmoid probs.
    """
    from ..ops.resize import bilinear_row_weights_dynamic

    Hc, Wc = image_canvas.shape[:2]
    img = normalize_clip_padded(image_canvas, hw)
    div = cfg.crop_size  # SIZE_DIVISIBILITY 384
    ph = ((hw[0] + div - 1) // div) * div
    pw = ((hw[1] + div - 1) // div) * div
    # the non-sliding fusion branch resizes the padded tensor to the fusion
    # CLIP resolution (768) directly, and to the DINO resolution independently
    # (implicit_fusion_Ver31.py:239-240) — no intermediate 384 bottleneck
    R = cfg.clip_resolution if cfg.fusion is None else cfg.fusion.clip_resolution
    whr = bilinear_row_weights_dynamic(R, ph, Hc)
    wwr = bilinear_row_weights_dynamic(R, pw, Wc)
    imgR = jnp.einsum("hwc,Hh->Hwc", img, whr)
    imgR = jnp.einsum("Hwc,Ww->HWc", imgR, wwr)
    if cfg.fusion is not None:
        from ..core.fusion import fusion_forward

        Rd = cfg.fusion.encoder_resolution
        whd = bilinear_row_weights_dynamic(Rd, ph, Hc)
        wwd = bilinear_row_weights_dynamic(Rd, pw, Wc)
        second = jnp.einsum("hwc,Hh->Hwc", img, whd)
        second = jnp.einsum("Hwc,Ww->HWc", second, wwd)
        logits = fusion_forward(params, imgR[None], text_feats, cfg, normalized=True,
                                second_images=second[None])[0]
        return jax.nn.sigmoid(logits.astype(jnp.float32)).transpose(1, 2, 0)
    img = imgR
    from ..core.catseg import clip_guidance_features
    from ..core.aggregator import aggregator_forward

    img_feats, guidance = clip_guidance_features(params, img[None], cfg)
    tf = text_feats[None] if text_feats.ndim == 3 else text_feats
    dtype = jnp.dtype(cfg.compute_dtype)
    logits = aggregator_forward(params["agg"], img_feats, tf.astype(dtype), guidance, cfg)[0]
    return jax.nn.sigmoid(logits.astype(jnp.float32)).transpose(1, 2, 0)


def normalize_clip_padded(image_canvas: jnp.ndarray, hw: jnp.ndarray) -> jnp.ndarray:
    """CLIP-normalize and zero everything beyond the true (h, w) extent."""
    from ..core.catseg import normalize_clip

    Hc, Wc = image_canvas.shape[:2]
    img = normalize_clip(image_canvas.astype(jnp.float32))
    rows = jnp.arange(Hc)[:, None] < hw[0]
    cols = jnp.arange(Wc)[None, :] < hw[1]
    return img * (rows & cols)[..., None]


@functools.partial(jax.jit, static_argnames=("cfg",))
def whole_image_probs(
    params: dict,
    image: jnp.ndarray,
    text_feats: jnp.ndarray,
    cfg: CATSegConfig,
) -> jnp.ndarray:
    """(H, W, 3) raw RGB (H, W static) -> (96, 96, T) sigmoid probabilities
    (whole-image branch, cat_seg_model.py:147-155,220-229)."""
    logits = _model_forward(params, image[None], text_feats, cfg)[0]
    return jax.nn.sigmoid(logits.astype(jnp.float32)).transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=("canvas", "chunk"))
def resize_argmax_dynamic(
    probs: jnp.ndarray,
    out_hw: jnp.ndarray,
    canvas: tuple[int, int],
    chunk: int = 32,
) -> jnp.ndarray:
    """resize_argmax with the true output size as a runtime (2,) int32 input;
    interpolation weights are built in-graph (zero per-image host traffic)."""
    from ..ops.resize import bilinear_row_weights_dynamic_out

    h, w = probs.shape[:2]
    wh = bilinear_row_weights_dynamic_out(canvas[0], out_hw[0], h)
    ww = bilinear_row_weights_dynamic_out(canvas[1], out_hw[1], w)
    return resize_argmax(probs, wh, ww, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("chunk",))
def resize_argmax(
    probs: jnp.ndarray,
    wh: jnp.ndarray,
    ww: jnp.ndarray,
    chunk: int = 32,
) -> jnp.ndarray:
    """Bilinear-resize (h, w, T) probs to a padded canvas and argmax over T.

    wh: (Hmax, h), ww: (Wmax, w) torch-exact interpolation weights (zero rows
    beyond the true output size).  Scans class chunks to bound memory.
    """
    h, w, T = probs.shape
    Tp = -(-T // chunk) * chunk
    if Tp != T:
        probs = jnp.concatenate([probs, jnp.full((h, w, Tp - T), -1.0, probs.dtype)], axis=-1)
    chunks = probs.reshape(h, w, Tp // chunk, chunk).transpose(2, 0, 1, 3)

    Hm, Wm = wh.shape[0], ww.shape[0]
    # mirror _resize_argmax_dynamic_cm's bf16 handling (bf16 probs: bf16
    # weights + bf16 mid so the dots stay on the full-rate MXU path)
    if probs.dtype == jnp.bfloat16:
        wh = wh.astype(jnp.bfloat16)
        ww = ww.astype(jnp.bfloat16)
    mid_dt = probs.dtype if probs.dtype == jnp.bfloat16 else jnp.float32

    def body(carry, ch):
        best, best_idx, base = carry
        r = jnp.einsum("hwt,Hh->Hwt", ch, wh, preferred_element_type=mid_dt)
        r = jnp.einsum("Hwt,Ww->HWt", r, ww, preferred_element_type=jnp.float32)
        cmax = jnp.max(r, axis=-1)
        cidx = jnp.argmax(r, axis=-1).astype(jnp.int32) + base
        take = cmax > best
        return (jnp.where(take, cmax, best), jnp.where(take, cidx, best_idx), base + chunk), None

    init = (jnp.full((Hm, Wm), -jnp.inf, jnp.float32), jnp.zeros((Hm, Wm), jnp.int32), jnp.int32(0))
    (_, pred, _), _ = jax.lax.scan(body, init, chunks)
    return pred


def resize_weights(in_size: int, out_size: int, canvas: int, in_pad: int | None = None) -> np.ndarray:
    """(canvas, in_pad or in_size) torch-bilinear weights; rows beyond
    out_size and columns beyond in_size are zero."""
    w = np.zeros((canvas, in_pad or in_size), dtype=np.float32)
    w[:out_size, :in_size] = _linear_weights(in_size, out_size, align_corners=False)
    return w


def host_resize_bilinear(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """torch-exact bilinear resize on host numpy (HWC float image)."""
    h, w = img.shape[:2]
    wh = _linear_weights(h, out_hw[0], False).astype(np.float32)
    ww = _linear_weights(w, out_hw[1], False).astype(np.float32)
    out = np.einsum("hwc,Hh->Hwc", img.astype(np.float32), wh)
    return np.einsum("Hwc,Ww->HWc", out, ww)


class Predictor:
    """predict(image) -> {"sem_seg": (T, H, W) probs} | argmax map.

    The functional mirror of the reference's CATSeg inference API
    (cat_seg_model.py:115-229 returns [{"sem_seg": KxHxW}]).
    """

    def __init__(
        self,
        params: dict,
        cfg: CATSegConfig,
        class_names: list[str],
        text_feats: np.ndarray | None = None,
        input_canvas: tuple[int, int] | None = None,
        mesh=None,
    ):
        self.params = params
        self.cfg = cfg
        self.class_names = list(class_names)
        self.input_canvas = input_canvas  # fix one (Hc, Wc) to compile once per dataset
        # optional device mesh: single-image sliding inference shards the
        # tile batch over the mesh "data" axis (parallel/latency.py) —
        # per-frame latency scales with devices instead of only throughput
        self.mesh = mesh if (mesh is not None and mesh.shape.get("data", 1) > 1) else None
        self._tile_sharded = None
        if text_feats is None:
            text_feats = forward_text_embeds(
                params["clip"], self.class_names, cfg.prompt_ensemble_type, cfg.clip,
                compute_dtype=jnp.dtype(cfg.compute_dtype),
            )
        self.text_feats = jnp.asarray(text_feats)

    def probs_sliding(self, image: np.ndarray) -> jnp.ndarray:
        """image: (H, W, 3) RGB uint8/float at any size -> (640, 640, T) probs.

        The input is zero-padded to a 256-bucketed canvas and resized on
        device (exact torch bilinear via runtime weight matrices), so the
        host does no per-pixel math and jit compiles once per bucket."""
        cfg = self.cfg
        h, w = image.shape[:2]
        if self.input_canvas is not None:
            Hc, Wc = self.input_canvas
        else:
            Hc = -(-h // 256) * 256
            Wc = -(-w // 256) * 256
        dtype = np.uint8 if image.dtype == np.uint8 else np.float32
        canvas = np.zeros((Hc, Wc, 3), dtype=dtype)
        canvas[:h, :w] = image
        if self.mesh is not None:
            if self._tile_sharded is None:
                from ..parallel.latency import make_tile_sharded_probs

                self._tile_sharded = make_tile_sharded_probs(cfg, self.mesh)
            return self._tile_sharded(
                self.params, jnp.asarray(canvas), jnp.asarray([h, w], np.int32),
                self.text_feats)
        return sliding_window_probs_from_canvas(
            self.params, jnp.asarray(canvas), jnp.asarray([h, w], np.int32),
            self.text_feats, cfg,
        )

    def probs_sliding_batch(self, images: list[np.ndarray]) -> jnp.ndarray:
        """n images -> (n, 640, 640, T) probs through ONE model dispatch.

        Per-image results are identical to probs_sliding (independent batch
        axis); batching amortizes dispatch/tunnel overhead and fills the MXU
        with a 5n-tile forward.  Requires input_canvas (all images share one
        static canvas so the batch compiles once)."""
        cfg = self.cfg
        if self.input_canvas is None:
            raise ValueError("probs_sliding_batch requires a fixed input_canvas")
        Hc, Wc = self.input_canvas
        dtype = np.uint8 if all(im.dtype == np.uint8 for im in images) else np.float32
        canvases = np.zeros((len(images), Hc, Wc, 3), dtype=dtype)
        hws = np.zeros((len(images), 2), dtype=np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            canvases[i, :h, :w] = im
            hws[i] = (h, w)
        return sliding_window_probs_from_canvas_batch(
            self.params, jnp.asarray(canvases), jnp.asarray(hws), self.text_feats, cfg
        )

    def preds_sliding_batch(self, images: list[np.ndarray], out_hws: np.ndarray,
                            out_canvas: tuple[int, int], chunk: int = 32) -> jnp.ndarray:
        """n images -> (n, Hmax, Wmax) argmax maps at the per-image true sizes
        (out_hws, (n, 2) int32) in one dispatch — the fused eval path: forward,
        probability tail, and class-major resize-argmax in one executable, so
        per-image probabilities never leave the chip.  Identical results to
        probs_sliding_batch + resize_argmax_dynamic_batch."""
        cfg = self.cfg
        if self.input_canvas is None:
            raise ValueError("preds_sliding_batch requires a fixed input_canvas")
        Hc, Wc = self.input_canvas
        dtype = np.uint8 if all(im.dtype == np.uint8 for im in images) else np.float32
        canvases = np.zeros((len(images), Hc, Wc, 3), dtype=dtype)
        hws = np.zeros((len(images), 2), dtype=np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            canvases[i, :h, :w] = im
            hws[i] = (h, w)
        return sliding_window_preds_from_canvas_batch(
            self.params, jnp.asarray(canvases), jnp.asarray(hws),
            jnp.asarray(np.asarray(out_hws, np.int32)), self.text_feats, cfg,
            out_canvas, chunk)

    def probs_whole(self, image: np.ndarray) -> jnp.ndarray:
        """Whole-image (non-sliding) branch -> (96, 96, T) probs."""
        cfg = self.cfg
        h, w = image.shape[:2]
        div = cfg.crop_size
        if self.input_canvas is not None:
            Hc, Wc = self.input_canvas
        else:
            Hc = -(-h // div) * div
            Wc = -(-w // div) * div
        dtype = np.uint8 if image.dtype == np.uint8 else np.float32
        canvas = np.zeros((Hc, Wc, 3), dtype=dtype)
        canvas[:h, :w] = image
        return whole_image_probs_from_canvas(
            self.params, jnp.asarray(canvas), jnp.asarray([h, w], np.int32), self.text_feats, cfg
        )

    def probs(self, image: np.ndarray) -> jnp.ndarray:
        return self.probs_sliding(image) if self.cfg.sliding_window else self.probs_whole(image)

    def predict(self, image: np.ndarray, out_hw: tuple[int, int] | None = None) -> dict:
        """Full-resolution class probabilities for one image (demo path).
        The inference branch follows cfg.sliding_window, like the reference
        meta-arch (cat_seg_model.py:147-176)."""
        H, W = out_hw or image.shape[:2]
        probs = self.probs(image)
        h, w = probs.shape[:2]
        wh = jnp.asarray(_linear_weights(h, H, False).astype(np.float32))
        ww = jnp.asarray(_linear_weights(w, W, False).astype(np.float32))
        up = jnp.einsum("hwt,Hh->Hwt", probs, wh)
        up = jnp.einsum("Hwt,Ww->HWt", up, ww)
        sem_seg = np.asarray(up).transpose(2, 0, 1)
        return {"sem_seg": sem_seg}

    def predict_argmax(self, image: np.ndarray, out_hw: tuple[int, int] | None = None,
                       canvas: tuple[int, int] | None = None) -> np.ndarray:
        """Argmax map at the original size via the static-canvas device path."""
        H, W = out_hw or image.shape[:2]
        cH, cW = canvas or (H, W)
        probs = self.probs(image)
        pred = resize_argmax_dynamic(probs, jnp.asarray([H, W], np.int32), (cH, cW))
        return np.asarray(pred)[:H, :W]
