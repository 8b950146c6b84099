"""Interactive SAM predictor: encode an image once, decode many prompts.

TPU-native equivalent of the reference's vendored SamPredictor
(cat_seg/segment_anything/predictor.py:17-269): `set_image` resizes the
longest side to the variant's input size (ResizeLongestSide semantics,
segment_anything/utils/transforms.py), SAM-normalizes, pads bottom/right to
a square canvas and runs the jitted image encoder; `predict` embeds point /
box / mask prompts, runs the two-way mask decoder, strips the pad region and
upscales masks back to the original image size (predictor.py:226-247 /
modeling/sam.py postprocess_masks).

The encode and decode stages are separate jitted programs so N prompt
queries against one image pay for one ViT pass — same economics as the
reference's embedding cache.  Prompt semantics match the reference exactly
(a single not-a-point pad slot is appended only when no box is given,
prompt_encoder.py:83-87); the decode program shape-specializes on the point
count, so repeated queries with the same number of clicks reuse the cache.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import PIXEL_MEAN, PIXEL_STD
from ..core import sam as jsam
from ..core.sam_decoder import (
    dense_pe,
    embed_boxes,
    embed_masks,
    embed_points,
    mask_decoder,
    no_mask_embed,
)
from ..ops.resize import resize_bilinear


def resize_longest_side(h: int, w: int, long: int) -> tuple[int, int]:
    """ResizeLongestSide.get_preprocess_shape: int(scale * dim + 0.5)."""
    scale = long / max(h, w)
    return int(scale * h + 0.5), int(scale * w + 0.5)


@functools.partial(jax.jit, static_argnames=("variant",))
def _encode(params, canvas, variant):
    return jsam.encode_image(params, canvas, variant)


@functools.partial(jax.jit, static_argnames=("img_size", "multimask", "use_box", "use_mask"))
def _decode(pe, dec, feat, points, labels, boxes, mask_input,
            img_size: int, multimask: bool, use_box: bool, use_mask: bool):
    """One prompt query against cached features.

    points: (1, N, 2) px in model space with pad slots labelled -1;
    boxes: (1, 4) xyxy; mask_input: (1, 4h, 4w) logits.
    """
    gh, gw = feat.shape[1:3]
    input_size = (img_size, img_size)
    sparse = embed_points(pe, points, labels, input_size)  # (1, N, C)
    if use_box:
        sparse = jnp.concatenate([sparse, embed_boxes(pe, boxes, input_size)], axis=1)
    if use_mask:
        dense = embed_masks(pe, mask_input[..., None])
    else:
        dense = jnp.broadcast_to(no_mask_embed(pe, (gh, gw)), (1, gh, gw, sparse.shape[-1]))
    masks, iou = mask_decoder(dec, feat, dense_pe(pe["gauss"], (gh, gw)), sparse, dense,
                              multimask_output=multimask)
    return masks, iou


class SamPredictor:
    """predictor.py-compatible API: set_image() once, predict() per prompt."""

    def __init__(self, sam_params: dict, pe: dict, dec: dict,
                 variant: jsam.SAMVariant = jsam.SAM_VITB):
        self.sam_params = sam_params
        self.pe = pe
        self.dec = dec
        self.variant = variant
        self.reset_image()

    def reset_image(self) -> None:
        self.features = None
        self.original_size = None
        self.input_size = None

    def set_image(self, image: np.ndarray) -> None:
        """image: (H, W, 3) uint8 RGB.

        The longest-side resize runs on host through PIL: the reference's
        ResizeLongestSide.apply_image is torchvision resize on a PIL image
        (utils/transforms.py:30-34), i.e. ANTIALIASED bilinear — an
        F.interpolate-style resize diverges on downscale (the transform
        module's own comment warns apply_image_torch 'may not exactly
        match apply_image')."""
        from PIL import Image

        h, w = image.shape[:2]
        nh, nw = resize_longest_side(h, w, self.variant.img_size)
        pil = Image.fromarray(np.asarray(image, np.uint8))
        resized = np.asarray(pil.resize((nw, nh), Image.BILINEAR), np.float32)
        x = jnp.asarray(resized)[None]
        x = (x - jnp.asarray(PIXEL_MEAN)) / jnp.asarray(PIXEL_STD)
        canvas = jnp.zeros((1, self.variant.img_size, self.variant.img_size, 3), jnp.float32)
        canvas = canvas.at[:, :nh, :nw].set(x)
        self.features = _encode(self.sam_params, canvas, self.variant)
        self.original_size = (h, w)
        self.input_size = (nh, nw)

    def get_image_embedding(self) -> jnp.ndarray:
        assert self.features is not None, "set_image() first"
        return self.features

    def _to_model_coords(self, coords: np.ndarray) -> np.ndarray:
        oh, ow = self.original_size
        nh, nw = self.input_size
        out = np.asarray(coords, np.float32).copy()
        out[..., 0] *= nw / ow
        out[..., 1] *= nh / oh
        return out

    def predict(
        self,
        point_coords: np.ndarray | None = None,
        point_labels: np.ndarray | None = None,
        box: np.ndarray | None = None,
        mask_input: np.ndarray | None = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Prompt coords in ORIGINAL image px (predictor.py:104-168).

        Returns (masks (N, H, W), iou_predictions (N,), low_res_logits
        (N, h4, w4)); masks bool unless return_logits.
        """
        assert self.features is not None, "set_image() first"
        if point_coords is not None:
            p = self._to_model_coords(np.atleast_2d(point_coords))
            lbls = np.asarray(point_labels, np.int32).reshape(-1)
        else:
            p = np.zeros((0, 2), np.float32)
            lbls = np.zeros((0,), np.int32)
        # pad with one not-a-point slot iff no box (prompt_encoder.py:83-87)
        if box is None:
            p = np.concatenate([p, np.zeros((1, 2), np.float32)], axis=0)
            lbls = np.concatenate([lbls, np.asarray([-1], np.int32)])
        boxes = np.zeros((1, 4), np.float32)
        if box is not None:
            boxes[0] = self._to_model_coords(np.asarray(box, np.float32).reshape(2, 2)).reshape(4)
        grid4 = 4 * self.variant.grid  # low-res mask side (256 for 1024 input)
        mi = np.zeros((1, grid4, grid4), np.float32)
        if mask_input is not None:
            mi[0] = np.asarray(mask_input, np.float32).reshape(grid4, grid4)

        low_res, iou = _decode(
            self.pe, self.dec, self.features,
            jnp.asarray(p[None]), jnp.asarray(lbls[None]), jnp.asarray(boxes), jnp.asarray(mi),
            img_size=self.variant.img_size, multimask=multimask_output,
            use_box=box is not None, use_mask=mask_input is not None,
        )
        masks = self._postprocess(low_res[0])
        iou = np.asarray(iou[0])
        if not return_logits:
            masks = masks > 0.0
        return masks, iou, np.asarray(low_res[0])

    def _postprocess(self, low_res: jnp.ndarray) -> np.ndarray:
        """(N, h4, w4) logits -> (N, H, W) at original size (sam.py
        postprocess_masks: upscale to img_size, crop pad, upscale to orig)."""
        x = resize_bilinear(low_res[..., None].astype(jnp.float32),
                            (self.variant.img_size, self.variant.img_size))
        nh, nw = self.input_size
        x = x[:, :nh, :nw]
        x = resize_bilinear(x, self.original_size)[..., 0]
        return np.asarray(x)
