"""Single-image latency parallelism: shard the sliding-window tile batch.

The reference's only parallelism is DDP over *images* (plain_train_net.py:
241-260) — one image's latency never improves with more GPUs.  On a TPU
slice the sliding-window forward of ONE image is itself a batch of
``nt + 1`` tiles (4 window tiles + the global view at the eval preset,
cat_seg_model.py:156-176), so placing that tile axis on the mesh's "data"
axis turns spare chips into latency: each device computes its tiles, XLA
all_gathers the tiny (nt+1, 24², T) logit tensor once, and the fold tail
runs replicated.

The tile-batch forward runs inside a `jax.shard_map` manual region: each
device executes the unchanged single-chip model (fused Pallas kernels
included) on its tile slice, so tile parallelism is pure speedup with no
per-tile kernel regression.

This is a TPU-native extra with no reference equivalent (DDP cannot split
one image); it serves the demo/video path where per-frame latency, not
throughput, is the product metric.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs import CATSegConfig
from ..ops import fold_divisor, fold_tiles, resize_bilinear, unfold_tiles


def make_tile_sharded_probs(cfg: CATSegConfig, mesh):
    """Build a jitted ``fn(params, canvas, hw, text_feats) -> (out, out, T)``
    fp32 sigmoid probabilities with the tile-batch model forward sharded
    over ``mesh`` axis "data".

    canvas: (Hc, Wc, 3) zero-padded raw RGB (uint8 preferred), hw: (2,)
    int32 true size — same contract as
    ``infer.pipeline.sliding_window_probs_from_canvas``, and bit-compatible
    with it up to the partitioner's reduction order.  The (nt + 1) tile
    axis is zero-padded up to a multiple of the data-axis size (the pad
    tiles compute on black images and are dropped before the fold).
    """
    from ..infer.pipeline import _model_forward, canvas_to_sliding_inputs
    from .mesh import local_region

    n_data = mesh.shape["data"]
    rep = NamedSharding(mesh, P())

    def local_fwd(params, batch, text_feats):
        # per-device body = unchanged single-chip forward on the local tiles
        with local_region():
            return _model_forward(params, batch, text_feats, cfg)

    sharded_fwd = jax.shard_map(
        local_fwd, mesh=mesh, in_specs=(P(), P("data"), P()),
        out_specs=P("data"), check_vma=False)

    @functools.partial(jax.jit, in_shardings=(rep, rep, rep, rep), out_shardings=rep)
    def fn(params, canvas, hw, text_feats):  # cfg, mesh closed over
        out, k, s = cfg.sw_out_res, cfg.sw_kernel, cfg.sw_stride
        img640, imgk = canvas_to_sliding_inputs(canvas, hw, cfg)

        tiles = unfold_tiles(img640[None], k, s)  # (nt, k, k, 3)
        batch = jnp.concatenate([tiles, imgk[None]], axis=0)
        nt1 = batch.shape[0]
        pad_to = -(-nt1 // n_data) * n_data
        if pad_to != nt1:
            batch = jnp.pad(batch, ((0, pad_to - nt1), (0, 0), (0, 0), (0, 0)))

        logits = sharded_fwd(params, batch, text_feats)
        # (pad_to, T, h, w) -> gather the real tiles once, replicated:
        # tiny next to the forward (nt+1 * h*w * T activations)
        logits = jax.lax.with_sharding_constraint(logits, rep)
        logits = logits[:nt1].transpose(0, 2, 3, 1)

        lg = resize_bilinear(logits, (k, k))
        probs = jax.nn.sigmoid(lg.astype(jnp.float32))
        folded = fold_tiles(probs[: nt1 - 1], (out, out), k, s)[0]
        folded = folded / jnp.asarray(fold_divisor((out, out), k, s))
        global_up = resize_bilinear(probs[nt1 - 1 :], (out, out))[0]
        return (folded + global_up) / 2.0

    return fn
