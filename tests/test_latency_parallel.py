"""Tile-sharded single-image inference (parallel/latency.py): the sliding
forward sharded over the mesh "data" axis must match the single-device
pipeline (the tile batch axis is independent, so sharding it cannot change
the math — only the partitioner's reduction order)."""

import numpy as np

import jax
import jax.numpy as jnp

from catseg_tpu.infer.pipeline import Predictor, sliding_window_probs_from_canvas
from catseg_tpu.parallel.latency import make_tile_sharded_probs
from catseg_tpu.parallel.mesh import make_mesh

from test_catseg_model import mini_cfg


def _setup():
    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128, sw_overlap=0.5)
    from catseg_tpu.core import catseg

    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    canvas = np.zeros((256, 256, 3), np.uint8)
    canvas[:220, :200] = rng.randint(0, 255, (220, 200, 3), dtype=np.uint8)
    text = rng.randn(7, 1, 48).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    return cfg, params, canvas, jnp.asarray(text)


def test_tile_sharded_matches_single_device():
    cfg, params, canvas, text = _setup()
    hw = jnp.asarray([220, 200], np.int32)
    want = np.asarray(sliding_window_probs_from_canvas(
        params, jnp.asarray(canvas), hw, text, cfg))

    mesh = make_mesh(n_data=len(jax.devices()))  # 8 virtual CPU devices
    fn = make_tile_sharded_probs(cfg, mesh)
    got = np.asarray(fn(params, jnp.asarray(canvas), hw, text))
    assert got.shape == want.shape == (256, 256, 7)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_predictor_routes_through_mesh():
    cfg, params, canvas, text = _setup()
    mesh = make_mesh(n_data=len(jax.devices()))
    pred = Predictor(params, cfg, [f"c{i}" for i in range(7)],
                     text_feats=np.asarray(text), mesh=mesh)
    image = np.asarray(canvas[:220, :200])
    got = np.asarray(pred.probs_sliding(image))
    base = Predictor(params, cfg, [f"c{i}" for i in range(7)],
                     text_feats=np.asarray(text))
    want = np.asarray(base.probs_sliding(image))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    assert pred._tile_sharded is not None  # actually took the sharded path
