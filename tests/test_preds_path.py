"""Single-dispatch sliding-eval preds path vs the two-dispatch composition.

Predictor.preds_sliding_batch fuses forward + probability tail + class-major
dynamic resize-argmax into one executable; it must reproduce
probs_sliding_batch + resize_argmax_dynamic_batch exactly (same tail math,
same argmax tie-breaking: both scan class chunks with a strict `>` update,
so the lowest class id wins ties).
"""

import numpy as np
import jax
import jax.numpy as jnp

from test_catseg_model import mini_cfg
from catseg_tpu.core import catseg
from catseg_tpu.infer.pipeline import Predictor, resize_argmax_dynamic_batch


def test_preds_path_matches_probs_path():
    cfg = mini_cfg(sliding_window=True, sw_out_res=256, sw_kernel=128,
                   sw_overlap=0.5)
    params = catseg.init_catseg_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    T = 6
    text = rng.randn(T, 1, cfg.clip.embed_dim).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    pred = Predictor(params, cfg, [f"c{i}" for i in range(T)], text_feats=text,
                     input_canvas=(320, 320))
    images = [rng.randint(0, 255, (200, 260, 3), dtype=np.uint8),
              rng.randint(0, 255, (260, 180, 3), dtype=np.uint8)]
    out_hws = np.array([(160, 210), (210, 150)], np.int32)

    got = np.asarray(pred.preds_sliding_batch(images, out_hws, (256, 256)))
    probs = pred.probs_sliding_batch(images)
    want = np.asarray(resize_argmax_dynamic_batch(
        probs, jnp.asarray(out_hws), (256, 256)))
    for i, (H, W) in enumerate(out_hws):
        np.testing.assert_array_equal(got[i, :H, :W], want[i, :H, :W])
