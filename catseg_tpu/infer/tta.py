"""Test-time augmentation: horizontal-flip probability averaging.

Mirrors the reference SemanticSegmentorWithTTA
(cat_seg/test_time_augmentation.py:19-120): run the model on the image and
its hflip, un-flip the flipped prediction, average the sem_seg probability
maps.  (The reference's DatasetMapperTTA with the released configs produces
exactly {identity, hflip} at min_size_test.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .pipeline import Predictor


class TTAPredictor:
    def __init__(self, predictor: Predictor):
        self.predictor = predictor
        self.cfg = predictor.cfg

    def probs_sliding(self, image: np.ndarray) -> jnp.ndarray:
        if self.predictor.input_canvas is not None:
            # one 2x(nt+1)-tile dispatch: [image, hflip] ride the batch axis
            p2 = self.predictor.probs_sliding_batch(
                [image, np.ascontiguousarray(image[:, ::-1])])
            return (p2[0] + p2[1][:, ::-1]) / 2.0
        p = self.predictor.probs_sliding(image)
        p_flip = self.predictor.probs_sliding(np.ascontiguousarray(image[:, ::-1]))
        return (p + p_flip[:, ::-1]) / 2.0

    def probs(self, image: np.ndarray) -> jnp.ndarray:
        """Branch-agnostic flip-averaged probabilities (eval harness entry)."""
        if self.cfg.sliding_window:
            return self.probs_sliding(image)
        p = self.predictor.probs(image)
        p_flip = self.predictor.probs(np.ascontiguousarray(image[:, ::-1]))
        return (p + p_flip[:, ::-1]) / 2.0

    def predict(self, image: np.ndarray, out_hw=None) -> dict:
        base = self.predictor.predict(image, out_hw)
        flipped = self.predictor.predict(np.ascontiguousarray(image[:, ::-1]), out_hw)
        return {"sem_seg": (base["sem_seg"] + flipped["sem_seg"][:, :, ::-1]) / 2.0}
