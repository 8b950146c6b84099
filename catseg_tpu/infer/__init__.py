from .pipeline import Predictor, sliding_window_probs, resize_argmax

__all__ = ["Predictor", "sliding_window_probs", "resize_argmax"]
