from . import clip, aggregator, catseg

__all__ = ["clip", "aggregator", "catseg"]
