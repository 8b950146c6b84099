from .miou import ConfusionAccumulator, semseg_metrics, gzero_metrics

__all__ = ["ConfusionAccumulator", "semseg_metrics", "gzero_metrics"]
