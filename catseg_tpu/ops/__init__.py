from .resize import resize_bilinear, resize_bicubic, resize_nearest
from .conv import conv2d, conv_transpose2d_nonoverlap, avg_pool2d
from .norm import layer_norm, group_norm
from .window import window_partition, window_reverse
from .unfold import unfold_tiles, fold_tiles, fold_divisor

__all__ = [
    "resize_bilinear",
    "resize_bicubic",
    "resize_nearest",
    "conv2d",
    "conv_transpose2d_nonoverlap",
    "avg_pool2d",
    "layer_norm",
    "group_norm",
    "window_partition",
    "window_reverse",
    "unfold_tiles",
    "fold_tiles",
    "fold_divisor",
]
