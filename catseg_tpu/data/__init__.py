from .catalogs import DATASETS, DatasetSpec, get_dataset, load_class_names
from .loader import list_dataset, load_image, load_gt, resize_shortest_edge

__all__ = [
    "DATASETS",
    "DatasetSpec",
    "get_dataset",
    "load_class_names",
    "list_dataset",
    "load_image",
    "load_gt",
    "resize_shortest_edge",
]
