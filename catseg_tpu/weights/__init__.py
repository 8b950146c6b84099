from .convert import convert_clip_state_dict, convert_catseg_checkpoint
from .io import save_pytree, load_pytree

__all__ = [
    "convert_clip_state_dict",
    "convert_catseg_checkpoint",
    "save_pytree",
    "load_pytree",
]
