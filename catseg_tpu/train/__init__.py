from .optim import build_optimizer, finetune_label_tree, cosine_lr
from .loop import TrainState, make_train_step, init_train_state

__all__ = [
    "build_optimizer",
    "finetune_label_tree",
    "cosine_lr",
    "TrainState",
    "make_train_step",
    "init_train_state",
]
