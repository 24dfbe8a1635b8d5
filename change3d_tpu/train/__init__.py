from change3d_tpu.train.losses import (
    bce_dice_loss,
    cross_entropy_2d,
    change_similarity_loss,
    caption_cross_entropy,
    caption_top_k_accuracy,
)
from change3d_tpu.train.lr import (
    poly_warmup_schedule,
    step_schedule,
    shrink_schedule,
    constant_schedule,
)
from change3d_tpu.train.optim import torch_adam
from change3d_tpu.train.engine import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)

__all__ = [
    "bce_dice_loss",
    "cross_entropy_2d",
    "change_similarity_loss",
    "caption_cross_entropy",
    "caption_top_k_accuracy",
    "poly_warmup_schedule",
    "step_schedule",
    "shrink_schedule",
    "constant_schedule",
    "torch_adam",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
