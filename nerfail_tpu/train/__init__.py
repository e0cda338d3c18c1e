from nerfail_tpu.train.nerf_trainer import (
    NeRFTrainState,
    create_train_state,
    make_train_step,
    train_nerf,
)
from nerfail_tpu.train.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint

__all__ = [
    "NeRFTrainState",
    "create_train_state",
    "make_train_step",
    "train_nerf",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
]
