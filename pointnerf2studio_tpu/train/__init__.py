from pointnerf2studio_tpu.train.loss import compute_loss, compute_losses
from pointnerf2studio_tpu.train.trainer import (
    TrainState, create_train_state, make_train_step)
