"""Training: losses, optimizer/schedule, jitted train steps (SURVEY.md L5/L7)."""

from tdrn_tpu.train.loss import Targets, refine_multibox_loss, smooth_l1  # noqa: F401
from tdrn_tpu.train.trainer import (  # noqa: F401
    TrainState,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
