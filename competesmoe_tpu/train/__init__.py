from .lm_trainer import (  # noqa: F401
    OptConfig,
    TrainState,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
