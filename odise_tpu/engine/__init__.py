from .checkpoint import BestCheckpointer, Checkpointer, merge_params, split_frozen
from .defaults import default_setup
from .hooks import EvalHook, IterationTimer, PeriodicCheckpointer, PeriodicWriter
from .optimizer import make_optimizer, make_trainable_mask, multistep_lr
from .train_loop import (
    TrainState,
    Trainer,
    check_finite,
    global_norm,
    make_caption_train_step,
    make_category_train_step,
)
