from .inferencer import Inferencer
from .optim import make_optimizer, make_schedule, no_decay_mask
from .states import DiscState, GenState
from .steps import make_eval_step, make_forward_fn, make_train_step
from .tester import Tester
from .trainer import Trainer

__all__ = [
    "Trainer",
    "Tester",
    "Inferencer",
    "GenState",
    "DiscState",
    "make_train_step",
    "make_eval_step",
    "make_forward_fn",
    "make_optimizer",
    "make_schedule",
    "no_decay_mask",
]
