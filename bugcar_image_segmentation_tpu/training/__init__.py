"""Training subsystem: loss, train state, jitted/sharded train steps.

The reference ships frozen graphs only; this supplies the missing
train/fine-tune direction (see trainer.py).
"""

from .trainer import (TrainState, create_train_state, make_eval_step,
                      make_train_step, softmax_cross_entropy)

__all__ = ["TrainState", "create_train_state", "make_eval_step",
           "make_train_step", "softmax_cross_entropy"]
