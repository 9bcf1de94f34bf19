from .pruner import Pruner
from .train_state import TrainState, create_train_state, make_train_step, resize_batch
from .trainer import Trainer
from .trainer_synflow import TrainerSynFlow
from .tuner import Tuner
