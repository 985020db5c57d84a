from spef_tpu.train.loss import SPELoss  # noqa: F401
from spef_tpu.train.optimizer import import_optimizer  # noqa: F401
from spef_tpu.train.step import TrainState, create_train_state  # noqa: F401
from spef_tpu.train.trainer import Trainer, evaluation  # noqa: F401
