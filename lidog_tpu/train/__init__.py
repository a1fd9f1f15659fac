from lidog_tpu.train.optim import make_optimizer  # noqa: F401
from lidog_tpu.train.train_step import TrainState, make_eval_step, make_train_step  # noqa: F401
