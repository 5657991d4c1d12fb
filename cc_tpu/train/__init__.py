from cc_tpu.train.config import TrainConfig
from cc_tpu.train.state import CCModels, TrainState, make_models, init_state
from cc_tpu.train.step import build_train_step, build_forward_eval

__all__ = [
    "TrainConfig", "CCModels", "TrainState", "make_models", "init_state",
    "build_train_step", "build_forward_eval",
]
