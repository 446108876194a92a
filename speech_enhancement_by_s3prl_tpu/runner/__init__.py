from .optim import bert_adam, build_optimizer, plain_adam  # noqa: F401
from .trainer import StepBuilder, TrainState, make_context  # noqa: F401
