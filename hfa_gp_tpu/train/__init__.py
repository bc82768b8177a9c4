from .state import TrainState, make_optimizer, apply_generator_freeze  # noqa: F401
from . import rgb, t3dmm, audio  # noqa: F401
