"""Training runtime: state/checkpointing, loop utilities, config plumbing."""
from .state import TrainState, latest_step, restore_checkpoint, save_checkpoint  # noqa: F401
from .loop import MetricLogger, Throughput  # noqa: F401
from .config import dataclass_from_dict, init_from_dict  # noqa: F401
