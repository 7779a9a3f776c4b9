from .optimizers import Optimizer, build_optimizer
from .schedulers import Scheduler, build_scheduler
from .sr_trainer import SRTrainer
from .state import NetState, SRTrainState

__all__ = [
    "Optimizer", "build_optimizer", "Scheduler", "build_scheduler",
    "SRTrainer", "NetState", "SRTrainState",
]
