from . import metrics, score
from .longbench import DATASETS as LONGBENCH_DATASETS
from .ruler import TASKS as RULER_TASKS

__all__ = ["metrics", "score", "LONGBENCH_DATASETS", "RULER_TASKS"]
