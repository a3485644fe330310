from .meters import AverageMeter
from .metrics import calc_pr, fast_argtopk
from .logger import get_logger
from .trace import compiled_cost, timed, trace_report

__all__ = ["AverageMeter", "calc_pr", "fast_argtopk", "get_logger",
           "compiled_cost", "timed", "trace_report"]
