from .meters import AverageMeter
from .metrics import calc_pr, fast_argtopk
from .logger import get_logger

__all__ = ["AverageMeter", "calc_pr", "fast_argtopk", "get_logger"]
