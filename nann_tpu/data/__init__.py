from .synthetic import synthetic_dataset
from .dataio import BatchIterator

__all__ = ["synthetic_dataset", "BatchIterator"]
