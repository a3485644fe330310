from .metrics import Histogram, Meter, MetricsRegistry
from .engine import Engine, EngineConfig, RequestRejected
from .load_gen import LoadGenConfig, run_load_test

__all__ = ["Engine", "EngineConfig", "RequestRejected", "Histogram", "Meter",
           "MetricsRegistry", "LoadGenConfig", "run_load_test"]
