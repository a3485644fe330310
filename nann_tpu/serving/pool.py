"""Multi-device engine pool: one engine per chip, round-robin dispatch.

The reference scales serving on one host by round-robining predictors over
virtual GPUs (blaze-benchmark model.cc:192-235, `gpuid = i % gpu_count`). On
TPU the analogue is real chips: each device gets its own Engine whose model
params and search index are placed in that device's HBM; requests round-robin
across engines. Throughput scales with device count because the devices are
share-nothing (index replicated per chip — for indexes larger than one chip's
HBM, use the row-sharded distributed searcher instead).
"""

from __future__ import annotations

import itertools
import threading
from concurrent.futures import Future
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..config import ModelConfig, SearchConfig
from ..models.layers import Params, State
from ..search import SearchIndex
from ..utils import get_logger
from .engine import Engine, EngineConfig
from .metrics import MetricsRegistry

logger = get_logger("nann_tpu.pool")


class EnginePool:
    """Per-device engines with round-robin submit."""

    def __init__(self, mcfg: ModelConfig, scfg: SearchConfig, params: Params,
                 state: State, index: SearchIndex,
                 devices: Optional[Sequence[jax.Device]] = None,
                 config: Optional[EngineConfig] = None):
        devices = list(devices if devices is not None else jax.devices())
        self.engines: List[Engine] = []
        for dev in devices:
            put = lambda tree, d=dev: jax.tree.map(
                lambda x: jax.device_put(x, d), tree)
            self.engines.append(Engine(mcfg, scfg, put(params), put(state),
                                       put(index), config))
        self._rr = itertools.cycle(range(len(self.engines)))
        self._lock = threading.Lock()
        logger.info(f"engine pool over {len(self.engines)} devices")

    def submit(self, user_seq_emb: np.ndarray, level_topn=None,
               deadline_ms: Optional[float] = None) -> Future:
        """Route to the least-loaded engine (queue-depth-aware, the role of
        the reference pool's Borrow-with-timeout which naturally skips busy
        predictors, model.cc:27-42); round-robin only breaks ties. A full
        engine falls through to the next-least-loaded instead of rejecting
        while siblings are idle."""
        with self._lock:
            start = next(self._rr)
        order = sorted(range(len(self.engines)),
                       key=lambda i: (self.engines[i].depth(),
                                      (i - start) % len(self.engines)))
        from .engine import RequestRejected
        fut = None
        for i in order:
            fut = self.engines[i].submit(user_seq_emb, level_topn, deadline_ms)
            exc = fut.exception() if fut.done() else None
            if not isinstance(exc, RequestRejected):
                return fut
        return fut  # every engine full: surface the rejection

    def search_sync(self, user_seq_emb: np.ndarray, level_topn=None,
                    timeout: float = 30):
        return self.submit(user_seq_emb, level_topn).result(timeout=timeout)

    def swap_model(self, params: Params, state: State,
                   index: SearchIndex) -> None:
        for eng in self.engines:
            dev = None
            # place onto the same device as the engine's current model
            cur = eng._model[0]
            leaf = jax.tree_util.tree_leaves(cur)[0]
            dev = list(leaf.devices())[0]
            put = lambda tree: jax.tree.map(
                lambda x: jax.device_put(x, dev), tree)
            eng.swap_model(put(params), put(state), put(index))

    def aggregate_metrics(self) -> dict:
        total = sum(e.metrics.throughput.count for e in self.engines)
        rejected = sum(e.metrics.rejected.count for e in self.engines)
        failures = sum(e.metrics.failures.count for e in self.engines)
        lats = [e.metrics.latency_us.snapshot() for e in self.engines]
        return {
            "total": total,
            "rejected": rejected,
            "failures": failures,
            "latency_p50_us": float(np.mean([s["p50"] for s in lats])),
            "latency_p99_us": float(np.max([s["p99"] for s in lats])),
            "per_engine": [e.metrics.throughput.count for e in self.engines],
        }

    def shutdown(self) -> None:
        for e in self.engines:
            e.shutdown()

    # context-manager sugar
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
