"""Serving metrics: meters, histograms, periodic console reporter.

Parity with the reference's cppmetrics setup (blaze-benchmark/benchmark/core/
metrics.cc:24-87): per-model throughput meter, latency histogram in
microseconds, batch-size histogram, failure/get-predictor-failure meters,
reported every few seconds.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional

import numpy as np


class Meter:
    """Event-rate meter: count + 1-minute-style moving rate."""

    def __init__(self):
        self.count = 0
        self._t0 = time.monotonic()
        self._lock = threading.Lock()

    def mark(self, n: int = 1) -> None:
        with self._lock:
            self.count += n

    @property
    def mean_rate(self) -> float:
        dt = time.monotonic() - self._t0
        return self.count / dt if dt > 0 else 0.0


class Histogram:
    """Reservoir-free histogram over a bounded window (values in µs)."""

    def __init__(self, max_samples: int = 100_000):
        self._vals: List[float] = []
        self._max = max_samples
        self._lock = threading.Lock()

    def update(self, value: float) -> None:
        with self._lock:
            if len(self._vals) >= self._max:
                self._vals = self._vals[self._max // 2:]
            self._vals.append(value)

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            count = len(self._vals)
            vals = np.asarray(self._vals) if self._vals else np.zeros(1)
        return {
            "count": count,
            "mean": float(vals.mean()),
            "p50": float(np.percentile(vals, 50)),
            "p95": float(np.percentile(vals, 95)),
            "p99": float(np.percentile(vals, 99)),
            "max": float(vals.max()),
        }


class MetricsRegistry:
    """The metric set blaze-benchmark reports, plus a periodic reporter."""

    def __init__(self, name: str = "model"):
        self.name = name
        self.throughput = Meter()
        self.failures = Meter()
        self.rejected = Meter()
        self.latency_us = Histogram()
        self.batch_size = Histogram()
        # transport-independent per-batch device time: chip-busy wall between
        # drain boundaries divided over the batches drained, so the relay
        # round-trip is paid once per drain instead of once per sample —
        # regression-sensitive where latency_us (request wall time) is
        # dominated by ~30 ms tunnel jitter
        self.device_us = Histogram()
        # requests whose hop expansion hit a frontier cap (per-hop tuned
        # caps truncate silently — this meter is the serve-time detectability
        # the round-4 advisor asked for; nonzero means the tuned caps are
        # binding on live traffic and parity may diverge from the scalar-cap
        # program)
        self.cap_saturated = Meter()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def report_lines(self) -> List[str]:
        lat = self.latency_us.snapshot()
        bs = self.batch_size.snapshot()
        dev = self.device_us.snapshot()
        return [
            f"[{self.name}] device_us/batch: p50={dev['p50']:.0f} "
            f"p99={dev['p99']:.0f}",
            f"[{self.name}] throughput: {self.throughput.mean_rate:.1f}/s "
            f"(total {self.throughput.count})",
            f"[{self.name}] latency_us: p50={lat['p50']:.0f} "
            f"p95={lat['p95']:.0f} p99={lat['p99']:.0f} max={lat['max']:.0f}",
            f"[{self.name}] batch_size: mean={bs['mean']:.1f} p99={bs['p99']:.0f}",
            f"[{self.name}] failures: {self.failures.count} "
            f"rejected: {self.rejected.count} "
            f"cap_saturated: {self.cap_saturated.count}",
        ]

    def start_reporter(self, interval_s: float = 3.0, sink=print) -> None:
        def loop():
            while not self._stop.wait(interval_s):
                for line in self.report_lines():
                    sink(line)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop_reporter(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1)
