"""Load generator: the blaze-benchmark equivalent.

Reference harness (blaze-benchmark/benchmark/core/benchmark.cc:25-149 +
predict_request_{producer,consumer}.cc): N producer threads generate requests
at a target QPS (-1 = unbounded), consumers measure per-request wall time;
metrics (throughput, latency histogram, batch-size histogram, drops) print
every 3 s for `duration` seconds.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Dict, Optional

import numpy as np

from .engine import Engine


@dataclasses.dataclass
class LoadGenConfig:
    duration_s: float = 10.0
    qps: float = -1.0                # -1 = max pressure (reference qps:-1)
    num_producers: int = 4           # predictor_num=4 / thread_count=4
    report_interval_s: float = 3.0
    seed: int = 0
    replay_path: str = ""            # runmeta npz from Engine.dump_runmeta:
    #                                  producers replay recorded requests
    #                                  instead of generating random ones


def run_load_test(engine: Engine, config: LoadGenConfig,
                  verbose: bool = True) -> Dict[str, float]:
    """Drive the engine; returns summary metrics."""
    stop = threading.Event()
    mcfg = engine.mcfg
    inflight_sem = threading.Semaphore(engine.config.max_queue)

    replay = None
    if config.replay_path:
        rec = np.load(config.replay_path)
        replay = (rec["user_seq_emb"].astype(np.float32),
                  rec["level_topn"].astype(np.int32))

    def producer(tid: int):
        # pre-generate the request pool (the reference producer does the
        # same, predict_request_producer.cc): per-request RNG in the paced
        # loop costs tens of µs that starve multi-kqps targets on a busy host
        per_thread_qps = (config.qps / config.num_producers
                          if config.qps > 0 else None)
        if replay is not None:
            pool_u, pool_l = replay[0], replay[1]
        else:
            rng = np.random.default_rng(config.seed + tid)
            pool_u = rng.standard_normal(
                (64, mcfg.max_seq_length, mcfg.user_emb_dim)
            ).astype(np.float32)
            pool_l = None
        next_t = time.perf_counter()
        i = tid
        while not stop.is_set():
            if per_thread_qps:
                now = time.perf_counter()
                if now < next_t:
                    time.sleep(min(next_t - now, 0.05))
                    continue
                next_t += 1.0 / per_thread_qps
            user = pool_u[i % len(pool_u)]
            ltn = pool_l[i % len(pool_l)] if pool_l is not None else None
            i += config.num_producers
            if not inflight_sem.acquire(timeout=0.1):
                continue
            fut = engine.submit(user, ltn)
            fut.add_done_callback(lambda _f: inflight_sem.release())

    threads = [threading.Thread(target=producer, args=(t,), daemon=True)
               for t in range(config.num_producers)]
    if verbose:
        engine.metrics.start_reporter(config.report_interval_s)
    # meters are engine-lifetime cumulative; report THIS run's delta so
    # repeated runs (calibrate-then-measure) don't inflate qps
    count0 = engine.metrics.throughput.count
    rejected0 = engine.metrics.rejected.count
    failures0 = engine.metrics.failures.count
    t0 = time.monotonic()
    for t in threads:
        t.start()
    time.sleep(config.duration_s)
    stop.set()
    for t in threads:
        t.join(timeout=1)
    wall = time.monotonic() - t0
    # drain
    time.sleep(0.3)
    if verbose:
        engine.metrics.stop_reporter()

    lat = engine.metrics.latency_us.snapshot()
    bs = engine.metrics.batch_size.snapshot()
    dev = engine.metrics.device_us.snapshot()
    return {
        "qps": (engine.metrics.throughput.count - count0) / wall,
        "total": engine.metrics.throughput.count - count0,
        "rejected": engine.metrics.rejected.count - rejected0,
        "failures": engine.metrics.failures.count - failures0,
        "latency_p50_us": lat["p50"],
        "latency_p99_us": lat["p99"],
        # transport-independent per-batch device time (metrics.device_us):
        # regression-sensitive where request wall time is relay-dominated
        "device_p50_us": dev["p50"],
        "device_p99_us": dev["p99"],
        "mean_batch": bs["mean"],
        "duration_s": wall,
    }
