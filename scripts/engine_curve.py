"""Engine qps/latency curve across batch buckets (VERDICT r2 item 2).

Round-2 forensics put the chip's program-level sweet spot at batch 64-128,
but the engine had only been measured at bucket 16. This measures the FULL
serving stack (queue -> micro-batch -> async dispatch -> drain) at each
max-bucket, two ways per point:

  * saturated: unbounded producers — the engine's capacity at that bucket
  * paced: 70% of saturated — service-latency percentiles without queue
    growth, plus the transport-independent per-batch device-time histogram

Prints one table + one JSON line (runs/engine_curve.json) for DESIGN.md.

Usage: python scripts/engine_curve.py [--items 200000] [--buckets 16 64 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--buckets", type=int, nargs="+", default=[16, 64, 128])
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--out", default=os.path.join(REPO, "runs",
                                                  "engine_curve.json"))
    args = ap.parse_args()

    from bench import build_setup
    from nann_tpu.serving import (Engine, EngineConfig, LoadGenConfig,
                                  run_load_test)

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    import jax.numpy as jnp
    mcfg, scfg, params, state, sidx = build_setup(
        args.items, dtype="int8" if args.dtype == "int8" else jnp.bfloat16)

    rows = []
    for b in args.buckets:
        eng = Engine(mcfg, scfg, params, state, sidx,
                     EngineConfig(batch_buckets=(1, b), wait_ms=2.0))
        sat = run_load_test(eng, LoadGenConfig(duration_s=3.0, qps=-1),
                            verbose=False)
        target = max(0.7 * sat["qps"], 20.0)
        # micro-batch window sized to the paced rate (same discipline as
        # bench.py): half a bucket's fill time, capped at 200 ms
        eng.config.wait_ms = min(200.0, max(2.0, 1e3 * b / (2.0 * target)))
        eng.metrics.latency_us = type(eng.metrics.latency_us)()
        eng.metrics.device_us = type(eng.metrics.device_us)()
        paced = run_load_test(
            eng, LoadGenConfig(duration_s=args.duration, qps=target),
            verbose=False)
        lat = eng.metrics.latency_us.snapshot()
        dev = eng.metrics.device_us.snapshot()
        eng.shutdown()
        row = {
            "bucket": b,
            "saturated_qps": round(sat["qps"], 1),
            "paced_qps": round(paced["qps"], 1),
            "paced_target": round(target, 1),
            "p50_ms": round(lat["p50"] / 1e3, 2),
            "p99_ms": round(lat["p99"] / 1e3, 2),
            "device_ms_per_batch_p50": round(dev["p50"] / 1e3, 3),
            "device_ms_per_batch_p99": round(dev["p99"] / 1e3, 3),
            "mean_batch": round(paced["mean_batch"], 1),
        }
        rows.append(row)
        print(f"bucket {b:4d}: sat {row['saturated_qps']:7.1f} qps | paced "
              f"{row['paced_qps']:7.1f} qps  p50 {row['p50_ms']:6.1f} ms  "
              f"p99 {row['p99_ms']:6.1f} ms  dev/batch p50 "
              f"{row['device_ms_per_batch_p50']:6.2f} ms  mean_batch "
              f"{row['mean_batch']}", flush=True)

    # full ladder with CALIBRATION, saturated: what the shipped default
    # (serving/engine.py calibrate) achieves — the serve bucket it picks is
    # the row to compare against the per-bucket curve above
    eng = Engine(mcfg, scfg, params, state, sidx,
                 EngineConfig(wait_ms=2.0, calibrate=True))
    sat = run_load_test(eng, LoadGenConfig(duration_s=4.0, qps=-1),
                        verbose=False)
    serve_b = eng._serve_cap
    eng.shutdown()
    full = {"bucket": "ladder(1,4,16,64,128)+calibrate",
            "calibrated_serve_bucket": serve_b,
            "saturated_qps": round(sat["qps"], 1),
            "mean_batch": round(sat["mean_batch"], 1)}
    rows.append(full)
    print(f"full ladder: sat {full['saturated_qps']} qps mean_batch "
          f"{full['mean_batch']}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"items": args.items, "dtype": args.dtype,
                   "frontier_cap": scfg.frontier_cap, "rows": rows}, f,
                  indent=1)
    print(json.dumps({"engine_curve": rows}))


if __name__ == "__main__":
    main()
