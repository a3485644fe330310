"""Tracing / profiling utilities (SURVEY §5.1 parity).

The reference's observability is runmeta tensor tracing (serving/engine.py
record/replay covers that) plus ad-hoc GPU profiling. On TPU the native tool
is jax.profiler, but it needs a direct device connection — through the CI
relay the trace collection hangs (docs/DESIGN.md §Gaps), so this module
provides the relay-safe half of the story:

  * compiled_cost(fn, *args)  — the XLA compiler's own cost model for a
    compiled program: FLOPs, HBM bytes accessed, output bytes, and an
    HLO "kernel census" (top-level ENTRY ops ≈ device launches, fusion
    count). Pure host-side metadata: works over any transport.
  * timed(fn, *args)          — pipelined device-time estimate per call
    (dispatch reps back-to-back, block once) — the measurement discipline
    every script in scripts/ uses, centralized.
  * trace_report(...)         — one dict combining both plus derived
    effective bandwidth / FLOP-rate, printable as a single JSON line.

jax.profiler remains available on directly-attached TPUs via
`bench.py --profile DIR`.
"""

from __future__ import annotations

import math
import re
import time
from typing import Any, Callable, Dict


def compiled_cost(fn: Callable, *args, **kwargs) -> Dict[str, Any]:
    """Compile (cache-warm) a jitted fn and return the XLA cost analysis.

    Returns {flops, bytes_accessed, output_bytes, entry_ops, fusions}.
    entry_ops counts the ENTRY computation's top-level instructions — a
    proxy for device kernel launches after fusion.
    """
    lowered = fn.lower(*args, **kwargs)
    comp = lowered.compile()
    out: Dict[str, Any] = {}
    try:
        ca = comp.cost_analysis()
        if isinstance(ca, list):  # one entry per partition
            ca = ca[0]
        # keys a backend doesn't report are OMITTED (never NaN: NaN is
        # truthy, flows through `if rep.get(...)` guards, and json.dumps
        # would emit invalid JSON in bench.py's one-line driver contract)
        for key, name in (("flops", "flops"),
                          ("bytes accessed", "bytes_accessed"),
                          ("bytes accessed output", "output_bytes")):
            v = ca.get(key)
            if v is not None and math.isfinite(float(v)):
                out[name] = float(v)
    except Exception as e:  # pragma: no cover - backend-specific
        out["cost_analysis_error"] = str(e)
    try:
        txt = comp.as_text()
        m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", txt, re.S)
        body = m.group(1) if m else txt
        out["entry_ops"] = len(re.findall(r"\n\s+\S+ = ", body))
        out["fusions"] = len(re.findall(r"= \S*fusion", body))
    except Exception as e:  # pragma: no cover
        out["hlo_error"] = str(e)
    return out


def timed(fn: Callable, *args, reps: int = 30, **kwargs) -> float:
    """Pipelined wall time per call in ms (dispatch reps, block once).

    Per-call block_until_ready measures the host<->device sync path (~30 ms
    through the CI relay) rather than the program; pipelining dispatches
    back-to-back so wall/reps converges to device time per call.
    """
    import jax  # lazy: keep nann_tpu.utils importable without jax init
    jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn(*args, **kwargs)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps * 1e3


def trace_report(fn: Callable, *args, reps: int = 30, label: str = "program",
                 **kwargs) -> Dict[str, Any]:
    """Cost analysis + measured device time + derived roofline numbers."""
    rep: Dict[str, Any] = {"label": label, **compiled_cost(fn, *args, **kwargs)}
    ms = timed(fn, *args, reps=reps, **kwargs)
    rep["time_ms"] = round(ms, 4)
    if rep.get("flops"):
        rep["effective_tflops"] = round(rep["flops"] / (ms * 1e-3) / 1e12, 3)
    if rep.get("bytes_accessed"):
        rep["effective_gbps"] = round(
            rep["bytes_accessed"] / (ms * 1e-3) / 1e9, 1)
    return rep
