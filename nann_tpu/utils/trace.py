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


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}
_SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([0-9,]*)\]")
_DEF_RE = re.compile(r"^\s+(?:ROOT )?(%?[\w.-]+) = (.*?) ([\w-]+)\((.*)",
                     re.M)


def _shape_bytes(type_text: str) -> int:
    """Total bytes of an HLO type string (handles tuples by summing)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_text):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def per_op_bytes(fn: Callable, *args, top: int = 15, **kwargs) -> Dict[str, Any]:
    """Per-instruction HBM byte attribution from the compiled HLO text.

    XLA's cost_analysis() reports bytes at program granularity only; this
    walks the post-fusion HLO and charges each top-level instruction its
    result bytes + operand bytes (operands looked up from their defining
    instruction anywhere in the module). Instructions inside `while` bodies
    are attributed separately under the body computation's name — multiply
    by the trip count (static hop count for the search program) to get
    program totals.

    Charging a whole operand over-counts gather-style access (a fusion that
    gathers 4k rows from a 200k-row table did not read the table); entries
    where one operand exceeds 8x the result are tagged gatherish=True so the
    over-count is visible rather than silent. That mirrors the conservative
    convention XLA's own HloCostAnalysis uses for operand bytes, so the
    per-op numbers decompose the same census bench.py --cost reports.

    Returns {computation_name: [{op, opcode, result_mb, operand_mb,
    total_mb, gatherish}, ...]} for ENTRY and every while-body computation,
    each list sorted by total bytes, truncated to `top`.
    """
    comp = fn.lower(*args, **kwargs).compile()
    txt = comp.as_text()

    # name -> result bytes for every defined instruction in the module
    defs: Dict[str, int] = {}
    for name, rtype, _opcode, _ops in _DEF_RE.findall(txt):
        defs[name.lstrip("%")] = _shape_bytes(rtype)
    # computation parameters appear as `name = TYPE parameter(K)` defs too

    # split into computations
    comps: Dict[str, str] = {}
    cur_name, cur_lines = None, []
    for line in txt.splitlines():
        m = re.match(r"^(ENTRY )?%?([\w.-]+)(?:\.clone)? \(.*\) -> ", line)
        if m and line.rstrip().endswith("{"):
            cur_name = ("ENTRY" if m.group(1) else m.group(2))
            cur_lines = []
            comps[cur_name] = cur_lines  # type: ignore[assignment]
        elif line.startswith("}"):
            cur_name = None
        elif cur_name is not None:
            cur_lines.append(line)

    # which computations are while bodies (referenced via body=%name)
    while_bodies = set(re.findall(r"body=%?([\w.-]+)", txt))

    report: Dict[str, Any] = {}
    for cname, lines in comps.items():
        if cname != "ENTRY" and cname not in while_bodies:
            continue
        rows = []
        for line in lines:
            m = _DEF_RE.match(line)
            if not m:
                continue
            name, rtype, opcode, operands = m.groups()
            if opcode in ("parameter", "constant", "iota", "tuple",
                          "get-tuple-element", "bitcast"):
                continue  # no (or aliased) HBM traffic of their own
            res_b = _shape_bytes(rtype)
            op_names = re.findall(r"%([\w.-]+)", operands.split("),")[0])
            op_bytes = [defs.get(o, 0) for o in op_names]
            tot_op = sum(op_bytes)
            rows.append({
                "op": name.lstrip("%"), "opcode": opcode,
                "result_mb": round(res_b / 1e6, 3),
                "operand_mb": round(tot_op / 1e6, 3),
                "total_mb": round((res_b + tot_op) / 1e6, 3),
                "gatherish": bool(op_bytes) and max(op_bytes) > 8 * max(res_b, 1),
            })
        rows.sort(key=lambda r: -r["total_mb"])
        report[cname] = rows[:top]
    return report


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
