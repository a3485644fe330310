"""utils/trace.py — the relay-safe profiling path (SURVEY §5.1).

The reference's profiling story is runmeta tensor tracing + GPU timelines;
ours is engine record/replay (test_serving.py) plus this module: XLA's own
cost model for a compiled program and pipelined device timing. These tests
pin the contract on CPU; bench.py --cost exercises it on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nann_tpu.utils.trace import compiled_cost, timed, trace_report


def _matmul():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256)),
                    jnp.float32)

    @jax.jit
    def f(x):
        return x @ x

    return f, a


def test_compiled_cost_reports_flops_and_ops():
    f, a = _matmul()
    rep = compiled_cost(f, a)
    # 256^3 * 2 FLOPs for the matmul; cost model must see at least that
    assert rep["flops"] >= 2 * 256**3 * 0.9
    assert rep["bytes_accessed"] >= 3 * 256 * 256 * 4 * 0.9
    assert rep["entry_ops"] >= 1


def test_timed_positive_and_small():
    f, a = _matmul()
    ms = timed(f, a, reps=5)
    assert 0 < ms < 1000


def test_trace_report_combines_both():
    f, a = _matmul()
    rep = trace_report(f, a, reps=5, label="matmul")
    assert rep["label"] == "matmul"
    assert rep["time_ms"] > 0
    assert rep["effective_tflops"] > 0
    assert rep["effective_gbps"] > 0


def test_cost_on_search_program():
    # the real search program exposes its cost profile (used by
    # bench.py --cost); entry_ops is the kernel-launch census
    from test_staged import _setup
    from nann_tpu.search import make_searcher
    from nann_tpu.search.beam import level_topn_default

    mcfg, scfg, params, state, sidx, users = _setup()
    fn = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                          in_axes=(None, None, None, 0, None)))
    ltn = jnp.asarray(level_topn_default(scfg))
    rep = compiled_cost(fn, params, state, sidx, users, ltn)
    assert rep["flops"] > 0
    assert rep["entry_ops"] > 0


def test_per_op_bytes_attribution():
    """per_op_bytes decomposes the program census per instruction: entries
    must carry positive byte totals and cover the matmul's traffic."""
    from nann_tpu.utils.trace import per_op_bytes

    f, a = _matmul()
    rep = per_op_bytes(f, a, top=10)
    assert "ENTRY" in rep and rep["ENTRY"], rep
    top = rep["ENTRY"][0]
    assert top["total_mb"] > 0
    assert {"op", "opcode", "result_mb", "operand_mb",
            "gatherish"} <= set(top)
    # the 256x256 fp32 matmul moves ~0.79 MB (2 reads + 1 write)
    total = sum(r["total_mb"] for r in rep["ENTRY"])
    assert total >= 0.5, rep


def test_per_op_bytes_on_search_program():
    from test_staged import _setup
    from nann_tpu.search import make_searcher
    from nann_tpu.search.beam import level_topn_default
    from nann_tpu.utils.trace import per_op_bytes

    mcfg, scfg, params, state, sidx, users = _setup()
    fn = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                          in_axes=(None, None, None, 0, None)))
    ltn = jnp.asarray(level_topn_default(scfg))
    rep = per_op_bytes(fn, params, state, sidx, users, ltn, top=8)
    assert rep["ENTRY"], "search program attribution empty"
    assert all(r["total_mb"] >= 0 for r in rep["ENTRY"])
