"""Serving engine tests: correctness, batching, admission, hot swap, load."""

import time

import jax
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import init_scorer
from nann_tpu.search import SearchIndex, make_searcher
from nann_tpu.search.beam import level_topn_default
from nann_tpu.serving import (Engine, EngineConfig, LoadGenConfig,
                              run_load_test)


@pytest.fixture(scope="module")
def engine_setup(tmp_path_factory):
    mcfg = ModelConfig(num_item=1000, num_cate=20, emb_dim=8, max_seq_length=8,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(50, 25, 10), topk_eval=(50,),
                        frontier_cap=512)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    item_embs = rng.standard_normal((1000, mcfg.item_emb_dim)).astype(np.float32)
    item_ids = np.arange(1, 1001, dtype=np.int32)
    d = tmp_path_factory.mktemp("idx")
    build_and_save_index(item_embs, 2, 8, str(d), ef_construction=40)
    art = load_index(str(d), 2, max_degree=16)
    sidx = SearchIndex.from_artifacts(art, item_embs, item_ids)
    return mcfg, scfg, params, state, sidx


@pytest.fixture(scope="module")
def engine(engine_setup):
    mcfg, scfg, params, state, sidx = engine_setup
    eng = Engine(mcfg, scfg, params, state, sidx,
                 EngineConfig(batch_buckets=(1, 2, 4), wait_ms=2.0,
                              max_queue=64))
    yield eng
    eng.shutdown()


def test_sync_request_matches_direct_search(engine, engine_setup):
    mcfg, scfg, params, state, sidx = engine_setup
    rng = np.random.default_rng(3)
    user = rng.standard_normal((8, 16)).astype(np.float32)

    items, scores = engine.search_sync(user)
    assert len(items) == 50
    assert np.all(np.diff(scores) <= 1e-6)

    import jax.numpy as jnp
    direct = jax.jit(make_searcher(mcfg, scfg))(
        params, state, sidx, jnp.asarray(user),
        jnp.asarray(level_topn_default(scfg)))
    d_items = np.asarray(direct[0])
    np.testing.assert_array_equal(items, d_items[d_items >= 0])


def test_concurrent_requests_batched(engine):
    rng = np.random.default_rng(4)
    futs = [engine.submit(rng.standard_normal((8, 16)).astype(np.float32))
            for _ in range(16)]
    outs = [f.result(timeout=30) for f in futs]
    assert all(len(o[0]) == 50 for o in outs)
    bs = engine.metrics.batch_size.snapshot()
    assert bs["max"] >= 2, "no batching happened"


def test_custom_level_topn(engine):
    rng = np.random.default_rng(5)
    ltn = np.asarray([50, 25, 10, 5], np.int32)  # eval-semantics layout
    items, _ = engine.search_sync(
        rng.standard_normal((8, 16)).astype(np.float32), ltn)
    assert len(items) == 5


def test_hot_swap_changes_results(engine, engine_setup):
    mcfg, scfg, params, state, sidx = engine_setup
    rng = np.random.default_rng(6)
    user = rng.standard_normal((8, 16)).astype(np.float32)
    before, _ = engine.search_sync(user)

    params2, state2 = init_scorer(jax.random.PRNGKey(99), mcfg)
    engine.swap_model(params2, state2, sidx)
    after, _ = engine.search_sync(user)
    engine.swap_model(params, state, sidx)
    assert not np.array_equal(before, after)


def test_queue_rejection(engine_setup):
    """Submissions beyond max_queue are rejected (max_queue_size drop
    semantics, predict_request_consumer.cc:31-35)."""
    from nann_tpu.serving.engine import RequestRejected
    mcfg, scfg, params, state, sidx = engine_setup
    eng = Engine(mcfg, scfg, params, state, sidx,
                 EngineConfig(batch_buckets=(1,), wait_ms=1.0, max_queue=3,
                              warmup=False))
    # halt the dispatcher so the queue genuinely fills
    eng._stop.set()
    eng._dispatcher.join(timeout=5)
    eng._completer.join(timeout=5)
    rng = np.random.default_rng(0)
    futs = [eng.submit(rng.standard_normal((8, 16)).astype(np.float32))
            for _ in range(5)]
    rejected = [f for f in futs if f.done() and
                isinstance(f.exception(), RequestRejected)]
    assert len(rejected) == 2, len(rejected)
    assert eng.metrics.rejected.count == 2


def test_deadline_rejection(engine):
    """A request with an already-expired deadline must be rejected at
    dispatch (reference wait_ms DeadlineExceeded semantics)."""
    from nann_tpu.serving.engine import RequestRejected
    rng = np.random.default_rng(8)
    fut = engine.submit(rng.standard_normal((8, 16)).astype(np.float32),
                        deadline_ms=0.0)
    with pytest.raises(RequestRejected):
        fut.result(timeout=10)


def test_concurrent_submitters_thread_safety(engine):
    """Hammer the engine from several threads at once — results must all
    arrive and be well-formed (the queue/dispatcher race test per
    SURVEY.md §5.2)."""
    import threading
    rng = np.random.default_rng(9)
    users = [rng.standard_normal((8, 16)).astype(np.float32)
             for _ in range(40)]
    results = [None] * 40
    def worker(lo, hi):
        for i in range(lo, hi):
            results[i] = engine.search_sync(users[i])
    threads = [threading.Thread(target=worker, args=(i * 10, (i + 1) * 10))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None and len(r[0]) == 50 for r in results)


def test_dispatcher_survives_bad_request(engine):
    """A request that blows up during dispatch (wrong user shape) must fail
    its own future and leave the engine serving (review fix: the dispatcher
    thread previously died)."""
    rng = np.random.default_rng(13)
    bad = engine.submit(rng.standard_normal((3, 7)).astype(np.float32))
    with pytest.raises(Exception):
        bad.result(timeout=30)
    # engine still works afterwards
    items, _ = engine.search_sync(rng.standard_normal((8, 16)).astype(np.float32))
    assert len(items) == 50


def test_submit_rejects_bad_level_topn_shape(engine):
    rng = np.random.default_rng(14)
    fut = engine.submit(rng.standard_normal((8, 16)).astype(np.float32),
                        level_topn=np.asarray([5, 5], np.int32))
    with pytest.raises(ValueError):
        fut.result(timeout=10)


def test_load_generator(engine):
    res = run_load_test(engine, LoadGenConfig(duration_s=2.0, qps=200,
                                              num_producers=2), verbose=False)
    assert res["total"] > 50, res
    # run_load_test reports per-run deltas, so prior tests on the shared
    # engine fixture don't leak in
    assert res["failures"] == 0
    assert res["latency_p99_us"] > 0


def test_engine_serves_row_sharded_index(engine_setup):
    """The engine can serve the distributed (mp row-sharded) searcher: results
    must match the local engine's."""
    from nann_tpu.parallel import make_mesh
    from nann_tpu.search.distributed import shard_index

    mcfg, scfg, params, state, sidx = engine_setup
    if sidx.item_ids.shape[0] % 8:
        pytest.skip("catalogue not divisible by 8 shards")
    mesh = make_mesh(dp=1, mp=8)
    engines = []
    try:
        eng_local = Engine(mcfg, scfg, params, state, sidx,
                           EngineConfig(batch_buckets=(1, 2), wait_ms=1.0,
                                        warmup=False))
        engines.append(eng_local)
        eng_dist = Engine(mcfg, scfg, params, state, shard_index(mesh, sidx),
                          EngineConfig(batch_buckets=(1, 2), wait_ms=1.0,
                                       warmup=False, mesh=mesh))
        engines.append(eng_dist)
        rng = np.random.default_rng(21)
        user = rng.standard_normal((8, 16)).astype(np.float32)
        a, _ = eng_local.search_sync(user)
        b, _ = eng_dist.search_sync(user)
        np.testing.assert_array_equal(a, b)
    finally:
        for e in engines:
            e.shutdown()


def test_runmeta_record_and_replay(engine_setup, tmp_path):
    """Runmeta protocol: record served requests, dump, replay through the
    load generator (reference traced-tensors -> ParseRunmeta flow)."""
    mcfg, scfg, params, state, sidx = engine_setup
    eng = Engine(mcfg, scfg, params, state, sidx,
                 EngineConfig(batch_buckets=(1, 2), wait_ms=1.0,
                              record_requests=32, warmup=False))
    try:
        rng = np.random.default_rng(11)
        for _ in range(6):
            eng.search_sync(rng.standard_normal((8, 16)).astype(np.float32))
        path = str(tmp_path / "runmeta.npz")
        n = eng.dump_runmeta(path)
        assert n == 6
        rec = np.load(path)
        assert rec["user_seq_emb"].shape == (6, 8, 16)
        assert rec["latency_us"].min() > 0

        # The assertion is structural (replay completes without failures),
        # not a throughput bar: wall-time windows flaked twice under CI CPU
        # contention (5 completions at 1 s, then 2 at 2 s with a parallel
        # training run) and throughput is load_gen's own tests' concern.
        res = run_load_test(eng, LoadGenConfig(duration_s=2.0, qps=100,
                                               num_producers=1,
                                               replay_path=path),
                            verbose=False)
        assert res["total"] >= 1
        assert res["failures"] == 0
    finally:
        eng.shutdown()


def test_mixed_level_topn_latency_bounded(engine):
    """Adversarial alternating level_topn mix (the worst case for the
    hold-back-then-front-of-line grouping, engine._dispatch_once): every
    dispatch window sees both budgets, so half the requests are held one
    cycle. The mixed stream must stay FAIR — per-budget p99 within a small
    multiple of the homogeneous stream's p99 — and lose at most one dispatch
    cycle (wait_ms + service) per request, not queue up unboundedly."""
    rng = np.random.default_rng(11)
    ltn_a = level_topn_default(engine.scfg)
    ltn_b = ltn_a.copy()
    ltn_b[-1] = max(1, ltn_a[-1] // 2)

    def run_stream(ltns, n=60, gap_s=0.002):
        lats = {i: None for i in range(n)}
        futs = []
        for i in range(n):
            u = rng.standard_normal((8, 16)).astype(np.float32)
            t0 = time.perf_counter()
            futs.append((i, t0, engine.submit(u, ltns[i % len(ltns)])))
            time.sleep(gap_s)
        for i, t0, f in futs:
            f.result(timeout=30)
            lats[i] = time.perf_counter() - t0
        return np.asarray([lats[i] for i in range(n)])

    homog = run_stream([ltn_a])
    mixed = run_stream([ltn_a, ltn_b])  # strict alternation
    p99_h = np.percentile(homog, 99)
    p99_ab = (np.percentile(mixed[0::2], 99), np.percentile(mixed[1::2], 99))
    cycle = engine.config.wait_ms / 1e3 + np.percentile(homog, 50)
    for p99_m in p99_ab:
        # one extra dispatch cycle of added latency allowed (held requests go
        # front-of-line next cycle); 3x guards CI timing noise
        assert p99_m <= 3 * (p99_h + cycle), (p99_m, p99_h, cycle)
    # fairness between the two interleaved budgets
    lo, hi = sorted([np.median(mixed[0::2]), np.median(mixed[1::2])])
    assert hi <= 5 * lo + 0.05, (lo, hi)
