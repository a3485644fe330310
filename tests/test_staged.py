"""Staged executor == fused program, id-exact.

The staged path (search/staged.py) splits the search at hop boundaries into
separately-compiled XLA programs as a fusion firewall (the measured batch-16
co-compilation pathology, docs/DESIGN.md). Splitting must not change a single
result: these tests pin staged output to the fused searcher's bit-for-bit on
ids and allclose on scores, including the num_scoring metric, int8 indexes,
and runtime level_topn budgets.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import init_scorer
from nann_tpu.search import SearchIndex, make_searcher
from nann_tpu.search.beam import level_topn_default
from nann_tpu.search.staged import make_staged_searcher


def _setup(num_items=3000, seed=0, dtype=jnp.float32, tmpdir="/tmp"):
    mcfg = ModelConfig(num_item=num_items, num_cate=40, emb_dim=16,
                       max_seq_length=12, item_tower_dims=(32, 32, 32),
                       head_dims=(64, 32, 16, 1))
    scfg = SearchConfig(top_k_per_level=(200, 100, 50), topk_eval=(100,),
                        frontier_cap=1024, semantics="eval")
    params, state = init_scorer(jax.random.PRNGKey(seed), mcfg)
    rng = np.random.default_rng(seed)
    embs = rng.standard_normal((num_items, mcfg.item_emb_dim)).astype(
        np.float32)
    import tempfile
    d = tempfile.mkdtemp(prefix="staged_idx_")
    build_and_save_index(embs, start_level=scfg.hnsw_start_level,
                         num_neighbors=8, output_dir=d, ef_construction=40,
                         seed=seed)
    art = load_index(d, start_level=scfg.hnsw_start_level, max_degree=16)
    sidx = SearchIndex.from_artifacts(art, embs,
                                      np.arange(1, num_items + 1,
                                                dtype=np.int32),
                                      dtype=dtype)
    users = rng.standard_normal(
        (3, mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32)
    return mcfg, scfg, params, state, sidx, jnp.asarray(users)


@pytest.mark.parametrize("dtype", [jnp.float32, "int8"])
def test_staged_matches_fused(dtype):
    mcfg, scfg, params, state, sidx, users = _setup(dtype=dtype)
    ltn = jnp.asarray(level_topn_default(scfg))

    fused = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                             in_axes=(None, None, None, 0, None)))
    staged = make_staged_searcher(mcfg, scfg)

    fi, fs, fn_ = fused(params, state, sidx, users, ltn)
    si, ss, sn = staged(params, state, sidx, users, ltn)

    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si))
    np.testing.assert_allclose(np.asarray(fs), np.asarray(ss),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fn_), np.asarray(sn))


def test_staged_runtime_budget():
    """A tighter runtime level_topn must flow through identically."""
    mcfg, scfg, params, state, sidx, users = _setup()
    ltn = level_topn_default(scfg)
    tight = jnp.asarray(np.minimum(ltn, 40).astype(np.int32))

    fused = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                             in_axes=(None, None, None, 0, None)))
    staged = make_staged_searcher(mcfg, scfg)

    fi, _, _ = fused(params, state, sidx, users, tight)
    si, _, _ = staged(params, state, sidx, users, tight)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si))
    # budget respected: at most 40 valid results
    assert (np.asarray(si)[0] >= 0).sum() <= 40


def test_staged_single_query():
    """2-D input (one query) returns unbatched outputs like the fused fn."""
    mcfg, scfg, params, state, sidx, users = _setup()
    ltn = jnp.asarray(level_topn_default(scfg))
    fused = jax.jit(make_searcher(mcfg, scfg))
    staged = make_staged_searcher(mcfg, scfg)
    fi, fs, _ = fused(params, state, sidx, users[0], ltn)
    si, ss, _ = staged(params, state, sidx, users[0], ltn)
    assert si.ndim == 1
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si))


def test_staged_engine_serves():
    """Engine(staged=True) serves requests identical to the fused engine."""
    from nann_tpu.serving import Engine, EngineConfig
    mcfg, scfg, params, state, sidx, users = _setup(num_items=1000)
    cfg = dict(batch_buckets=(1, 4), wait_ms=1.0, max_queue=32)
    eng_f = Engine(mcfg, scfg, params, state, sidx, EngineConfig(**cfg))
    eng_s = Engine(mcfg, scfg, params, state, sidx,
                   EngineConfig(staged=True, **cfg))
    try:
        u = np.asarray(users[0])
        items_f, scores_f = eng_f.search_sync(u)
        items_s, scores_s = eng_s.search_sync(u)
        np.testing.assert_array_equal(items_f, items_s)
        np.testing.assert_allclose(scores_f, scores_s, rtol=1e-5, atol=1e-5)
        futs = [eng_s.submit(np.asarray(users[i % 3])) for i in range(8)]
        outs = [f.result(timeout=60) for f in futs]
        assert all(len(o[0]) > 0 for o in outs)
    finally:
        eng_f.shutdown()
        eng_s.shutdown()


def test_staged_rejects_serving_semantics():
    mcfg = ModelConfig(num_item=100, num_cate=10, emb_dim=16,
                       max_seq_length=12)
    with pytest.raises(NotImplementedError):
        make_staged_searcher(mcfg, SearchConfig(semantics="serving"))
