"""Eval-graph search semantics (model.py:299-362) vs a numpy reference
implementation of the same algorithm, plus recall sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import init_scorer
from nann_tpu.ops.scorer_kernel import (fold_scorer, precompute_user,
                                        score_frontier_reference)
from nann_tpu.search import SearchIndex, make_searcher
from nann_tpu.search.beam import level_topn_default


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    mcfg = ModelConfig(num_item=800, num_cate=10, emb_dim=8, max_seq_length=6,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(60, 30, 15), topk_eval=(60,),
                        frontier_cap=600)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((800, 16)).astype(np.float32)
    d = tmp_path_factory.mktemp("eidx")
    build_and_save_index(embs, 2, 8, str(d), ef_construction=40)
    art = load_index(str(d), 2, max_degree=16)
    sidx = SearchIndex.from_artifacts(art, embs,
                                      np.arange(1, 801, dtype=np.int32))
    user = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    return mcfg, scfg, params, state, sidx, art, embs, user


def _numpy_eval_search(mcfg, scfg, params, state, art, embs, user):
    """Direct numpy transcription of the reference eval retrieval
    (model.py:299-362) using true ragged neighbor sets."""
    folded = fold_scorer(params, state, mcfg)
    k_proj, v = precompute_user(folded, jnp.asarray(user), dt=jnp.float32)

    def score(ids):
        if len(ids) == 0:
            return np.zeros(0, np.float32)
        out = score_frontier_reference(folded, k_proj, v,
                                       jnp.asarray(embs[ids]),
                                       dt=jnp.float32)
        return np.asarray(out)

    ep = art.enter_points.astype(np.int64)
    scores = score(ep)
    order = np.argsort(scores)[::-1][:scfg.top_k_per_level[2]]
    res, res_s = ep[order], scores[order]

    num_scoring = [len(ep)]
    for level in (1, 0):
        nb = art.neighbors[level]   # fixed-degree packed with self padding
        visited = set(res.tolist())
        cand = res.copy()
        k = scfg.top_k_per_level[level]
        for _ in range(scfg.num_scoring_per_level[level]):
            expand = np.unique(nb[cand].reshape(-1))
            fresh = np.asarray([x for x in expand if x not in visited],
                               np.int64)
            fresh = fresh[:scfg.frontier_cap]
            visited.update(fresh.tolist())
            fs = score(fresh)
            num_scoring.append(len(fresh))
            merged_ids = np.concatenate([res, fresh])
            merged_s = np.concatenate([res_s, fs])
            order = np.argsort(merged_s, kind="stable")[::-1][:k]
            res, res_s = merged_ids[order], merged_s[order]
            kth = res_s[-1]
            mask = fs >= kth
            cand = fresh[mask][:k]
        # next level enter points = res
    topk = max(scfg.topk_eval)
    return res[:topk] + 1, num_scoring   # +1: item ids are 1-based


def test_eval_semantics_close_to_numpy_reference(setup):
    mcfg, scfg, params, state, sidx, art, embs, user = setup
    search = jax.jit(make_searcher(mcfg, scfg, semantics="eval",
                                   scorer_impl="folded"))
    # force fp32 compute for tight comparison
    import dataclasses
    mcfg32 = dataclasses.replace(mcfg, compute_dtype="float32")
    search = jax.jit(make_searcher(mcfg32, scfg, semantics="eval"))
    ltn = jnp.asarray(level_topn_default(scfg, "eval"))
    items, scores, ns = search(params, state, sidx, jnp.asarray(user), ltn)

    ref_items, ref_ns = _numpy_eval_search(mcfg32, scfg, params, state, art,
                                           embs, np.asarray(user))
    got = np.asarray(items)
    got = got[got >= 0]
    overlap = len(set(got.tolist()) & set(ref_items.tolist())) / len(ref_items)
    # fp ties at set boundaries allow small divergence
    assert overlap > 0.9, (overlap, got[:10], ref_items[:10])


def test_eval_level_topn_layout(setup):
    mcfg, scfg, params, state, sidx, art, embs, user = setup
    ltn = level_topn_default(scfg, "eval")
    np.testing.assert_array_equal(ltn, [15, 30, 60, 60])


def test_eval_semantics_no_duplicates(setup):
    mcfg, scfg, params, state, sidx, art, embs, user = setup
    search = jax.jit(make_searcher(mcfg, scfg, semantics="eval"))
    ltn = jnp.asarray(level_topn_default(scfg, "eval"))
    items, _, _ = search(params, state, sidx, jnp.asarray(user), ltn)
    got = np.asarray(items)
    got = got[got >= 0]
    assert len(np.unique(got)) == len(got)
