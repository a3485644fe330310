"""Graph-aware checkpoint selection: measure the SHIPPING metric per
checkpoint, not its ceiling.

Round-5 forensics (docs/DESIGN.md, scripts/graph_parity_probe.py): at 4.2M
items the oracle recall curve across checkpoints is nearly flat (67-69%)
while the end-to-end graph recall collapses monotonically with training
progress — subset-graph parity 76.6% at step 10k, 18.2% at 30k, 5.7% at 50k.
A memorizing scorer still RANKS well (oracle) but its item-embedding space
loses the neighborhood structure HNSW routing depends on, so deploy-by-
oracle (the reference's test_all-then-deploy flow, NANN_impls/main.py:
194-237) ships a model whose ceiling the graph cannot reach.

The fix: evaluate each checkpoint end-to-end on a SMALL index. Building the
full-catalogue HNSW per checkpoint would take hours; instead a subset of the
catalogue that covers the eval users' gt items (plus the most popular items
and a random fill) keeps the build to minutes while preserving the relative
ordering across checkpoints — the subset is identical for every checkpoint,
so whatever geometry a checkpoint gives those items, the probe routes
through it exactly as full-scale serving would.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Dict, Tuple

import numpy as np

from ..config import ModelConfig, SearchConfig, default_frontier_cap
from ..utils import calc_pr, get_logger

logger = get_logger("nann_tpu.delivery")


def gt_covering_subset(feats: Dict[str, np.ndarray],
                       test: Dict[str, np.ndarray], n_users: int,
                       subset_size: int, seed: int = 0
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Pick `subset_size` catalogue items: all gt items of the first
    `n_users` eval users, then the most popular items, then a random fill.

    Returns (sub_ids, sub_rows): the original item ids (sorted) and their
    row positions in the embedding matrix (item ids are 1-based in the
    UserBehavior contract; a plain prefix subset covers ~zero gt).
    """
    ids_all = np.asarray(feats["item_id"]).astype(np.int64)
    gt = np.unique(np.concatenate(
        [np.atleast_1d(np.asarray(g)).ravel()
         for g in test["gt_item_id"][:n_users]]))
    pop_ids = ids_all[np.argsort(-np.asarray(feats["weight_tag"]))]
    rng = np.random.default_rng(seed)
    fill_ids = ids_all[rng.choice(len(ids_all),
                                  size=min(subset_size, len(ids_all)),
                                  replace=False)]
    cand = np.concatenate([gt, pop_ids[:subset_size // 2], fill_ids])
    _, first = np.unique(cand, return_index=True)
    sub_ids = np.ascontiguousarray(
        np.sort(cand[np.sort(first)][:subset_size]).astype(np.int64))
    sub_rows = np.searchsorted(ids_all, sub_ids)
    if not (ids_all[sub_rows] == sub_ids).all():
        raise ValueError("item_id array is not sorted — cannot map ids "
                         "to embedding rows")
    return sub_ids, sub_rows


def subset_graph_recall(mcfg: ModelConfig, scfg: SearchConfig, state,
                        item_embs: np.ndarray, sub_ids: np.ndarray,
                        sub_rows: np.ndarray, test: Dict[str, np.ndarray],
                        n_users: int, workdir: str,
                        ef_construction: int = 100, num_threads: int = 0,
                        search_batch: int = 64, topk: int = 200,
                        keep_index: bool = False) -> float:
    """Build an HNSW over `item_embs[sub_rows]` and measure graph
    recall@topk for the first `n_users` eval users.

    `scfg`'s level budgets are kept; the frontier cap is resized to the
    subset's catalogue-aware default so the probe exercises the same
    relative truncation pressure as full-scale serving.
    """
    import jax
    import jax.numpy as jnp

    from ..index import load_index
    from ..index.hnsw_build import build_and_save_index
    from ..search import SearchIndex, make_searcher
    from ..search.beam import level_topn_default
    from .extract import extract_user_embeddings

    scfg = dataclasses.replace(
        scfg, frontier_cap=default_frontier_cap(len(sub_ids)),
        frontier_cap_per_hop=None)
    sub = np.ascontiguousarray(np.asarray(item_embs)[sub_rows],
                               dtype=np.float32)
    if not os.path.exists(os.path.join(workdir, "enter_points.npy")):
        build_and_save_index(sub, start_level=scfg.hnsw_start_level,
                             num_neighbors=32,
                             ef_construction=ef_construction,
                             output_dir=workdir, num_threads=num_threads)
    art = load_index(workdir, scfg.hnsw_start_level, max_degree=64)
    sidx = SearchIndex.from_artifacts(art, sub, sub_ids, dtype=jnp.float32)
    search = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                              in_axes=(None, None, None, 0, None)))
    ltn = jnp.asarray(level_topn_default(scfg))
    B = search_batch
    rec = []
    for s in range(0, n_users, B):
        e = min(s + B, n_users)
        batch = {k: test[k][s:e] for k in test}
        user = extract_user_embeddings(state.params, batch)
        if e - s < B:
            user = np.concatenate(
                [user, np.zeros((B - (e - s),) + user.shape[1:],
                                np.float32)])
        top_items, _sc, _ns = search(state.params, state.bn_state, sidx,
                                     jnp.asarray(user), ltn)
        top_items = np.asarray(top_items)[:e - s]
        for u in range(e - s):
            got = top_items[u][top_items[u] >= 0]
            _p, r, _f = calc_pr(batch["gt_item_id"][u], got[:topk])
            rec.append(r)
    if not keep_index:
        shutil.rmtree(workdir, ignore_errors=True)
    return float(np.mean(rec))
