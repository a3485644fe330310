"""HNSW builder tests: structural invariants, connectivity, L2 search quality."""

import numpy as np
import pytest

from nann_tpu.index import (build_and_save_index, build_hnsw, load_index,
                            pack_fixed_degree)


@pytest.fixture(scope="module")
def embs():
    rng = np.random.default_rng(0)
    # clustered points so graph search is meaningful
    centers = rng.standard_normal((20, 16)) * 5
    pts = centers[rng.integers(0, 20, 3000)] + rng.standard_normal((3000, 16))
    return pts.astype(np.float32)


@pytest.fixture(scope="module")
def graph(embs):
    return build_hnsw(embs, M=16, ef_construction=100, seed=1)


def test_levels_distribution(graph, embs):
    levels, csr = graph
    n = len(embs)
    assert levels.shape == (n,)
    assert levels.min() == 0
    # expected fraction at level>=1 is 1/M
    frac = (levels >= 1).mean()
    assert 0.02 < frac < 0.15, frac


def test_csr_invariants(graph, embs):
    levels, csr = graph
    n = len(embs)
    for level, (values, row_splits) in csr.items():
        assert row_splits[0] == 0 and row_splits[-1] == len(values)
        assert np.all(np.diff(row_splits) >= 0)
        deg = np.diff(row_splits)
        cap = 32 if level == 0 else 16
        assert deg.max() <= cap, (level, deg.max())
        if len(values):
            assert values.min() >= 0 and values.max() < n
        # nodes below this level have no neighbors here
        assert deg[levels < level].sum() == 0


def test_ground_level_connectivity(graph, embs):
    """BFS from the top-level node must reach nearly every node at level 0."""
    levels, csr = graph
    n = len(embs)
    values, row_splits = csr[0]
    start = int(np.argmax(levels))
    seen = np.zeros(n, bool)
    frontier = [start]
    seen[start] = True
    while frontier:
        nxt = []
        for u in frontier:
            for v in values[row_splits[u]:row_splits[u + 1]]:
                if not seen[v]:
                    seen[v] = True
                    nxt.append(v)
        frontier = nxt
    assert seen.mean() > 0.99, seen.mean()


def test_l2_graph_search_recall(graph, embs):
    """Greedy beam search over the built graph with plain L2 must find most of
    the true top-10 — validates graph quality independent of the DNN scorer."""
    levels, csr = graph
    values, row_splits = csr[0]
    rng = np.random.default_rng(3)
    queries = embs[rng.integers(0, len(embs), 20)] + 0.1

    hits, total = 0, 0
    for q in queries:
        d = ((embs - q) ** 2).sum(-1)
        true_top = set(np.argsort(d)[:10])
        # greedy beam from the global top node
        ef = 50
        start = int(np.argmax(levels))
        visited = {start}
        cand = [(d[start], start)]
        best = [(d[start], start)]
        import heapq
        heapq.heapify(cand)
        while cand:
            dc, c = heapq.heappop(cand)
            if dc > max(b[0] for b in best) and len(best) >= ef:
                break
            for v in values[row_splits[c]:row_splits[c + 1]]:
                if v in visited:
                    continue
                visited.add(v)
                dv = d[v]
                if len(best) < ef or dv < max(b[0] for b in best):
                    heapq.heappush(cand, (dv, v))
                    best.append((dv, v))
                    best = sorted(best)[:ef]
        found = set(v for _, v in best)
        hits += len(true_top & found)
        total += 10
    assert hits / total > 0.85, hits / total


def test_artifact_roundtrip(tmp_path, embs):
    build_and_save_index(embs, start_level=2, num_neighbors=16,
                         output_dir=str(tmp_path), ef_construction=100)
    for level in range(2):
        for suffix in ("values", "row_splits"):
            assert (tmp_path / f"neighbors_level_{level}_{suffix}.npy").exists()
    assert (tmp_path / "enter_points.npy").exists()

    art = load_index(str(tmp_path), start_level=2, max_degree=32)
    assert art.num_items == len(embs)
    assert art.neighbors[0].shape == (len(embs), 32)
    assert art.neighbors[0].dtype == np.int32
    assert art.enter_points.size > 0


def test_pack_fixed_degree_padding():
    values = np.array([1, 2, 3, 7], np.int64)
    row_splits = np.array([0, 2, 2, 4], np.int64)
    packed = pack_fixed_degree(values, row_splits, 3)
    np.testing.assert_array_equal(packed[0], [1, 2, 0])
    np.testing.assert_array_equal(packed[1], [1, 1, 1])   # empty row -> self
    np.testing.assert_array_equal(packed[2], [3, 7, 2])


def test_pack_fixed_degree_truncation():
    values = np.arange(5, dtype=np.int64)
    row_splits = np.array([0, 5], np.int64)
    packed = pack_fixed_degree(values, row_splits, 3)
    np.testing.assert_array_equal(packed[0], [0, 1, 2])


def test_bfs_reorder_is_pure_relabel(tmp_path):
    """reorder="bfs" must leave search results bit-identical in item-id
    space (it only permutes internal node ids for gather locality)."""
    import jax
    import jax.numpy as jnp

    from nann_tpu.config import ModelConfig, SearchConfig
    from nann_tpu.models import init_scorer
    from nann_tpu.search import SearchIndex, make_searcher
    from nann_tpu.search.beam import level_topn_default

    rng = np.random.default_rng(3)
    n = 600
    embs = rng.standard_normal((n, 16)).astype(np.float32)
    build_and_save_index(embs, 2, 8, str(tmp_path), ef_construction=40)
    art = load_index(str(tmp_path), 2, max_degree=16)
    item_ids = np.arange(1, n + 1, dtype=np.int32)

    mcfg = ModelConfig(num_item=n, num_cate=10, emb_dim=8, max_seq_length=6,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(50, 25, 12), topk_eval=(50,),
                        frontier_cap=256)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    search = jax.jit(make_searcher(mcfg, scfg))
    ltn = jnp.asarray(level_topn_default(scfg))

    base = SearchIndex.from_artifacts(art, embs, item_ids)
    reord = SearchIndex.from_artifacts(art, embs, item_ids, reorder="bfs")
    # the permutation must actually move things
    assert not np.array_equal(np.asarray(base.item_ids),
                              np.asarray(reord.item_ids))
    # every level's neighbor multiset is preserved under the relabel
    for lvl in art.neighbors:
        a = np.sort(np.asarray(base.item_ids)[np.asarray(
            base.neighbors[lvl]).reshape(-1)])
        b = np.sort(np.asarray(reord.item_ids)[np.asarray(
            reord.neighbors[lvl]).reshape(-1)])
        np.testing.assert_array_equal(a, b)

    for seed in range(3):
        u = jnp.asarray(np.random.default_rng(seed).standard_normal(
            (6, 16)).astype(np.float32))
        bi, bs, _ = search(params, state, base, u, ltn)
        ri, rs, _ = search(params, state, reord, u, ltn)
        bi, ri = np.asarray(bi), np.asarray(ri)
        np.testing.assert_array_equal(np.sort(bi[bi >= 0]),
                                      np.sort(ri[ri >= 0]))
