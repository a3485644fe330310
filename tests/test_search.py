"""Search subsystem tests: brute-force oracle, fused beam search mechanics,
and the recall-parity integration test (the reference's primary correctness
harness, SURVEY.md §4.2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig, TrainConfig
from nann_tpu.data import BatchIterator, synthetic_dataset
from nann_tpu.delivery import extract_item_embeddings, extract_user_embeddings
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import scorer
from nann_tpu.search import SearchIndex, brute_force_topk, make_searcher
from nann_tpu.search.beam import _masked_topk, level_topn_default
from nann_tpu.train import create_train_state, make_train_step


# ---------------------------------------------------------------- unit tests


def test_masked_topk_runtime_k():
    ids = jnp.array([5, 6, 7, 8, 9])
    scores = jnp.array([0.1, 0.9, 0.5, -jnp.inf, 0.7])
    top_ids, top_scores = _masked_topk(ids, scores, 4, jnp.int32(2),
                                       sentinel=99)
    np.testing.assert_array_equal(np.asarray(top_ids), [6, 9, 99, 99])
    assert np.asarray(top_scores)[2] == -np.inf


def test_level_topn_default_shape():
    scfg = SearchConfig()
    # default (eval) layout: [k_start, k per level start-1..0, k_final]
    np.testing.assert_array_equal(level_topn_default(scfg),
                                  [100, 200, 400, 200])
    # exported-graph (serving) layout keeps the reference runmeta shape
    # (gen_runmeta.py:24)
    np.testing.assert_array_equal(level_topn_default(scfg, "serving"),
                                  [100, 200, 400, 400, 400, 200])


# ------------------------------------------------------- integration fixture


@pytest.fixture(scope="module")
def trained():
    """Train a small scorer on clustered synthetic data, extract embeddings,
    build the index."""
    num_item, num_cate = 2000, 40
    mcfg = ModelConfig(num_item=num_item, num_cate=num_cate, emb_dim=16,
                       max_seq_length=12, item_tower_dims=(32, 32, 32),
                       head_dims=(64, 32, 16, 1))
    tcfg = TrainConfig(batch_size=64, num_neg=24, learning_rate=2e-3,
                       adv_eps=1e-4, train_epochs=30)
    train, test, feats = synthetic_dataset(
        num_item=num_item, num_cate=num_cate, num_users=400,
        max_seq_length=12, samples_per_user=4)

    featsj = {k: jnp.asarray(v) for k, v in feats.items()}
    state, tx = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, tx, featsj)
    it = BatchIterator(train, tcfg.batch_size, epochs=tcfg.train_epochs, seed=0)
    for i, batch in enumerate(it):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        if i >= 150:
            break

    item_ids, item_embs = extract_item_embeddings(state.params, state.bn_state,
                                                  mcfg, feats)
    return mcfg, state, test, feats, item_ids, item_embs


def test_brute_force_oracle_matches_direct_scoring(trained):
    mcfg, state, test, feats, item_ids, item_embs = trained
    user = extract_user_embeddings(state.params,
                                   {k: test[k][:2] for k in test})
    top_idx, top_scores = brute_force_topk(
        state.params, state.bn_state, mcfg, jnp.asarray(user),
        jnp.asarray(item_embs), k=10, chunk_size=512)
    # direct dense scoring of all items for user 0
    logits, _ = scorer.scorer_forward(
        state.params, state.bn_state, mcfg, jnp.asarray(user[:1]),
        jnp.asarray(item_embs)[None], training=False)
    direct = np.asarray(logits[0])
    expect = np.argsort(direct)[::-1][:10]
    np.testing.assert_array_equal(np.asarray(top_idx[0]), expect)
    np.testing.assert_allclose(np.asarray(top_scores[0]), direct[expect],
                               rtol=1e-5)


@pytest.fixture(scope="module")
def search_setup(trained, tmp_path_factory):
    mcfg, state, test, feats, item_ids, item_embs = trained
    index_dir = tmp_path_factory.mktemp("index")
    build_and_save_index(item_embs, start_level=2, num_neighbors=16,
                         output_dir=str(index_dir), ef_construction=80)
    art = load_index(str(index_dir), start_level=2, max_degree=32)
    sidx = SearchIndex.from_artifacts(art, item_embs, item_ids)
    scfg = SearchConfig(top_k_per_level=(100, 50, 25), topk_eval=(100,),
                        frontier_cap=1024)
    return mcfg, state, test, sidx, scfg


def test_search_no_duplicate_results(search_setup):
    mcfg, state, test, sidx, scfg = search_setup
    search = make_searcher(mcfg, scfg)
    user = extract_user_embeddings(state.params, {k: test[k][:1] for k in test})
    ltn = jnp.asarray(level_topn_default(scfg))
    top_items, top_scores, num_scoring = jax.jit(search)(
        state.params, state.bn_state, sidx, jnp.asarray(user[0]), ltn)
    items = np.asarray(top_items)
    valid = items[items >= 0]
    assert len(valid) > 0
    assert len(np.unique(valid)) == len(valid), "duplicate items in results"
    # scores sorted descending over valid prefix
    s = np.asarray(top_scores)[items >= 0]
    assert np.all(np.diff(s) <= 1e-6)


def test_search_respects_runtime_level_topn(search_setup):
    mcfg, state, test, sidx, scfg = search_setup
    search = jax.jit(make_searcher(mcfg, scfg))
    user = extract_user_embeddings(state.params, {k: test[k][:1] for k in test})
    ltn = np.asarray(level_topn_default(scfg))
    small = ltn.copy()
    small[-1] = 7
    top_items, _, _ = search(state.params, state.bn_state, sidx,
                             jnp.asarray(user[0]), jnp.asarray(small))
    items = np.asarray(top_items)
    assert (items >= 0).sum() == 7


def test_search_num_scoring_reported(search_setup):
    mcfg, state, test, sidx, scfg = search_setup
    search = jax.jit(make_searcher(mcfg, scfg))
    user = extract_user_embeddings(state.params, {k: test[k][:1] for k in test})
    ltn = jnp.asarray(level_topn_default(scfg))
    _, _, num_scoring = search(state.params, state.bn_state, sidx,
                               jnp.asarray(user[0]), ltn)
    ns = np.asarray(num_scoring)
    assert ns.shape == (5,)          # ep + 1 (level1) + 3 (level0)
    assert ns[0] == sidx.enter_points.shape[0]
    assert np.all(ns[1:] > 0)


def test_recall_parity_vs_brute_force(search_setup):
    """The north-star harness: graph search recall@k against the brute-force
    oracle on the same checkpoint (reference main.py:144-237)."""
    mcfg, state, test, sidx, scfg = search_setup
    search = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                              in_axes=(None, None, None, 0, None)))
    n_users = 16
    user = extract_user_embeddings(state.params,
                                   {k: test[k][:n_users] for k in test})
    ltn = jnp.asarray(level_topn_default(scfg))

    top_items, _, num_scoring = search(state.params, state.bn_state, sidx,
                                       jnp.asarray(user), ltn)
    bf_idx, _ = brute_force_topk(state.params, state.bn_state, mcfg,
                                 jnp.asarray(user), sidx.item_embs,
                                 k=100, chunk_size=512)
    bf_items = np.asarray(sidx.item_ids)[np.asarray(bf_idx)]

    recalls = []
    for u in range(n_users):
        got = set(np.asarray(top_items[u])[np.asarray(top_items[u]) >= 0].tolist())
        want = set(bf_items[u].tolist())
        recalls.append(len(got & want) / len(want))
    mean_recall = float(np.mean(recalls))
    mean_scored = float(np.asarray(num_scoring).sum(-1).mean())
    # scoring a fraction of the corpus must recover most of the true top-100
    assert mean_scored < 2000 * 1.5  # sanity: bounded work
    assert mean_recall > 0.75, (mean_recall, mean_scored)


def test_search_batched_matches_single(search_setup):
    mcfg, state, test, sidx, scfg = search_setup
    searcher = make_searcher(mcfg, scfg)
    search1 = jax.jit(searcher)
    searchB = jax.jit(jax.vmap(searcher, in_axes=(None, None, None, 0, None)))
    user = extract_user_embeddings(state.params, {k: test[k][:3] for k in test})
    ltn = jnp.asarray(level_topn_default(scfg))
    outB, _, _ = searchB(state.params, state.bn_state, sidx,
                         jnp.asarray(user), ltn)
    out0, _, _ = search1(state.params, state.bn_state, sidx,
                         jnp.asarray(user[1]), ltn)
    np.testing.assert_array_equal(np.asarray(outB[1]), np.asarray(out0))


def test_wide_hop_mode_contract_and_overlap(search_setup):
    """hop_mode="wide" (score-everything, select-by-score) must keep the
    output contract (unique, sorted, runtime-k masked) and retrieve nearly
    the same set as the filtered reference mode — at a tiny corpus every
    mode converges on the same top items."""
    import dataclasses

    mcfg, state, test, sidx, scfg = search_setup
    params = state.params
    state_bn = state.bn_state
    ltnv = jnp.asarray(level_topn_default(scfg))
    base = jax.jit(make_searcher(mcfg, scfg))
    wide = jax.jit(make_searcher(
        mcfg, dataclasses.replace(scfg, hop_mode="wide")))
    rng = np.random.default_rng(11)
    for _ in range(3):
        user = jnp.asarray(rng.standard_normal(
            (mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
        bi, bs, _ = base(params, state_bn, sidx, user, ltnv)
        wi, ws, _ = wide(params, state_bn, sidx, user, ltnv)
        wi, ws = np.asarray(wi), np.asarray(ws)
        got = wi[wi >= 0]
        assert len(got) > 0
        assert len(np.unique(got)) == len(got)
        assert np.all(np.diff(ws[wi >= 0]) <= 1e-6)
        bset = set(np.asarray(bi)[np.asarray(bi) >= 0].tolist())
        overlap = len(bset & set(got.tolist())) / max(len(bset), 1)
        assert overlap >= 0.9, overlap


def test_approx_topk_impl_contract(search_setup):
    """topk_impl="approx" keeps the result contract; on CPU approx_max_k
    falls back to exact so results match the default bit-for-bit."""
    import dataclasses

    mcfg, state, test, sidx, scfg = search_setup
    params = state.params
    state_bn = state.bn_state
    ltnv = jnp.asarray(level_topn_default(scfg))
    base = jax.jit(make_searcher(mcfg, scfg))
    ap = jax.jit(make_searcher(
        mcfg, dataclasses.replace(scfg, topk_impl="approx")))
    rng = np.random.default_rng(12)
    user = jnp.asarray(rng.standard_normal(
        (mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
    bi, _, _ = base(params, state_bn, sidx, user, ltnv)
    ai, asc, _ = ap(params, state_bn, sidx, user, ltnv)
    ai = np.asarray(ai)
    got = ai[ai >= 0]
    assert len(got) > 0 and len(np.unique(got)) == len(got)
    bset = set(np.asarray(bi)[np.asarray(bi) >= 0].tolist())
    overlap = len(bset & set(got.tolist())) / max(len(bset), 1)
    assert overlap >= 0.9, overlap


def test_per_hop_frontier_caps(search_setup):
    """frontier_cap_per_hop: equal-to-scalar caps are bit-identical to the
    scalar config; a big-enough-per-hop profile (each hop's measured need)
    matches too; validate() rejects a wrong-length list."""
    import dataclasses
    mcfg, state, test, sidx, scfg = search_setup
    user = extract_user_embeddings(state.params, {k: test[k][:1] for k in test})
    ltn = jnp.asarray(level_topn_default(scfg))
    base = jax.jit(make_searcher(mcfg, scfg))
    ref_items, ref_scores, ref_ns = base(state.params, state.bn_state, sidx,
                                         jnp.asarray(user[0]), ltn)

    same = dataclasses.replace(scfg, frontier_cap_per_hop=(1024,) * 4)
    got = jax.jit(make_searcher(mcfg, same))(
        state.params, state.bn_state, sidx, jnp.asarray(user[0]), ltn)
    np.testing.assert_array_equal(np.asarray(ref_items), np.asarray(got[0]))

    # per-hop caps sized above each hop's actual expansion leave results
    # identical (truncation never engages); smaller upper-level caps are the
    # padded-work optimization this knob exists for
    ns = np.asarray(ref_ns)[1:]      # per-hop scored counts (ep excluded)
    caps = tuple(int(2 ** np.ceil(np.log2(max(c, 2) * 2))) for c in ns)
    prof = dataclasses.replace(scfg, frontier_cap_per_hop=caps)
    got2 = jax.jit(make_searcher(mcfg, prof))(
        state.params, state.bn_state, sidx, jnp.asarray(user[0]), ltn)
    items2 = np.asarray(got2[0])
    ref = np.asarray(ref_items)
    overlap = len(set(ref[ref >= 0]) & set(items2[items2 >= 0])) / max(
        (ref >= 0).sum(), 1)
    assert overlap > 0.9, overlap

    with pytest.raises(AssertionError):
        dataclasses.replace(scfg, frontier_cap_per_hop=(512,)).validate()
