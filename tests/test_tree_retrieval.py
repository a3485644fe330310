"""TDM tree build + top-down DNN beam search tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig
from nann_tpu.index.tree_build import build_tree, load_tree, save_tree
from nann_tpu.models import init_scorer
from nann_tpu.search import brute_force_topk
from nann_tpu.search.tree import DeviceTree, make_tree_searcher


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((16, 16)) * 4
    embs = (centers[rng.integers(0, 16, 1000)] +
            rng.standard_normal((1000, 16))).astype(np.float32)
    tree = build_tree(embs, branch=8)
    return embs, tree


def test_tree_structure(setup):
    embs, tree = setup
    n = len(embs)
    # every item appears exactly once as a leaf
    assert sorted(tree.leaf_item_idx.tolist()) == list(range(n))
    # children partition the next level
    for l, ch in enumerate(tree.children):
        flat = ch[ch >= 0]
        n_next = tree.node_embs[l + 1].shape[0]
        assert sorted(flat.tolist()) == list(range(n_next))
    # node embeddings are subtree means: check root
    np.testing.assert_allclose(tree.node_embs[0][0], embs.mean(0), rtol=1e-4)


def test_tree_roundtrip(tmp_path, setup):
    embs, tree = setup
    save_tree(tree, str(tmp_path))
    loaded = load_tree(str(tmp_path))
    assert loaded.num_levels == tree.num_levels
    np.testing.assert_array_equal(loaded.leaf_item_idx, tree.leaf_item_idx)
    np.testing.assert_array_equal(loaded.children[0], tree.children[0])


def test_tree_search_recall_vs_brute_force(setup):
    embs, tree = setup
    mcfg = ModelConfig(num_item=1000, num_cate=10, emb_dim=8,
                       max_seq_length=6, item_tower_dims=(16, 16, 16),
                       head_dims=(16, 8, 8, 1))
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    item_ids = np.arange(1, 1001, dtype=np.int32)
    dtree = DeviceTree.from_tree(tree, item_ids)

    search = jax.jit(make_tree_searcher(mcfg, beam_width=128, topk=32))
    rng = np.random.default_rng(4)
    hits = total = 0
    for q in range(4):
        user = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
        items, scores = search(params, state, dtree, user)
        got = np.asarray(items)
        got = got[got >= 0]
        assert len(np.unique(got)) == len(got)
        s = np.asarray(scores)[np.asarray(scores) > -np.inf]
        assert np.all(np.diff(s) <= 1e-6)

        bf_idx, _ = brute_force_topk(params, state, mcfg, user[None],
                                     jnp.asarray(embs), k=32, chunk_size=256)
        want = item_ids[np.asarray(bf_idx[0])]
        hits += len(set(got.tolist()) & set(want.tolist()))
        total += len(want)
    # beam search under an arbitrary DNN offers no guarantee, but with a wide
    # beam on clustered data it must beat random (32/1000) by a wide margin
    assert hits / total > 0.3, hits / total
