"""Search with the fused Pallas scorer must match the XLA-scorer search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import init_scorer
from nann_tpu.search import SearchIndex, make_searcher
from nann_tpu.search.beam import level_topn_default


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    mcfg = ModelConfig(num_item=1500, num_cate=20, emb_dim=32,
                       max_seq_length=20)
    scfg = SearchConfig(top_k_per_level=(64, 32, 16), topk_eval=(64,),
                        frontier_cap=512)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((1500, 64)).astype(np.float32)
    d = tmp_path_factory.mktemp("pidx")
    build_and_save_index(embs, 2, 8, str(d), ef_construction=40)
    art = load_index(str(d), 2, max_degree=16)
    sidx = SearchIndex.from_artifacts(art, embs,
                                      np.arange(1, 1501, dtype=np.int32))
    user = jnp.asarray(rng.standard_normal((20, 64)).astype(np.float32))
    return mcfg, scfg, params, state, sidx, user


def test_pallas_search_vmapped(setup):
    """The pallas-scorer search must batch under vmap (pallas batching rule)."""
    mcfg, scfg, params, state, sidx, user = setup
    ltn = jnp.asarray(level_topn_default(scfg))
    searcher = make_searcher(mcfg, scfg, use_pallas_scorer=True,
                             pallas_tile=128, pallas_interpret=True)
    users = jnp.stack([user, user * 0.5])
    out = jax.jit(jax.vmap(searcher, in_axes=(None, None, None, 0, None)))(
        params, state, sidx, users, ltn)
    single = jax.jit(searcher)(params, state, sidx, user, ltn)
    np.testing.assert_array_equal(np.asarray(out[0][0]),
                                  np.asarray(single[0]))


def test_pallas_search_matches_xla_search(setup):
    mcfg, scfg, params, state, sidx, user = setup
    ltn = jnp.asarray(level_topn_default(scfg))
    xla = jax.jit(make_searcher(mcfg, scfg))(params, state, sidx, user, ltn)
    pal = jax.jit(make_searcher(mcfg, scfg, use_pallas_scorer=True,
                                pallas_tile=128, pallas_interpret=True))(
        params, state, sidx, user, ltn)
    # scores in fp32 compute differ only by fold/precompute rounding; the
    # retrieved sets must agree except possibly at ties near the boundary
    a, b = np.asarray(xla[0]), np.asarray(pal[0])
    overlap = len(set(a[a >= 0]) & set(b[b >= 0])) / max((a >= 0).sum(), 1)
    assert overlap > 0.95, overlap
    np.testing.assert_allclose(np.asarray(xla[1]), np.asarray(pal[1]),
                               rtol=2e-3, atol=2e-3)
