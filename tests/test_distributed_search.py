"""Distributed (row-sharded) search must match the single-device search
exactly — the virtual-device parity harness for the mp axis."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import init_scorer
from nann_tpu.parallel import make_mesh
from nann_tpu.search import SearchIndex, make_searcher
from nann_tpu.search.beam import level_topn_default
from nann_tpu.search.distributed import (make_distributed_searcher,
                                         shard_index)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    num_item = 1024   # divisible by 8 shards
    mcfg = ModelConfig(num_item=num_item, num_cate=16, emb_dim=8,
                       max_seq_length=6, item_tower_dims=(16, 16, 16),
                       head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(64, 32, 16), topk_eval=(64,),
                        frontier_cap=512)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    item_embs = rng.standard_normal((num_item, mcfg.item_emb_dim)).astype(
        np.float32)
    item_ids = np.arange(1, num_item + 1, dtype=np.int32)
    d = tmp_path_factory.mktemp("didx")
    build_and_save_index(item_embs, 2, 8, str(d), ef_construction=40)
    art = load_index(str(d), 2, max_degree=16)
    sidx = SearchIndex.from_artifacts(art, item_embs, item_ids)
    user = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    return mcfg, scfg, params, state, sidx, user


@pytest.mark.parametrize("vis_impl", ["list", "bytemap"])
def test_distributed_matches_local(setup, vis_impl):
    # "list" = replicated visited list (ShardedListBackend, no visited psum);
    # "bytemap" = row-sharded visited buffer (ShardedBackend)
    mcfg, scfg, params, state, sidx, user = setup
    scfg = dataclasses.replace(scfg, vis_impl=vis_impl)
    mesh = make_mesh(dp=1, mp=8)
    ltn = jnp.asarray(level_topn_default(scfg))

    local = jax.jit(make_searcher(mcfg, scfg))(
        params, state, sidx, user, ltn)
    dist_search = make_distributed_searcher(mcfg, scfg, mesh)
    dist = jax.jit(dist_search)(
        params, state, shard_index(mesh, sidx), user, ltn)

    np.testing.assert_array_equal(np.asarray(local[0]), np.asarray(dist[0]))
    np.testing.assert_allclose(np.asarray(local[1]), np.asarray(dist[1]),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(local[2]), np.asarray(dist[2]))


def test_distributed_batched(setup):
    mcfg, scfg, params, state, sidx, user = setup
    mesh = make_mesh(dp=1, mp=8)
    ltn = jnp.asarray(level_topn_default(scfg))
    rng = np.random.default_rng(5)
    users = jnp.asarray(rng.standard_normal((4, 6, 16)).astype(np.float32))

    local = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                             in_axes=(None, None, None, 0, None)))(
        params, state, sidx, users, ltn)
    dist_search = make_distributed_searcher(mcfg, scfg, mesh, batch=4)
    dist = jax.jit(dist_search)(
        params, state, shard_index(mesh, sidx), users, ltn)
    np.testing.assert_array_equal(np.asarray(local[0]), np.asarray(dist[0]))


def test_distributed_int8_index(setup, tmp_path_factory):
    """Row-sharded quantized index: int8 rows psum-gathered then dequantized
    must match the local int8 search exactly."""
    mcfg, scfg, params, state, sidx, user = setup
    import numpy as _np
    from nann_tpu.index import load_index as _load
    # rebuild an int8 SearchIndex from the same artifacts
    embs32 = _np.asarray(sidx.item_embs, _np.float32)
    art_dir = tmp_path_factory.mktemp("d8idx")
    from nann_tpu.index import build_and_save_index as _build
    _build(embs32, 2, 8, str(art_dir), ef_construction=40)
    art = _load(str(art_dir), 2, max_degree=16)
    s8 = SearchIndex.from_artifacts(art, embs32,
                                    _np.asarray(sidx.item_ids), dtype="int8")
    mesh = make_mesh(dp=1, mp=8)
    ltn = jnp.asarray(level_topn_default(scfg))
    local = jax.jit(make_searcher(mcfg, scfg))(params, state, s8, user, ltn)
    dist = jax.jit(make_distributed_searcher(mcfg, scfg, mesh))(
        params, state, shard_index(mesh, s8), user, ltn)
    np.testing.assert_array_equal(np.asarray(local[0]), np.asarray(dist[0]))


def test_distributed_eval_semantics(setup):
    """Eval-graph semantics must also match under row sharding."""
    mcfg, scfg, params, state, sidx, user = setup
    mesh = make_mesh(dp=1, mp=8)
    ltn = jnp.asarray(level_topn_default(scfg, "eval"))
    local = jax.jit(make_searcher(mcfg, scfg, semantics="eval"))(
        params, state, sidx, user, ltn)
    dist = jax.jit(make_distributed_searcher(mcfg, scfg, mesh,
                                             semantics="eval"))(
        params, state, shard_index(mesh, sidx), user, ltn)
    np.testing.assert_array_equal(np.asarray(local[0]), np.asarray(dist[0]))


def test_distributed_mp2_with_dp_axis_present(setup):
    """mp=2 on a mesh that also has a dp axis (the serving-pool layout)."""
    mcfg, scfg, params, state, sidx, user = setup
    mesh = make_mesh(dp=4, mp=2)
    ltn = jnp.asarray(level_topn_default(scfg))
    local = jax.jit(make_searcher(mcfg, scfg))(params, state, sidx, user, ltn)
    dist = jax.jit(make_distributed_searcher(mcfg, scfg, mesh))(
        params, state, shard_index(mesh, sidx), user, ltn)
    np.testing.assert_array_equal(np.asarray(local[0]), np.asarray(dist[0]))
