"""Mesh / sharding / collectives tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nann_tpu.config import ModelConfig
from nann_tpu.models import init_scorer
from nann_tpu.parallel import (index_shardings, make_mesh, param_shardings,
                               shard_pytree, sharded_gather)


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}
    mesh = make_mesh(mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=8, mp=2)


def test_param_shardings_rules():
    mesh = make_mesh(dp=2, mp=4)
    mcfg = ModelConfig(num_item=64, num_cate=8, emb_dim=8, max_seq_length=4,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    params, _ = init_scorer(jax.random.PRNGKey(0), mcfg)
    sh = param_shardings(mesh, params)
    assert sh["ht_item"].spec == P("mp", None)
    assert sh["ht_cate"].spec == P("mp", None)
    assert sh["att"]["q1"]["kernel"].spec == P()

    # placement actually works (row counts here divide mp=4... 65 rows don't,
    # so use a divisible table for the placement check)
    params["ht_item"] = jnp.ones((64, 8))
    params["ht_cate"] = jnp.ones((8, 8))
    placed = shard_pytree(params, sh)
    assert placed["ht_item"].sharding.spec == P("mp", None)


def test_sharded_gather_matches_dense():
    mesh = make_mesh(dp=2, mp=4)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, (37,)), jnp.int32)

    table_sharded = jax.device_put(table, NamedSharding(mesh, P("mp", None)))
    gather = jax.jit(sharded_gather(mesh))
    out = gather(table_sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[np.asarray(ids)],
                               rtol=1e-6)


def test_sharded_gather_2d_ids():
    mesh = make_mesh(dp=1, mp=8)
    table = jnp.arange(32 * 4, dtype=jnp.float32).reshape(32, 4)
    ids = jnp.asarray([[0, 31], [5, 16]], jnp.int32)
    table_sharded = jax.device_put(table, NamedSharding(mesh, P("mp", None)))
    out = sharded_gather(mesh)(table_sharded, ids)
    assert out.shape == (2, 2, 4)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table)[np.asarray(ids)])
