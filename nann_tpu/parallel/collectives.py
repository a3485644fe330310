"""Collective building blocks for the row-sharded index.

The reference has no cross-device communication at serving time (share-nothing
virtual GPUs, SURVEY.md §2.6); the TPU build adds it to scale the index beyond
one chip's HBM. The primitive is `sharded_gather`: fetch arbitrary rows from a
row-sharded table. Inside shard_map, each shard gathers the rows it owns
(others masked to zero) and a psum over "mp" assembles the full result — the
all-to-all-style embedding fetch riding ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_gather_psum(table_local: jnp.ndarray, ids: jnp.ndarray,
                       axis_name: str) -> jnp.ndarray:
    """Per-shard body: gather owned rows, zero others, psum-assemble."""
    shard = jax.lax.axis_index(axis_name)
    rows_per_shard = table_local.shape[0]
    lo = shard.astype(jnp.int32) * rows_per_shard
    local = ids.astype(jnp.int32) - lo
    mine = (local >= 0) & (local < rows_per_shard)
    got = jnp.take(table_local, jnp.clip(local, 0, rows_per_shard - 1), axis=0)
    got = jnp.where(mine[..., None], got, 0).astype(table_local.dtype)
    return jax.lax.psum(got, axis_name)


def sharded_gather(mesh: Mesh, axis_name: str = "mp") -> Callable:
    """Build gather(table, ids) for a table sharded P(axis_name, None) and
    replicated ids; returns replicated [ids.shape + (d,)] rows.

    The table's global row count must be divisible by the axis size.
    """
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis_name, None), P()),
             out_specs=P())
    def gather(table_local, ids):
        return _local_gather_psum(table_local, ids, axis_name)

    return gather
