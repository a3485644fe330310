"""Sharding rules for the scorer params, search index, and data batches.

Policy (north-star layout, BASELINE.json):
  * embedding tables (`ht_item`, `ht_cate`) — row-sharded over "mp": they are
    the only O(num_items) training state,
  * all tower/attention/head weights — replicated (tiny; data-parallel compute),
  * search index (`item_embs`, `neighbors`, per level) — row-sharded over "mp",
  * batches — sharded over "dp" on the leading axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.layers import Params


def param_shardings(mesh: Mesh, params: Params) -> Any:
    """NamedSharding pytree for scorer params: tables row-sharded on "mp"."""
    replicated = NamedSharding(mesh, P())
    rowsharded = NamedSharding(mesh, P("mp", None))

    def rule(path, leaf):
        name = path[0].key if path else ""
        if name in ("ht_item", "ht_cate"):
            return rowsharded
        return replicated

    return jax.tree_util.tree_map_with_path(rule, params)


def index_shardings(mesh: Mesh, index: Any) -> Any:
    """NamedSharding pytree for a SearchIndex: big row tables sharded on "mp",
    small arrays (enter points, ids) replicated."""
    replicated = NamedSharding(mesh, P())
    rowsharded = NamedSharding(mesh, P("mp", None))
    return type(index)(
        item_embs=rowsharded,
        item_ids=replicated,
        enter_points=replicated,
        neighbors={l: rowsharded for l in index.neighbors},
    )


def batch_shardings(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Batch dict sharded over "dp" on the leading axis."""
    return {k: NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1))))
            for k, v in batch.items()}


def shard_pytree(tree: Any, shardings: Any) -> Any:
    """device_put a pytree according to a matching sharding pytree."""
    return jax.tree.map(jax.device_put, tree, shardings)


def train_state_shardings(mesh: Mesh, state: Any) -> Any:
    """NamedSharding pytree for a full TrainState (params + bn state +
    optimizer state + step): every leaf whose path passes through an
    embedding-table key is row-sharded on "mp" (this covers the AdamW mu/nu
    moments, whose subtrees mirror the params), everything else replicated."""
    replicated = NamedSharding(mesh, P())
    rowsharded = NamedSharding(mesh, P("mp", None))

    def rule(path, leaf):
        keys = {p.key for p in path if hasattr(p, "key")}
        if ("ht_item" in keys or "ht_cate" in keys) and getattr(
                leaf, "ndim", 0) == 2:
            return rowsharded
        return replicated

    return jax.tree_util.tree_map_with_path(rule, state)
