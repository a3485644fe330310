"""Distributed model-scored search over a row-sharded index.

The north-star capability the reference lacks (BASELINE.json): the item
embedding table, the packed neighbor tables, and the visited buffer are
row-sharded across the mesh's "mp" axis so the index scales beyond one chip's
HBM; the scoring tower runs on every shard over 1/S of each hop's frontier.

Per hop, inside shard_map (all riding ICI):
  neighbor expansion   each shard gathers the candidate rows it owns, others
                       contribute zeros; a psum assembles the full expansion
                       (the all-to-all-style row fetch)
  visited filter       each shard tests/marks only its id range; a psum ORs
                       the per-shard visited verdicts
  scoring              embedding rows psum-gathered once, then each shard runs
                       the DNN on a 1/S slice of the frontier; scores
                       all-gathered back
  top-k / control      replicated (identical on every shard, no comm)

The search algorithm itself is search/beam.py's — only the four backend
touchpoints differ.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, SearchConfig
from .beam import _UNVISITED, ListBackend, LocalBackend, SearchIndex, \
    make_searcher


class ShardedBackend(LocalBackend):
    """Index access over row-sharded tables inside shard_map."""

    def __init__(self, axis: str, num_shards: int):
        self.axis = axis
        self.num_shards = num_shards

    # n passed everywhere is the GLOBAL item count (from replicated item_ids
    # ... except take_ids where item_ids itself is sharded; see below).

    def _my_range(self, rows_local: int):
        shard = jax.lax.axis_index(self.axis)
        lo = shard.astype(jnp.int32) * rows_local
        return lo

    def take_rows(self, table, ids, n):
        from ..parallel.collectives import _local_gather_psum
        return _local_gather_psum(table, ids, self.axis)

    def take_ids(self, item_ids, ids, n):
        # item_ids row-sharded [n/S]; same masked psum in 1-D
        rows_local = item_ids.shape[0]
        lo = self._my_range(rows_local)
        local = ids.astype(jnp.int32) - lo
        mine = (local >= 0) & (local < rows_local)
        got = jnp.take(item_ids, jnp.clip(local, 0, rows_local - 1))
        return jax.lax.psum(jnp.where(mine, got, 0), self.axis)

    def num_items(self, index) -> int:
        # item_ids is sharded here, so global n = local rows * num_shards
        return index.item_ids.shape[0] * self.num_shards

    def vis_init(self, n: int, trash: int = 1):
        n_local = n // self.num_shards
        return jnp.full((n_local + max(trash, 1),), _UNVISITED, jnp.uint8)

    def _localize(self, vis, ids, n):
        # ids this shard doesn't own (incl. the caller's global trash slots)
        # map to DISTINCT local trash slots rows_local + position, keeping
        # the scatter's unique_indices promise true (same scheme as
        # beam._pad_trash)
        rows_local = n // self.num_shards
        lo = self._my_range(rows_local)
        local = ids.astype(jnp.int32) - lo
        mine = (local >= 0) & (local < rows_local)
        pos = jnp.arange(ids.shape[0], dtype=jnp.int32)
        return jnp.where(mine, local, rows_local + pos), mine

    def vis_unvisited(self, vis, ids, epoch, n):
        local, mine = self._localize(vis, ids, n)
        visited_here = mine & (jnp.take(vis, jnp.clip(
            local, 0, vis.shape[0] - 1)) == epoch)
        visited = jax.lax.psum(visited_here.astype(jnp.int32), self.axis)
        return visited == 0

    def vis_mark_sorted(self, vis, ids, epoch, n):
        local, _mine = self._localize(vis, ids, n)
        return vis.at[local].set(epoch, unique_indices=True)

    vis_mark = vis_mark_sorted

    def run_scorer(self, score_fn, emb):
        # emb [cap, d] replicated after take_rows; each shard scores its slice
        cap = emb.shape[0]
        if cap % self.num_shards:
            pad = self.num_shards - cap % self.num_shards
            emb = jnp.pad(emb, ((0, pad), (0, 0)))
        chunk = emb.shape[0] // self.num_shards
        shard = jax.lax.axis_index(self.axis)
        my = jax.lax.dynamic_slice_in_dim(emb, shard * chunk, chunk, axis=0)
        scores = score_fn(my)
        full = jax.lax.all_gather(scores, self.axis, tiled=True)
        return full[:cap]


class ShardedListBackend(ListBackend, ShardedBackend):
    """Row-sharded index access + the sorted visited-LIST representation.

    The neighbor expansion is replicated after take_rows' psum, and the list
    filter (beam.ListBackend.dedup_filter_mark) is pure compute over it — so
    the visited state is simply replicated on every shard: no per-shard
    visited buffer, no per-hop visited psum. Per-hop communication drops to
    1 psum (row fetch) + 1 psum/all_gather (scoring); visited memory is
    O(visited) replicated instead of O(n/S) sharded. MRO: visited methods
    from ListBackend, data access from ShardedBackend."""


def shard_index(mesh: Mesh, index: SearchIndex, axis: str = "mp"
                ) -> SearchIndex:
    """Place a SearchIndex with tables (and item_ids) row-sharded over `axis`.
    Row counts must divide the axis size (pad the catalogue if needed)."""
    rowsharded = NamedSharding(mesh, P(axis, None))
    sharded1d = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())

    def put2d(x, sharding):
        # opt-in row-major per-shard pin (NANN_PIN_LAYOUT=1) — same A/B knob
        # as beam.device_row_major; the single-chip A/B measured the default
        # (XLA's own per-call staging) FASTER, so default off
        import os
        if os.environ.get("NANN_PIN_LAYOUT", "0") != "1":
            return jax.device_put(x, sharding)
        try:
            from jax.experimental.layout import Format, Layout
            fmt = Format(Layout(major_to_minor=tuple(range(x.ndim))),
                         sharding)
            return jax.device_put(x, fmt)
        except Exception:
            return jax.device_put(x, sharding)

    return SearchIndex(
        item_embs=put2d(index.item_embs, rowsharded),
        item_ids=jax.device_put(index.item_ids, sharded1d),
        enter_points=jax.device_put(index.enter_points, replicated),
        neighbors={l: put2d(v, rowsharded)
                   for l, v in index.neighbors.items()},
    )


def make_distributed_searcher(mcfg: ModelConfig, scfg: SearchConfig,
                              mesh: Mesh, axis: str = "mp",
                              batch: Optional[int] = None,
                              semantics: str = None,
                              batch_axis: Optional[str] = None):
    """Build the sharded search program.

    Returns search(params, state, sharded_index, user_seq_emb, level_topn)
    — same contract as make_searcher. With `batch`, user_seq_emb is
    [batch, L, d] and outputs carry a leading batch axis.

    batch_axis: optionally shard the QUERY batch over this mesh axis (e.g.
    "dp" across hosts) while the index stays row-sharded over `axis` (e.g.
    "mp" over ICI within a host) — the serving scale-out layout: each dp
    row serves batch/dp queries against its own copy of the mp-sharded
    index, so throughput scales with dp and index memory with mp. Requires
    `batch` divisible by the axis size.
    """
    num_shards = mesh.shape[axis]
    use_list = scfg.vis_impl == "list" and scfg.hop_mode == "filtered"
    be = (ShardedListBackend(axis, num_shards) if use_list
          else ShardedBackend(axis, num_shards))
    core = make_searcher(mcfg, scfg, backend=be, semantics=semantics)
    if batch is not None:
        core = jax.vmap(core, in_axes=(None, None, None, 0, None))
    if batch_axis is not None:
        assert batch is not None and batch % mesh.shape[batch_axis] == 0, \
            (batch, batch_axis, dict(mesh.shape))
    user_spec = P() if batch_axis is None else P(batch_axis)

    def search(params, state, index: SearchIndex, user_seq_emb, level_topn):
        specs = SearchIndex(
            item_embs=P(axis, None),
            item_ids=P(axis),
            enter_points=P(),
            neighbors={l: P(axis, None) for l in index.neighbors},
        )
        inner = jax.shard_map(
            core, mesh=mesh,
            in_specs=(P(), P(), specs, user_spec, P()),
            out_specs=(user_spec, user_spec, user_spec),
            check_vma=False,
        )
        return inner(params, state, index, user_seq_emb, level_topn)

    return search
