"""Model-scored HNSW beam search as ONE fused XLA program.

This is the serving compute path — the TPU-native re-design of the reference's
two-graph architecture (outer CPU graph with custom ops + inner bucketed
BlazeXlaOp scorer, NANN_impls/nann/delivery/build_opt_graph.py:69-149). The
reference pays a host/device round trip and a pad-to-bucket per hop; here the
entire multi-level search — neighbor expansion, visited filtering, DNN scoring,
top-k merging — is a single jitted program with static shapes, so one
compilation covers every request and nothing leaves the chip.

How each reference mechanism maps:

  BlazeXlaOp + 75 warmup buckets      -> static per-hop frontier caps inside
                                         the one program (masked, no buckets)
  BitmapRefDifference (visited set)   -> sorted visited-id LIST merged with the
                                         frontier by one tagged-key sort
                                         (ListBackend, the default — random
                                         byte gather/scatter is the measured
                                         TPU bottleneck); the epoch-stamped
                                         uint8 byte-map remains as
                                         vis_impl="bytemap"
  GroupGather (ragged neighbor fetch) -> dense fixed-degree gather
                                         [cands, max_degree] (self-padded rows)
  BlazeTopK / runtime level_topn      -> lax.top_k at the static cap + masking
                                         positions >= the runtime k to -inf
  set semantics of search_level       -> per-level candidate marking + visited
                                         accumulation across hops in a level
                                         (model.py:299-337 semantics)

Request signature parity: search(user_seq_emb, level_topn) -> (top item ids,
scores, num_scoring per hop) — the `comm_seq`/`level_topn` -> `top_k` contract
of the exported exec graph, plus the reference's num_scoring efficiency metric
(main.py:155-186).

Batched queries are the same program under jax.vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SearchConfig
from ..models import scorer
from ..models.layers import Params, State

NEG_INF = jnp.float32(-jnp.inf)
_UNVISITED = np.uint8(255)


def device_row_major(x) -> jnp.ndarray:
    """device_put a table with an EXPLICIT row-major layout (OPT-IN,
    NANN_PIN_LAYOUT=1) — a measured pessimization kept for A/B.

    The TPU PJRT default layout for 2-D tables here is column-major
    (major_to_minor=(1, 0)); the compiled search program then re-stages the
    WHOLE table per invocation (async `slice-start` + `ConcatBitcast` +
    `copy {0,1}->{1,0}` chains in the HLO, 51.2 MB x2 for the level-0
    neighbors alone at 200k items). Pinning row-major at load removes those
    copies — the XLA-counted program bytes drop 2,219 -> 1,833 MB/batch
    (-17.4%) — but measured DEVICE-TRUE throughput gets WORSE: 3,981 ->
    3,530 qps at batch 16, 0.513 -> 0.647 ms single-query (same-window A/B,
    identical results). The per-call staging is an asynchronous PREFETCH
    XLA overlaps with compute, and gathers from the staged (VMEM-scoped /
    freshly-packed) tables are faster than HBM-resident row-major gathers.
    Cost-model bytes mislead when the copies are async — see docs/DESIGN.md
    forensics IV. Default is therefore OFF.
    """
    import os
    x = np.asarray(x) if not isinstance(x, jnp.ndarray) else x
    if x.ndim < 2 or os.environ.get("NANN_PIN_LAYOUT", "0") != "1":
        return jnp.asarray(x)
    try:
        if jax.process_count() > 1:
            # pinning commits the array to one local device, which a
            # multi-process program can't mix with globally-placed arrays;
            # multihost consumers re-place via shard_index (which pins the
            # per-shard layout itself)
            return jnp.asarray(x)
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
        fmt = Format(Layout(major_to_minor=tuple(range(x.ndim))),
                     SingleDeviceSharding(jax.devices()[0]))
        return jax.device_put(x, fmt)
    except Exception:  # backends without layout control (e.g. some CPU paths)
        return jnp.asarray(x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SearchIndex:
    """Device-resident retrieval state (a pytree, so it can be donated /
    sharded / hot-swapped as a unit)."""

    item_embs: jnp.ndarray           # [N, d_item]
    item_ids: jnp.ndarray            # [N] external item ids
    enter_points: jnp.ndarray        # [n_ep] int32 node indices
    neighbors: Dict[int, jnp.ndarray]  # level -> [N, deg_l] int32, self-padded

    @property
    def num_items(self) -> int:
        return self.item_embs.shape[0]

    @staticmethod
    def from_artifacts(art, item_embs: np.ndarray, item_ids: np.ndarray,
                       dtype=jnp.float32, reorder: str = None
                       ) -> "SearchIndex":
        """dtype "int8" packs embeddings as symmetric per-row int8 + scale
        (index/quantize.py) — halves index memory; the frontier is
        dequantized after each gather.

        reorder="bfs" relabels nodes in breadth-first order from the enter
        points (index/reorder.py) so each hop's HBM gathers hit nearby rows;
        results are identical in item-id space."""
        enter, neigh = art.enter_points, art.neighbors
        item_embs = np.asarray(item_embs)
        item_ids = np.asarray(item_ids)
        if reorder == "bfs":
            from ..index.reorder import bfs_order, relabel
            order = bfs_order(neigh[0], enter, item_embs.shape[0])
            enter, neigh, item_embs, item_ids = relabel(
                enter, neigh, item_embs, item_ids, order)
        if dtype in ("int8", jnp.int8):
            from ..index.quantize import pack_quantized
            embs = device_row_major(pack_quantized(item_embs))
        else:
            embs = device_row_major(np.asarray(item_embs, dtype))
        return SearchIndex(
            item_embs=embs,
            item_ids=jnp.asarray(item_ids.astype(np.int32)),
            enter_points=jnp.asarray(enter),
            neighbors={l: device_row_major(v) for l, v in neigh.items()},
        )


def level_topn_default(scfg: SearchConfig, semantics: str = None
                       ) -> np.ndarray:
    """The default runtime search budget.

    serving layout (the exported graph's level_topn input):
        [k_start, k per level start-1..1, k per level-0 hop, k_final]
    eval layout (reference test-job knobs, one k per level):
        [k_start, k per level start-1..0, k_final]
    """
    semantics = semantics or scfg.semantics
    ks = [scfg.top_k_per_level[scfg.hnsw_start_level]]
    if semantics == "serving":
        for level in range(scfg.hnsw_start_level - 1, 0, -1):
            ks.append(scfg.top_k_per_level[level])
        ks.extend([scfg.top_k_per_level[0]] * scfg.num_scoring_per_level[0])
    else:
        for level in range(scfg.hnsw_start_level - 1, -1, -1):
            ks.append(scfg.top_k_per_level[level])
    ks.append(max(scfg.topk_eval))
    return np.asarray(ks, np.int32)


def _pad_trash(ids: jnp.ndarray, valid: jnp.ndarray, n) -> jnp.ndarray:
    """Scatter-index padding for visited marking: masked positions map to
    DISTINCT trash slots past the catalogue (n + position), so the
    unique_indices=True promise on the scatter is actually true. A shared
    sentinel here (the old scheme) made XLA's uniqueness/sortedness hints
    lies — defined behavior only by accident of current backends."""
    pos = jnp.arange(ids.shape[0], dtype=ids.dtype)
    return jnp.where(valid, ids, n + pos)


def _masked_topk(ids: jnp.ndarray, scores: jnp.ndarray, k_static: int,
                 k_runtime: jnp.ndarray, sentinel: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape top-k with the runtime budget applied as a mask
    (runtime-k semantics of tf.math.top_k(level_topn[i]))."""
    k_static = min(k_static, ids.shape[0])
    top_scores, idx = jax.lax.top_k(scores, k_static)
    top_ids = jnp.take(ids, idx)
    pos = jnp.arange(k_static)
    live = pos < k_runtime
    return (jnp.where(live, top_ids, sentinel),
            jnp.where(live, top_scores, NEG_INF))


def _select_fresh(key: jnp.ndarray, imax, salt, f_cap: int, n: int,
                  topk_impl: str
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compaction to the scoring cap: kept (salted) keys to the front by
    value-sort. When unique fresh nodes exceed f_cap, selecting ascending ids
    would systematically favor low catalogue ids, so keys are an XOR-mixed
    bijection of the id (per-hop salt) — an unbiased pseudo-random
    truncation; ids are recovered by the inverse XOR.

    Returns (fresh ids [f_cap], fresh_valid [f_cap], sel [key.shape]) where
    sel marks EXACTLY the selected positions of `key` — mark_policy="scored"
    marks this set, and it must equal the scored set even under approx_min_k
    (a threshold would over-mark there and could strip a scored node's mark,
    letting it be re-scored into a duplicate result)."""
    if topk_impl == "approx" and key.shape[0] > f_cap:
        # TPU-native partial reduce instead of a second full sort; f32
        # key rounding only perturbs which fresh nodes the (already
        # pseudo-random) truncation picks
        _kv, ki = jax.lax.approx_min_k(key.astype(jnp.float32), f_cap)
        fresh_key = jnp.take(key, ki)
        fresh_valid = fresh_key != imax
        sel = jnp.zeros(key.shape, bool).at[ki].set(fresh_valid)
    elif topk_impl == "topk" and key.shape[0] > f_cap:
        # partial selection via TopK on negated keys (exact: real keys are
        # an XOR bijection of unique ids, so they are distinct and the
        # threshold rule reproduces the selected set precisely)
        fresh_key = -jax.lax.top_k(-key, f_cap)[0]
        fresh_valid = fresh_key != imax
        thr = jnp.max(jnp.where(fresh_valid, fresh_key, -1))
        sel = (key != imax) & (key <= thr)
    else:
        fresh_key = jnp.sort(key)[:f_cap]
        fresh_valid = fresh_key != imax
        thr = jnp.max(jnp.where(fresh_valid, fresh_key, -1))
        sel = (key != imax) & (key <= thr)
    fresh = jnp.where(fresh_valid, fresh_key ^ salt, n)
    return fresh, fresh_valid, sel


def filter_expand(be, neighbors_l: jnp.ndarray, vis: jnp.ndarray, epoch,
                  cand_ids: jnp.ndarray, cand_scores: jnp.ndarray,
                  f_cap: int, n: int, salt: jnp.ndarray,
                  topk_impl: str = "exact", mark_policy: str = "all",
                  mark_ids: jnp.ndarray = None, mark_valid: jnp.ndarray = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The filter half of one hop: neighbor expansion -> in-frontier dedup ->
    visited test-and-mark -> unbiased compaction to f_cap.

    Module-level so the staged executor (search/staged.py) can compile it as
    its own XLA program; the fused path (expand_filter_score) calls it too.
    salt is traced (not static) so hops share compilations. Optionally marks
    mark_ids visited first (the level-entry marking, model.py:312).
    Returns (fresh ids [f_cap], fresh_valid [f_cap], vis, num_fresh)."""
    sentinel = n
    if mark_ids is not None:
        vis = be.vis_reset_mark(vis, mark_ids, mark_valid, epoch, n)
    valid_cand = cand_scores > NEG_INF
    nb = be.take_rows(neighbors_l, cand_ids, n)
    nb = jnp.where(valid_cand[:, None], nb, sentinel).reshape(-1)
    f_cap = min(f_cap, nb.shape[0])
    return be.dedup_filter_mark(vis, nb, epoch, n, salt, f_cap, topk_impl,
                                mark_policy)


class LocalBackend:
    """Single-device index access: plain gathers and a full visited buffer.

    The distributed variant (search/distributed.py ShardedBackend) swaps these
    four touchpoints for collective versions over a row-sharded index; the
    search algorithm itself is shared.
    """

    def num_items(self, index) -> int:
        return index.item_ids.shape[0]

    def take_rows(self, table: jnp.ndarray, ids: jnp.ndarray, n: int
                  ) -> jnp.ndarray:
        return jnp.take(table, jnp.clip(ids, 0, table.shape[0] - 1), axis=0)

    def take_ids(self, item_ids: jnp.ndarray, ids: jnp.ndarray, n: int
                 ) -> jnp.ndarray:
        return jnp.take(item_ids, jnp.clip(ids, 0, n - 1))

    def vis_init(self, n: int, trash: int = 1) -> jnp.ndarray:
        # [0, n) = catalogue slots; [n, n+trash) = distinct trash slots for
        # masked scatter positions (see _pad_trash)
        return jnp.full((n + max(trash, 1),), _UNVISITED, jnp.uint8)

    def vis_unvisited(self, vis: jnp.ndarray, ids: jnp.ndarray, epoch,
                      n: int) -> jnp.ndarray:
        return jnp.take(vis, jnp.clip(ids, 0, n)) != epoch

    def vis_mark_sorted(self, vis: jnp.ndarray, ids: jnp.ndarray, epoch,
                        n: int) -> jnp.ndarray:
        # kept ids sorted+unique, masked positions _pad_trash'd to distinct
        # slots — unique_indices lets XLA emit a vectorized scatter instead
        # of a serial loop (a 16x regression without it)
        return vis.at[ids].set(epoch, unique_indices=True)

    def vis_mark(self, vis: jnp.ndarray, ids: jnp.ndarray, epoch,
                 n: int) -> jnp.ndarray:
        return vis.at[ids].set(epoch, unique_indices=True)

    def vis_reset_mark(self, vis: jnp.ndarray, ids: jnp.ndarray,
                       valid: jnp.ndarray, epoch, n: int) -> jnp.ndarray:
        """Level entry: visited starts as this level's candidate set
        (model.py:312). For the epoch-stamped map the new epoch IS the reset;
        only the marks are written."""
        return self.vis_mark(vis, _pad_trash(ids, valid, n), epoch, n)

    def dedup_filter_mark(self, vis: jnp.ndarray, nb: jnp.ndarray, epoch,
                          n: int, salt: jnp.ndarray, f_cap: int,
                          topk_impl: str, mark_policy: str = "all"):
        """In-frontier dedup -> visited test -> mark -> compaction to f_cap
        over the flattened masked expansion `nb` (invalid entries = n).
        Returns (fresh [f_cap], fresh_valid [f_cap], vis, num_fresh)."""
        nb_sorted = jnp.sort(nb)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), nb_sorted[1:] != nb_sorted[:-1]])
        unvisited = self.vis_unvisited(vis, nb_sorted, epoch, n)
        keep = first & unvisited & (nb_sorted < n)
        num_fresh = jnp.sum(keep)

        imax = jnp.int32(2**31 - 1)
        key = jnp.where(keep, nb_sorted ^ salt, imax)
        fresh, fresh_valid, sel = _select_fresh(key, imax, salt, f_cap, n,
                                                topk_impl)
        # "all": mark EVERY fresh node (reference BitmapRefDifference marks
        # all ids it returns); "scored": exactly the selected <= f_cap. Kept
        # entries are unique (first-occurrence) and masked ones get distinct
        # trash slots, so the scatter stays vectorized.
        mark = keep if mark_policy == "all" else sel
        vis = self.vis_mark_sorted(vis, _pad_trash(nb_sorted, mark, n),
                                   epoch, n)
        return fresh, fresh_valid, vis, jnp.minimum(num_fresh, f_cap)

    def run_scorer(self, score_fn, emb: jnp.ndarray) -> jnp.ndarray:
        return score_fn(emb)


class ListBackend(LocalBackend):
    """Visited set as a sorted-mergeable id LIST instead of an O(n_items)
    byte-map.

    Measured motivation (docs/DESIGN.md round-2 forensics II): the byte-map's
    random 1-byte gather (~272 us/q) + scatter (~162 us/q) are ~70% of total
    search time on TPU, while 25k-element sorts cost ~15 us. Here membership,
    in-frontier dedup and the visited-union are all computed by ONE sort over
    tagged keys (2*id + tag: even = already-visited, odd = frontier):

      sorted order places a frontier id's key directly after its visited key
      (if any), so `prev == key - 1` IS the membership test, and equal
      adjacent odd keys mark within-frontier duplicates.

    The updated visited state is the masked merge itself (ascending ids with
    pads interspersed — order is irrelevant since the next hop re-sorts), so
    its static size grows by the expansion size each hop; hops are unrolled,
    so every shape stays static. Results are bit-identical to "bytemap"
    (tests/test_vis_list.py).

    Reference analogue: bitmap_op/bitmap_ops.cc:150-258 (BitmapRefDifference)
    — same filter-and-mark contract, re-designed for a machine with fast
    sorts and slow random byte access. Memory: O(visited) per query instead
    of O(catalogue), which also removes the n_items-byte buffer from the
    1M/8M-item scaling ladder."""

    PAD = np.int32(2**31 - 1)

    def vis_init(self, n: int, trash: int = 1) -> jnp.ndarray:
        # the list starts empty; level entry (vis_reset_mark) populates it
        return jnp.full((0,), ListBackend.PAD, jnp.int32)

    def vis_reset_mark(self, vis: jnp.ndarray, ids: jnp.ndarray,
                       valid: jnp.ndarray, epoch, n: int) -> jnp.ndarray:
        # the new visited set IS the candidate list (order irrelevant)
        return jnp.where(valid, ids.astype(jnp.int32), ListBackend.PAD)

    def vis_unvisited(self, vis, ids, epoch, n):
        raise NotImplementedError(
            "ListBackend has no random-access membership; use "
            "dedup_filter_mark (hop_mode='wide' requires vis_impl='bytemap')")

    vis_mark = vis_unvisited
    vis_mark_sorted = vis_unvisited

    def dedup_filter_mark(self, vis: jnp.ndarray, nb: jnp.ndarray, epoch,
                          n: int, salt: jnp.ndarray, f_cap: int,
                          topk_impl: str, mark_policy: str = "all"):
        # tagged keys: visited ids -> 2*id (even), frontier ids -> 2*id+1
        # (odd); pads sort past every real key (requires n < 2^30, i.e.
        # catalogues up to ~1B items in int32)
        assert n < 2**30, f"ListBackend tagged keys need n < 2^30, got {n}"
        k_pad_v = jnp.int32(2**31 - 2)   # even pad (visited-side)
        imax = jnp.int32(2**31 - 1)      # odd pad (frontier-side)
        key_vis = jnp.where(vis < n, vis * 2, k_pad_v)
        key_nb = jnp.where(nb < n, nb * 2 + 1, imax)
        merged = jnp.sort(jnp.concatenate([key_vis, key_nb]))
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), merged[:-1]])
        is_nb = (merged & 1) == 1
        real = merged < k_pad_v
        first = merged != prev           # dedup: equal odd keys are adjacent
        visited = prev == merged - 1     # the even twin sorts directly before
        fresh_mask = is_nb & real & first & ~visited
        num_fresh = jnp.sum(fresh_mask)

        ids = jax.lax.shift_right_logical(merged, 1)
        key = jnp.where(fresh_mask, ids ^ salt, imax)
        fresh, fresh_valid, sel = _select_fresh(key, imax, salt, f_cap, n,
                                                topk_impl)
        # union: old visited entries + newly-marked frontier entries (visited
        # frontier ids are already present as their even twin). mark_policy
        # "scored" adds exactly the selected <= f_cap fresh nodes — and those
        # are exactly the `fresh` array, already compact, so the new list is
        # a CONCAT, not a sort: the list is unordered between hops (the next
        # merge re-sorts), so appending [vis | fresh] yields the same visited
        # SET as compact-sorting the marked merge at one full-length sort
        # less per hop (2 sorts/hop instead of 3).
        if mark_policy == "scored":
            new_vis = jnp.concatenate(
                [vis, jnp.where(fresh_valid, fresh, ListBackend.PAD)])
        else:
            new_vis = jnp.where(real & (~is_nb | fresh_mask), ids,
                                ListBackend.PAD)
        return fresh, fresh_valid, new_vis, jnp.minimum(num_fresh, f_cap)

def default_backend(scfg: SearchConfig) -> LocalBackend:
    """Pick the visited-set backend the config asks for. hop_mode='wide'
    needs random-access membership, so it always gets the byte-map."""
    if scfg.vis_impl == "list" and scfg.hop_mode == "filtered":
        return ListBackend()
    return LocalBackend()


def make_searcher(mcfg: ModelConfig, scfg: SearchConfig, *,
                  backend: LocalBackend = None,
                  scorer_impl: str = "folded",
                  semantics: str = None,
                  use_pallas_scorer: bool = False, pallas_tile: int = 1024,
                  pallas_interpret: bool = False,
                  _filter: bool = True, _score: bool = True,
                  _barrier: bool = False):
    """Build the fused search program.

    Returns search(params, state, index, user_seq_emb, level_topn):
        user_seq_emb [L, d_user] fp32, level_topn int32 vector (see
        level_topn_default) ->
        (top item ids [k_final_cap] int32 (-1 = empty slot),
         top scores   [k_final_cap] fp32,
         num_scoring  [hops] int32 — items scored per hop)

    Wrap in jax.vmap(..., in_axes=(None, None, None, 0, None)) for batches.
    """
    scfg.validate()
    semantics = semantics or scfg.semantics
    be = backend or default_backend(scfg)
    start = scfg.hnsw_start_level
    k_start_cap = scfg.top_k_per_level[start]
    hop_caps = scfg.num_scoring_per_level[0]
    k_hop_cap = scfg.top_k_per_level[0]
    k_final_cap = max(max(scfg.topk_eval), 1)

    if use_pallas_scorer:
        scorer_impl = "pallas"
    if scorer_impl in ("folded", "pallas"):
        from ..ops.scorer_kernel import (fold_scorer, precompute_user,
                                         score_frontier_reference)
        if scorer_impl == "pallas":
            # demoted experiment, kept opt-in (experimental/pallas_scorer.py)
            from ..experimental.pallas_scorer import \
                make_pallas_frontier_scorer
            pallas_score = make_pallas_frontier_scorer(
                mcfg, tile=pallas_tile, interpret=pallas_interpret)

    def score_items(params, state, user_seq_emb, ids, valid, n, item_embs):
        emb = be.take_rows(item_embs, ids, n)
        dt = jnp.dtype(mcfg.compute_dtype)
        if emb.dtype == jnp.int8:   # packed quantized rows -> dequantize
            from ..index.quantize import unpack_rows
            emb = unpack_rows(emb, mcfg.item_emb_dim, dt)

        if scorer_impl in ("folded", "pallas") and _score:
            # eval-mode BN folded to affine + user-side k-projections hoisted
            # out of the per-hop path; both are hop-invariant subgraphs XLA
            # CSEs across the search. The reference recomputes them inside
            # every BlazeXlaOp call.
            folded = fold_scorer(params, state, mcfg)
            k_proj, v = precompute_user(folded, user_seq_emb, dt=dt)

            if scorer_impl == "pallas":
                def fwd(emb_chunk):
                    F = emb_chunk.shape[0]
                    Fp = -(-F // pallas_tile) * pallas_tile
                    padded = jnp.pad(emb_chunk.astype(dt),
                                     ((0, Fp - F), (0, 0)))
                    return pallas_score(folded, k_proj, v, padded)[:F]
            else:
                def fwd(emb_chunk):
                    return score_frontier_reference(folded, k_proj, v,
                                                    emb_chunk, dt=dt)
        else:
            def fwd(emb_chunk):
                if not _score:  # benchmarking stub: isolate non-scorer cost
                    return jnp.sum(emb_chunk, -1, dtype=jnp.float32)
                logits, _ = scorer.scorer_forward(
                    params, state, mcfg, user_seq_emb[None], emb_chunk[None],
                    training=False)
                return logits[0].astype(jnp.float32)

        scores = be.run_scorer(fwd, emb)
        return jnp.where(valid, scores, NEG_INF)

    def expand_filter_score(params, state, index, user_seq_emb, vis, epoch,
                            level, cand_ids, cand_scores, f_cap, n, mix=0):
        """One hop: neighbor expansion -> dedup + visited filter -> compaction
        to f_cap -> DNN scoring. Returns (ids, scores, vis, scored_count).

        mix: static per-hop salt for the overflow-truncation shuffle."""
        sentinel = n
        # (measured: pre-sorting candidates for gather locality is neutral on
        # v5e at 200k-1M items — the working set, not the access order, is
        # what the 1M slowdown costs; keep score order)
        if not _filter:  # benchmarking stub: isolate filter cost
            valid_cand = cand_scores > NEG_INF
            nb = be.take_rows(index.neighbors[level], cand_ids, n)
            nb = jnp.where(valid_cand[:, None], nb, sentinel).reshape(-1)
            f_cap = min(f_cap, nb.shape[0])
            fresh = nb[:f_cap]
            fresh_valid = fresh < n
            fresh = jnp.where(fresh_valid, fresh, sentinel)
            scores = score_items(params, state, user_seq_emb, fresh,
                                 fresh_valid, n, index.item_embs)
            return fresh, scores, vis, jnp.sum(fresh_valid)
        salt = jnp.int32((0x1F123BB5 * (mix + 1)) & 0x3FFFFFFF
                         if n > f_cap else 0)
        fresh, fresh_valid, vis, num_fresh = filter_expand(
            be, index.neighbors[level], vis, epoch, cand_ids, cand_scores,
            f_cap, n, salt, topk_impl=scfg.topk_impl,
            mark_policy=scfg.mark_policy)

        if _barrier:
            # fusion fence: hand the scorer a clean (ids, mask) boundary so
            # XLA cannot entangle the DNN chain with the sort/scatter graph
            # (measured: without it the full program spills ~3.6GB of scorer
            # intermediates that the filter-free program keeps fused)
            fresh, fresh_valid = jax.lax.optimization_barrier(
                (fresh, fresh_valid))
        scores = score_items(params, state, user_seq_emb, fresh, fresh_valid,
                             n, index.item_embs)
        return fresh, scores, vis, num_fresh

    def expand_wide_score(params, state, index, user_seq_emb, vis, epoch,
                          level, cand_ids, cand_scores, f_cap, n, mix=0):
        """Wide hop (hop_mode="wide"): score the ENTIRE neighbor expansion
        with cross-hop-visited rows masked, then select the top sel_cap by
        score and dedup them — NO per-hop sorts over the expansion. The MXU
        scores dup/visited rows for free relative to the sort+compact cost
        this removes; the visited set (selected nodes only) still prevents
        candidate cycling. Returns the same (ids, scores, vis, count)
        contract as expand_filter_score, so the level loops are shared."""
        sentinel = n
        valid_cand = cand_scores > NEG_INF
        nb = be.take_rows(index.neighbors[level], cand_ids, n)
        nb = jnp.where(valid_cand[:, None], nb, sentinel).reshape(-1)
        in_range = nb < n
        fresh_mask = in_range & be.vis_unvisited(vis, nb, epoch, n)
        scores = score_items(params, state, user_seq_emb,
                             jnp.where(in_range, nb, sentinel), fresh_mask,
                             n, index.item_embs)

        # select the top sel_cap scoring fresh rows (2x margin over the
        # level cap absorbs within-hop duplicates crowding the window)
        sel_cap = min(2 * f_cap, nb.shape[0])
        if scfg.topk_impl == "approx" and nb.shape[0] > sel_cap:
            sel_v, sel_i = jax.lax.approx_max_k(scores, sel_cap)
        else:
            sel_v, sel_i = jax.lax.top_k(scores, sel_cap)
        sel_ids = jnp.take(nb, jnp.clip(sel_i, 0, nb.shape[0] - 1))
        sel_ids = jnp.where(sel_v > NEG_INF, sel_ids, sentinel)

        # dedup the small selection: duplicates of an id carry identical
        # scores, so keeping the first occurrence in id-sorted order is
        # exact; scatter the keep-mask back through the tiny permutation
        pos = jnp.arange(sel_cap, dtype=jnp.int32)
        sorted_ids, perm = jax.lax.sort_key_val(sel_ids, pos)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
        first = first & (sorted_ids < n)
        keep = jnp.zeros((sel_cap,), bool).at[perm].set(
            first, unique_indices=True)
        sel_ids = jnp.where(keep, sel_ids, sentinel)
        sel_v = jnp.where(keep, sel_v, NEG_INF)

        # mark the selected set visited (the wide-mode analogue of
        # BitmapRefDifference's mark-all-returned)
        vis = be.vis_mark(vis, _pad_trash(sel_ids, keep, n), epoch, n)
        # num_scoring: fresh rows the DNN actually evaluated this hop
        # (within-hop duplicates each cost a physical row here)
        return sel_ids, sel_v, vis, jnp.sum(fresh_mask)

    expand = (expand_wide_score if scfg.hop_mode == "wide"
              else expand_filter_score)

    def search_eval(params: Params, state: State, index: SearchIndex,
                    user_seq_emb: jnp.ndarray, level_topn: jnp.ndarray):
        """Eval-graph semantics (model.py search_level/retrieval:299-362):
        per level, merged top-k results; next-hop candidates = fresh nodes
        scoring >= the current k-th result."""
        n = be.num_items(index)
        sentinel = n
        max_deg = max(v.shape[1] for v in index.neighbors.values())
        max_cand = max([k_start_cap, k_final_cap] + list(scfg.top_k_per_level))
        vis = be.vis_init(n, trash=max_cand * max_deg)
        num_scoring: List[jnp.ndarray] = []

        ep = index.enter_points.astype(jnp.int32)
        ep_scores = score_items(params, state, user_seq_emb, ep,
                                jnp.ones(ep.shape, bool), n, index.item_embs)
        num_scoring.append(jnp.asarray(ep.shape[0], jnp.int32))
        res_ids, res_scores = _masked_topk(ep, ep_scores, k_start_cap,
                                           level_topn[0], sentinel)

        t = 1
        for level in range(start - 1, -1, -1):
            epoch = jnp.uint8(level)
            # visited starts as this level's enter points (model.py:312)
            vis = be.vis_reset_mark(vis, res_ids, res_scores > NEG_INF,
                                    epoch, n)
            cand_ids, cand_scores = res_ids, res_scores
            k_cap = scfg.top_k_per_level[level]
            for _ in range(scfg.num_scoring_per_level[level]):
                fresh, fscores, vis, cnt = expand(
                    params, state, index, user_seq_emb, vis, epoch, level,
                    cand_ids, cand_scores, scfg.hop_cap(len(num_scoring) - 1),
                    n, mix=len(num_scoring))
                num_scoring.append(cnt)
                res_ids, res_scores = _masked_topk(
                    jnp.concatenate([res_ids, fresh]),
                    jnp.concatenate([res_scores, fscores]),
                    k_cap, level_topn[t], sentinel)
                # candidates: fresh nodes with score >= k-th result
                # (model.py:333-334); any such node is inside the top-k
                kth = jnp.min(jnp.where(res_scores > NEG_INF, res_scores,
                                        jnp.inf))
                cand_ids, cand_scores = _masked_topk(fresh, fscores, k_cap,
                                                     level_topn[t], sentinel)
                live = cand_scores >= kth
                cand_ids = jnp.where(live, cand_ids, sentinel)
                cand_scores = jnp.where(live, cand_scores, NEG_INF)
            t += 1

        final_ids, final_scores = _masked_topk(
            res_ids, res_scores, k_final_cap, level_topn[-1], sentinel)
        valid = final_scores > NEG_INF
        top_items = jnp.where(
            valid, be.take_ids(index.item_ids, final_ids, n), -1)
        return top_items, final_scores, jnp.stack(num_scoring)

    def search(params: Params, state: State, index: SearchIndex,
               user_seq_emb: jnp.ndarray, level_topn: jnp.ndarray):
        n = be.num_items(index)
        sentinel = n
        max_deg = max(v.shape[1] for v in index.neighbors.values())
        max_cand = max([k_start_cap, k_final_cap] + list(scfg.top_k_per_level))
        vis = be.vis_init(n, trash=max_cand * max_deg)
        num_scoring: List[jnp.ndarray] = []

        # --- start level: score all enter points (model.py:339-354) ---
        ep = index.enter_points.astype(jnp.int32)
        ep_scores = score_items(params, state, user_seq_emb, ep,
                                jnp.ones(ep.shape, bool), n, index.item_embs)
        num_scoring.append(jnp.asarray(ep.shape[0], jnp.int32))
        res_ids, res_scores = _masked_topk(ep, ep_scores, k_start_cap,
                                           level_topn[0], sentinel)

        # --- intermediate levels start-1 .. 1 (one merged-topk hop each) ---
        t = 1
        cand_ids, cand_scores = res_ids, res_scores
        for level in range(start - 1, 0, -1):
            epoch = jnp.uint8(level)
            vis = be.vis_reset_mark(vis, cand_ids, cand_scores > NEG_INF,
                                    epoch, n)
            for _ in range(scfg.num_scoring_per_level[level]):
                fresh, fscores, vis, cnt = expand(
                    params, state, index, user_seq_emb, vis, epoch, level,
                    cand_ids, cand_scores, scfg.hop_cap(len(num_scoring) - 1),
                    n, mix=len(num_scoring))
                num_scoring.append(cnt)
                merged_ids = jnp.concatenate([res_ids, fresh])
                merged_scores = jnp.concatenate([res_scores, fscores])
                res_ids, res_scores = _masked_topk(
                    merged_ids, merged_scores, scfg.top_k_per_level[level],
                    level_topn[t], sentinel)
                cand_ids, cand_scores = res_ids, res_scores
            t += 1

        # --- ground level: fresh-topk hops, results accumulate
        #     (build_opt_graph.py:128-141) ---
        epoch = jnp.uint8(0)
        vis = be.vis_reset_mark(vis, cand_ids, cand_scores > NEG_INF,
                                epoch, n)
        buf_ids, buf_scores = [res_ids], [res_scores]
        for i in range(hop_caps):
            fresh, fscores, vis, cnt = expand(
                params, state, index, user_seq_emb, vis, epoch, 0,
                cand_ids, cand_scores, scfg.hop_cap(len(num_scoring) - 1),
                n, mix=len(num_scoring))
            num_scoring.append(cnt)
            cand_ids, cand_scores = _masked_topk(
                fresh, fscores, k_hop_cap, level_topn[t + i], sentinel)
            buf_ids.append(cand_ids)
            buf_scores.append(cand_scores)

        # --- final merge (build_opt_graph.py:143-149) ---
        all_ids = jnp.concatenate(buf_ids)
        all_scores = jnp.concatenate(buf_scores)
        final_ids, final_scores = _masked_topk(
            all_ids, all_scores, k_final_cap, level_topn[-1], sentinel)
        valid = final_scores > NEG_INF
        top_items = jnp.where(
            valid, be.take_ids(index.item_ids, final_ids, n), -1)
        return top_items, final_scores, jnp.stack(num_scoring)

    return search_eval if semantics == "eval" else search
