"""Staged search execution: the fused program split at hop boundaries.

Measured motivation (docs/DESIGN.md, "batch-16 co-compilation pathology"):
XLA compiles the filter half and the scorer half of the search into
HBM-roof programs in isolation (0.146 / 0.171 ms/query at batch 16, 200k
items) but the SINGLE fused program runs at 1.25 ms/query — co-compiled,
the compiler spills ~3.6 GB of scorer intermediates, and no fence, dtype
change, or scorer-kernel swap fixes it. Staged mode makes the hop boundary
a compiler firewall: each hop is two separately-compiled XLA programs

  filter: neighbor expansion + dedup + visited test-and-mark + compaction
          (beam.filter_expand — sorts and scatters, no matmuls)
  score:  frontier gather + folded DNN + top-k merge + candidate threshold
          (matmuls and top-k, no scatters)

chained by device-resident arrays with async dispatch — no host sync
anywhere; with the byte-map visited backend the per-query visited buffer is
donated from hop to hop (the list backend's buffer changes shape per hop,
so donation is skipped there).

This is intentionally NOT the reference's two-graph split (CPU custom-op
graph + per-hop bucketed BlazeXlaOp with a host round trip per hop,
NANN_impls/nann/delivery/build_opt_graph.py:69-149): both halves here are
device programs, intermediates never leave HBM, and shapes are static so
each program compiles exactly once per batch bucket.

Semantics: implements the eval-graph candidate rule (the serving default;
beam.make_searcher(semantics="eval")) and matches the fused program's
results exactly — tests/test_staged.py asserts id-level equality.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SearchConfig
from ..ops.scorer_kernel import (fold_scorer, precompute_user,
                                 score_frontier_reference)
from .beam import NEG_INF, _masked_topk, default_backend, filter_expand


def score_gathered(be, mcfg: ModelConfig, folded, k_proj, v,
                   item_embs: jnp.ndarray, ids: jnp.ndarray,
                   valid: jnp.ndarray, n: int) -> jnp.ndarray:
    """Gather frontier rows (dequantizing packed int8 if needed) and run the
    folded scorer. Mirrors beam.make_searcher's score_items folded path, with
    the fold/precompute hoisted out (they are per-query, done in j_prep)."""
    emb = be.take_rows(item_embs, ids, n)
    dt = jnp.dtype(mcfg.compute_dtype)
    if emb.dtype == jnp.int8:
        from ..index.quantize import unpack_rows
        emb = unpack_rows(emb, mcfg.item_emb_dim, dt)
    scores = score_frontier_reference(folded, k_proj, v, emb, dt=dt)
    return jnp.where(valid, scores, NEG_INF)


def make_staged_searcher(mcfg: ModelConfig, scfg: SearchConfig, *,
                         semantics: str = None, donate_vis: bool = True):
    """Build the staged executor.

    Returns searchB(params, state, index, user_seq_emb [B, L, d_user],
    level_topn) -> (top item ids [B, k], scores [B, k], num_scoring [B, hops])
    — the same contract as jit(vmap(make_searcher(...))), but as a Python
    function dispatching ~2 XLA programs per hop. Each stage specializes per
    batch size on first use (the engine's bucket ladder warms them).
    """
    scfg.validate()
    semantics = semantics or scfg.semantics
    if semantics != "eval":
        raise NotImplementedError(
            "staged execution implements eval semantics (the serving "
            "default); use the fused searcher for semantics='serving'")
    if scfg.hop_mode != "filtered":
        raise NotImplementedError("staged execution requires hop_mode="
                                  "'filtered'")
    if scfg.frontier_cap_per_hop is not None:
        raise NotImplementedError(
            "staged execution compiles ONE filter/score program per level "
            "and reuses it across that level's hops, so hop-varying frontier "
            "caps don't fit its program cache; use the fused searcher "
            "(search/beam.py) for frontier_cap_per_hop")
    be = default_backend(scfg)
    # the list-backend's vis shape grows per hop, so hop outputs can never
    # alias the donated input buffer — skip donation there
    donate_vis = donate_vis and scfg.vis_impl != "list"
    start = scfg.hnsw_start_level
    k_start_cap = scfg.top_k_per_level[start]
    k_final_cap = max(max(scfg.topk_eval), 1)

    # ---------------------------------------------------------------- stages

    @jax.jit
    def j_prep(params, state, userB):
        folded = fold_scorer(params, state, mcfg)
        dt = jnp.dtype(mcfg.compute_dtype)
        k_proj, v = jax.vmap(
            lambda u: precompute_user(folded, u, dt=dt))(userB)
        return folded, k_proj, v

    def _enter(folded, k_proj, v, item_embs, enter_points, ltn0):
        n = item_embs.shape[0]
        ep = enter_points.astype(jnp.int32)
        eps = score_gathered(be, mcfg, folded, k_proj, v, item_embs, ep,
                             jnp.ones(ep.shape, bool), n)
        return _masked_topk(ep, eps, k_start_cap, ltn0, n)

    j_enter = jax.jit(jax.vmap(_enter, in_axes=(None, 0, 0, None, None,
                                                None)))

    def _build_filter(level: int, mark_first: bool):
        epoch = jnp.uint8(level)

        def fn(neighbors_l, vis, cand_ids, cand_scores, res_ids, res_scores,
               salt):
            n = neighbors_l.shape[0]
            mark_ids = res_ids if mark_first else None
            mark_valid = (res_scores > NEG_INF) if mark_first else None
            return filter_expand(
                be, neighbors_l, vis, epoch, cand_ids, cand_scores,
                scfg.frontier_cap, n, salt, topk_impl=scfg.topk_impl,
                mark_policy=scfg.mark_policy,
                mark_ids=mark_ids, mark_valid=mark_valid)

        vm = jax.vmap(fn, in_axes=(None, 0, 0, 0, 0, 0, None))
        return jax.jit(vm, donate_argnums=(1,) if donate_vis else ())

    def _build_score(level: int):
        k_cap = scfg.top_k_per_level[level]

        def fn(folded, k_proj, v, item_embs, fresh, fresh_valid,
               res_ids, res_scores, ltn_t):
            n = item_embs.shape[0]
            sentinel = n
            fscores = score_gathered(be, mcfg, folded, k_proj, v, item_embs,
                                     fresh, fresh_valid, n)
            res_i, res_s = _masked_topk(
                jnp.concatenate([res_ids, fresh]),
                jnp.concatenate([res_scores, fscores]),
                k_cap, ltn_t, sentinel)
            # candidates: fresh nodes with score >= k-th result
            # (model.py:333-334); any such node is inside the top-k
            kth = jnp.min(jnp.where(res_s > NEG_INF, res_s, jnp.inf))
            cand_i, cand_s = _masked_topk(fresh, fscores, k_cap, ltn_t,
                                          sentinel)
            live = cand_s >= kth
            return (res_i, res_s, jnp.where(live, cand_i, sentinel),
                    jnp.where(live, cand_s, NEG_INF))

        return jax.jit(jax.vmap(fn, in_axes=(None, 0, 0, None, 0, 0, 0, 0,
                                             None)))

    def _final(res_ids, res_scores, item_ids, ltn_last):
        n = item_ids.shape[0]
        fi, fs = _masked_topk(res_ids, res_scores, k_final_cap, ltn_last, n)
        valid = fs > NEG_INF
        return jnp.where(valid, be.take_ids(item_ids, fi, n), -1), fs

    j_final = jax.jit(jax.vmap(_final, in_axes=(0, 0, None, None)))

    j_filter: Dict[Tuple[int, bool], object] = {}
    j_score: Dict[int, object] = {}
    for level in range(start - 1, -1, -1):
        j_filter[(level, True)] = _build_filter(level, True)
        if scfg.num_scoring_per_level[level] > 1:
            j_filter[(level, False)] = _build_filter(level, False)
        j_score[level] = _build_score(level)

    # ------------------------------------------------------------- execution

    def searchB(params, state, index, user_seq_emb, level_topn):
        userB = jnp.asarray(user_seq_emb)
        if userB.ndim == 2:   # single query: run as batch 1
            items, scores, ns = searchB(params, state, index, userB[None],
                                        level_topn)
            return items[0], scores[0], ns[0]
        B = userB.shape[0]
        n = index.item_ids.shape[0]
        ltn = jnp.asarray(level_topn)

        folded, kpB, vB = j_prep(params, state, userB)
        res_ids, res_scores = j_enter(folded, kpB, vB, index.item_embs,
                                      index.enter_points, ltn[0])
        counts = [jnp.full((B,), index.enter_points.shape[0], jnp.int32)]

        max_deg = max(v.shape[1] for v in index.neighbors.values())
        max_cand = max([k_start_cap, k_final_cap]
                       + list(scfg.top_k_per_level))
        vis1 = be.vis_init(n, trash=max_cand * max_deg)
        vis = jnp.broadcast_to(vis1, (B,) + vis1.shape)

        t = 1
        for level in range(start - 1, -1, -1):
            # candidates at level entry are the current results (model.py:312)
            cand_ids, cand_scores = res_ids, res_scores
            for hop in range(scfg.num_scoring_per_level[level]):
                # mix = hops dispatched so far incl. the enter-point scoring
                # (beam.py expand's `mix=len(num_scoring)` — same sequence)
                salt = jnp.int32(
                    (0x1F123BB5 * (len(counts) + 1)) & 0x3FFFFFFF
                    if n > scfg.frontier_cap else 0)
                fresh, valid, vis, cnt = j_filter[(level, hop == 0)](
                    index.neighbors[level], vis, cand_ids, cand_scores,
                    res_ids, res_scores, salt)
                res_ids, res_scores, cand_ids, cand_scores = j_score[level](
                    folded, kpB, vB, index.item_embs, fresh, valid,
                    res_ids, res_scores, ltn[t])
                counts.append(cnt)
            t += 1

        items, scores = j_final(res_ids, res_scores, index.item_ids, ltn[-1])
        return items, scores, jnp.stack(counts, axis=-1)

    # expose the stage programs for warmup and per-stage profiling
    searchB.stages = {"prep": j_prep, "enter": j_enter, "filter": j_filter,
                      "score": j_score, "final": j_final}
    return searchB
