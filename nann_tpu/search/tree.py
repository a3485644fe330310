"""TDM-style top-down tree beam search with DNN scoring.

The tree analogue of the HNSW search: at each level, expand the beam's
children (fixed branch factor — naturally static shapes, no visited set
needed because the tree is acyclic), score every child with the scorer, and
keep the top-k as the next beam. One jitted program end to end, same scoring
machinery as search/beam.py (folded scorer).

Reference context: the tree custom ops (tree_kernel.cc) are the serving
support for this retrieval family; the reference demo pipeline uses HNSW,
with trees as the alternative index (SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.layers import Params, State
from .beam import NEG_INF, _masked_topk

MAX_LEVELS = 24


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceTree:
    """Device-resident tree: per-level children + node embeddings."""

    children: List[jnp.ndarray]      # level l -> [n_l, branch] int32, -1 pad
    node_embs: List[jnp.ndarray]     # level l -> [n_l, d]
    leaf_item_ids: jnp.ndarray       # [n_leaves] external item ids

    @staticmethod
    def from_tree(tree, item_ids: np.ndarray, dtype=jnp.float32
                  ) -> "DeviceTree":
        return DeviceTree(
            children=[jnp.asarray(c) for c in tree.children],
            node_embs=[jnp.asarray(e, dtype) for e in tree.node_embs],
            leaf_item_ids=jnp.asarray(
                np.asarray(item_ids)[tree.leaf_item_idx].astype(np.int32)),
        )


def make_tree_searcher(mcfg: ModelConfig, beam_width: int = 64,
                       topk: int = 64, scorer_impl: str = "folded"):
    """Build search(params, state, tree, user_seq_emb) ->
    (top item ids [topk], scores [topk])."""
    from ..ops.scorer_kernel import (fold_scorer, precompute_user,
                                     score_frontier_reference)

    def search(params: Params, state: State, tree: DeviceTree,
               user_seq_emb: jnp.ndarray):
        dt = jnp.dtype(mcfg.compute_dtype)
        folded = fold_scorer(params, state, mcfg)
        k_proj, v = precompute_user(folded, user_seq_emb, dt=dt)

        def score(embs, valid):
            s = score_frontier_reference(folded, k_proj, v, embs.astype(dt),
                                         dt=dt)
            return jnp.where(valid, s, NEG_INF)

        num_levels = len(tree.node_embs)
        # start: score every node at the highest level that fits the beam
        start_level = 0
        for l in range(num_levels):
            if tree.node_embs[l].shape[0] > beam_width:
                break
            start_level = l
        n0 = tree.node_embs[start_level].shape[0]
        beam = jnp.arange(n0, dtype=jnp.int32)
        scores = score(tree.node_embs[start_level], jnp.ones((n0,), bool))
        beam, scores = _masked_topk(beam, scores, min(beam_width, n0),
                                    jnp.int32(beam_width), n0)

        for l in range(start_level, num_levels - 1):
            ch_table = tree.children[l]
            n_next = tree.node_embs[l + 1].shape[0]
            valid_beam = scores > NEG_INF
            ch = jnp.take(ch_table, jnp.clip(beam, 0, ch_table.shape[0] - 1),
                          axis=0)                       # [B, branch]
            ch = jnp.where(valid_beam[:, None], ch, -1).reshape(-1)
            valid = ch >= 0
            embs = jnp.take(tree.node_embs[l + 1],
                            jnp.clip(ch, 0, n_next - 1), axis=0)
            s = score(embs, valid)
            k = min(beam_width if l + 1 < num_levels - 1 else topk,
                    ch.shape[0])
            beam, scores = _masked_topk(ch, s, k, jnp.int32(k), n_next)

        valid = scores > NEG_INF
        items = jnp.where(
            valid,
            jnp.take(tree.leaf_item_ids,
                     jnp.clip(beam, 0, tree.leaf_item_ids.shape[0] - 1)),
            -1)
        return items, scores

    return search
