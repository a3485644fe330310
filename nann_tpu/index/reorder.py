"""Graph-locality node relabeling for the search index.

At 1M+ items the search becomes HBM-gather-bound: each hop gathers neighbor
rows and embedding rows by node id, and ids assigned in catalogue order have
no locality, so a frontier's gathers touch pages all over the table
(round-1 ladder: 1017 -> 611 -> 200 qps at 200k -> 1M -> 8M items).

BFS relabeling assigns consecutive ids in breadth-first order from the enter
points over the ground-level graph: a hop's frontier (graph-adjacent nodes)
then maps to nearby rows, so its gathers hit far fewer HBM pages. This is a
pure bijective relabel applied at LOAD time — the on-disk artifact contract
(reference build_hnsw_index.py layout) is untouched, external item ids are
carried through `item_ids`, and search results are bit-identical in item-id
space (tested).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def bfs_order(neighbors0: np.ndarray, enter_points: np.ndarray,
              n: int) -> np.ndarray:
    """Vectorised BFS over the dense-packed ground level.

    Returns order[new_id] = old_id covering all n nodes (disconnected
    leftovers appended in id order).
    """
    visited = np.zeros(n, bool)
    order = np.empty(n, np.int64)
    frontier = np.unique(np.asarray(enter_points, np.int64))
    frontier = frontier[(frontier >= 0) & (frontier < n)]
    visited[frontier] = True
    order[:len(frontier)] = frontier
    pos = len(frontier)
    while frontier.size:
        nb = np.unique(neighbors0[frontier].reshape(-1).astype(np.int64))
        nb = nb[(nb >= 0) & (nb < n)]
        nb = nb[~visited[nb]]
        visited[nb] = True
        order[pos:pos + len(nb)] = nb
        pos += len(nb)
        frontier = nb
    if pos < n:
        rest = np.nonzero(~visited)[0]
        order[pos:] = rest
    return order


def relabel(enter_points: np.ndarray, neighbors: Dict[int, np.ndarray],
            item_embs: np.ndarray, item_ids: np.ndarray,
            order: np.ndarray) -> Tuple[np.ndarray, Dict[int, np.ndarray],
                                        np.ndarray, np.ndarray]:
    """Apply a node permutation (order[new] = old) consistently to every
    id-indexed structure. Self-padded neighbor rows stay self-padded."""
    n = len(order)
    old_to_new = np.empty(n, np.int64)
    old_to_new[order] = np.arange(n, dtype=np.int64)
    new_neighbors = {
        l: old_to_new[nb[order].astype(np.int64)].astype(np.int32)
        for l, nb in neighbors.items()
    }
    new_enter = old_to_new[np.asarray(enter_points, np.int64)].astype(
        enter_points.dtype)
    return new_enter, new_neighbors, item_embs[order], item_ids[order]
