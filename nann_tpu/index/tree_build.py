"""TDM-style tree index construction.

The reference ships tree-retrieval custom ops (tree_kernel.cc — TDM, "Learning
Tree-based Deep Model" lineage) as an alternative index to HNSW. This builds
the tree they search: a balanced k-ary hierarchy over item embeddings from
recursive balanced k-means-style splits, exported in the RangeIndicator
encoding (level-order ranges; ops/tree.py) plus a leaf->item mapping.

Internal nodes carry the mean embedding of their subtree, so the same DNN
scorer ranks internal nodes during top-down beam search (search/tree.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class TreeIndex:
    """Flat arrays describing the tree, level by level (root = level 0).

    children[l]: [n_l, branch] int32 — indices into level l+1 (-1 padding)
    node_embs[l]: [n_l, d] float32 — node embeddings (leaf = item embedding)
    leaf_item_idx: [n_leaves] int32 — item index of each last-level node
    """

    children: List[np.ndarray]
    node_embs: List[np.ndarray]
    leaf_item_idx: np.ndarray
    branch: int

    @property
    def num_levels(self) -> int:
        return len(self.node_embs)


def _balanced_split(embs: np.ndarray, idx: np.ndarray, k: int,
                    rng: np.random.Generator) -> List[np.ndarray]:
    """Split items into k equal groups by projection onto the top principal
    direction (balanced, deterministic given rng) — the cheap, stable stand-in
    for balanced k-means used by TDM-style builders."""
    x = embs[idx]
    center = x.mean(0)
    xc = x - center
    # power iteration for the leading PC
    v = rng.standard_normal(x.shape[1]).astype(np.float32)
    for _ in range(8):
        v = xc.T @ (xc @ v)
        norm = np.linalg.norm(v)
        if norm < 1e-12:
            break
        v /= norm
    proj = xc @ v
    order = idx[np.argsort(proj, kind="stable")]
    return np.array_split(order, k)


def build_tree(item_embs: np.ndarray, branch: int = 16, leaf_size: int = 1,
               seed: int = 0) -> TreeIndex:
    """Recursively build the balanced k-ary tree over the item embeddings."""
    rng = np.random.default_rng(seed)
    n, d = item_embs.shape

    # levels of groups: start with one group of all items
    levels: List[List[np.ndarray]] = [[np.arange(n)]]
    while max(len(g) for g in levels[-1]) > max(leaf_size, 1):
        nxt: List[np.ndarray] = []
        for g in levels[-1]:
            if len(g) <= leaf_size:
                nxt.append(g)
            else:
                nxt.extend(s for s in _balanced_split(item_embs, g, branch,
                                                      rng) if len(s))
        levels.append(nxt)

    children: List[np.ndarray] = []
    node_embs: List[np.ndarray] = []
    for li, groups in enumerate(levels):
        embs_l = np.stack([item_embs[g].mean(0) for g in groups]).astype(
            np.float32)
        node_embs.append(embs_l)
        if li + 1 < len(levels):
            # map each group to the indices of its sub-groups at level li+1
            ch = np.full((len(groups), branch), -1, np.int32)
            cursor = 0
            nxt_groups = levels[li + 1]
            for gi, g in enumerate(groups):
                count = 0
                consumed = 0
                while consumed < len(g):
                    ch[gi, count] = cursor
                    consumed += len(nxt_groups[cursor])
                    cursor += 1
                    count += 1
            children.append(ch)

    leaf_item_idx = np.concatenate(levels[-1]).astype(np.int32)
    return TreeIndex(children=children, node_embs=node_embs,
                     leaf_item_idx=leaf_item_idx, branch=branch)


def save_tree(tree: TreeIndex, output_dir: str) -> None:
    import os
    os.makedirs(output_dir, exist_ok=True)
    np.save(os.path.join(output_dir, "leaf_item_idx.npy"), tree.leaf_item_idx)
    np.save(os.path.join(output_dir, "meta.npy"),
            np.asarray([tree.branch, tree.num_levels], np.int64))
    for l in range(tree.num_levels):
        np.save(os.path.join(output_dir, f"node_embs_{l}.npy"),
                tree.node_embs[l])
        if l < tree.num_levels - 1:
            np.save(os.path.join(output_dir, f"children_{l}.npy"),
                    tree.children[l])


def load_tree(output_dir: str) -> TreeIndex:
    import os
    branch, num_levels = np.load(os.path.join(output_dir, "meta.npy"))
    node_embs = [np.load(os.path.join(output_dir, f"node_embs_{l}.npy"))
                 for l in range(num_levels)]
    children = [np.load(os.path.join(output_dir, f"children_{l}.npy"))
                for l in range(num_levels - 1)]
    leaf = np.load(os.path.join(output_dir, "leaf_item_idx.npy"))
    return TreeIndex(children=children, node_embs=node_embs,
                     leaf_item_idx=leaf, branch=int(branch))
