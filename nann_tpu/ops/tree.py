"""TDM-style tree-index ops (the alternative retrieval index to HNSW).

Equivalents of the reference's tree_kernel.cc with both encodings:

  ParentIndicator (:40-148): tree[i] = parent of node i (monotone, root = -1).
  RangeIndicator  (:151-284): level-order splits of a complete tree/forest —
      tree[i+1]-exclusive ranges: children of node i are [tree[i], tree[i+1]);
      nodes before tree[0] are the roots ("first level").

Host-side numpy (index plumbing, like the reference's CPU kernels) plus
dense jit-safe variants (children as fixed-degree padded matrices) for
on-device tree search.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


# ------------------------------------------------------- ParentIndicator


def get_parents_parent_indicator(nodes: np.ndarray, tree: np.ndarray
                                 ) -> np.ndarray:
    nodes = np.asarray(nodes)
    if np.any((nodes < 0) | (nodes >= len(tree))):
        raise ValueError("node out of range")
    parents = np.asarray(tree)[nodes]
    if np.any(parents < 0):
        raise ValueError("node is already root")
    return parents


def get_children_parent_indicator(nodes: np.ndarray, tree: np.ndarray
                                  ) -> np.ndarray:
    """All i with tree[i] in nodes, in ascending order (tree monotone)."""
    mask = np.isin(np.asarray(tree), np.asarray(nodes))
    return np.nonzero(mask)[0].astype(np.int32)


def first_level_parent_indicator(tree: np.ndarray) -> np.ndarray:
    tree = np.asarray(tree)
    n = int(np.argmax(tree >= 0)) if np.any(tree >= 0) else len(tree)
    return np.arange(n, dtype=np.int32)


# -------------------------------------------------------- RangeIndicator


def get_children_range_indicator(nodes: np.ndarray, tree: np.ndarray
                                 ) -> np.ndarray:
    """Children of each node concatenated: [tree[i], tree[i+1]) per node i
    (node 0's children start at index tree[0]... with the convention that
    range i covers [tree[i-1], tree[i]) and range 0 is [first_level_end=tree[0]
    handled by the caller's node ids being < num_ranges)."""
    tree = np.asarray(tree)
    num_ranges = len(tree) - 1
    out = []
    for node in np.asarray(nodes):
        if not (0 <= node < num_ranges):
            raise ValueError(f"node {node} out of range {num_ranges}")
        out.append(np.arange(tree[node], tree[node + 1], dtype=np.int32))
    return np.concatenate(out) if out else np.zeros(0, np.int32)


def get_parents_range_indicator(nodes: np.ndarray, tree: np.ndarray
                                ) -> np.ndarray:
    """parent(node) = the range index whose [tree[i], tree[i+1]) contains node."""
    tree = np.asarray(tree)
    nodes = np.asarray(nodes)
    if np.any(nodes < tree[0]):
        raise ValueError("node is in the first level (no parent)")
    parents = np.searchsorted(tree, nodes, side="right") - 1
    return parents.astype(np.int32)


def first_level_range_indicator(tree: np.ndarray) -> np.ndarray:
    return np.arange(int(np.asarray(tree)[0]), dtype=np.int32)


# --------------------------------------------- dense jit-safe tree search


def pack_children_range_indicator(tree: np.ndarray, max_degree: int
                                  ) -> np.ndarray:
    """RangeIndicator -> dense [num_ranges, max_degree] children matrix padded
    with -1 — the TPU-friendly layout for in-graph tree beam search (same
    fixed-degree trick as index/artifacts.pack_fixed_degree)."""
    tree = np.asarray(tree)
    num_ranges = len(tree) - 1
    out = np.full((num_ranges, max_degree), -1, np.int32)
    for i in range(num_ranges):
        lo, hi = int(tree[i]), int(min(tree[i + 1], tree[i] + max_degree))
        out[i, :hi - lo] = np.arange(lo, hi, dtype=np.int32)
    return out
