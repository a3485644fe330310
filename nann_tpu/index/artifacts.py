"""Index artifact loading and TPU-friendly packing.

The on-disk contract is the reference's flat-npy layout (SURVEY.md §5.4).
For the TPU search path, ragged CSR neighbor lists are packed into
fixed-degree dense matrices [num_items, max_degree] int32 padded with the
node's own id (self-loops are harmless: they are always already visited when
expanded, so the visited filter drops them). Dense fixed-degree gathers map
onto the TPU's vector units; ragged gathers do not.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np


def pack_fixed_degree(values: np.ndarray, row_splits: np.ndarray,
                      max_degree: int) -> np.ndarray:
    """CSR -> dense [n, max_degree] int32, rows padded with the row id.

    Rows longer than max_degree are truncated (HNSW guarantees degree <= 2M at
    ground level, so pass max_degree >= 2M for lossless packing).
    """
    n = len(row_splits) - 1
    lengths = np.diff(row_splits)
    out = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None],
                          (n, max_degree)).copy()
    # scatter the CSR values into the dense rows
    take = np.minimum(lengths, max_degree)
    row_idx = np.repeat(np.arange(n), take)
    col_idx = np.concatenate([np.arange(t) for t in take]) if n else \
        np.zeros(0, np.int64)
    src_idx = np.concatenate(
        [np.arange(s, s + t) for s, t in zip(row_splits[:-1], take)]) if n else \
        np.zeros(0, np.int64)
    out[row_idx, col_idx] = values[src_idx].astype(np.int32)
    return out


@dataclasses.dataclass
class IndexArtifacts:
    """In-memory index ready for the TPU search program."""

    enter_points: np.ndarray                  # [n_ep] int32
    neighbors: Dict[int, np.ndarray]          # level -> [n, max_degree] int32
    num_items: int
    max_degree: int

    @property
    def num_levels(self) -> int:
        return len(self.neighbors)


def load_index(index_dir: str, start_level: int,
               max_degree: Optional[int] = None) -> IndexArtifacts:
    """Load the npy artifact contract and pack for TPU.

    With max_degree=None (default), each level packs at its true maximum
    degree — lossless regardless of the build's M. An explicit max_degree
    caps the ground level (upper levels cap at half: HNSW stores up to 2M
    neighbors at ground, M above); rows beyond the cap are truncated.
    """
    enter_points = np.load(os.path.join(index_dir, "enter_points.npy"))
    neighbors = {}
    num_items = 0
    widest = 1
    for level in range(0, start_level):
        values = np.load(os.path.join(index_dir,
                                      f"neighbors_level_{level}_values.npy"))
        row_splits = np.load(
            os.path.join(index_dir, f"neighbors_level_{level}_row_splits.npy"))
        num_items = len(row_splits) - 1
        true_max = int(np.diff(row_splits).max()) if len(row_splits) > 1 else 1
        true_max = max(true_max, 1)
        if max_degree is None:
            width = true_max
        else:
            cap = max_degree if level == 0 else max(max_degree // 2, 1)
            width = min(true_max, cap)
        widest = max(widest, width)
        neighbors[level] = pack_fixed_degree(values, row_splits, width)
    return IndexArtifacts(enter_points=enter_points.astype(np.int32),
                          neighbors=neighbors, num_items=num_items,
                          max_degree=widest)
