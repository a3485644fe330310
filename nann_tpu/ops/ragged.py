"""Ragged-tensor ops: batched set algebra and gathers over (values, row_splits).

Functional equivalents of the reference's set_op/set_op.cc (SetUnion :13,
SetIntersection :41, SetDifference :65) and beam_search_op gathers
(GroupGather_kernel.cc :18, BatchGatherOnRT_kernel.cc, BatchConcatOnRT_kernel.cc,
SplitsGather_kernel.cc).

Representation notes:
  * host-side ("build/delivery" plumbing): true ragged via numpy
    (values, row_splits) — these run eagerly, matching the reference's CPU ops;
  * device-side the search path uses dense fixed-degree packing instead
    (index/artifacts.py); these ops exist for tooling/parity and for tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

Ragged = Tuple[np.ndarray, np.ndarray]  # (values, row_splits[n+1])


def _rows(r: Ragged):
    values, splits = r
    for i in range(len(splits) - 1):
        yield values[splits[i]:splits[i + 1]]


def _from_rows(rows) -> Ragged:
    rows = list(rows)
    splits = np.zeros(len(rows) + 1, np.int64)
    for i, row in enumerate(rows):
        splits[i + 1] = splits[i] + len(row)
    values = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    return values.astype(np.int64), splits


def set_union(a: Ragged, b: Ragged) -> Ragged:
    return _from_rows(np.union1d(x, y) for x, y in zip(_rows(a), _rows(b)))


def set_intersection(a: Ragged, b: Ragged) -> Ragged:
    return _from_rows(np.intersect1d(x, y) for x, y in zip(_rows(a), _rows(b)))


def set_difference(a: Ragged, b: Ragged) -> Ragged:
    return _from_rows(np.setdiff1d(x, y) for x, y in zip(_rows(a), _rows(b)))


def group_gather(params: Ragged, indices: Ragged, unique: bool = False
                 ) -> Ragged:
    """For each group of indices, concatenate params[idx] rows; the neighbor
    expansion op (GroupGather_kernel.cc:18, optional per-group dedup :91-131)."""
    out_rows = []
    for group in _rows(indices):
        parts = [next_row for idx in group
                 for next_row in [params[0][params[1][idx]:params[1][idx + 1]]]]
        row = np.concatenate(parts) if parts else np.zeros(0, np.int64)
        if unique:
            _seen, first_idx = np.unique(row, return_index=True)
            row = row[np.sort(first_idx)]     # preserve first-occurrence order
        out_rows.append(row)
    return _from_rows(out_rows)


def batch_gather_on_rt(data: Ragged, indices: Ragged) -> Ragged:
    """Per-row gather: out[i] = data_row_i[indices_row_i]
    (BatchGatherOnRT_kernel.cc)."""
    out = []
    for drow, irow in zip(_rows(data), _rows(indices)):
        out.append(drow[irow.astype(np.int64)])
    return _from_rows(out)


def batch_concat_on_rt(a: Ragged, b: Ragged) -> Ragged:
    """Row-wise concat of two ragged tensors (BatchConcatOnRT_kernel.cc)."""
    return _from_rows(np.concatenate([x, y])
                      for x, y in zip(_rows(a), _rows(b)))


def splits_gather(data: Ragged, row_indices: np.ndarray) -> Ragged:
    """Gather whole rows by row index (SplitsGather_kernel.cc)."""
    values, splits = data
    return _from_rows(values[splits[i]:splits[i + 1]] for i in row_indices)
