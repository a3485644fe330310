"""Device-side (jit-safe) ragged ops over padded-dense rows.

The TPU-native encoding of the reference's ragged (values, row_splits) pairs
is padded-dense with a validity mask: [B, W] values + [B, W] bool — static
shapes that XLA can tile, with masking carrying the raggedness. This module
implements the full user_ops ragged family in that encoding, as compiled
device code (the §2.2 op surface the host-numpy ops/ragged.py only mirrors
for tooling):

  set_union / set_intersection / set_difference   set_op/set_op.cc:13,41,65
  group_gather (+ per-group dedup)                beam_search_op/GroupGather_kernel.cc:18,91-131
  batch_gather_on_rt                              beam_search_op/BatchGatherOnRT_kernel.cc
  batch_concat_on_rt                              beam_search_op/BatchConcatOnRT_kernel.cc
  splits_gather                                   beam_search_op/SplitsGather_kernel.cc
  batch_topk_on_rt                                topk_op/BatchTopKOnRT_kernel.cc:25

Conventions: int32 values >= 0; masked slots hold the value INT32_MAX and
mask False. Set ops return rows sorted ascending (np.union1d-style, matching
the reference's sorted set outputs); compaction brings valid entries to the
front of each row.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD = jnp.int32(2**31 - 1)

Padded = Tuple[jnp.ndarray, jnp.ndarray]  # (values [B, W], mask [B, W])


def from_ragged(values: np.ndarray, row_splits: np.ndarray, width: int
                ) -> Padded:
    """Host converter: ragged -> padded-dense (rows truncated at `width`)."""
    nrows = len(row_splits) - 1
    out = np.full((nrows, width), np.iinfo(np.int32).max, np.int32)
    mask = np.zeros((nrows, width), bool)
    for i in range(nrows):
        row = values[row_splits[i]:row_splits[i + 1]][:width]
        out[i, :len(row)] = row
        mask[i, :len(row)] = True
    return jnp.asarray(out), jnp.asarray(mask)


def to_ragged(values, mask) -> Tuple[np.ndarray, np.ndarray]:
    """Host converter: padded-dense -> ragged (drops masked slots)."""
    values, mask = np.asarray(values), np.asarray(mask)
    rows = [values[i][mask[i]] for i in range(len(values))]
    splits = np.zeros(len(rows) + 1, np.int64)
    for i, r in enumerate(rows):
        splits[i + 1] = splits[i] + len(r)
    vals = np.concatenate(rows) if rows else np.zeros(0, np.int64)
    return vals.astype(np.int64), splits


def _compact_sorted(vals: jnp.ndarray, keep: jnp.ndarray) -> Padded:
    """Per-row: keep-masked entries to the front, ascending; padded with PAD.
    One sort per row batch — the same static-shape compaction discipline as
    the search path."""
    keyed = jnp.where(keep, vals, PAD)
    out = jnp.sort(keyed, axis=-1)
    return out, out != PAD


def set_union(a: Padded, b: Padded) -> Padded:
    """Row-wise sorted union (SetUnion, set_op.cc:13)."""
    vals = jnp.concatenate([jnp.where(a[1], a[0], PAD),
                            jnp.where(b[1], b[0], PAD)], axis=-1)
    s = jnp.sort(vals, axis=-1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=-1)
    return _compact_sorted(s, first & (s != PAD))


def _membership(a: Padded, b: Padded) -> jnp.ndarray:
    """For each valid a-entry, is the value present in its b row?
    Vectorized binary search over the sorted b row (log W gathers)."""
    b_sorted = jnp.sort(jnp.where(b[1], b[0], PAD), axis=-1)

    def row(avals, brow):
        pos = jnp.searchsorted(brow, avals)
        pos = jnp.clip(pos, 0, brow.shape[0] - 1)
        return jnp.take(brow, pos) == avals

    return jax.vmap(row)(a[0], b_sorted) & a[1]


def set_intersection(a: Padded, b: Padded) -> Padded:
    """Row-wise sorted intersection (SetIntersection, set_op.cc:41)."""
    hit = _membership(a, b)
    # dedup within a (set semantics): sort then first-occurrence
    s = jnp.sort(jnp.where(hit, a[0], PAD), axis=-1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=-1)
    return _compact_sorted(s, first & (s != PAD))


def set_difference(a: Padded, b: Padded) -> Padded:
    """Row-wise sorted a \\ b (SetDifference, set_op.cc:65)."""
    miss = a[1] & ~_membership(a, b)
    s = jnp.sort(jnp.where(miss, a[0], PAD), axis=-1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=-1)
    return _compact_sorted(s, first & (s != PAD))


def group_gather(params: jnp.ndarray, params_mask: jnp.ndarray,
                 indices: Padded, unique: bool = False) -> Padded:
    """Neighbor expansion (GroupGather_kernel.cc:18): for each group row,
    concatenate params[idx] rows. params is padded-dense [N, deg].

    With unique=True the per-group dedup (:91-131) is sort-based, so the
    output is ascending (vs the reference's first-occurrence order — callers
    in the search treat the result as a set, as does the reference's
    downstream bitmap filter)."""
    idx_vals, idx_mask = indices
    safe = jnp.clip(idx_vals, 0, params.shape[0] - 1)
    rows = jnp.take(params, safe, axis=0)              # [B, K, deg]
    rmask = jnp.take(params_mask, safe, axis=0) & idx_mask[..., None]
    B = idx_vals.shape[0]
    flat = rows.reshape(B, -1)
    fmask = rmask.reshape(B, -1)
    if not unique:
        # stable compaction preserving concatenation order: sort by
        # (invalid, position) composite key
        W = flat.shape[1]
        pos = jnp.arange(W, dtype=jnp.int32)[None, :]
        key = jnp.where(fmask, pos, W + pos)
        order = jnp.argsort(key, axis=-1)
        out = jnp.take_along_axis(flat, order, axis=-1)
        m = jnp.take_along_axis(fmask, order, axis=-1)
        return jnp.where(m, out, PAD), m
    s = jnp.sort(jnp.where(fmask, flat, PAD), axis=-1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], bool), s[:, 1:] != s[:, :-1]], axis=-1)
    return _compact_sorted(s, first & (s != PAD))


def batch_gather_on_rt(data: Padded, indices: Padded) -> Padded:
    """Per-row gather: out[i, j] = data[i, indices[i, j]]
    (BatchGatherOnRT_kernel.cc)."""
    dvals, dmask = data
    ivals, imask = indices
    safe = jnp.clip(ivals, 0, dvals.shape[1] - 1)
    out = jnp.take_along_axis(dvals, safe, axis=-1)
    m = imask & jnp.take_along_axis(dmask, safe, axis=-1)
    return jnp.where(m, out, PAD), m


def batch_concat_on_rt(a: Padded, b: Padded) -> Padded:
    """Row-wise concat (BatchConcatOnRT_kernel.cc): a-row then b-row,
    compacted to the front."""
    vals = jnp.concatenate([a[0], b[0]], axis=-1)
    mask = jnp.concatenate([a[1], b[1]], axis=-1)
    W = vals.shape[1]
    pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    key = jnp.where(mask, pos, W + pos)
    order = jnp.argsort(key, axis=-1)
    out = jnp.take_along_axis(vals, order, axis=-1)
    m = jnp.take_along_axis(mask, order, axis=-1)
    return jnp.where(m, out, PAD), m


def splits_gather(data: Padded, row_indices: jnp.ndarray) -> Padded:
    """Whole-row gather by row index (SplitsGather_kernel.cc)."""
    safe = jnp.clip(row_indices, 0, data[0].shape[0] - 1)
    return jnp.take(data[0], safe, axis=0), jnp.take(data[1], safe, axis=0)


def batch_topk_on_rt(values: jnp.ndarray, mask: jnp.ndarray, k: jnp.ndarray,
                     k_cap: int, ascending: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row top-k with a runtime per-row k vector and ascending option
    (BatchTopKOnRT_kernel.cc:25): returns ([B, k_cap] values, mask); slots
    >= k_i or beyond the row's length are masked."""
    sign = jnp.float32(-1.0 if ascending else 1.0)
    v = jnp.where(mask, values.astype(jnp.float32) * sign, -jnp.inf)
    k_cap = min(k_cap, v.shape[-1])
    top, _idx = jax.lax.top_k(v, k_cap)
    pos = jnp.arange(k_cap)[None, :]
    live = (pos < jnp.broadcast_to(jnp.asarray(k)[..., None],
                                   (v.shape[0], k_cap))) & jnp.isfinite(top)
    return jnp.where(live, top * sign, 0.0).astype(values.dtype), live
