"""Visited-set ops: bitmap and bloom-filter membership filtering.

Functional equivalents of the reference's bitmap_op family
(tensorflow/core/user_ops/bitmap_op/bitmap_ops.cc):

  BitmapInit           (:28)  -> bitmap_init
  BitmapDifference     (:83)  -> bitmap_difference
  BitmapRefDifference  (:150) -> bitmap_ref_difference — the HNSW visited
                                 filter: returns unseen ids AND the updated
                                 bitmap (functional in-place; pass the result
                                 forward instead of mutating a Ref variable)
  BloomFilterDifference(:264) -> bloom_filter_difference (4-hash, prime-mod)

Ids are int32; the bitmap packs 1 bit/item into int32 words (id>>5 / id&31,
matching bitmap_ops.cc:226-231). All functions are jit-safe with static
shapes: variable-length results are returned compacted-left with a validity
count, not dynamically sized.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bitmap_init(ids: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """Set bit `id` for every id; returns [ceil(num_bits/32)] int32 words."""
    num_words = -(-num_bits // 32)
    return _bitmap_or(jnp.zeros((num_words,), jnp.int32), ids, num_bits)


def _bitmap_or(bm: jnp.ndarray, ids: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """OR bits for ids into bm, duplicate-safe.

    Duplicate ids are dropped on a sorted first-occurrence pass; distinct ids
    sharing a word have distinct bits, so a segment-sum over words equals a
    bitwise OR (the scatter-free formulation XLA vectorises well)."""
    num_words = bm.shape[0]
    ids_sorted = jnp.sort(ids)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             ids_sorted[1:] != ids_sorted[:-1]])
    valid = first & (ids_sorted >= 0) & (ids_sorted < num_bits)
    word = jnp.where(valid, ids_sorted >> 5, num_words)
    bit = jnp.where(valid,
                    jnp.left_shift(jnp.int32(1),
                                   (ids_sorted & 31).astype(jnp.int32)),
                    0)
    combined = jax.ops.segment_sum(bit, word, num_segments=num_words + 1,
                                   indices_are_sorted=True)
    return bm | combined[:num_words].astype(jnp.int32)


def bitmap_test(bm: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """True where id's bit is set (ids out of range -> False)."""
    num_bits = bm.shape[0] * 32
    valid = (ids >= 0) & (ids < num_bits)
    word = jnp.clip(ids >> 5, 0, bm.shape[0] - 1)
    got = jnp.right_shift(bm[word], (ids & 31).astype(jnp.int32)) & 1
    return (got == 1) & valid


def bitmap_difference(ids: jnp.ndarray, bm: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure difference: ids whose bit is NOT set, compacted left.

    Returns (out_ids [len(ids)] with -1 padding, count)."""
    num_bits = bm.shape[0] * 32
    keep = ~bitmap_test(bm, ids) & (ids >= 0) & (ids < num_bits)
    order = jnp.argsort(~keep, stable=True)
    out = jnp.where(keep[order], ids[order], -1)
    return out, jnp.sum(keep)


def bitmap_ref_difference(ids: jnp.ndarray, bm: jnp.ndarray,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The HNSW visited filter (bitmap_ops.cc:150-258): returns ids not yet in
    the bitmap (first occurrence only, compacted left, -1 padded), the count,
    and the bitmap with those ids now marked."""
    num_bits = bm.shape[0] * 32
    ids_sorted = jnp.sort(ids)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             ids_sorted[1:] != ids_sorted[:-1]])
    keep = first & ~bitmap_test(bm, ids_sorted) & (ids_sorted >= 0) & \
        (ids_sorted < num_bits)
    order = jnp.argsort(~keep, stable=True)
    out = jnp.where(keep[order], ids_sorted[order], -1)
    new_bm = _bitmap_or(bm, jnp.where(keep, ids_sorted, -1), num_bits)
    return out, jnp.sum(keep), new_bm


# ------------------------------------------------------------- bloom filter

_BLOOM_PRIMES = (999269, 999437, 999721, 999953)
_BLOOM_MULTS = (3, 5, 7, 11)


def bloom_hashes(ids: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """[4, n] hash positions (prime-mod family like bitmap_ops.cc:393-419).

    Arithmetic stays in uint32 (mult*id < 11 * 2^31 overflows int32 but the
    prime mod keeps values small after one widening multiply in uint64-free
    form: (id % p) * m % p)."""
    x = ids.astype(jnp.uint32)[None, :]
    p = jnp.asarray(_BLOOM_PRIMES, jnp.uint32)[:, None]
    m = jnp.asarray(_BLOOM_MULTS, jnp.uint32)[:, None]
    h = ((x % p) * m + 1) % p
    return (h % jnp.uint32(num_bits)).astype(jnp.int32)


def bloom_filter_difference(ids: jnp.ndarray, bm: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bloom-filter variant for id spaces too large for an exact bitmap:
    approximate visited filter (false positives drop ids, never duplicates).
    Returns (out_ids -1-padded, count, updated filter)."""
    num_bits = bm.shape[0] * 32
    ids_sorted = jnp.sort(ids)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             ids_sorted[1:] != ids_sorted[:-1]])
    h = bloom_hashes(ids_sorted, num_bits)                  # [4, n]
    present = jnp.all(bitmap_test(bm, h), axis=0)
    keep = first & ~present & (ids_sorted >= 0)
    order = jnp.argsort(~keep, stable=True)
    out = jnp.where(keep[order], ids_sorted[order], -1)
    marked = jnp.where(keep[None, :], h, -1).reshape(-1)
    new_bm = _bitmap_or(bm, marked, num_bits)
    return out, jnp.sum(keep), new_bm
