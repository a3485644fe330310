"""Property tests for the ops layer against numpy oracles — mirroring the
reference's op-level test scripts (SURVEY.md §4.1), including the empty-input
edge cases they exercise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.ops import bitmap, idmap, ragged, topk, tree


# ------------------------------------------------------------------ bitmap


def test_bitmap_init_and_test():
    ids = jnp.asarray([0, 1, 31, 32, 63, 64, 100], jnp.int32)
    bm = bitmap.bitmap_init(ids, 128)
    assert bm.shape == (4,)
    assert np.all(np.asarray(bitmap.bitmap_test(bm, ids)))
    others = jnp.asarray([2, 30, 33, 99, 127], jnp.int32)
    assert not np.any(np.asarray(bitmap.bitmap_test(bm, others)))


def test_bitmap_init_duplicate_ids():
    ids = jnp.asarray([5, 5, 5, 7], jnp.int32)
    bm = bitmap.bitmap_init(ids, 64)
    expected = np.zeros(2, np.int32)
    expected[0] = (1 << 5) | (1 << 7)
    np.testing.assert_array_equal(np.asarray(bm), expected)


def test_bitmap_difference():
    bm = bitmap.bitmap_init(jnp.asarray([1, 3], jnp.int32), 64)
    out, cnt = bitmap.bitmap_difference(jnp.asarray([0, 1, 2, 3, 4], jnp.int32),
                                        bm)
    assert int(cnt) == 3
    np.testing.assert_array_equal(np.asarray(out)[:3], [0, 2, 4])
    assert np.all(np.asarray(out)[3:] == -1)


def test_bitmap_ref_difference_chained():
    """Stateful chaining like the reference's bitmap_ref_difference.py test:
    repeated calls must not re-emit previously seen ids."""
    bm = jnp.zeros(2, jnp.int32)
    out1, cnt1, bm = bitmap.bitmap_ref_difference(
        jnp.asarray([4, 4, 9, 1], jnp.int32), bm)
    assert int(cnt1) == 3
    np.testing.assert_array_equal(np.sort(np.asarray(out1)[:3]), [1, 4, 9])
    out2, cnt2, bm = bitmap.bitmap_ref_difference(
        jnp.asarray([9, 2, 4, 60], jnp.int32), bm)
    assert int(cnt2) == 2
    np.testing.assert_array_equal(np.sort(np.asarray(out2)[:2]), [2, 60])


def test_bitmap_ref_difference_jit():
    f = jax.jit(bitmap.bitmap_ref_difference)
    bm = jnp.zeros(4, jnp.int32)
    out, cnt, bm2 = f(jnp.asarray([10, 20, 10], jnp.int32), bm)
    assert int(cnt) == 2


def test_bloom_filter_difference():
    bm = jnp.zeros(1024, jnp.int32)   # 32k bits, tiny load -> ~no FPs
    ids1 = jnp.asarray([100, 2000, 55555], jnp.int32)
    out, cnt, bm = bitmap.bloom_filter_difference(ids1, bm)
    assert int(cnt) == 3
    out, cnt, bm = bitmap.bloom_filter_difference(
        jnp.asarray([100, 777, 2000], jnp.int32), bm)
    assert int(cnt) == 1
    assert np.asarray(out)[0] == 777


# ------------------------------------------------------------------ ragged


def _rag(*rows):
    splits = np.cumsum([0] + [len(r) for r in rows]).astype(np.int64)
    vals = np.concatenate([np.asarray(r, np.int64) for r in rows]) if rows \
        else np.zeros(0, np.int64)
    return vals, splits


def test_set_ops():
    a = _rag([1, 2, 3], [5], [])
    b = _rag([2, 4], [5], [7])
    u = ragged.set_union(a, b)
    np.testing.assert_array_equal(u[0], [1, 2, 3, 4, 5, 7])
    i = ragged.set_intersection(a, b)
    np.testing.assert_array_equal(i[0], [2, 5])
    d = ragged.set_difference(a, b)
    np.testing.assert_array_equal(d[0], [1, 3])
    np.testing.assert_array_equal(d[1], [0, 2, 2, 2])


def test_group_gather_empty_and_dedup():
    """Mirrors group_gather_test.py:21-34 incl. empty rows."""
    params = _rag([0, 1], [2, 3, 4], [5, 6], [7, 8, 9])
    idx = _rag([0, 1], [], [1, 3])
    out = ragged.group_gather(params, idx)
    np.testing.assert_array_equal(out[0], [0, 1, 2, 3, 4, 2, 3, 4, 7, 8, 9])
    np.testing.assert_array_equal(out[1], [0, 5, 5, 11])

    params2 = _rag([1, 2], [2, 3])
    out2 = ragged.group_gather(params2, _rag([0, 1]), unique=True)
    np.testing.assert_array_equal(out2[0], [1, 2, 3])


def test_batch_gather_concat_splits():
    data = _rag([10, 11, 12], [20, 21])
    idx = _rag([2, 0], [1])
    g = ragged.batch_gather_on_rt(data, idx)
    np.testing.assert_array_equal(g[0], [12, 10, 21])
    c = ragged.batch_concat_on_rt(data, g)
    np.testing.assert_array_equal(c[0], [10, 11, 12, 12, 10, 20, 21, 21])
    s = ragged.splits_gather(data, np.asarray([1, 0]))
    np.testing.assert_array_equal(s[0], [20, 21, 10, 11, 12])


# -------------------------------------------------------------------- topk


def test_blaze_topk_runtime_k():
    v = jnp.asarray([[0.1, 0.9, 0.5, 0.7], [1.0, -1.0, 0.0, 2.0]])
    vals, idx = topk.blaze_topk(v, jnp.asarray([2, 3]), k_cap=4)
    np.testing.assert_array_equal(np.asarray(idx)[0, :2], [1, 3])
    assert np.asarray(idx)[0, 2] == -1
    np.testing.assert_array_equal(np.asarray(idx)[1, :3], [3, 0, 2])


def test_blaze_topk_ascending():
    v = jnp.asarray([[0.3, 0.1, 0.2]])
    vals, idx = topk.blaze_topk(v, 2, k_cap=3, ascending=True)
    np.testing.assert_array_equal(np.asarray(idx)[0, :2], [1, 2])
    assert np.isposinf(np.asarray(vals)[0, 2])


def test_batch_topk_on_rt_per_row_k():
    """Mirrors batch_topk_on_rt_test.py:16-18 (per-row k, ascending)."""
    vals = np.asarray([3.0, 1.0, 2.0, 9.0, 8.0])
    splits = np.asarray([0, 3, 5])
    out_v, out_s = topk.batch_topk_on_rt(vals, splits, np.asarray([2, 1]))
    np.testing.assert_array_equal(out_v, [3.0, 2.0, 9.0])
    np.testing.assert_array_equal(out_s, [0, 2, 3])
    asc_v, _ = topk.batch_topk_on_rt(vals, splits, np.asarray([2, 1]),
                                     ascending=True)
    np.testing.assert_array_equal(asc_v, [1.0, 2.0, 8.0])


# -------------------------------------------------------------------- tree


def test_parent_indicator_ops():
    # tree from tree_kernel.cc:43-47
    t = np.asarray([-1, 0, 0, 0, 0, 1, 1, 1, 2, 2, 3, 4, 4])
    np.testing.assert_array_equal(
        tree.get_parents_parent_indicator([5, 8, 12], t), [1, 2, 4])
    np.testing.assert_array_equal(
        tree.get_children_parent_indicator([1, 2], t), [5, 6, 7, 8, 9])
    np.testing.assert_array_equal(tree.first_level_parent_indicator(t), [0])
    with pytest.raises(ValueError):
        tree.get_parents_parent_indicator([0], t)


def test_range_indicator_ops():
    # forest from tree_kernel.cc:160-165
    t = np.asarray([3, 5, 6, 9, 11, 12, 15, 17, 18, 21])
    np.testing.assert_array_equal(tree.first_level_range_indicator(t),
                                  [0, 1, 2])
    np.testing.assert_array_equal(
        tree.get_children_range_indicator([0, 2], t), [3, 4, 6, 7, 8])
    np.testing.assert_array_equal(
        tree.get_parents_range_indicator([9, 10, 11, 15], t), [3, 3, 4, 6])


def test_pack_children_range_indicator():
    t = np.asarray([1, 3, 4])
    packed = tree.pack_children_range_indicator(t, max_degree=3)
    np.testing.assert_array_equal(packed, [[1, 2, -1], [3, -1, -1]])


# ------------------------------------------------------------------- idmap


def test_idmap_lookup():
    m = idmap.IdMap(np.asarray([10, 5, 30]), np.asarray([1, 2, 3]),
                    default=-7)
    out = m.lookup(jnp.asarray([5, 10, 30, 99]))
    np.testing.assert_array_equal(np.asarray(out), [2, 1, 3, -7])
    vals, hit = m.lookup_v2(jnp.asarray([5, 99]))
    np.testing.assert_array_equal(np.asarray(hit), [True, False])
