"""Device-side (jit-safe, padded-dense) ragged ops vs the host oracles.

Property tests: random ragged fixtures (incl. empty rows, the reference's
group_gather_test.py edge case) are run through both ops/ragged.py (host
numpy, the oracle) and ops/ragged_device.py (compiled), and must agree as
sets per row. Everything device-side runs under jax.jit to prove the ops
are trace-safe with static shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.ops import ragged, ragged_device as rd


def _rag(*rows):
    splits = np.cumsum([0] + [len(r) for r in rows]).astype(np.int64)
    vals = np.concatenate([np.asarray(r, np.int64) for r in rows]) if rows \
        else np.zeros(0, np.int64)
    return vals, splits


def _rand_rag(rng, nrows, maxlen, hi, unique=False):
    rows = []
    for _ in range(nrows):
        ln = int(rng.integers(0, maxlen + 1))
        row = (rng.choice(hi, size=min(ln, hi), replace=False) if unique
               else rng.integers(0, hi, size=ln))
        rows.append(np.asarray(row, np.int64))
    return _rag(*rows)


def _rows_of(rag):
    vals, splits = rag
    return [vals[splits[i]:splits[i + 1]] for i in range(len(splits) - 1)]


def _assert_rows_equal_as_sets(padded, oracle_rag):
    got_vals, got_splits = rd.to_ragged(*padded)
    got = _rows_of((got_vals, got_splits))
    want = _rows_of(oracle_rag)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.sort(g), np.sort(w))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_set_ops_match_host_oracle(seed):
    rng = np.random.default_rng(seed)
    W = 16
    a = _rand_rag(rng, 6, 10, 20, unique=True)
    b = _rand_rag(rng, 6, 10, 20, unique=True)
    ap = rd.from_ragged(*a, width=W)
    bp = rd.from_ragged(*b, width=W)

    union = jax.jit(rd.set_union)(ap, bp)
    _assert_rows_equal_as_sets(union, ragged.set_union(a, b))
    inter = jax.jit(rd.set_intersection)(ap, bp)
    _assert_rows_equal_as_sets(inter, ragged.set_intersection(a, b))
    diff = jax.jit(rd.set_difference)(ap, bp)
    _assert_rows_equal_as_sets(diff, ragged.set_difference(a, b))
    # set outputs are ascending-sorted and front-compacted
    v, m = np.asarray(union[0]), np.asarray(union[1])
    for i in range(len(v)):
        row = v[i][m[i]]
        assert np.all(np.diff(row) > 0)
        assert not m[i][np.argmin(m[i]):].any() or m[i].all()


def test_group_gather_matches_host_incl_empty_rows():
    params = _rag([0, 1], [2, 3, 4], [5, 6], [7, 8, 9])
    idx = _rag([0, 1], [], [1, 3])
    # dense params: [N, deg] padded
    pvals, pmask = rd.from_ragged(*params, width=3)
    ivals, imask = rd.from_ragged(*idx, width=4)
    out = jax.jit(rd.group_gather)(pvals, pmask, (ivals, imask))
    _assert_rows_equal_as_sets(out, ragged.group_gather(params, idx))
    # non-unique keeps concatenation order compacted to the front
    got_vals, _ = rd.to_ragged(*out)
    np.testing.assert_array_equal(
        got_vals, ragged.group_gather(params, idx)[0])

    out_u = jax.jit(lambda p, pm, i: rd.group_gather(p, pm, i, unique=True))(
        pvals, pmask, (ivals, imask))
    _assert_rows_equal_as_sets(
        out_u, ragged.group_gather(params, idx, unique=True))


def test_batch_gather_concat_splits_match_host():
    data = _rag([10, 11, 12], [20, 21])
    idx = _rag([2, 0], [1])
    dp = rd.from_ragged(*data, width=4)
    ip = rd.from_ragged(*idx, width=4)

    g = jax.jit(rd.batch_gather_on_rt)(dp, ip)
    gv, _ = rd.to_ragged(*g)
    np.testing.assert_array_equal(gv, [12, 10, 21])

    c = jax.jit(rd.batch_concat_on_rt)(dp, g)
    cv, cs = rd.to_ragged(*c)
    np.testing.assert_array_equal(cv, [10, 11, 12, 12, 10, 20, 21, 21])
    np.testing.assert_array_equal(cs, [0, 5, 8])

    s = jax.jit(rd.splits_gather)(dp, jnp.asarray([1, 0]))
    sv, _ = rd.to_ragged(*s)
    np.testing.assert_array_equal(sv, [20, 21, 10, 11, 12])


def test_batch_topk_on_rt_matches_host():
    from nann_tpu.ops.topk import batch_topk_on_rt as host_topk
    rng = np.random.default_rng(3)
    rows = [rng.standard_normal(int(rng.integers(0, 9))).astype(np.float32)
            for _ in range(5)]
    splits = np.cumsum([0] + [len(r) for r in rows]).astype(np.int64)
    vals = np.concatenate(rows) if rows else np.zeros(0, np.float32)
    ks = np.asarray([3, 1, 4, 2, 8])

    W = 8
    padded = np.zeros((5, W), np.float32)
    mask = np.zeros((5, W), bool)
    for i, r in enumerate(rows):
        padded[i, :len(r)] = r
        mask[i, :len(r)] = True

    for ascending in (False, True):
        got_v, got_m = jax.jit(
            lambda v, m, k: rd.batch_topk_on_rt(v, m, k, k_cap=W,
                                                ascending=ascending)
        )(jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(ks))
        want_v, want_s = host_topk(vals, splits, ks, ascending=ascending)
        got_v, got_m = np.asarray(got_v), np.asarray(got_m)
        for i in range(5):
            want_row = want_v[want_s[i]:want_s[i + 1]]
            np.testing.assert_allclose(got_v[i][got_m[i]], want_row,
                                       rtol=1e-6)
