"""Sorted visited-list backend == byte-map backend, id-exact.

The list backend (beam.ListBackend) replaces the O(n_items) epoch-stamped
visited byte-map — whose random 1-byte gather/scatter is the measured TPU
bottleneck (docs/DESIGN.md round-2 forensics II) — with a sort-merged id
list. The representation change must not move a single result: these tests
pin vis_impl="list" to vis_impl="bytemap" bit-for-bit across semantics,
batch sizes, dtypes, budgets, and the staged executor.

Reference semantics under test: BitmapRefDifference filter-and-mark
(bitmap_op/bitmap_ops.cc:150-258) + per-level visited reset (model.py:312).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.search import make_searcher
from nann_tpu.search.beam import ListBackend, level_topn_default
from nann_tpu.search.staged import make_staged_searcher

from test_staged import _setup


def _run(mcfg, scfg, params, state, sidx, users, ltn, **kw):
    fn = jax.jit(jax.vmap(make_searcher(mcfg, scfg, **kw),
                          in_axes=(None, None, None, 0, None)))
    return fn(params, state, sidx, users, ltn)


@pytest.mark.parametrize("semantics", ["eval", "serving"])
@pytest.mark.parametrize("dtype", [jnp.float32, "int8"])
def test_list_matches_bytemap(semantics, dtype):
    mcfg, scfg, params, state, sidx, users = _setup(dtype=dtype)
    scfg = dataclasses.replace(scfg, semantics=semantics)
    ltn = jnp.asarray(level_topn_default(scfg))

    bi, bs, bn = _run(mcfg, dataclasses.replace(scfg, vis_impl="bytemap"),
                      params, state, sidx, users, ltn)
    li, ls, ln = _run(mcfg, dataclasses.replace(scfg, vis_impl="list"),
                      params, state, sidx, users, ltn)

    np.testing.assert_array_equal(np.asarray(bi), np.asarray(li))
    np.testing.assert_allclose(np.asarray(bs), np.asarray(ls), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(bn), np.asarray(ln))


def test_list_matches_bytemap_tight_budget():
    # small level_topn exercises the masked/truncation paths
    mcfg, scfg, params, state, sidx, users = _setup()
    ltn = np.asarray(level_topn_default(scfg))
    ltn = jnp.asarray(np.minimum(ltn, 17))

    bi, _, bn = _run(mcfg, dataclasses.replace(scfg, vis_impl="bytemap"),
                     params, state, sidx, users, ltn)
    li, _, ln = _run(mcfg, dataclasses.replace(scfg, vis_impl="list"),
                     params, state, sidx, users, ltn)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(li))
    np.testing.assert_array_equal(np.asarray(bn), np.asarray(ln))


def test_staged_list_matches_fused_list():
    mcfg, scfg, params, state, sidx, users = _setup()
    scfg = dataclasses.replace(scfg, vis_impl="list")
    ltn = jnp.asarray(level_topn_default(scfg))

    fi, fs, fn_ = _run(mcfg, scfg, params, state, sidx, users, ltn)
    si, ss, sn = make_staged_searcher(mcfg, scfg)(params, state, sidx,
                                                  users, ltn)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si))
    np.testing.assert_array_equal(np.asarray(fn_), np.asarray(sn))


@pytest.mark.parametrize("semantics", ["eval", "serving"])
def test_mark_scored_list_matches_bytemap(semantics):
    # the "scored" mark policy must also be representation-independent
    mcfg, scfg, params, state, sidx, users = _setup()
    scfg = dataclasses.replace(scfg, semantics=semantics,
                               mark_policy="scored")
    ltn = jnp.asarray(level_topn_default(scfg))
    bi, _, bn = _run(mcfg, dataclasses.replace(scfg, vis_impl="bytemap"),
                     params, state, sidx, users, ltn)
    li, _, ln = _run(mcfg, dataclasses.replace(scfg, vis_impl="list"),
                     params, state, sidx, users, ltn)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(li))
    np.testing.assert_array_equal(np.asarray(bn), np.asarray(ln))


def test_topk_impl_topk_bitexact_vs_exact():
    # "topk" replaces the fresh-compaction full sort with lax.top_k on
    # negated keys — an EXACT partial selection (keys are an XOR bijection
    # of unique ids), so results must match topk_impl="exact" bit-for-bit
    mcfg, scfg, params, state, sidx, users = _setup()
    scfg = dataclasses.replace(scfg, mark_policy="scored", frontier_cap=64)
    ltn = jnp.asarray(level_topn_default(scfg))
    ei, es, en = _run(mcfg, scfg, params, state, sidx, users, ltn)
    ti, ts, tn = _run(mcfg, dataclasses.replace(scfg, topk_impl="topk"),
                      params, state, sidx, users, ltn)
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(ti))
    np.testing.assert_array_equal(np.asarray(es), np.asarray(ts))
    np.testing.assert_array_equal(np.asarray(en), np.asarray(tn))


@pytest.mark.parametrize("topk_impl", ["exact", "approx", "topk"])
def test_mark_scored_no_duplicate_results(topk_impl):
    # truncated-away nodes may be re-expanded later, but final results must
    # still be unique items; under approx_min_k the marked set must equal
    # the scored set exactly (a threshold over-marks and can strip a scored
    # node's mark)
    mcfg, scfg, params, state, sidx, users = _setup()
    scfg = dataclasses.replace(scfg, mark_policy="scored", frontier_cap=64,
                               topk_impl=topk_impl)
    ltn = jnp.asarray(level_topn_default(scfg))
    items, _, _ = _run(mcfg, scfg, params, state, sidx, users, ltn)
    for row in np.asarray(items):
        row = row[row >= 0]
        assert len(row) == len(set(row.tolist()))


def test_wide_mode_falls_back_to_bytemap():
    # hop_mode="wide" needs random-access membership; the config pair must
    # still build and run (backend silently stays bytemap)
    mcfg, scfg, params, state, sidx, users = _setup()
    scfg = dataclasses.replace(scfg, vis_impl="list", hop_mode="wide")
    ltn = jnp.asarray(level_topn_default(scfg))
    items, scores, _ = _run(mcfg, scfg, params, state, sidx, users, ltn)
    assert np.asarray(items).shape == (3, 100)


def test_list_backend_explicit_misuse_raises():
    be = ListBackend()
    with pytest.raises(NotImplementedError):
        be.vis_unvisited(jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
                         jnp.uint8(0), 4)
