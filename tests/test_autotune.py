"""Per-hop frontier-cap autotuning (search/autotune.py): profile shape,
cap rounding/clipping rules, and result equivalence at tuned caps."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.delivery import extract_user_embeddings
from nann_tpu.search import make_searcher
from nann_tpu.search.autotune import (autotune_hop_caps, measure_hop_profile,
                                      tuned_hop_caps)
from nann_tpu.search.beam import level_topn_default

from test_search import search_setup, trained  # noqa: F401  (fixtures)


def test_tuned_hop_caps_rules():
    profile = np.array([[300, 900, 40, 1024],
                        [200, 700, 10, 1024]])
    caps = tuned_hop_caps(profile, scalar_cap=1024, margin=1.3, quantum=512,
                          floor=512)
    # 300*1.3=390 -> 512 (floor/quantum); 900*1.3=1170 -> clipped to scalar;
    # 40 -> floor; saturated hop (max == cap) keeps the scalar cap
    assert caps == (512, 1024, 512, 1024)
    assert all(c % 512 == 0 or c == 1024 for c in caps)


def test_autotune_search_equivalence(search_setup):  # noqa: F811
    """Autotuned per-hop caps reproduce the scalar-cap results on the probe
    queries: every tuned cap sits above that hop's measured expansion, so
    truncation never engages and the cap only sheds padding."""
    mcfg, state, test, sidx, scfg = search_setup
    users = extract_user_embeddings(state.params,
                                    {k: test[k][:8] for k in test})
    users = np.asarray(users, np.float32)

    prof = measure_hop_profile(mcfg, scfg, state.params, state.bn_state,
                               sidx, users, batch=8)
    # expansion hops exclude the start level (its single "hop" IS the
    # enter-point evaluation, num_scoring row 0)
    n_hops = sum(scfg.num_scoring_per_level[:scfg.hnsw_start_level])
    assert prof.shape == (8, n_hops + 1)  # +1: enter-point row

    tuned = autotune_hop_caps(mcfg, scfg, state.params, state.bn_state,
                              sidx, users)
    assert tuned.frontier_cap_per_hop is not None
    assert len(tuned.frontier_cap_per_hop) == n_hops
    assert all(c <= scfg.frontier_cap for c in tuned.frontier_cap_per_hop)
    tuned.validate()

    ltn = jnp.asarray(level_topn_default(scfg))
    base_fn = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                               in_axes=(None, None, None, 0, None)))
    tuned_fn = jax.jit(jax.vmap(make_searcher(mcfg, tuned),
                                in_axes=(None, None, None, 0, None)))
    ref = base_fn(state.params, state.bn_state, sidx, jnp.asarray(users), ltn)
    got = tuned_fn(state.params, state.bn_state, sidx, jnp.asarray(users), ltn)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(got[2]))
