"""Tests for the target-attention scorer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig
from nann_tpu.models import scorer


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(num_item=500, num_cate=30, emb_dim=32, max_seq_length=10)


@pytest.fixture(scope="module")
def model(cfg):
    return scorer.init_scorer(jax.random.PRNGKey(0), cfg)


def test_param_shapes(cfg, model):
    params, state = model
    assert params["ht_item"].shape == (501, 32)
    assert params["ht_cate"].shape == (31, 32)
    assert params["att"]["q1"]["kernel"].shape == (64, 128)
    assert params["att"]["q2"]["kernel"].shape == (128, 256)
    assert params["head"][0]["dense"]["kernel"].shape == (128, 128)
    assert "bias" not in params["head"][3]["dense"]  # last fc bias-free


def test_padding_id_zero_is_masked(cfg, model):
    params, _ = model
    emb = scorer.user_embed(params, jnp.array([[0, 1]]), jnp.array([[0, 1]]))
    assert emb.shape == (1, 2, 64)
    np.testing.assert_array_equal(np.asarray(emb[0, 0]), 0.0)
    assert np.abs(np.asarray(emb[0, 1])).sum() > 0


def test_item_tower_shape(cfg, model):
    params, state = model
    ids = jnp.array([[1, 2, 3], [4, 5, 6]])
    emb, ns = scorer.item_tower(params, state, cfg, ids, ids % 30 + 1, True)
    assert emb.shape == (2, 3, 64)


def test_forward_shapes_and_determinism(cfg, model):
    params, state = model
    user = jnp.ones((2, 10, 64))
    items = jnp.ones((2, 7, 64)) * 0.5
    logits1, _ = scorer.scorer_forward(params, state, cfg, user, items)
    logits2, _ = scorer.scorer_forward(params, state, cfg, user, items)
    assert logits1.shape == (2, 7)
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))


def test_forward_items_independent_in_eval(cfg, model):
    """In eval mode each item's score must not depend on other items in the
    batch (required for search correctness: padding items can't perturb real
    scores)."""
    params, state = model
    rng = np.random.default_rng(1)
    user = jnp.asarray(rng.standard_normal((1, 10, 64)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((1, 8, 64)), jnp.float32)
    full, _ = scorer.scorer_forward(params, state, cfg, user, items, False)
    half, _ = scorer.scorer_forward(params, state, cfg, user, items[:, :4], False)
    np.testing.assert_allclose(np.asarray(full[:, :4]), np.asarray(half),
                               rtol=1e-4, atol=1e-5)


def test_score_pairs_end_to_end(cfg, model):
    params, state = model
    B, L, N = 3, 10, 5
    rng = np.random.default_rng(2)
    u_items = jnp.asarray(rng.integers(0, 500, (B, L)))
    u_cates = jnp.asarray(rng.integers(0, 30, (B, L)))
    t_items = jnp.asarray(rng.integers(1, 500, (B, N)))
    t_cates = jnp.asarray(rng.integers(1, 30, (B, N)))
    logits, item_emb, ns = scorer.score_pairs(
        params, state, cfg, u_items, u_cates, t_items, t_cates, training=True)
    assert logits.shape == (B, N)
    assert item_emb.shape == (B, N, 64)
    assert np.isfinite(np.asarray(logits)).all()
    # training updated bn state
    assert not np.array_equal(
        np.asarray(ns["head"][0]["bn"]["mean"]),
        np.asarray(state["head"][0]["bn"]["mean"]))


def test_forward_jit_compiles(cfg, model):
    params, state = model
    fwd = jax.jit(lambda u, i: scorer.scorer_forward(params, state, cfg, u, i)[0])
    out = fwd(jnp.ones((1, 10, 64)), jnp.ones((1, 16, 64)))
    assert out.shape == (1, 16)
