"""Sampler statistics tests (property tests against the unigram distribution)."""

import jax
import jax.numpy as jnp
import numpy as np

from nann_tpu.train import sampler


def test_samples_are_unique():
    probs = jnp.ones(1000) / 1000
    idx = sampler.sample_negatives(jax.random.PRNGKey(0), jnp.log(probs), 200)
    assert len(np.unique(np.asarray(idx))) == 200


def test_samples_in_range():
    probs = jnp.ones(50) / 50
    idx = sampler.sample_negatives(jax.random.PRNGKey(1), jnp.log(probs), 50)
    a = np.asarray(idx)
    assert a.min() >= 0 and a.max() < 50


def test_popular_items_sampled_more():
    # one item with 100x the weight of the rest must show up much more often
    n = 2000
    w = np.ones(n)
    w[7] = 100.0
    log_probs = jnp.log(jnp.asarray(w / w.sum(), jnp.float32))
    hits = 0
    trials = 200
    for t in range(trials):
        idx = sampler.sample_negatives(jax.random.PRNGKey(t), log_probs, 20)
        hits += int(7 in np.asarray(idx))
    # p(item7 in sample) ~ 1-(1-0.0476)^20 ~ 0.62; uniform item would be ~1%
    assert hits / trials > 0.4


def test_expected_count_formula():
    vals = [0.5, 0.01, 1e-6]
    ec = np.asarray(sampler.expected_count(jnp.array(vals), 100))
    # float64 oracle via the same numerically-stable form
    expected = -np.expm1(100 * np.log1p(-np.asarray(vals, np.float64)))
    np.testing.assert_allclose(ec, expected, rtol=1e-4)


def test_marginal_frequency_tracks_popularity():
    """Empirical inclusion frequency should approximate 1-(1-p)^k."""
    n = 500
    rng = np.random.default_rng(5)
    w = rng.random(n) + 0.01
    p = w / w.sum()
    log_probs = jnp.log(jnp.asarray(p, jnp.float32))
    k = 50
    counts = np.zeros(n)
    trials = 300
    for t in range(trials):
        idx = sampler.sample_negatives(jax.random.PRNGKey(1000 + t), log_probs, k)
        counts[np.asarray(idx)] += 1
    freq = counts / trials
    pred = 1 - (1 - p) ** k
    # correlation between predicted and empirical inclusion probabilities
    c = np.corrcoef(freq, pred)[0, 1]
    assert c > 0.95, c
