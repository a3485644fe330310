"""Unit tests for nann_tpu.models.layers against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.models import layers


def test_dense_matches_numpy(rng):
    key = jax.random.PRNGKey(0)
    p = layers.dense_init(key, 16, 8)
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    y = layers.dense(p, x)
    expected = np.asarray(x) @ np.asarray(p["kernel"]) + np.asarray(p["bias"])
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-5)


def test_dense_no_bias():
    p = layers.dense_init(jax.random.PRNGKey(1), 4, 4, use_bias=False)
    assert "bias" not in p


def test_prelu():
    p = layers.prelu_init(3)
    x = jnp.array([[-1.0, 0.0, 2.0], [4.0, -2.0, -0.5]])
    y = layers.prelu(p, x)
    expected = np.where(np.asarray(x) > 0, np.asarray(x), 0.25 * np.asarray(x))
    np.testing.assert_allclose(np.asarray(y), expected)


def test_layer_norm_zero_mean_unit_var(rng):
    p = layers.ln_init(32)
    x = jnp.asarray(rng.standard_normal((5, 32)) * 3 + 7, jnp.float32)
    y = np.asarray(layers.layer_norm(p, x))
    np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-2)


def test_batch_norm_train_normalizes_and_updates_state(rng):
    p, s = layers.bn_init(8)
    x = jnp.asarray(rng.standard_normal((64, 8)) * 2 + 5, jnp.float32)
    y, new_s = layers.batch_norm(p, s, x, training=True, momentum=0.9)
    yn = np.asarray(y)
    np.testing.assert_allclose(yn.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(yn.std(0), 1.0, atol=1e-2)
    # moving stats move toward batch stats
    assert np.all(np.asarray(new_s["mean"]) != 0.0)
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               0.1 * np.asarray(x).mean(0), rtol=1e-4)


def test_batch_norm_eval_uses_moving_stats(rng):
    p, s = layers.bn_init(4)
    s = {"mean": jnp.full((4,), 2.0), "var": jnp.full((4,), 4.0)}
    x = jnp.full((3, 4), 6.0)
    y, new_s = layers.batch_norm(p, s, x, training=False, epsilon=0.0)
    np.testing.assert_allclose(np.asarray(y), (6.0 - 2.0) / 2.0, rtol=1e-5)
    assert new_s is s


def test_batch_norm_3d_axes(rng):
    # normalizes over batch AND item axes, like tf.layers.batch_normalization
    p, s = layers.bn_init(8)
    x = jnp.asarray(rng.standard_normal((4, 16, 8)) + 3, jnp.float32)
    y, _ = layers.batch_norm(p, s, x, training=True)
    yn = np.asarray(y).reshape(-1, 8)
    np.testing.assert_allclose(yn.mean(0), 0.0, atol=1e-3)


def test_dnn_block_shapes():
    p, s = layers.dnn_init(jax.random.PRNGKey(0), 16, 32,
                           norm_op="bn", active_op="prelu")
    x = jnp.ones((4, 16))
    y, ns = layers.dnn_apply(p, s, x, True, "bn", "prelu")
    assert y.shape == (4, 32)
    assert "bn" in ns


def test_dense_bf16_compute_close_to_fp32(rng):
    p = layers.dense_init(jax.random.PRNGKey(0), 64, 64)
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    y32 = layers.dense(p, x)
    y16 = layers.dense(p, x, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(y32),
                               rtol=0.1, atol=0.1)
