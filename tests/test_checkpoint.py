"""Checkpoint save/restore round-trip and auto-resume."""

import jax
import jax.numpy as jnp
import numpy as np

from nann_tpu.config import ModelConfig, TrainConfig
from nann_tpu.train import create_train_state
from nann_tpu.train.dataclasses_io import restore_train_state, save_train_state
from nann_tpu.train.loop import latest_checkpoint_step


def test_roundtrip(tmp_path):
    mcfg = ModelConfig(num_item=50, num_cate=5, emb_dim=4, max_seq_length=6,
                       item_tower_dims=(8, 8, 8), head_dims=(8, 8, 8, 1))
    tcfg = TrainConfig()
    state, _ = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    state2, _ = create_train_state(jax.random.PRNGKey(1), mcfg, tcfg)

    p = str(tmp_path / "step_5")
    save_train_state(p, state)
    restored = restore_train_state(p, state2)

    np.testing.assert_array_equal(np.asarray(restored.params["ht_item"]),
                                  np.asarray(state.params["ht_item"]))
    np.testing.assert_array_equal(
        np.asarray(restored.bn_state["head"][0]["bn"]["var"]),
        np.asarray(state.bn_state["head"][0]["bn"]["var"]))
    assert int(restored.step) == int(state.step)


def test_latest_checkpoint_step(tmp_path):
    assert latest_checkpoint_step(str(tmp_path)) is None
    (tmp_path / "step_10").mkdir()
    (tmp_path / "step_200").mkdir()
    (tmp_path / "junk").mkdir()
    assert latest_checkpoint_step(str(tmp_path)) == 200
