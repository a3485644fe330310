"""Pre-schedule (float-lr) checkpoints restore into today's skeleton.

Round-4 advisor finding: switching adamw to an always-callable lr schedule
changed the opt_state pytree (EmptyState -> ScaleByScheduleState.count), and
orbax's strict structure matching made every checkpoint saved before the
change unreadable. restore_train_state now falls back to a legacy-shaped
template and migrates (count := restored step).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nann_tpu.config import ModelConfig, TrainConfig
from nann_tpu.models import scorer
from nann_tpu.train.dataclasses_io import restore_train_state, save_train_state
from nann_tpu.train.step import TrainState, create_train_state


def _small():
    mcfg = ModelConfig(num_item=50, num_cate=5, emb_dim=8, max_seq_length=6,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 4, 1))
    tcfg = TrainConfig(batch_size=4, num_neg=4)
    return mcfg, tcfg


def test_legacy_float_lr_checkpoint_restores(tmp_path):
    mcfg, tcfg = _small()
    # old-format state: adamw built with a FLOAT lr (pre-schedule commit)
    params, bn_state = scorer.init_scorer(jax.random.PRNGKey(0), mcfg)
    legacy_tx = optax.adamw(3e-3, weight_decay=1e-4)
    legacy = TrainState(params, bn_state, legacy_tx.init(params),
                        jnp.asarray(123, jnp.int32))
    assert isinstance(legacy.opt_state[-1], optax.EmptyState)
    path = str(tmp_path / "step_123")
    save_train_state(path, legacy)

    # today's skeleton (schedule callable -> ScaleByScheduleState tail)
    state, _tx = create_train_state(jax.random.PRNGKey(1), mcfg, tcfg)
    assert isinstance(state.opt_state[-1], optax.ScaleByScheduleState)
    restored = restore_train_state(path, state)

    assert int(restored.step) == 123
    assert isinstance(restored.opt_state[-1], optax.ScaleByScheduleState)
    assert int(restored.opt_state[-1].count) == 123
    np.testing.assert_array_equal(
        np.asarray(restored.params["ht_item"]),
        np.asarray(params["ht_item"]))


def test_new_format_roundtrip_unaffected(tmp_path):
    mcfg, tcfg = _small()
    state, _tx = create_train_state(jax.random.PRNGKey(2), mcfg, tcfg)
    state = dataclasses.replace(state, step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "step_7")
    save_train_state(path, state)
    template, _tx2 = create_train_state(jax.random.PRNGKey(3), mcfg, tcfg)
    restored = restore_train_state(path, template)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["ht_item"]),
                                  np.asarray(state.params["ht_item"]))


def test_non_checkpoint_path_raises(tmp_path):
    mcfg, tcfg = _small()
    template, _tx = create_train_state(jax.random.PRNGKey(4), mcfg, tcfg)
    with pytest.raises(Exception):
        restore_train_state(str(tmp_path / "nope"), template)
