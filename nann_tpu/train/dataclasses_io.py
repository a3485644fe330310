"""Checkpoint save/restore for TrainState (orbax-backed).

The TPU-native Saver (reference: tf.train.Saver usage in NANN_impls/main.py:
292-298). Each checkpoint directory holds the full TrainState pytree —
params, batch-norm state, optimizer state, step — so resume is exact.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from .step import TrainState


def save_train_state(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (shapes/dtypes must match)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, abstract)
