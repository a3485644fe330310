"""Checkpoint save/restore for TrainState (orbax-backed).

The TPU-native Saver (reference: tf.train.Saver usage in NANN_impls/main.py:
292-298). Each checkpoint directory holds the full TrainState pytree —
params, batch-norm state, optimizer state, step — so resume is exact.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import optax
import orbax.checkpoint as ocp

from ..utils import get_logger
from .step import TrainState

logger = get_logger("nann_tpu.train")


def save_train_state(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (shapes/dtypes must match).

    Legacy fallback: checkpoints saved before lr schedules landed were
    written with a FLOAT learning rate, so their adamw opt_state ends in
    optax.EmptyState where today's schedule-callable skeleton has
    ScaleByScheduleState(count). Orbax restore is strict on structure, so
    such checkpoints fail against the new template — retry against a
    legacy-shaped template and migrate (count := restored step, which is
    what the schedule-invariant skeleton would have recorded)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        try:
            return ckptr.restore(path, abstract)
        except Exception as e:  # noqa: BLE001 — orbax raises ValueError
            # subclasses for structure mismatch; anything else re-raises below
            opt = template.opt_state
            if not (isinstance(opt, tuple) and opt
                    and isinstance(opt[-1], optax.ScaleByScheduleState)):
                raise
            legacy = TrainState(template.params, template.bn_state,
                                opt[:-1] + (optax.EmptyState(),),
                                template.step)
            abstract_legacy = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                           legacy)
            try:
                restored = ckptr.restore(path, abstract_legacy)
            except Exception:  # noqa: BLE001 — not legacy either: surface
                raise e from None  # the ORIGINAL (new-format) error
            logger.info(f"restored pre-schedule (float-lr) checkpoint "
                        f"{path}; migrating opt_state (count := step "
                        f"{int(restored.step)})")
            migrated = restored.opt_state[:-1] + (optax.ScaleByScheduleState(
                count=restored.step.astype(jnp.int32)),)
            return TrainState(restored.params, restored.bn_state, migrated,
                              restored.step)
