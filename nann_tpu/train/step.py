"""Train state and the jitted (optionally data-parallel) train step.

Replaces the reference's MirroredStrategy + AdamW setup (NANN_impls/main.py:
240-274) with the TPU-native formulation: one `jax.jit` train step whose batch
is sharded over the mesh's "dp" axis and whose params/optimizer state are
replicated — XLA inserts the gradient psum over ICI automatically from the
sharding annotations (no NCCL machinery). BatchNorm batch statistics are
computed over the *global* batch (an improvement over per-replica
MirroredStrategy stats).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, TrainConfig
from ..models import scorer
from ..models.layers import Params, State
from .objective import build_targets, nann_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Params
    bn_state: State
    opt_state: Any
    step: jnp.ndarray


def lr_schedule_fn(tcfg: TrainConfig, total_steps: Optional[int] = None):
    """Learning-rate schedule from TrainConfig.

    Always returns an optax schedule callable — even for constant lr — so
    the opt_state pytree structure (ScaleByScheduleState.count) is identical
    across schedules: any checkpoint restores into any skeleton, and the
    checkpointed count resumes the schedule where it stopped.
    """
    base = tcfg.learning_rate
    horizon = tcfg.lr_total_steps or total_steps or 0
    if tcfg.lr_schedule == "constant":
        if tcfg.warmup_steps <= 0:
            return optax.schedules.constant_schedule(base)
        return optax.schedules.linear_schedule(
            init_value=0.0, end_value=base,
            transition_steps=tcfg.warmup_steps)
    if tcfg.lr_schedule == "cosine":
        if horizon <= 0:
            raise ValueError("lr_schedule='cosine' needs a decay horizon: "
                             "set lr_total_steps or pass total_steps")
        return optax.schedules.warmup_cosine_decay_schedule(
            init_value=0.0 if tcfg.warmup_steps > 0 else base,
            peak_value=base, warmup_steps=max(tcfg.warmup_steps, 0),
            decay_steps=horizon, end_value=base * tcfg.lr_final_ratio)
    raise ValueError(f"unknown lr_schedule {tcfg.lr_schedule!r} "
                     "(constant|cosine)")


def create_train_state(rng: jax.Array, mcfg: ModelConfig, tcfg: TrainConfig,
                       total_steps: Optional[int] = None,
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    params, bn_state = scorer.init_scorer(rng, mcfg)
    tx = optax.adamw(lr_schedule_fn(tcfg, total_steps),
                     weight_decay=tcfg.weight_decay)
    opt_state = tx.init(params)
    return TrainState(params, bn_state, opt_state, jnp.zeros((), jnp.int32)), tx


def make_train_step(mcfg: ModelConfig, tcfg: TrainConfig,
                    tx: optax.GradientTransformation,
                    item_features: Dict[str, jnp.ndarray],
                    mesh: Optional[Mesh] = None,
                    state_shardings: Optional[Any] = None) -> Callable:
    """Build the jitted train step.

    Args:
        item_features: dict with "item_id", "cate_id" int32 [num_item] and
            "weight_tag" float32 [num_item] popularity probabilities (the
            reference's ub_items.npz contract, convert_UB_to_tfrecord.py:186-193).
        mesh: optional device mesh with a "dp" axis; if given, the step is
            compiled with the batch sharded over it.

    Returns:
        step(state, batch, rng) -> (new_state, metrics)
    """
    item_ids = item_features["item_id"].astype(jnp.int32)
    cate_ids = item_features["cate_id"].astype(jnp.int32)
    probs = item_features["weight_tag"].astype(jnp.float32)
    log_probs = jnp.log(1e-20 + probs)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        targets = build_targets(rng, batch, item_ids, cate_ids,
                                log_probs, probs, tcfg.num_neg)

        def loss_fn(params):
            return nann_loss(params, state.bn_state, mcfg, tcfg, batch, targets)

        grads, (new_bn, metrics) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_bn, new_opt, state.step + 1)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    batch_sharding = {
        "item_ids": NamedSharding(mesh, P("dp", None)),
        "cate_ids": NamedSharding(mesh, P("dp", None)),
        "gt_item_id": NamedSharding(mesh, P("dp")),
        "gt_cate_id": NamedSharding(mesh, P("dp")),
        "weight_tag": NamedSharding(mesh, P("dp")),
    }
    replicated = NamedSharding(mesh, P())
    # default: params/opt_state replicated (prefix pytree broadcasts over the
    # state). Pass state_shardings (e.g. parallel.train_state_shardings) for
    # row-sharded embedding tables — XLA turns the table lookups/updates into
    # collective gathers/scatters over "mp".
    if state_shardings is None:
        state_shardings = replicated
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_sharding, replicated),
        donate_argnums=(0,),
    )
