"""The NANN target-attention user-item scorer, pure JAX.

Functional re-design of the reference model (NANN_impls/nann/model/model.py):
  * id/category embedding tables with 0 = padding masked to zero (:175-181)
  * item tower: 3 DNN blocks over concat(item_emb, cate_emb) (:160-173)
  * user "tower": embedding concat of the behavior sequence (:151-158)
  * scorer: nonlinear attention (model_util.py:70-97) + 4-layer MLP head
    (:214-221, last layer bias-free) producing one logit per (user, item) pair.

The scorer-only forward (`scorer_forward`) takes (user_seq_emb, item_emb) and is
the delivery contract — the analogue of the reference's frozen_graph.pb inner
graph (delivery/convert_meta.py). Everything is shaped for the MXU: batched
[B, N, D] matmuls, no data-dependent shapes, configurable bf16 compute.

Params/state are plain nested dicts (pytrees), so sharding annotations,
optimizers, and delivery serialisation all operate on a transparent structure.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers
from .layers import Params, State

_ITEM_TOWER_SPECS = (  # (norm_op, active_op) per layer; model.py:165-169
    ("bn", "prelu"),
    ("bn", "prelu"),
    (None, None),
)
_HEAD_SPECS = (  # model.py:214-220; last layer bias-free for fusion friendliness
    ("bn", "prelu"),
    ("bn", "prelu"),
    ("bn", "prelu"),
    (None, None),
)


def init_scorer(rng: jax.Array, cfg: ModelConfig) -> Tuple[Params, State]:
    """Initialise all scorer parameters and batch-norm state."""
    d = cfg.emb_dim
    d_item = cfg.item_emb_dim        # 2*emb_dim
    d_user = cfg.user_emb_dim        # 2*emb_dim
    keys = iter(jax.random.split(rng, 32))

    emb_std = 1.0 / math.sqrt(d)
    params: Params = {
        # hash tables; row 0 is the padding row (masked at lookup)
        "ht_item": emb_std * jax.random.truncated_normal(
            next(keys), -2.0, 2.0, (cfg.num_item + 1, d), dtype=jnp.float32),
        "ht_cate": emb_std * jax.random.truncated_normal(
            next(keys), -2.0, 2.0, (cfg.num_cate + 1, d), dtype=jnp.float32),
    }
    state: State = {}

    # item tower
    tower_params, tower_state = [], []
    in_dim = d_item
    for i, ((norm, act), out_dim) in enumerate(zip(_ITEM_TOWER_SPECS, cfg.item_tower_dims)):
        use_bias = True
        p, s = layers.dnn_init(next(keys), in_dim, out_dim, use_bias, norm, act)
        tower_params.append(p)
        tower_state.append(s)
        in_dim = out_dim
    params["item_tower"] = tower_params
    state["item_tower"] = tower_state

    # nonlinear attention projections (q from item emb, k from user seq emb)
    m1, m2 = cfg.att_proj_mult1, cfg.att_proj_mult2
    params["att"] = {
        "q1": layers.dense_init(next(keys), d_item, m1 * d_user),
        "q1_prelu": layers.prelu_init(m1 * d_user),
        "q2": layers.dense_init(next(keys), m1 * d_user, m2 * d_user),
        "k1": layers.dense_init(next(keys), d_user, m1 * d_user),
        "k1_prelu": layers.prelu_init(m1 * d_user),
        "k2": layers.dense_init(next(keys), m1 * d_user, m2 * d_user),
    }

    # MLP head over concat(att_out, item_emb)
    head_params, head_state = [], []
    in_dim = d_user + cfg.item_tower_dims[-1]
    for i, ((norm, act), out_dim) in enumerate(zip(_HEAD_SPECS, cfg.head_dims)):
        use_bias = i < len(cfg.head_dims) - 1
        p, s = layers.dnn_init(next(keys), in_dim, out_dim, use_bias, norm, act)
        head_params.append(p)
        head_state.append(s)
        in_dim = out_dim
    params["head"] = head_params
    state["head"] = head_state

    return params, state


def _masked_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup with id 0 (padding/missing) mapped to the zero vector
    (reference model.py:175-181)."""
    emb = jnp.take(table, ids, axis=0)
    mask = (ids > 0).astype(emb.dtype)
    return emb * mask[..., None]


def user_embed(params: Params, item_ids: jnp.ndarray, cate_ids: jnp.ndarray
               ) -> jnp.ndarray:
    """Behavior sequence -> user sequence embedding [B, L, 2*emb_dim]
    (reference get_user_emb, model.py:151-158)."""
    e_item = _masked_lookup(params["ht_item"], item_ids)
    e_cate = _masked_lookup(params["ht_cate"], cate_ids)
    return jnp.concatenate([e_item, e_cate], axis=-1)


def item_tower(params: Params, state: State, cfg: ModelConfig,
               item_ids: jnp.ndarray, cate_ids: jnp.ndarray, training: bool
               ) -> Tuple[jnp.ndarray, State]:
    """Item/category ids -> item embedding [..., item_emb_dim]
    (reference get_item_emb, model.py:160-173)."""
    e_item = _masked_lookup(params["ht_item"], item_ids)
    e_cate = _masked_lookup(params["ht_cate"], cate_ids)
    x = jnp.concatenate([e_item, e_cate], axis=-1)
    dt = jnp.dtype(cfg.compute_dtype)
    new_tower_state = []
    for p, s, (norm, act) in zip(params["item_tower"], state["item_tower"],
                                 _ITEM_TOWER_SPECS):
        x, ns = layers.dnn_apply(p, s, x, training, norm, act,
                                 cfg.bn_momentum, cfg.bn_epsilon, dt)
        new_tower_state.append(ns)
    return x.astype(jnp.float32), {**state, "item_tower": new_tower_state}


def _nonlinear_attention(att: Params, item_emb: jnp.ndarray,
                         user_seq_emb: jnp.ndarray, dt) -> jnp.ndarray:
    """Target attention (reference model_util.py:70-97).

    item_emb:     [B, N, d_item]   (queries)
    user_seq_emb: [B, L, d_user]   (keys and values)
    returns       [B, N, d_user]   (attention-pooled user representation per item)
    """
    q = layers.prelu(att["q1_prelu"], layers.dense(att["q1"], item_emb, dt))
    q = layers.dense(att["q2"], q, dt)                       # [B, N, 4d]
    k = layers.prelu(att["k1_prelu"], layers.dense(att["k1"], user_seq_emb, dt))
    k = layers.dense(att["k2"], k, dt)                       # [B, L, 4d]
    d_k = q.shape[-1]
    logits = jnp.einsum("bnd,bld->bnl", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    weights = jax.nn.softmax(logits, axis=-1).astype(dt)     # [B, N, L]
    # weighted sum of values == reference's broadcast-multiply + reduce_sum
    return jnp.einsum("bnl,bld->bnd", weights, user_seq_emb.astype(dt),
                      preferred_element_type=jnp.float32).astype(dt)


def scorer_forward(params: Params, state: State, cfg: ModelConfig,
                   user_seq_emb: jnp.ndarray, item_emb: jnp.ndarray,
                   training: bool = False) -> Tuple[jnp.ndarray, State]:
    """Dense scorer: (user sequence embedding, item embeddings) -> logits.

    This is the delivery-contract forward (reference Model.forward,
    model.py:188-233): attention over the user sequence conditioned on each
    item, concat with the item embedding, 4-layer MLP head.

    user_seq_emb: [B, L, d_user]
    item_emb:     [B, N, d_item]
    returns:      logits [B, N], new_state
    """
    dt = jnp.dtype(cfg.compute_dtype)
    att_out = _nonlinear_attention(params["att"], item_emb.astype(dt),
                                   user_seq_emb.astype(dt), dt)
    x = jnp.concatenate([att_out, item_emb.astype(dt)], axis=-1)
    new_head_state = []
    for p, s, (norm, act) in zip(params["head"], state["head"], _HEAD_SPECS):
        x, ns = layers.dnn_apply(p, s, x, training, norm, act,
                                 cfg.bn_momentum, cfg.bn_epsilon, dt)
        new_head_state.append(ns)
    logits = jnp.squeeze(x, axis=-1).astype(jnp.float32)     # [B, N]
    return logits, {**state, "head": new_head_state}


def score_pairs(params: Params, state: State, cfg: ModelConfig,
                user_item_ids: jnp.ndarray, user_cate_ids: jnp.ndarray,
                target_item_ids: jnp.ndarray, target_cate_ids: jnp.ndarray,
                training: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
    """End-to-end scoring from raw ids: returns (logits, item_emb, new_state).

    item_emb is returned because FGSM training perturbs it
    (reference model.py:124-143)."""
    user_seq = user_embed(params, user_item_ids, user_cate_ids)
    item_emb, state = item_tower(params, state, cfg, target_item_ids,
                                 target_cate_ids, training)
    logits, state = scorer_forward(params, state, cfg, user_seq, item_emb,
                                   training)
    return logits, item_emb, state
