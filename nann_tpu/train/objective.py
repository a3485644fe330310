"""Training objective: logQ-corrected sampled sigmoid cross-entropy + FGSM.

Re-derivation of the reference loss (NANN_impls/nann/model/model.py:94-149):

  1. per batch, draw B*num_neg unique popularity-weighted negatives and build
     per-row targets [gt, neg_1..neg_n] with labels [1, 0..0],
  2. logits -= log(expected_count)  (the sampled-softmax logQ correction),
  3. loss_xe = mean sigmoid cross-entropy,
  4. FGSM: perturb the *item tower output* by eps * sign(d loss_xe / d item_emb)
     and add a KL(stop_grad(clean logits) || adversarial logits) consistency
     term — this is the robustness trick that lets the scorer survive the
     HNSW-graph distribution shift (README.md:13-14 of the reference).

In JAX the double-backprop structure is direct: an inner function of item_emb
gives loss_xe via `jax.value_and_grad`, and the outer `jax.grad` for the
optimizer differentiates through everything including the FGSM branch, exactly
as TF's GradientTape construction does.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, TrainConfig
from ..models import scorer
from ..models.layers import Params, State
from .sampler import expected_count, sample_negatives


def build_targets(rng: jax.Array, batch: Dict[str, jnp.ndarray],
                  item_ids: jnp.ndarray, cate_ids: jnp.ndarray,
                  log_probs: jnp.ndarray, probs: jnp.ndarray,
                  num_neg: int) -> Dict[str, jnp.ndarray]:
    """Assemble [B, 1+num_neg] target ids / cate ids / labels / log expected
    counts (reference model.py:95-118)."""
    B = batch["gt_item_id"].shape[0]
    if num_neg * B > log_probs.shape[0]:
        raise ValueError(
            f"unique negative sampling needs num_neg*batch ({num_neg * B}) "
            f"<= num_item ({log_probs.shape[0]})")
    sampled = sample_negatives(rng, log_probs, num_neg * B)       # [B*num_neg]
    sampled = sampled.reshape(B, num_neg)

    tgt_item = jnp.concatenate(
        [batch["gt_item_id"][:, None], jnp.take(item_ids, sampled, axis=0)], axis=1)
    tgt_cate = jnp.concatenate(
        [batch["gt_cate_id"][:, None], jnp.take(cate_ids, sampled, axis=0)], axis=1)

    true_exp = expected_count(batch["weight_tag"], num_neg * B)   # [B]
    samp_exp = expected_count(jnp.take(probs, sampled, axis=0), num_neg * B)
    exp_cnt = jnp.concatenate([true_exp[:, None], samp_exp], axis=1)
    log_exp_cnt = jnp.log(1e-20 + exp_cnt)

    labels = jnp.concatenate(
        [jnp.ones((B, 1), jnp.float32), jnp.zeros((B, num_neg), jnp.float32)], axis=1)
    return {"item_id": tgt_item, "cate_id": tgt_cate,
            "labels": labels, "log_exp_cnt": log_exp_cnt}


def _sigmoid_xent(labels: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Mean elementwise sigmoid cross-entropy (tf.losses.sigmoid_cross_entropy
    with unit weights)."""
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)


def _kl_with_logits(q_logit: jnp.ndarray, p_logit: jnp.ndarray) -> jnp.ndarray:
    """KL(softmax(q) || softmax(p)) averaged over rows (model_util.py:100-104)."""
    q = jax.nn.softmax(q_logit, axis=-1)
    qlogq = jnp.mean(jnp.sum(q * jax.nn.log_softmax(q_logit, axis=-1), axis=-1))
    qlogp = jnp.mean(jnp.sum(q * jax.nn.log_softmax(p_logit, axis=-1), axis=-1))
    return qlogq - qlogp


def _accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits, -1) == jnp.argmax(labels, -1))
                    .astype(jnp.float32))


def nann_loss(params: Params, state: State, mcfg: ModelConfig, tcfg: TrainConfig,
              batch: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray]
              ) -> Tuple[jnp.ndarray, Tuple[State, Dict[str, jnp.ndarray]]]:
    """Full training loss. Returns (loss, (new_state, metrics))."""
    user_seq = scorer.user_embed(params, batch["item_ids"], batch["cate_ids"])
    item_emb, state1 = scorer.item_tower(
        params, state, mcfg, targets["item_id"], targets["cate_id"], training=True)

    labels = targets["labels"]
    log_exp_cnt = targets["log_exp_cnt"]

    def xe_of_item_emb(emb):
        logits_origin, st = scorer.scorer_forward(
            params, state1, mcfg, user_seq, emb, training=True)
        logits = logits_origin - log_exp_cnt
        return _sigmoid_xent(labels, logits), (logits_origin, logits, st)

    (loss_xe, (logits_origin, logits, state2)), emb_grad = jax.value_and_grad(
        xe_of_item_emb, has_aux=True)(item_emb)

    if tcfg.adv_eps > 0:
        item_emb_adv = item_emb + tcfg.adv_eps * jnp.sign(emb_grad)
        logits_adv, _ = scorer.scorer_forward(
            params, state2, mcfg, user_seq, item_emb_adv, training=True)
        logits_adv = logits_adv - log_exp_cnt
        loss_adv = _kl_with_logits(jax.lax.stop_gradient(logits), logits_adv)
    else:
        loss_adv = jnp.float32(0.0)

    loss = loss_xe + tcfg.adv_weight * loss_adv
    metrics = {
        "loss": loss,
        "loss_xe": loss_xe,
        "loss_adv": loss_adv,
        "acc": _accuracy(logits, labels),
        "acc_origin": _accuracy(logits_origin, labels),
    }
    return loss, (state2, metrics)
