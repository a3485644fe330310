"""The folded frontier scorer — the production per-hop scoring path.

The per-hop hot path of the search scores a frontier of F item embeddings
against one user: q-projections -> target attention over the L-step user
sequence -> 4-layer MLP head (models/scorer.py). Two inference-time
simplifications keep it lean:
  * eval-mode BatchNorm folds into per-feature scale/shift (fold_scorer), so
    every DNN block is matmul + affine + PReLU;
  * the user-side k-projections and values depend only on the query, so they
    are precomputed once per query (precompute_user) instead of per hop —
    the reference recomputes them inside every BlazeXlaOp invocation.

score_frontier_reference is the scorer the fused search runs (and the oracle
its tests compare against): XLA fuses each dot's f32-accumulate -> affine ->
PReLU -> bf16-convert epilogue into one kernel, which measured at ~143 TF/s
on v5e — near MXU peak (scripts/scorer_probe.py). The hand-written Pallas
equivalent measured 1.2-10x slower on every probed shape and lives in
experimental/pallas_scorer.py with the demotion rationale.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.layers import Params, State


def _fold_affine(dense_p, bn_p, bn_s, epsilon):
    """dense (+bias) followed by eval-mode BN -> (kernel, scale, shift) such
    that y = (x @ kernel) * scale + shift."""
    kernel = dense_p["kernel"]
    bias = dense_p.get("bias", jnp.zeros((kernel.shape[1],)))
    if bn_p is None:
        return kernel, jnp.ones((kernel.shape[1],)), bias
    scale = bn_p["gamma"] * jax.lax.rsqrt(bn_s["var"] + epsilon)
    shift = bn_p["beta"] - bn_s["mean"] * scale + bias * scale
    return kernel, scale, shift


def fold_scorer(params: Params, state: State, mcfg: ModelConfig
                ) -> Dict[str, jnp.ndarray]:
    """Fold the eval-mode scorer (attention + head) into plain affine weights."""
    att = params["att"]
    eps = mcfg.bn_epsilon
    folded = {
        "q1_k": att["q1"]["kernel"], "q1_b": att["q1"]["bias"],
        "q1_alpha": att["q1_prelu"]["alpha"],
        "q2_k": att["q2"]["kernel"], "q2_b": att["q2"]["bias"],
        "k1_k": att["k1"]["kernel"], "k1_b": att["k1"]["bias"],
        "k1_alpha": att["k1_prelu"]["alpha"],
        "k2_k": att["k2"]["kernel"], "k2_b": att["k2"]["bias"],
    }
    specs = (("h1", True), ("h2", True), ("h3", True), ("h4", False))
    for (name, has_bn), p, s in zip(specs, params["head"], state["head"]):
        kernel, scale, shift = _fold_affine(
            p["dense"], p.get("bn") if has_bn else None,
            s.get("bn") if has_bn else None, eps)
        folded[f"{name}_k"] = kernel
        folded[f"{name}_scale"] = scale
        folded[f"{name}_shift"] = shift
        if has_bn:
            folded[f"{name}_alpha"] = p["prelu"]["alpha"]
    return folded


def precompute_user(folded: Dict[str, jnp.ndarray], user_seq_emb: jnp.ndarray,
                    dt=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query user-side work: k-projections + values.

    user_seq_emb [L, d_user] -> (k_proj [L, 4d], v [L, d_user])."""
    u = user_seq_emb.astype(dt)
    k = jnp.dot(u, folded["k1_k"].astype(dt),
                preferred_element_type=jnp.float32) + folded["k1_b"]
    alpha = folded["k1_alpha"]
    k = jnp.maximum(k, 0) + alpha * jnp.minimum(k, 0)
    k = jnp.dot(k.astype(dt), folded["k2_k"].astype(dt),
                preferred_element_type=jnp.float32) + folded["k2_b"]
    return k.astype(dt), u


def _prelu(x, alpha):
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def score_frontier_reference(folded: Dict[str, jnp.ndarray],
                             k_proj: jnp.ndarray, v: jnp.ndarray,
                             item_emb: jnp.ndarray, dt=jnp.bfloat16
                             ) -> jnp.ndarray:
    """Pure-jnp oracle with identical math to the kernel."""
    e = item_emb.astype(dt)
    q = jnp.dot(e, folded["q1_k"].astype(dt),
                preferred_element_type=jnp.float32) + folded["q1_b"]
    q = _prelu(q, folded["q1_alpha"])
    q = jnp.dot(q.astype(dt), folded["q2_k"].astype(dt),
                preferred_element_type=jnp.float32) + folded["q2_b"]
    d_k = q.shape[-1]
    logits = jnp.dot(q.astype(dt), k_proj.astype(dt).T,
                     preferred_element_type=jnp.float32) / math.sqrt(d_k)
    w = jax.nn.softmax(logits, axis=-1)
    att = jnp.dot(w.astype(dt), v.astype(dt),
                  preferred_element_type=jnp.float32)
    x = jnp.concatenate([att.astype(dt), e], axis=-1)
    for name in ("h1", "h2", "h3"):
        x = jnp.dot(x, folded[f"{name}_k"].astype(dt),
                    preferred_element_type=jnp.float32)
        x = x * folded[f"{name}_scale"] + folded[f"{name}_shift"]
        x = _prelu(x, folded[f"{name}_alpha"]).astype(dt)
    x = jnp.dot(x, folded["h4_k"].astype(dt),
                preferred_element_type=jnp.float32)
    x = x * folded["h4_scale"] + folded["h4_shift"]
    return x[:, 0].astype(jnp.float32)
