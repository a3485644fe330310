"""NN building blocks as pure functions over param/state pytrees.

Functional equivalents of the reference blocks (NANN_impls/nann/model/model_util.py):
PReLU (:9), LayerNorm (:14), DNN = dense (+BN/LN) (+PReLU) (:32-67). Written
TPU-first: all matmuls go through `jnp.dot` with a configurable compute dtype
(bf16 on TPU) and fp32 accumulation so XLA maps them onto the MXU.

Param initialisation matches the reference so training dynamics are comparable:
dense kernels use variance-scaling fan-in normal (model_util.py:48), bias 0.1,
PReLU alpha 0.25, BN gamma 1 / beta 0.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
State = Dict[str, Any]


# ----------------------------------------------------------------------------- init


def dense_init(rng: jax.Array, in_dim: int, out_dim: int, use_bias: bool = True,
               dtype=jnp.float32) -> Params:
    """Variance-scaling (fan_in, truncated-normal) kernel + 0.1 bias."""
    stddev = math.sqrt(1.0 / in_dim) / 0.87962566103423978  # truncation correction
    kernel = stddev * jax.random.truncated_normal(
        rng, -2.0, 2.0, (in_dim, out_dim), dtype=jnp.float32)
    p = {"kernel": kernel.astype(dtype)}
    if use_bias:
        p["bias"] = jnp.full((out_dim,), 0.1, dtype=dtype)
    return p


def prelu_init(dim: int, dtype=jnp.float32) -> Params:
    return {"alpha": jnp.full((dim,), 0.25, dtype=dtype)}


def bn_init(dim: int, dtype=jnp.float32) -> Tuple[Params, State]:
    params = {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}
    state = {"mean": jnp.zeros((dim,), jnp.float32),
             "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def ln_init(dim: int, dtype=jnp.float32) -> Params:
    return {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}


def dnn_init(rng: jax.Array, in_dim: int, out_dim: int, use_bias: bool = True,
             norm_op: Optional[str] = None, active_op: Optional[str] = None,
             dtype=jnp.float32) -> Tuple[Params, State]:
    """One reference `DNN` block: dense [+bn|ln] [+prelu]."""
    params: Params = {"dense": dense_init(rng, in_dim, out_dim, use_bias, dtype)}
    state: State = {}
    if norm_op == "bn":
        params["bn"], state["bn"] = bn_init(out_dim, dtype)
    elif norm_op == "ln":
        params["ln"] = ln_init(out_dim, dtype)
    if active_op == "prelu":
        params["prelu"] = prelu_init(out_dim, dtype)
    return params, state


# ----------------------------------------------------------------------------- apply


def dense(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """y = x @ W (+ b). Accumulates in fp32 on the MXU regardless of dtype."""
    dt = compute_dtype or x.dtype
    y = jnp.dot(x.astype(dt), p["kernel"].astype(dt),
                preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(dt)


def prelu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    alpha = p["alpha"].astype(x.dtype)
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def layer_norm(p: Params, x: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    normed = (x - mean) * jax.lax.rsqrt(var + epsilon)
    return p["gamma"].astype(x.dtype) * normed + p["beta"].astype(x.dtype)


def batch_norm(p: Params, s: State, x: jnp.ndarray, training: bool,
               momentum: float = 0.99, epsilon: float = 1e-3
               ) -> Tuple[jnp.ndarray, State]:
    """BatchNorm over all axes but the last; returns (y, new_state).

    Training uses batch statistics and updates the moving stats (reference
    `tf.layers.batch_normalization`, model_util.py:53); eval folds the moving
    stats into an affine transform that XLA fuses into the preceding matmul.
    """
    gamma = p["gamma"].astype(jnp.float32)
    beta = p["beta"].astype(jnp.float32)
    if training:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        new_state = {
            "mean": momentum * s["mean"] + (1 - momentum) * mean,
            "var": momentum * s["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    scale = gamma * jax.lax.rsqrt(var + epsilon)
    shift = beta - mean * scale
    y = x.astype(jnp.float32) * scale + shift
    return y.astype(x.dtype), new_state


def dnn_apply(p: Params, s: State, x: jnp.ndarray, training: bool,
              norm_op: Optional[str] = None, active_op: Optional[str] = None,
              bn_momentum: float = 0.99, bn_epsilon: float = 1e-3,
              compute_dtype=None) -> Tuple[jnp.ndarray, State]:
    out = dense(p["dense"], x, compute_dtype)
    new_s: State = {}
    if norm_op == "bn":
        out, new_s["bn"] = batch_norm(p["bn"], s["bn"], out, training,
                                      bn_momentum, bn_epsilon)
    elif norm_op == "ln":
        out = layer_norm(p["ln"], out)
    if active_op == "prelu":
        out = prelu(p["prelu"], out)
    elif active_op == "relu":
        out = jax.nn.relu(out)
    return out, new_s
