"""Fused Pallas TPU kernel for frontier scoring.

The per-hop hot path of the search scores a frontier of F item embeddings
against one user: q-projections -> target attention over the L-step user
sequence -> 4-layer MLP head (models/scorer.py). As stock XLA this is ~15
kernels per hop; here it is ONE pallas_call tiled over the frontier, with all
weights resident in VMEM and fp32 accumulation on the MXU.

Two inference-time simplifications make the kernel small:
  * eval-mode BatchNorm folds into per-feature scale/shift (fold_scorer), so
    every DNN block is matmul + affine + PReLU;
  * the user-side k-projections and values depend only on the query, so they
    are precomputed once per query (precompute_user) instead of per hop —
    the reference recomputes them inside every BlazeXlaOp invocation.

score_frontier_reference is the pure-jnp oracle used by tests; the kernel
must match it to bf16 tolerance.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models.layers import Params, State

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


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


def _score_kernel(k_proj_ref, v_ref, seq_len_ref,
                  q1k, q1b, q1a, q2k, q2b,
                  h1k, h1s, h1t, h1a, h2k, h2s, h2t, h2a,
                  h3k, h3s, h3t, h3a, h4k, h4s, h4t,
                  item_ref, out_ref, scale_ref=None):
    if scale_ref is not None:
        # fused int8 dequant: rows arrive quantized (q * per-row scale,
        # index/quantize.py) and never round-trip a dequantized copy to HBM
        dt = k_proj_ref.dtype
        e = (item_ref[:].astype(jnp.float32) * scale_ref[:]).astype(dt)
    else:
        dt = item_ref.dtype
        e = item_ref[:]                                 # [T, d_item]
    q = jnp.dot(e, q1k[:], preferred_element_type=jnp.float32) + q1b[:]
    q = _prelu(q, q1a[:])
    q = jnp.dot(q.astype(dt), q2k[:],
                preferred_element_type=jnp.float32) + q2b[:]
    d_k = q.shape[-1]
    att = jnp.dot(q.astype(dt), k_proj_ref[:].T,
                  preferred_element_type=jnp.float32) / math.sqrt(d_k)
    # mask lanes beyond the true sequence length (L padded to a lane multiple)
    L_pad = att.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, att.shape, 1)
    att = jnp.where(lane < seq_len_ref[0], att, -jnp.inf)
    w = jax.nn.softmax(att, axis=-1)
    a = jnp.dot(w.astype(dt), v_ref[:], preferred_element_type=jnp.float32)
    x = jnp.concatenate([a.astype(dt), e], axis=-1)     # [T, 2*d]
    for kk, ss, tt, aa in ((h1k, h1s, h1t, h1a), (h2k, h2s, h2t, h2a),
                           (h3k, h3s, h3t, h3a)):
        x = jnp.dot(x, kk[:], preferred_element_type=jnp.float32)
        x = x * ss[:] + tt[:]
        x = _prelu(x, aa[:]).astype(dt)
    x = jnp.dot(x, h4k[:], preferred_element_type=jnp.float32)
    x = x * h4s[:] + h4t[:]
    out_ref[:, :] = x[:, 0].astype(jnp.float32).reshape(out_ref.shape)


def _score_kernel_int8(k_proj_ref, v_ref, seq_len_ref, *rest):
    # pallas passes refs positionally with outputs last; reorder for the
    # shared kernel body (inputs ... item, scale | output)
    *weights, item_ref, scale_ref, out_ref = rest
    _score_kernel(k_proj_ref, v_ref, seq_len_ref, *weights,
                  item_ref, out_ref, scale_ref=scale_ref)


def make_pallas_frontier_scorer(mcfg: ModelConfig, tile: int = 1024,
                                seq_pad: int = 128, interpret: bool = False,
                                packed_int8: bool = False):
    """Returns score(folded, k_proj, v, item_emb [F, d_item]) -> [F] fp32.

    F must be a multiple of `tile`. k_proj/v are padded to seq_pad lanes
    inside; padded attention lanes are masked to -inf.

    packed_int8=True: score(folded, k_proj, v, q_rows int8 [F, d_item],
    scales f32 [F, 1]) — the quantized-index hot shape (VERDICT r2 item 6):
    dequant happens in VMEM inside the kernel, so the bf16 dequantized copy
    of the frontier never round-trips HBM between gather and scorer.
    """
    if not _HAS_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")

    def score(folded, k_proj, v, item_emb, scales=None):
        F, d_item = item_emb.shape
        assert F % tile == 0, (F, tile)
        L = k_proj.shape[0]
        dt = jnp.bfloat16 if packed_int8 else item_emb.dtype
        kp = jnp.zeros((seq_pad, k_proj.shape[1]), dt).at[:L].set(
            k_proj.astype(dt))
        vp = jnp.zeros((seq_pad, v.shape[1]), dt).at[:L].set(v.astype(dt))
        seq_len = jnp.full((1,), L, jnp.int32)

        weights = [
            folded["q1_k"].astype(dt), folded["q1_b"].astype(jnp.float32),
            folded["q1_alpha"].astype(jnp.float32),
            folded["q2_k"].astype(dt), folded["q2_b"].astype(jnp.float32),
        ]
        for name in ("h1", "h2", "h3"):
            weights += [folded[f"{name}_k"].astype(dt),
                        folded[f"{name}_scale"].astype(jnp.float32),
                        folded[f"{name}_shift"].astype(jnp.float32),
                        folded[f"{name}_alpha"].astype(jnp.float32)]
        weights += [folded["h4_k"].astype(dt),
                    folded["h4_scale"].astype(jnp.float32),
                    folded["h4_shift"].astype(jnp.float32)]

        grid = (F // tile,)
        in_specs = (
            [pl.BlockSpec((seq_pad, kp.shape[1]), lambda i: (0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((seq_pad, vp.shape[1]), lambda i: (0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec(memory_space=pltpu.SMEM)] +
            [pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                          memory_space=pltpu.VMEM) for w in weights] +
            [pl.BlockSpec((tile, d_item), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)]
        )
        inputs = (kp, vp, seq_len, *weights, item_emb)
        kernel = _score_kernel
        if packed_int8:
            assert scales is not None and scales.shape == (F, 1), scales
            in_specs = in_specs + [pl.BlockSpec(
                (tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
            inputs = inputs + (scales.astype(jnp.float32),)
            kernel = _score_kernel_int8
        # 2-D [F//128, 128] output with (tile//128, 128) blocks: 1-D fp32
        # outputs hit XLA-vs-Mosaic layout tiling mismatches on TPU, and
        # output blocks need their second-to-last dim divisible by 8
        if not interpret:
            assert tile % 1024 == 0, \
                "compiled mode needs tile % 1024 == 0 (8x128 out blocks)"
        rows = tile // 128
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F // 128, 128), jnp.float32),
            interpret=interpret,
        )(*inputs)
        return out.reshape(F)

    return score
