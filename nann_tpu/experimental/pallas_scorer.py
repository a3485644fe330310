"""Fused Pallas TPU kernel for frontier scoring — DEMOTED experiment.

One pallas_call runs the whole per-hop scorer chain (q-projections -> target
attention -> folded 4-layer head) per frontier tile with weights resident in
VMEM, including a packed-int8 variant that dequantizes in VMEM so the bf16
frontier copy never round-trips HBM.

Why it is here and not in ops/: measured losses on both candidate shapes
(scripts/scorer_probe.py on TPU v5e, 65k rows, chained timing; round 3):

    xla score_frontier      0.041 ms/call   ~143 TF/s   (near MXU peak)
    pallas tile=1024/2048   0.42 ms/call    ~14 TF/s    (10x slower)
    xla int8 dequant+score  0.315 ms/call
    pallas int8 tile=1024   0.391 ms/call               (1.2x slower)

The per-op HBM attribution (scripts/hbm_attrib.py, docs/DESIGN.md forensics
IV) explains why XLA wins: the XLA chain is already optimally fused — bf16
inter-layer buffers with f32-accumulate epilogues fused into each dot — so
the kernel's VMEM-residency advantage buys little, while its hand-tiled
matmuls leave most of the MXU idle. The kernel stays importable (opt-in via
make_searcher(scorer_impl="pallas")) with hardware-verified numerics
(tests/test_scorer_kernel.py) as the baseline for any future attempt.

Reference kernel-parity mandate context: SURVEY.md §2.2; the production
kernel-equivalence surface is the compiled op family (ops/) + the folded XLA
scorer (ops/scorer_kernel.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.scorer_kernel import _prelu

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


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
