"""Top-k ops: batched top-k and per-ragged-row top-k with runtime k.

Equivalents of the reference's topk_op family:
  BlazeTopK        (BlazeTopK_kernel.cc:13) — batched top-k. The reference
      uses a sampled-threshold + partial_sort CPU algorithm; on TPU the
      hardware-friendly formulation is lax.top_k at a static cap with runtime-k
      masking (see also search/beam._masked_topk, the fused in-search variant).
  BatchTopKOnRT    (BatchTopKOnRT_kernel.cc:25) — top-k per ragged row with a
      per-row k vector and an `ascending` option.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def blaze_topk(values: jnp.ndarray, k: jnp.ndarray, k_cap: int,
               ascending: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched top-k over the last axis with runtime per-batch k.

    values [..., n]; k scalar or [...]-shaped int; k_cap static upper bound.
    Returns (top values [..., k_cap], indices [..., k_cap]); slots >= k hold
    +/-inf sentinels and index -1.
    """
    sign = 1.0 if not ascending else -1.0
    v = values * sign
    top_v, top_i = jax.lax.top_k(v, min(k_cap, values.shape[-1]))
    pos = jnp.arange(top_v.shape[-1])
    live = pos < jnp.asarray(k)[..., None] if jnp.ndim(k) else pos < k
    pad = jnp.float32(-jnp.inf if not ascending else jnp.inf)
    return (jnp.where(live, top_v * sign, pad),
            jnp.where(live, top_i, -1))


def batch_topk_on_rt(values: np.ndarray, row_splits: np.ndarray,
                     k: np.ndarray, ascending: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-ragged-row top-k (host-side, BatchTopKOnRT semantics): returns a
    new ragged (values, row_splits) with each row cut to its k best."""
    k = np.broadcast_to(np.asarray(k), (len(row_splits) - 1,))
    out_rows = []
    for i in range(len(row_splits) - 1):
        row = values[row_splits[i]:row_splits[i + 1]]
        ki = min(int(k[i]), len(row))
        order = np.argsort(row, kind="stable")
        if not ascending:
            order = order[::-1]
        out_rows.append(row[order[:ki]])
    splits = np.zeros(len(out_rows) + 1, np.int64)
    for i, r in enumerate(out_rows):
        splits[i + 1] = splits[i] + len(r)
    vals = np.concatenate(out_rows) if out_rows else np.zeros(0, values.dtype)
    return vals, splits
