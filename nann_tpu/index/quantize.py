"""Int8 item-embedding quantization for the search index.

Memory enabler for the 100M-item target (BASELINE.json): bf16 embeddings at
100M x 64 are 12.8 GB; int8 + per-item scale halves that to 6.5 GB, so a
single v5e (16 GB) holds a 100M-item shard comfortably even before row
sharding. Symmetric per-row quantization: row = int8 * scale.

The scorer consumes dequantized rows; only the gathered frontier (<= a few
thousand rows/hop) is dequantized, so the extra work is O(frontier), not
O(catalogue). Recall impact is bounded by the scorer's own bf16 noise
(validated in tests/test_quantize.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_embeddings(embs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """fp32 [N, d] -> (int8 values [N, d], fp32 scales [N])."""
    embs = np.asarray(embs, np.float32)
    amax = np.abs(embs).max(axis=1)
    scales = (amax / 127.0).astype(np.float32)
    safe = np.where(scales > 0, scales, 1.0)
    q = np.clip(np.rint(embs / safe[:, None]), -127, 127).astype(np.int8)
    return q, scales


def dequantize_rows(q_rows: jnp.ndarray, scales: jnp.ndarray,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 [..., d] + scales [...] -> dtype [..., d]."""
    return (q_rows.astype(jnp.float32) *
            scales[..., None].astype(jnp.float32)).astype(dtype)


class QuantizedTable:
    """A drop-in row table: jnp.take-compatible [N, d+?] storage.

    Packs int8 values and the fp32 scale per row so a single gather fetches
    both (scale occupies 4 trailing bytes reinterpreted as int8x4)."""

    def __init__(self, embs: np.ndarray):
        q, scales = quantize_embeddings(embs)
        scale_bytes = scales.view(np.int8).reshape(len(scales), 4)
        self.packed = jnp.asarray(np.concatenate([q, scale_bytes], axis=1))
        self.dim = embs.shape[1]

    @property
    def shape(self):
        return self.packed.shape

    def take(self, ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
        rows = jnp.take(self.packed, ids, axis=0)
        return unpack_rows(rows, self.dim, dtype)


def pack_quantized(embs: np.ndarray) -> jnp.ndarray:
    """fp32 [N, d] -> packed int8 [N, d+4] (values + scale bytes)."""
    q, scales = quantize_embeddings(embs)
    scale_bytes = scales.view(np.int8).reshape(len(scales), 4)
    return jnp.asarray(np.concatenate([q, scale_bytes], axis=1))


def unpack_rows(rows: jnp.ndarray, dim: int, dtype=jnp.bfloat16
                ) -> jnp.ndarray:
    """Gathered packed rows [..., dim+4] -> dequantized [..., dim]."""
    q = rows[..., :dim]
    # widening bitcast collapses the trailing 4-byte axis
    scales = jax.lax.bitcast_convert_type(rows[..., dim:], jnp.float32)
    if scales.ndim == rows.ndim:                # some backends keep the axis
        scales = scales[..., 0]
    return dequantize_rows(q, scales, dtype)
