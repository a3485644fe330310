"""Feature extraction: item/user embeddings from a trained checkpoint.

Reference: `--job-type extract_feature` (NANN_impls/main.py:80-109, item tower
over every item) and the user-side extraction used by test jobs
(main.py:112-141). Output contract: item_ids.npy + item_embs.npy in array
order (the index build and search index both consume this order).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models import scorer
from ..models.layers import Params, State


def extract_item_embeddings(params: Params, state: State, mcfg: ModelConfig,
                            item_features: Dict[str, np.ndarray],
                            batch_size: int = 8192
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the item tower (eval mode) over the full catalogue.

    Returns (item_ids [N], item_embs [N, d_item] fp32) in catalogue order.
    """
    item_ids = np.asarray(item_features["item_id"])
    cate_ids = np.asarray(item_features["cate_id"])
    n = len(item_ids)

    # params/state must be jit ARGUMENTS, not closure captures — captured
    # they become HLO constants, and a 4.2M-item embedding table inlined
    # into the compile payload breaks remote-compile transports (HTTP 413)
    @jax.jit
    def tower(params, state, ids, cates):
        emb, _ = scorer.item_tower(params, state, mcfg, ids, cates,
                                   training=False)
        return emb

    out = np.empty((n, mcfg.item_emb_dim), np.float32)
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        ids = np.zeros(batch_size, np.int32)
        cates = np.zeros(batch_size, np.int32)
        ids[:end - start] = item_ids[start:end]
        cates[:end - start] = cate_ids[start:end]
        emb = tower(params, state, jnp.asarray(ids), jnp.asarray(cates))
        out[start:end] = np.asarray(emb[:end - start], np.float32)
    return item_ids, out


def extract_user_embeddings(params: Params, batch: Dict[str, np.ndarray]
                            ) -> np.ndarray:
    """User behavior sequences -> [B, L, d_user] sequence embeddings."""
    return np.asarray(scorer.user_embed(
        params, jnp.asarray(batch["item_ids"]), jnp.asarray(batch["cate_ids"])))
