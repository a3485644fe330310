"""Brute-force full-corpus scoring — the recall oracle.

Equivalent of the reference `--job-type test_all` (NANN_impls/main.py:194-237):
score every item against the user with the DNN, chunked to bound memory, and
take the global top-k. This is the upper bound that graph search recall is
measured against (the reference's primary correctness metric, SURVEY.md §4.2).

TPU formulation: items are processed in static-size chunks via `lax.map` so the
whole oracle is one jitted program regardless of corpus size; each chunk is a
[chunk, d_item] MXU-friendly batch.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..models import scorer
from ..models.layers import Params, State

NEG_INF = jnp.float32(-jnp.inf)


def make_brute_force_scorer(mcfg: ModelConfig, chunk_size: int = 8192,
                            k: int = 200) -> Callable:
    """Returns jitted oracle(params, state, user_seq_emb, item_embs) ->
    (top_idx [B, k], top_scores [B, k]).

    item_embs is padded up to a multiple of chunk_size internally; padding
    scores are -inf and never reach the top-k.
    """

    @jax.jit
    def oracle(params: Params, state: State, user_seq_emb: jnp.ndarray,
               item_embs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        n = item_embs.shape[0]
        n_pad = -(-n // chunk_size) * chunk_size
        pad = n_pad - n
        items = jnp.pad(item_embs, ((0, pad), (0, 0)))
        chunks = items.reshape(n_pad // chunk_size, chunk_size, -1)

        def score_chunk(chunk):
            # [B, chunk] logits for every user in the batch
            logits, _ = scorer.scorer_forward(
                params, state, mcfg, user_seq_emb,
                jnp.broadcast_to(chunk[None],
                                 (user_seq_emb.shape[0],) + chunk.shape),
                training=False)
            return logits

        # lax.map keeps memory at one chunk; output [C, B, chunk]
        all_scores = jax.lax.map(score_chunk, chunks)
        all_scores = jnp.moveaxis(all_scores, 1, 0).reshape(
            user_seq_emb.shape[0], n_pad)
        valid = jnp.arange(n_pad) < n
        all_scores = jnp.where(valid[None, :], all_scores, NEG_INF)
        top_scores, top_idx = jax.lax.top_k(all_scores, k)
        return top_idx, top_scores

    return oracle


def brute_force_topk(params: Params, state: State, mcfg: ModelConfig,
                     user_seq_emb: jnp.ndarray, item_embs: jnp.ndarray,
                     k: int = 200, chunk_size: int = 8192
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot convenience wrapper around make_brute_force_scorer."""
    oracle = make_brute_force_scorer(mcfg, chunk_size=chunk_size, k=k)
    return oracle(params, state, user_seq_emb, item_embs)
