"""Popularity-weighted unique negative sampling.

TPU-native equivalent of `tf.random.fixed_unigram_candidate_sampler(...,
unique=True)` as used by the reference trainer (NANN_impls/nann/model/model.py:
99-107): draw `batch_size * num_neg` *distinct* item indices from the unigram
(popularity) distribution, and report the expected occurrence count for both
sampled and true classes so the loss can apply the logQ correction.

Design: sampling-without-replacement is done with the Gumbel-top-k trick —
perturb log-probabilities with Gumbel noise and take the top k — which is an
exact sampler for the without-replacement unigram distribution and is a single
fused XLA program (one [num_item] vector op + one top_k) instead of the
reference's sequential CPU rejection loop. Expected counts use the same
closed-form approximation TF uses for unique sampling:
E[count] = 1 - (1 - p)^k = -expm1(k * log1p(-p)).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def expected_count(probs: jnp.ndarray, num_sampled: int) -> jnp.ndarray:
    """Probability that each class appears in a size-`num_sampled` unique
    sample; the logQ-correction denominator."""
    return -jnp.expm1(num_sampled * jnp.log1p(-probs))


def sample_negatives(rng: jax.Array, log_probs: jnp.ndarray, num_sampled: int
                     ) -> jnp.ndarray:
    """Draw `num_sampled` distinct indices from softmax-free unigram weights.

    Args:
        rng: PRNG key.
        log_probs: [num_item] unnormalised log popularity weights.
        num_sampled: number of distinct indices to draw.

    Returns:
        [num_sampled] int32 indices into the item array (0-based, like the
        reference's sampler over range_max=num_item).
    """
    gumbel = jax.random.gumbel(rng, log_probs.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(log_probs + gumbel, num_sampled)
    return idx.astype(jnp.int32)
