"""Static id-remap lookup (BlazeGeneralMap / BlazeGeneralMapV2).

The reference (blaze_map_op/blaze_general_map.cc, BlazeGeneralMapV2.cc) is a
string-configured int->int hash map evaluated per request on CPU. The
TPU-native equivalent is a device-resident sorted-key lookup: binary search
via jnp.searchsorted (O(log n) vectorised, no host hop). V1 semantics return
a default on miss; V2 semantics flag misses.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


class IdMap:
    """Immutable int->int map with vectorised device lookup."""

    def __init__(self, keys: np.ndarray, values: np.ndarray,
                 default: int = -1):
        order = np.argsort(keys)
        self._keys = jnp.asarray(np.asarray(keys)[order])
        self._values = jnp.asarray(np.asarray(values)[order])
        self.default = default

    def lookup(self, queries: jnp.ndarray) -> jnp.ndarray:
        """V1 semantics: default on miss."""
        found, hit = self.lookup_v2(queries)
        return jnp.where(hit, found, self.default)

    def lookup_v2(self, queries: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """V2 semantics: returns (values, hit_mask); caller errors on miss."""
        pos = jnp.searchsorted(self._keys, queries)
        pos = jnp.clip(pos, 0, self._keys.shape[0] - 1)
        hit = self._keys[pos] == queries
        return self._values[pos], hit
