"""Device mesh construction.

The communication story of the TPU build (SURVEY.md §2.6): a 2-axis mesh
  "dp" — data parallel: batch sharding for training, query sharding for bulk
         eval; gradient psum rides ICI (replaces MirroredStrategy/NCCL),
  "mp" — model parallel: row-sharding of the item-embedding table, the packed
         neighbor tables, and frontier scoring in the distributed search
         (the capability the reference lacks; north-star requirement).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ("dp", "mp") mesh. With dp=None, uses all devices / mp."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        if len(devices) % mp:
            raise ValueError(f"{len(devices)} devices not divisible by mp={mp}")
        dp = len(devices) // mp
    n = dp * mp
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))
