"""Device mesh construction helpers.

Axes:
- ``dp``  — data parallel over *blocks* (the container's unit of
  independence; frames gather in order on the host).
- ``sp``  — sequence parallel over *sub-chunks within a block*: the
  container's fixed sub-chunk framing (models/blockcodec.py) makes the
  Huffman stage embarrassingly parallel inside one block, so the same
  wire format runs on any mesh shape.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh
import numpy as np


def make_mesh(n_devices: int | None = None, sp: int = 1) -> Mesh:
    """A ``(dp, sp)`` mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n % sp != 0:
        raise ValueError(f"n_devices={n} not divisible by sp={sp}")
    grid = np.array(devs[:n]).reshape(n // sp, sp)
    return Mesh(grid, ("dp", "sp"))
