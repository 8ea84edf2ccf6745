"""Bit-width helpers.

Semantics mirror the reference framework's ``util.hpp`` (bits_for:
``util.hpp:194``, idiv_ceil: ``util.hpp:204``, bytes_for: ``util.hpp:226``):
``bits_for(n)`` is the number of bits needed to store ``n``, guaranteed >= 1,
i.e. ``bits_for(0) == bits_for(1) == 1``.

Both scalar (python int) and numpy-array versions are provided; the jnp
version lives in ``tudocomp_tpu.ops.bitpack`` so this module stays
import-light.
"""

import numpy as np


def bits_for(n: int) -> int:
    """Number of bits required to store the value ``n`` (>= 1)."""
    if n < 0:
        raise ValueError("bits_for requires a non-negative integer")
    return max(1, int(n).bit_length())


def idiv_ceil(a: int, b: int) -> int:
    """Integer division rounded up."""
    return (a // b) + (1 if a % b else 0)


def bytes_for(n: int) -> int:
    """Number of bytes required to store the value ``n`` (>= 1)."""
    return idiv_ceil(bits_for(n), 8)


def bits_for_arr(n: np.ndarray) -> np.ndarray:
    """Vectorized bits_for over a numpy integer array (result uint8)."""
    n = np.asarray(n)
    out = np.zeros(n.shape, dtype=np.uint8)
    v = n.astype(np.uint64).copy()
    # binary count of leading-bit position via repeated halving of shift width
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        out[mask] += np.uint8(shift)
        v[mask] >>= np.uint64(shift)
    out += 1  # v is now 0 or 1; width of remaining bit
    np.maximum(out, 1, out=out)
    return out
