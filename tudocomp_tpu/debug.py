"""Debug / paranoid invariant checks (reference ``IF_DEBUG``/``IF_PARANOID``).

The reference compiles invariant checks in or out with preprocessor
levels (``def.hpp:27-60``); here the levels are environment variables,
checked once at import:

- ``TDC_DEBUG=1``   — cheap invariants (Kraft equality of Huffman
  tables, ``HuffmanCoder.hpp:143-166``).
- ``TDC_PARANOID=1`` — implies debug; adds O(n) structural checks
  (permutation validity, ``util.hpp:449-473``; BWT LF-mapping
  invariant, ``ds/bwt.hpp:55-65``).

The test suite runs with both enabled (tests/conftest.py) so every
kernel change is exercised against the invariants; production runs pay
nothing.
"""

from __future__ import annotations

import os

import numpy as np

PARANOID = os.environ.get("TDC_PARANOID", "0") not in ("", "0")
DEBUG = PARANOID or os.environ.get("TDC_DEBUG", "0") not in ("", "0")


class InvariantError(AssertionError):
    pass


def check_kraft(lengths: np.ndarray, full: bool = True) -> None:
    """Kraft (in)equality of a code-length vector (debug level).

    Optimal Huffman lengths satisfy equality; min-length-clamped tables
    (TBC2) satisfy the inequality — pass ``full=False`` for those.
    """
    if not DEBUG or lengths.size == 0:
        return
    ls = np.asarray(lengths, np.int64)
    if (ls <= 0).any() or (ls > 63).any():
        raise InvariantError(f"invalid code lengths: {ls}")
    kraft = (np.exp2(-ls.astype(np.float64))).sum()
    if full and abs(kraft - 1.0) > 1e-9:
        raise InvariantError(f"Kraft sum {kraft} != 1 for {ls}")
    if kraft > 1.0 + 1e-9:
        raise InvariantError(f"Kraft sum {kraft} > 1 for {ls}")


def assert_permutation(arr: np.ndarray, n: int | None = None) -> None:
    """``arr`` is a permutation of [0, n) (paranoid level)."""
    if not PARANOID:
        return
    a = np.asarray(arr, np.int64)
    if n is None:
        n = a.size
    if a.size != n:
        raise InvariantError(f"permutation size {a.size} != {n}")
    seen = np.zeros(n, bool)
    if (a < 0).any() or (a >= n).any():
        raise InvariantError("permutation value out of range")
    seen[a] = True
    if not seen.all():
        raise InvariantError("permutation misses values")


def check_lf(lf: np.ndarray, bwt: np.ndarray) -> None:
    """LF-mapping invariant: LF is a permutation and characters map in
    nondecreasing rank order within equal symbols (paranoid level)."""
    if not PARANOID:
        return
    assert_permutation(lf)
    b = np.asarray(bwt)
    order = np.argsort(np.asarray(lf, np.int64), kind="stable")
    sorted_chars = b[order]
    if (np.diff(sorted_chars.astype(np.int64)) < 0).any():
        raise InvariantError("LF does not sort BWT characters")
