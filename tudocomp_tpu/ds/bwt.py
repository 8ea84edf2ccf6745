"""Burrows-Wheeler transform kernels (host specification).

Reference semantics (``ds/bwt.hpp:20-98``): forward
``BWT[i] = text[(SA[i] - 1) mod n]`` — a pure gather; decode via the LF
mapping (stable counting sort of the BWT) followed by a backward walk.
The forward transform is the device-friendly direction (gather); the LF
walk is a sequential pointer chase, so the device path keeps BWT blocks
block-local (SURVEY.md §7 step 5).
"""

from __future__ import annotations

import numpy as np


def bwt_forward(text: np.ndarray, sa: np.ndarray) -> np.ndarray:
    t = np.asarray(text, np.uint8)
    return t[(sa - 1) % t.size] if t.size else t


def compute_lf(bwt: np.ndarray) -> np.ndarray:
    """LF[i] = C[bwt[i]] + rank of i among equal symbols (stable)."""
    # the stable-argsort inverse IS the LF mapping:
    # rank of position i = C[bwt[i]] + #{j < i : bwt[j] == bwt[i]}
    order = np.argsort(bwt, kind="stable")
    lf = np.empty(bwt.size, np.int64)
    lf[order] = np.arange(bwt.size)
    return lf


def bwt_decode(bwt_bytes: bytes) -> bytes:
    """Decode a BWT of a 0-sentineled text; returns text *without* sentinel."""
    bwt = np.frombuffer(bwt_bytes, np.uint8)
    n = bwt.size
    if n <= 1:
        return b""
    lf = compute_lf(bwt)
    from tudocomp_tpu.debug import check_lf

    check_lf(lf, bwt)  # paranoid (ds/bwt.hpp:55-65)
    out = np.empty(n - 1, np.uint8)
    lf_list = lf.tolist()
    bw = bwt.tolist()
    i = 0
    for j in range(1, n):
        out[n - 1 - j] = bw[i]
        i = lf_list[i]
    return out.tobytes()
