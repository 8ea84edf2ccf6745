"""Randomized roundtrip fuzzing across compressor families.

Seeded (deterministic in CI); set ``FUZZ_ITERS`` to raise the budget.
Complements the fixed adversarial corpus with structured random inputs:
skewed alphabets, long runs, periodic-with-mutations, random binary.
"""

import os

import numpy as np
import pytest

from tudocomp_tpu import cli

ITERS = int(os.environ.get("FUZZ_ITERS", "3"))

ALGOS = [
    "rle",
    "mtf",
    "bwt",
    "encode(coder=huff)",
    "encode(coder=sle)",
    "encode(coder=arithmetic)",
    "lzss(coder=gamma)",
    "lzss_lcp(coder=huff)",
    "lz78(coder=bit)",
    "lzw(coder=bit)",
    "lcpcomp(coder=huff)",
    "repair(coder=huff)",
    "esp",
    "esp(slp_coder=sorted(d_coding=diff))",
    "lz78u(coder=bit)",
    "lfs_comp",
    "bwt:rle:mtf:encode(coder=huff)",
]


def _gen(rng: np.random.Generator) -> bytes:
    kind = rng.integers(0, 5)
    n = int(rng.integers(1, 3000))
    if kind == 0:  # skewed text
        p = np.array([0.3, 0.2, 0.2, 0.1, 0.1, 0.1])
        return rng.choice(
            np.frombuffer(b"etaoin", np.uint8), n, p=p
        ).tobytes()
    if kind == 1:  # long runs
        parts = []
        left = n
        while left > 0:
            r = int(rng.integers(1, max(2, left)))
            parts.append(bytes([int(rng.integers(0, 256))]) * r)
            left -= r
        return b"".join(parts)[:n]
    if kind == 2:  # periodic with mutations
        period = bytes(rng.integers(32, 127, int(rng.integers(2, 20)),
                                    dtype=np.uint8))
        s = bytearray((period * (n // len(period) + 1))[:n])
        for _ in range(int(rng.integers(0, 5))):
            if s:
                s[int(rng.integers(0, len(s)))] = int(
                    rng.integers(0, 256)
                )
        return bytes(s)
    if kind == 3:  # random binary (all byte values incl. escapes)
        return bytes(rng.integers(0, 256, n, dtype=np.uint8))
    return b""  # empty


@pytest.mark.parametrize("algo", ALGOS, ids=[a[:40] for a in ALGOS])
def test_fuzz_roundtrip(algo):
    rng = np.random.default_rng(hash(algo) % (2**32))
    for _ in range(ITERS):
        data = _gen(rng)
        blob = cli.compress(algo, data)
        assert cli.decompress(blob) == data, (
            f"{algo} failed on {len(data)}-byte input "
            f"(seed-reproducible)"
        )
