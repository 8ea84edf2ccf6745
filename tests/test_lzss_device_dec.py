"""Device factor-stream decode (lzss_lcp(dec=device)): the copy
resolution as pointer-doubling rounds (ops/lzss_jax.py
resolve_factors_device) must be byte-identical to the host back-buffer
walk (reference semantics lzss/LZSSCoding.hpp:95-140)."""

import numpy as np
import pytest

from tudocomp_tpu.compressors import REGISTRY  # noqa: F401  (populates)
from tudocomp_tpu.ops.lzss_jax import resolve_factors_device
from tudocomp_tpu.registry import REGISTRY as REG

CORPORA = [
    b"",
    b"a",
    b"abcdefgh",
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # one long overlapping run
    b"abcabcabcabcabcabcabcabcabcabcabc",
    b"abababababababababab" * 7,
    bytes(np.random.default_rng(7).integers(97, 102, 5000, dtype=np.uint8)),
    (b"the quick brown fox jumps over the lazy dog. " * 40),
]


def _rt(algo: str, data: bytes) -> bytes:
    comp = REG.instantiate(algo).compress(data + b"\x00")
    return REG.instantiate(algo).decompress(comp)


@pytest.mark.parametrize("coder", ["bit", "huff", "gamma"])
@pytest.mark.parametrize("i", range(len(CORPORA)))
def test_device_dec_matches_host(coder, i):
    data = CORPORA[i]
    host = _rt(f"lzss_lcp(coder={coder})", data)
    dev = _rt(f"lzss_lcp(coder={coder},dec=device)", data)
    assert host == dev == data + b"\x00"


def test_device_dec_deep_chains():
    # factors referencing factors referencing factors: chains of depth
    # ~levels, exercising multiple doubling rounds
    data = b"xy"
    for _ in range(9):
        data = data + data  # 1 KiB of xyxyxy... -> deep self-reference
    host = _rt("lzss_lcp", data)
    dev = _rt("lzss_lcp(dec=device)", data)
    assert host == dev == data + b"\x00"


def test_resolver_direct_overlap():
    # hand-built stream: literal "ab", factor (pos=2, src=0, len=6)
    # copies overlap their own output (classic run expansion)
    out = resolve_factors_device(
        np.frombuffer(b"ab", np.uint8),
        np.array([2]), np.array([0]), np.array([6]), 8,
    )
    assert out == b"abababab"


def test_resolver_all_literals():
    lits = np.frombuffer(b"hello", np.uint8)
    z = np.zeros(0, np.int64)
    assert resolve_factors_device(lits, z, z, z, 5) == b"hello"


def test_resolver_empty():
    z = np.zeros(0, np.int64)
    assert resolve_factors_device(np.zeros(0, np.uint8), z, z, z, 0) == b""


def test_resolver_chained_factors():
    # factor 2 copies from inside factor 1's output
    # lit "abcd" @0..3, f1 = (4, 1, 3) -> "bcd", f2 = (7, 5, 2) -> "cd"
    out = resolve_factors_device(
        np.frombuffer(b"abcd", np.uint8),
        np.array([4, 7]), np.array([1, 5]), np.array([3, 2]), 9,
    )
    assert out == b"abcdbcdcd"
