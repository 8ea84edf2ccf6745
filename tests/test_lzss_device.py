"""Device LZSS factorization (ops/lzss_jax.py): validity + roundtrip."""

import numpy as np
import pytest

from tudocomp_tpu import cli
from tudocomp_tpu.ops.lzss_jax import (
    _match_device, _match_exact_device, _psv_indices, factorize_device,
)

import jax.numpy as jnp


def test_match_tiny():
    text = np.frombuffer(b"abcdefgh_abcdefgh_abcdefgh\x00", np.uint8)
    for exact in (True, False):
        p, s, l = factorize_device(text, 3, exact=exact)
        assert list(zip(p, s, l)) == [(9, 0, 17)], exact


def test_psv_indices():
    rng = np.random.default_rng(11)
    for m in (1, 2, 7, 500):
        a = rng.permutation(m).astype(np.int32)
        got = np.asarray(_psv_indices(jnp.asarray(a)))
        for j in range(m):
            want = -1
            for k in range(j - 1, -1, -1):
                if a[k] < a[j]:
                    want = k
                    break
            assert got[j] == want, (m, j)


def test_exact_match_is_longest_previous():
    """The exact matcher's per-position lengths equal the brute-force
    longest previous factor (the reference PSV/NSV answer)."""
    rng = np.random.default_rng(5)
    text = np.concatenate([
        rng.integers(97, 101, 300, dtype=np.uint8),
        np.frombuffer(b"Z" * 90, np.uint8),
        rng.integers(97, 101, 100, dtype=np.uint8),
        np.zeros(1, np.uint8),
    ])
    cand, ln = _match_exact_device(jnp.asarray(text), max_len=256)
    cand = np.asarray(cand)
    ln = np.asarray(ln)
    n = text.size
    for i in range(1, n - 1):
        best = 0
        for c in range(i):
            L = 0
            while (i + L < n - 1 and L < 256
                   and text[c + L] == text[i + L]):
                L += 1
            best = max(best, L)
        assert int(ln[i]) == best, i
        if ln[i] > 0:
            c = int(cand[i])
            assert 0 <= c < i
            L = int(ln[i])
            assert np.array_equal(text[i:i + L], text[c:c + L]), i


def test_match_exactness():
    """Every reported match must be a true common prefix; candidates
    must be strictly earlier positions."""
    rng = np.random.default_rng(3)
    text = np.concatenate([
        rng.integers(97, 105, 400, dtype=np.uint8),
        np.frombuffer(b"0" * 130, np.uint8),  # > 64-level run
        rng.integers(97, 105, 200, dtype=np.uint8),
        np.zeros(1, np.uint8),
    ])
    cand, ln = _match_device(jnp.asarray(text), max_len=256)
    cand = np.asarray(cand)
    ln = np.asarray(ln)
    n = text.size
    for i in np.flatnonzero(ln > 0):
        c = cand[i]
        assert 0 <= c < i
        L = int(ln[i])
        assert i + L <= n - 1
        assert np.array_equal(text[i : i + L], text[c : c + L]), i


@pytest.mark.parametrize(
    "payload",
    [
        b"tobeornottobeortobeornot" * 40,
        b"A" * 4000 + b"AB" * 300 + bytes(range(256)),
        b"\xe4\xb8\xad\xe6\x96\x87 utf8 \xd0\xbc\xd0\xb8\xd1\x80 " * 60,
    ],
    ids=["text", "runs", "utf8"],
)
def test_device_parse_roundtrip(payload):
    for coder in ("bit", "huff"):
        alg = f"lzss_lcp(coder={coder},threshold=4,comp=device)"
        comp = cli.compress(alg, payload)
        assert cli.decompress(comp) == payload


def test_device_parse_compresses():
    data = b"compressible stretch " * 500
    comp = cli.compress("lzss_lcp(coder=bit,comp=device)", data)
    assert len(comp) < len(data) // 3
    assert cli.decompress(comp) == data
