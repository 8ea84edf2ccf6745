"""Vectorized ESP round (ops/esp_vec.py): grammar bit-identity with the
host esp_rounds across random and structured inputs."""

import random

import numpy as np

from tudocomp_tpu.compressors.esp import (
    _landmark_blocks, _merge_one_blocks, _split_eager13, esp_rounds,
)
from tudocomp_tpu.ops.esp_vec import (
    eager13_starts, esp_rounds_vec, merge_one_blocks_vec,
)


def test_eager13_closed_form():
    for L in range(1, 120):
        blocks = _split_eager13(L)
        want = np.zeros(L, bool)
        want[np.cumsum([0] + blocks[:-1])] = True
        assert np.array_equal(eager13_starts(np.arange(L), L), want), L


def test_merge_closed_form():
    rng = random.Random(5)
    for _ in range(4000):
        lens, prev1 = [], False
        for _ in range(rng.randint(1, 9)):
            v = rng.choice([2, 3] if prev1 else [1, 2, 3])
            lens.append(v)
            prev1 = v == 1
        if lens == [1]:
            continue
        want = _merge_one_blocks([[v, 0] for v in lens])
        got = merge_one_blocks_vec(np.asarray(lens, np.int64)).tolist()
        assert got == want, lens


def test_grammar_identity_random():
    rng = random.Random(9)
    for _ in range(300):
        n = rng.randint(2, 300)
        sigma = rng.choice([3, 8, 250])
        s = []
        while len(s) < n:
            if rng.random() < 0.4:
                s.extend([rng.randrange(sigma)] * rng.randint(2, 6))
            else:
                s.append(rng.randrange(sigma))
        data = bytes(s[:n])
        r1, root1, e1 = esp_rounds(data)
        r2, root2, e2 = esp_rounds_vec(data)
        assert root1 == root2 and e1 == e2
        assert np.array_equal(np.asarray(r1), r2), data[:40]


def test_grammar_identity_structured():
    cases = [
        b"", b"a", b"ab", b"aaaa", b"abcabcabc" * 30,
        bytes(range(256)) * 3, b"\x00" * 100 + b"\x01" * 100,
        b"to be or not to be that is the question " * 20,
    ]
    for data in cases:
        r1, root1, e1 = esp_rounds(data)
        r2, root2, e2 = esp_rounds_vec(data)
        assert e1 == e2
        if not e1:
            assert root1 == root2
            assert np.array_equal(np.asarray(r1), r2), data[:30]
