"""Device ESP rounds (ops/esp_jax.py): grammar bit-identity with the
host esp_rounds / esp_vec spec, plus a compressor roundtrip with
rounds=device (container bytes identical to the host path)."""

import random

import numpy as np

from tudocomp_tpu.compressors.esp import esp_rounds
from tudocomp_tpu.ops.esp_jax import esp_rounds_jax
from tudocomp_tpu.registry import REGISTRY


def _gen(rng, n, sigma):
    s = []
    while len(s) < n:
        if rng.random() < 0.4:
            s.extend([rng.randrange(sigma)] * rng.randint(2, 6))
        else:
            s.append(rng.randrange(sigma))
    return bytes(s[:n])


def test_grammar_identity_random_device():
    rng = random.Random(17)
    for _ in range(12):
        data = _gen(rng, rng.randint(2, 900), rng.choice([3, 8, 250]))
        r1, root1, e1 = esp_rounds(data)
        # tail_cutoff=1 forces every round through the device program
        r2, root2, e2 = esp_rounds_jax(data, tail_cutoff=1)
        assert root1 == root2 and e1 == e2
        assert np.array_equal(np.asarray(r1), r2), data[:40]


def test_grammar_identity_structured_device():
    cases = [
        b"", b"a", b"ab", b"aaaa" * 40, b"abcabcabc" * 200,
        bytes(range(256)) * 8, b"\x00" * 800 + b"\x01" * 800,
        b"to be or not to be that is the question " * 40,
    ]
    for data in cases:
        r1, root1, e1 = esp_rounds(data)
        r2, root2, e2 = esp_rounds_jax(data, tail_cutoff=1)
        assert e1 == e2
        if not e1:
            assert root1 == root2
            assert np.array_equal(np.asarray(r1), r2), data[:30]


def test_default_tail_handoff():
    # big-round device path + host tail (the production configuration)
    rng = random.Random(23)
    data = _gen(rng, 9000, 8)
    r1, root1, e1 = esp_rounds(data)
    r2, root2, e2 = esp_rounds_jax(data)  # default tail_cutoff
    assert root1 == root2 and e1 == e2
    assert np.array_equal(np.asarray(r1), r2)


def test_compressor_rounds_device_roundtrip():
    data = (b"esp device rounds produce the identical grammar " * 60
            + bytes(range(0, 250, 3)) * 4)
    host = REGISTRY.instantiate("esp")
    dev = REGISTRY.instantiate("esp(rounds=device)")
    enc_host = host.compress(data)
    enc_dev = dev.compress(data)
    assert enc_host == enc_dev  # same grammar -> same container bytes
    assert dev.decompress(enc_dev) == data
