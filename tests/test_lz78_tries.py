"""LZ78 trie family: every structure yields the canonical parse, and
the hash framework behaves as a map."""

import numpy as np
import pytest

from tudocomp_tpu import compressors as _register  # noqa: F401
from tudocomp_tpu import native
from tudocomp_tpu.compressors.lz78_trie import ALL_TRIES
from tudocomp_tpu.registry import REGISTRY


def _corpus():
    rng = np.random.default_rng(9)
    return [
        b"abababababab",
        b"to be or not to be that is the question " * 8,
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
        rng.choice(np.frombuffer(b"acgt", np.uint8), 4000)
        .astype(np.uint8).tobytes(),
        b"x" * 500,
        b"",
        b"\x00\x00\x01\x00",
    ]


TRIE_NAMES = [t.meta().name for t in ALL_TRIES]


@pytest.mark.parametrize("comp", ["lz78", "lzw"])
def test_all_tries_identical_parse(comp):
    for data in _corpus():
        outs = {}
        for name in TRIE_NAMES:
            spec = f"{comp}(coder=bit,lz78trie={name})"
            c = REGISTRY.instantiate(spec)
            enc = c.compress(data)
            d = REGISTRY.instantiate(spec)
            assert d.decompress(enc) == data, (name, len(data))
            outs[name] = enc
        ref = outs[TRIE_NAMES[0]]
        for name, enc in outs.items():
            assert enc == ref, (comp, name, len(data))


@pytest.mark.parametrize("comp", ["lz78", "lzw"])
def test_python_tries_match_native(comp):
    """With the native runtime disabled, every Python trie structure
    reproduces the native parse byte-for-byte (incl. dict reset)."""
    data = _corpus()[1]
    for name in TRIE_NAMES:
        for opts in ("", ",dict_size=17"):
            spec = f"{comp}(coder=bit,lz78trie={name}{opts})"
            enc_nat = REGISTRY.instantiate(spec).compress(data)
            try:
                native._lib = None
                native._tried = True
                enc_py = REGISTRY.instantiate(spec).compress(data)
            finally:
                native._tried = False
                native._lib = None
            assert enc_nat == enc_py, (comp, name, opts)


def test_native_structures_agree():
    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    # deep shared prefixes + 3-symbol alphabet: forces long double-array
    # relocation chains in the cedar structure (many siblings per node
    # appearing in adversarial insertion order)
    adversarial = (
        b"".join(
            bytes(rng.integers(0, 3, 40, dtype=np.uint8))
            for _ in range(4000)
        )
        + b"ab" * 20000
        + bytes(rng.integers(0, 256, 30000, dtype=np.uint8))
    )
    for data in (*_corpus(), adversarial):
        for lzw in (False, True):
            base = native.lz78_parse(data, lzw=lzw, structure="hash")
            for structure in ("ternary", "binary", "cedar"):
                got = native.lz78_parse(data, lzw=lzw, structure=structure)
                assert np.array_equal(got[0], base[0]), structure
                if not lzw:  # LZW emits refs only; chars are unused
                    assert np.array_equal(got[1], base[1]), structure


def test_hash_map_framework():
    from tudocomp_tpu.registry import create_algo
    from tudocomp_tpu.utils.hash import (
        HashMap, KnuthHasher, LinearProber, MixHasher, NoopHasher,
        QuadraticProber, SizeManagerDirect, SizeManagerPow2,
        SizeManagerPrime, VignaHasher,
    )

    rng = np.random.default_rng(4)
    keys = rng.integers(0, 2**62, 500, dtype=np.uint64).tolist()
    vals = rng.integers(0, 2**31, 500, dtype=np.int64).tolist()
    expect = dict(zip(keys, vals))
    for hasher in (VignaHasher, KnuthHasher, MixHasher, NoopHasher):
        for manager in (SizeManagerPow2, SizeManagerPrime,
                        SizeManagerDirect):
            for prober in (LinearProber, QuadraticProber):
                if prober is QuadraticProber and manager is not \
                        SizeManagerPow2:
                    continue  # quadratic probe cycle risk on non-pow2
                m = HashMap(
                    hasher=create_algo(hasher),
                    manager=create_algo(manager),
                    prober=create_algo(prober),
                )
                for k, v in expect.items():
                    m.insert(int(k), int(v))
                assert len(m) == len(expect)
                for k, v in expect.items():
                    assert m.get(int(k)) == v
                assert m.get(12345678901) is None
                m.clear()
                assert m.get(next(iter(expect))) is None


def test_hasher_reference_values():
    """The vigna mixer matches splitmix64's published finalizer."""
    from tudocomp_tpu.registry import create_algo
    from tudocomp_tpu.utils.hash import VignaHasher

    h = create_algo(VignaHasher)
    # splitmix64(seed=0) first output is mix(0 + 0x9E3779B97F4A7C15)
    assert h.hash(0x9E3779B97F4A7C15) == 0xE220A8397B1DCDAF
    arr = np.array([0x9E3779B97F4A7C15], np.uint64)
    assert int(h.hash_arr(arr)[0]) == 0xE220A8397B1DCDAF


def test_trie_hash_suboptions():
    """The reference's pluggable hash sub-algorithms
    (``registry_config.py:80-118``) are selectable per trie and leave
    the canonical parse unchanged."""
    data = _corpus()[1]
    base = REGISTRY.instantiate("lz78(coder=bit,lz78trie=ternary)")
    want = base.compress(data)
    for spec in (
        "hash(hash_function=vigna,hash_prober=quadratic,"
        "hash_manager=prime)",
        "hash(hash_function=knuth,hash_prober=gauss)",
        "hash(hash_function=noop,hash_prober=double,hash_manager=direct)",
        "hash_plus(hash_function=vigna)",
        "rolling(hash_roll=wordpack)",
        "rolling(hash_roll=karp_rabin,hash_prober=quadratic)",
        "rolling_plus(hash_roll=wordpack,hash_function=knuth)",
    ):
        try:
            native._lib = None
            native._tried = True  # force the Python structures
            c = REGISTRY.instantiate(f"lz78(coder=bit,lz78trie={spec})")
            enc = c.compress(data)
        finally:
            native._tried = False
            native._lib = None
        assert enc == want, spec
        d = REGISTRY.instantiate(f"lz78(coder=bit,lz78trie={spec})")
        assert d.decompress(enc) == data, spec
