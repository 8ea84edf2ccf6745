"""Cleary compact sparse hash table: behaves as a map under random
workloads (growth, width growth, overwrites), and recovers full keys
from quotients + v/c metadata alone."""

import numpy as np

from tudocomp_tpu.utils.compact_hash import CompactSparseHash


def test_basic_map_behavior():
    t = CompactSparseHash(key_width=8, initial_log2=2)
    assert t.get(5) is None
    t.insert(5, 50)
    t.insert(6, 60)
    assert t.get(5) == 50 and t.get(6) == 60 and len(t) == 2
    t.insert(5, 55)  # overwrite
    assert t.get(5) == 55 and len(t) == 2


def test_random_workload_matches_dict():
    rng = np.random.default_rng(7)
    t = CompactSparseHash(key_width=4, initial_log2=2)
    ref: dict[int, int] = {}
    for i in range(4000):
        k = int(rng.integers(0, 1 << 14))
        if rng.random() < 0.7:
            v = int(rng.integers(0, 1 << 30))
            t.insert(k, v)
            ref[k] = v
        else:
            assert t.get(k) == ref.get(k), (i, k)
    assert len(t) == len(ref)
    for k, v in ref.items():
        assert t.get(k) == v, k
    # key recovery from quotients + displacement metadata only
    assert dict(t.items()) == ref


def test_adversarial_collisions_and_clusters():
    # dense sequential keys force long clusters, group shifts and
    # wrap-around at every growth stage
    t = CompactSparseHash(key_width=1, initial_log2=1)
    n = 1500
    for k in range(n):
        t.insert(k, k * 3)
    for k in range(n):
        assert t.get(k) == k * 3, k
    assert t.get(n + 1) is None
    assert sorted(t.items()) == [(k, k * 3) for k in range(n)]


def test_clear():
    t = CompactSparseHash(key_width=8)
    for k in range(100):
        t.insert(k, k)
    t.clear()
    assert len(t) == 0 and t.get(3) is None
    t.insert(3, 4)
    assert t.get(3) == 4


def test_trie_uses_compact_hash():
    from tudocomp_tpu.compressors.lz78_trie import CompactSparseHashTrie
    from tudocomp_tpu.registry import create_algo
    from tudocomp_tpu.utils.compact_hash import CompactSparseHash as CSH

    trie = create_algo(CompactSparseHashTrie)
    assert isinstance(trie.table, CSH)
    trie.add_rootnode(0)
    a, new_a = trie.find_or_insert(0, ord("x"))
    b, new_b = trie.find_or_insert(0, ord("x"))
    assert new_a and not new_b and a == b


def test_invalid_load_factor_rejected():
    import pytest

    for lf in (0.0, 1.0, 1.5, -0.1):
        with pytest.raises(ValueError):
            CompactSparseHash(key_width=8, load_factor=lf)


def test_overwrite_at_load_boundary_does_not_grow():
    t = CompactSparseHash(key_width=8, initial_log2=3, load_factor=0.5)
    while len(t) + 1 <= t.m * t.load_factor:
        t.insert(len(t), len(t))
    m_before = t.m
    first_key = 0
    t.insert(first_key, 999)  # overwrite exactly at the boundary
    assert t.m == m_before and t.get(first_key) == 999
