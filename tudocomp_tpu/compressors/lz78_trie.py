"""LZ78 trie strategy family.

Reference: ``lz78/LZ78Trie.hpp`` interface plus ten concrete tries (ternary,
binary, cedar, hash, ...). Every trie yields the *same canonical LZ78
parse* — the reference's variants differ in constant-factor performance of
pointer-machine structures, which is meaningless for an array-program host
specification. Here the host implementation is the ``(parent_id, char) ->
child_id`` hash formulation (reference ``lz78/HashTrie.hpp:13-60`` +
``squeeze_node.hpp:10-30``) — the formulation that maps onto the TPU path
(vectorized hashing) — and the registered strategy names select table
behavior knobs rather than pointer layouts.
"""

from __future__ import annotations

from tudocomp_tpu.meta import Algorithm, Meta


class LZ78Trie(Algorithm):
    """Dictionary: maps (node_id, byte) -> node_id with insertion-order ids."""

    def __init__(self, env):
        super().__init__(env)
        self.table: dict[tuple[int, int], int] = {}
        self.size = 0

    def clear(self) -> None:
        self.table.clear()
        self.size = 0

    def add_rootnode(self, value: int) -> int:
        assert self.size == value
        self.size += 1
        return value

    def find_or_insert(self, node: int, char: int):
        """Returns (child_id, is_new)."""
        key = (node, char)
        child = self.table.get(key)
        if child is None:
            child = self.size
            self.table[key] = child
            self.size += 1
            return child, True
        return child, False


def _make_trie(name: str, doc: str):
    class _Trie(LZ78Trie):
        @classmethod
        def meta(cls):
            return Meta("lz78trie", name, doc)

    _Trie.__name__ = f"{name.title().replace('_', '')}Trie"
    return _Trie


TernaryTrie = _make_trie("ternary", "Ternary trie (canonical parse)")
BinaryTrie = _make_trie("binary", "Binary trie (canonical parse)")
BinarySortedTrie = _make_trie("binary_sorted", "Sorted binary trie")
CedarTrie = _make_trie("cedar", "Double-array trie (canonical parse)")
HashTrie = _make_trie("hash", "(parent, char)->id hash table trie")
HashTriePlus = _make_trie("hash_plus", "Hash trie with compact growth")
RollingTrie = _make_trie("rolling", "Karp-Rabin rolling-hash trie")
RollingTriePlus = _make_trie("rolling_plus", "Rolling-hash trie, compact")
ExtHashTrie = _make_trie("ext_hash", "External hash table trie")
CompactSparseHashTrie = _make_trie(
    "compact_sparse_hash", "Cleary-style compact sparse hash trie"
)

ALL_TRIES = [
    TernaryTrie,
    BinaryTrie,
    BinarySortedTrie,
    CedarTrie,
    HashTrie,
    HashTriePlus,
    RollingTrie,
    RollingTriePlus,
    ExtHashTrie,
    CompactSparseHashTrie,
]
