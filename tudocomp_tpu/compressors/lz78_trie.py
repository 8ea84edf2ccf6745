"""LZ78 trie strategy family — real, structurally distinct dictionaries.

Reference: ``lz78/LZ78Trie.hpp`` interface plus the concrete tries under
``compressors/lz78/``. Every trie yields the *same canonical LZ78
parse*; the strategies differ in node layout and lookup structure,
exactly as in the reference:

- ``ternary``        — ternary search trie (``lz78/TernaryTrie.hpp``)
- ``binary``         — first-child / next-sibling lists, linear scan
                       (``lz78/BinaryTrie.hpp``)
- ``binary_sorted``  — per-node sorted child arrays, binary search
                       (``lz78/BinarySortedTrie.hpp``)
- ``cedar``          — double-array (base/check) trie
                       (``lz78/CedarTrie.hpp`` / vendored cedar)
- ``hash``           — (parent<<8|char) -> id open-addressing map over
                       the hash framework (``lz78/HashTrie.hpp``,
                       MixHasher + LinearProber + pow2 sizes)
- ``hash_plus``      — hash trie with direct (x2 modulo) sizing and a
                       denser load factor (``lz78/HashTriePlus.hpp``)
- ``ext_hash``       — the host language's library hash table
                       (``lz78/ExtHashTrie.hpp`` = std::unordered_map;
                       here the Python dict)
- ``rolling``        — Karp-Rabin rolling fingerprint of the node's
                       string as the key (``lz78/RollingTrie.hpp``)
- ``rolling_plus``   — rolling fingerprints over the denser hash_plus
                       table (``lz78/RollingTriePlus.hpp``)
- ``compact_sparse_hash`` — Cleary compact hashing: only hash
                       quotients stored, initial addresses recovered
                       via v/c displacement bitvectors, 64-slot sparse
                       buckets (``lz78/CompactSparseHashTrie.hpp``,
                       ``util/compact_sparse_hash.hpp``; see
                       ``utils/compact_hash.py``)

The native C parsers (``native/tdc_native.cpp``) implement the three
structural classes — hash table, ternary search trie, and child-list
binary trie — and ``lz78.py`` dispatches to the one matching the
selected strategy; the remaining variants run their Python structures.
All paths are pinned equal by ``tests/test_lz78_tries.py``.
"""

from __future__ import annotations

from bisect import bisect_left

from tudocomp_tpu.meta import Algorithm, Meta
import tudocomp_tpu.utils.hash  # noqa: F401 — registers the hash framework


class LZ78Trie(Algorithm):
    """Interface: maps (node_id, byte) -> node_id, insertion-order ids
    (reference ``lz78/LZ78Trie.hpp:41-90``)."""

    #: native structural class
    #: ("hash" | "ternary" | "binary" | "cedar" | None)
    native_kind: str | None = None

    def __init__(self, env):
        super().__init__(env)
        self.size = 0

    def clear(self) -> None:
        raise NotImplementedError

    def add_rootnode(self, value: int) -> int:
        assert self.size == value
        self.size += 1
        return value

    def find_or_insert(self, node: int, char: int):
        """Returns (child_id, is_new)."""
        raise NotImplementedError


class ExtHashTrie(LZ78Trie):
    """Library hash table (reference ``lz78/ExtHashTrie.hpp``)."""

    native_kind = "hash"

    @classmethod
    def meta(cls):
        return Meta("lz78trie", "ext_hash", "Library hash table trie")

    def __init__(self, env):
        super().__init__(env)
        self.table: dict[int, int] = {}

    def clear(self) -> None:
        self.table.clear()
        self.size = 0

    def find_or_insert(self, node: int, char: int):
        key = (node << 8) | char
        child = self.table.get(key)
        if child is None:
            child = self.size
            self.table[key] = child
            self.size += 1
            return child, True
        return child, False


class HashTrie(LZ78Trie):
    """Open-addressing trie over the hash framework
    (reference ``lz78/HashTrie.hpp:13-60`` + ``squeeze_node.hpp``)."""

    native_kind = "hash"
    _load = 0.5

    @classmethod
    def meta(cls):
        m = Meta("lz78trie", "hash", "(parent,char)->id hash trie")
        m.option_submeta("hash_function", "hash_function", default="mixer")
        m.option_submeta("hash_prober", "hash_prober", default="linear")
        m.option_submeta("hash_manager", "hash_manager", default="pow")
        return m

    def __init__(self, env):
        super().__init__(env)
        from tudocomp_tpu.utils.hash import HashMap

        self.table = HashMap(
            hasher=env.instantiate("hash_function"),
            prober=(env.instantiate("hash_prober")
                    if env.has_option("hash_prober") else None),
            manager=env.instantiate("hash_manager"),
            load_factor=self._load,
        )

    def clear(self) -> None:
        self.table.clear()
        self.size = 0

    def find_or_insert(self, node: int, char: int):
        key = (node << 8) | char
        child = self.table.get(key)
        if child is None:
            child = self.size
            self.table.insert(key, child)
            self.size += 1
            return child, True
        return child, False


class HashTriePlus(HashTrie):
    """Denser table, direct sizing (reference ``lz78/HashTriePlus.hpp``;
    no prober sub-option, matching ``registry_config.py:116``)."""

    _load = 0.8

    @classmethod
    def meta(cls):
        m = Meta("lz78trie", "hash_plus", "Dense hash trie (x2 sizes)")
        m.option_submeta("hash_function", "hash_function", default="mixer")
        m.option_submeta("hash_manager", "hash_manager", default="direct")
        return m


class RollingTrie(HashTrie):
    """Karp-Rabin rolling fingerprints: a node's key is the rolling
    hash of its full string, extended per char (reference
    ``lz78/RollingTrie.hpp``). Collision-checked against (parent, char)
    so the parse stays canonical."""

    native_kind = "hash"

    @classmethod
    def meta(cls):
        m = Meta("lz78trie", "rolling", "Karp-Rabin rolling-hash trie")
        m.option_submeta("hash_roll", "hash_roll", default="karp_rabin")
        m.option_submeta("hash_prober", "hash_prober", default="linear")
        m.option_submeta("hash_manager", "hash_manager", default="pow")
        m.option_submeta("hash_function", "hash_function", default="mixer")
        return m

    def __init__(self, env):
        super().__init__(env)
        self._kr = env.instantiate("hash_roll").make
        self.fp: list = []  # node id -> KarpRabinHash of its string
        self.in_edge: list[tuple[int, int]] = []  # id -> (parent, char)
        self.table2: dict[tuple[int, int], int] = {}  # collision fallback

    def clear(self) -> None:
        super().clear()
        self.fp.clear()
        self.in_edge.clear()
        self.table2.clear()

    def add_rootnode(self, value: int) -> int:
        # per-root fingerprint seed (LZ78: one empty root, seed 0;
        # LZW: 256 one-char roots, seeded by the char)
        self.fp.append(self._kr(value))
        self.in_edge.append((-1, -1))
        return super().add_rootnode(value)

    def find_or_insert(self, node: int, char: int):
        # primary lookup by the rolled fingerprint; the stored
        # (parent, char) edge verifies the hit, so a fingerprint
        # collision falls back to the exact table and the parse stays
        # canonical (the reference trusts the fingerprint outright)
        kr = self.fp[node].extended(char)
        cand = self.table.get(kr.key())
        if cand is not None and self.in_edge[cand] == (node, char):
            return cand, False
        child = self.table2.get((node, char))
        if child is not None:
            return child, False
        child = self.size
        self.table.insert(kr.key(), child)
        self.table2[(node, char)] = child
        self.fp.append(kr)
        self.in_edge.append((node, char))
        self.size += 1
        return child, True


class RollingTriePlus(RollingTrie):
    """No prober sub-option (reference ``registry_config.py:118``)."""

    _load = 0.8

    @classmethod
    def meta(cls):
        m = Meta("lz78trie", "rolling_plus", "Dense rolling-hash trie")
        m.option_submeta("hash_roll", "hash_roll", default="karp_rabin")
        m.option_submeta("hash_manager", "hash_manager", default="direct")
        m.option_submeta("hash_function", "hash_function", default="mixer")
        return m


class TernaryTrie(LZ78Trie):
    """Ternary search trie (reference ``lz78/TernaryTrie.hpp``): each
    node's children form a BST keyed by edge byte; lookup walks
    lo/eq/hi links."""

    native_kind = "ternary"

    @classmethod
    def meta(cls):
        return Meta("lz78trie", "ternary", "Ternary search trie")

    def __init__(self, env):
        super().__init__(env)
        # per trie node: root of its child BST (index into the BST
        # arrays); BST nodes carry (byte, lo, hi, trie child id)
        self.child_bst: list[int] = []
        self.b_char: list[int] = []
        self.b_lo: list[int] = []
        self.b_hi: list[int] = []
        self.b_id: list[int] = []

    def clear(self) -> None:
        self.child_bst.clear()
        self.b_char.clear()
        self.b_lo.clear()
        self.b_hi.clear()
        self.b_id.clear()
        self.size = 0

    def add_rootnode(self, value: int) -> int:
        self.child_bst.append(-1)
        return super().add_rootnode(value)

    def find_or_insert(self, node: int, char: int):
        b = self.child_bst[node]
        prev, went_hi = -1, False
        while b != -1:
            bc = self.b_char[b]
            if char == bc:
                return self.b_id[b], False
            prev = b
            went_hi = char > bc
            b = self.b_hi[b] if went_hi else self.b_lo[b]
        child = self.size
        nb = len(self.b_char)
        self.b_char.append(char)
        self.b_lo.append(-1)
        self.b_hi.append(-1)
        self.b_id.append(child)
        if prev == -1:
            self.child_bst[node] = nb
        elif went_hi:
            self.b_hi[prev] = nb
        else:
            self.b_lo[prev] = nb
        self.child_bst.append(-1)
        self.size += 1
        return child, True


class BinaryTrie(LZ78Trie):
    """First-child / next-sibling node layout, linear sibling scan
    (reference ``lz78/BinaryTrie.hpp``)."""

    native_kind = "binary"

    @classmethod
    def meta(cls):
        return Meta("lz78trie", "binary", "First-child/next-sibling trie")

    def __init__(self, env):
        super().__init__(env)
        self.first_child: list[int] = []
        self.next_sibling: list[int] = []
        self.in_char: list[int] = []

    def clear(self) -> None:
        self.first_child.clear()
        self.next_sibling.clear()
        self.in_char.clear()
        self.size = 0

    def add_rootnode(self, value: int) -> int:
        self.first_child.append(-1)
        self.next_sibling.append(-1)
        self.in_char.append(-1)
        return super().add_rootnode(value)

    def find_or_insert(self, node: int, char: int):
        c = self.first_child[node]
        prev = -1
        while c != -1:
            if self.in_char[c] == char:
                return c, False
            prev = c
            c = self.next_sibling[c]
        child = self.size
        self.first_child.append(-1)
        self.next_sibling.append(-1)
        self.in_char.append(char)
        if prev == -1:
            self.first_child[node] = child
        else:
            self.next_sibling[prev] = child
        self.size += 1
        return child, True


class BinarySortedTrie(LZ78Trie):
    """Per-node sorted child arrays + binary search
    (reference ``lz78/BinarySortedTrie.hpp``)."""

    native_kind = "binary"

    @classmethod
    def meta(cls):
        return Meta("lz78trie", "binary_sorted", "Sorted-children trie")

    def __init__(self, env):
        super().__init__(env)
        self.child_chars: list[list[int]] = []
        self.child_ids: list[list[int]] = []

    def clear(self) -> None:
        self.child_chars.clear()
        self.child_ids.clear()
        self.size = 0

    def add_rootnode(self, value: int) -> int:
        self.child_chars.append([])
        self.child_ids.append([])
        return super().add_rootnode(value)

    def find_or_insert(self, node: int, char: int):
        chars = self.child_chars[node]
        i = bisect_left(chars, char)
        if i < len(chars) and chars[i] == char:
            return self.child_ids[node][i], False
        child = self.size
        chars.insert(i, char)
        self.child_ids[node].insert(i, child)
        self.child_chars.append([])
        self.child_ids.append([])
        self.size += 1
        return child, True


class CedarTrie(LZ78Trie):
    """Double-array (base/check) trie (reference ``lz78/CedarTrie.hpp``
    over the vendored cedar library; this is a from-scratch classic
    base/check implementation with first-fit base relocation)."""

    #: whole-parse fast path: a native double-array mirror of this
    #: structure (tdc_native.cpp tdc_lz78_parse_struct kind 2); this
    #: Python class remains the spec the native parse is pinned against
    native_kind = "cedar"

    @classmethod
    def meta(cls):
        return Meta("lz78trie", "cedar", "Double-array (base/check) trie")

    def __init__(self, env):
        super().__init__(env)
        self._init_arrays()

    def _init_arrays(self):
        cap = 512
        self.base = [0] * cap
        self.check = [-1] * cap  # -1 = free slot
        self.node_id = [-1] * cap
        self.slot_of: list[int] = []  # trie node id -> DA slot
        self.children: list[list[int]] = []  # slot -> child bytes
        # rolling first-fit start: scanning from 1 on every placement
        # is quadratic (cedar proper keeps free-lists); the hint only
        # moves forward — placement layout never affects the parse
        self._hint = 1

    def clear(self) -> None:
        self._init_arrays()
        self.size = 0

    def add_rootnode(self, value: int) -> int:
        s = value  # roots live at slots 0..n_roots-1
        self._grow(s)
        self.check[s] = -2  # occupied, no parent (root marker)
        self.node_id[s] = value
        self.slot_of.append(s)
        while len(self.children) <= s:
            self.children.append([])
        return super().add_rootnode(value)

    def _grow(self, need: int) -> None:
        cap = len(self.base)
        while cap <= need:
            cap *= 2
        self.base.extend([0] * (cap - len(self.base)))
        self.check.extend([-1] * (cap - len(self.check)))
        self.node_id.extend([-1] * (cap - len(self.node_id)))

    def _find_base(self, chars: list[int]) -> int:
        if not chars:
            return 1  # leaves carry no children yet; any base works
        b = self._hint
        while True:
            ok = True
            for ch in chars:
                s = b + ch
                if s >= len(self.base):
                    self._grow(s)
                if self.check[s] != -1:
                    ok = False
                    break
            if ok:
                self._hint = b
                return b
            b += 1

    def _relocate(self, slot: int, new_char: int) -> None:
        """Move slot's children to a base that also fits new_char."""
        kids = self.children[slot]
        old_base = self.base[slot]
        newb = self._find_base(kids + [new_char])
        need = max((newb + ch for ch in kids), default=0)
        while len(self.children) <= need:
            self.children.append([])
        for ch in kids:
            old_s = old_base + ch
            new_s = newb + ch
            self.base[new_s] = self.base[old_s]
            self.check[new_s] = slot
            self.node_id[new_s] = self.node_id[old_s]
            nid = self.node_id[old_s]
            self.slot_of[nid] = new_s
            self.children[new_s] = self.children[old_s]
            # re-parent grandchildren
            gb = self.base[old_s]
            for gch in self.children[old_s]:
                self.check[gb + gch] = new_s
            self.check[old_s] = -1
            self.node_id[old_s] = -1
            self.children[old_s] = []
        self.base[slot] = newb

    def find_or_insert(self, node: int, char: int):
        slot = self.slot_of[node]
        s = self.base[slot] + char
        if s >= len(self.base):
            self._grow(s)
        if self.check[s] == slot and self.node_id[s] != -1:
            return self.node_id[s], False
        if self.check[s] != -1:  # collision: relocate this node's block
            self._relocate(slot, char)
            slot = self.slot_of[node]
            s = self.base[slot] + char
        child = self.size
        nb = self._find_base([])  # any base works for a leaf
        self.base[s] = nb
        self.check[s] = slot
        self.node_id[s] = child
        self.slot_of.append(s)
        while len(self.children) <= s:
            self.children.append([])
        self.children[s] = []
        self.children[slot].append(char)
        self.size += 1
        return child, True


class CompactSparseHashTrie(LZ78Trie):
    """Cleary compact sparse hash table as the trie map (reference
    ``lz78/CompactSparseHashTrie.hpp`` over
    ``util/compact_sparse_hash.hpp``): slots store only hash
    *quotients* — the initial address is implied by table position and
    recovered through the v/c displacement bitvectors — in 64-slot
    sparse buckets.  See ``utils/compact_hash.py``."""

    native_kind = "hash"

    @classmethod
    def meta(cls):
        return Meta(
            "lz78trie", "compact_sparse_hash",
            "Compact sparse (quotient-bucket) hash trie",
        )

    def __init__(self, env):
        super().__init__(env)
        from tudocomp_tpu.utils.compact_hash import CompactSparseHash

        self.table = CompactSparseHash(key_width=9)

    def clear(self) -> None:
        self.table.clear()
        self.size = 0

    def find_or_insert(self, node: int, char: int):
        key = (node << 8) | char
        child = self.table.get(key)
        if child is None:
            child = self.size
            self.table.insert(key, child)
            self.size += 1
            return child, True
        return child, False


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
