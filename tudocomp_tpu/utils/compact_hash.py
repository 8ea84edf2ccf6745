"""Cleary-style compact sparse hash table.

Re-implements the scheme of the reference's
``util/compact_sparse_hash.hpp`` (1,213 LoC; used by
``lz78/CompactSparseHashTrie.hpp``):

- **Compact**: a slot does not store its key.  The key is scrambled by
  an invertible multiplicative hash; its top ``a`` bits become the
  *initial address* (implied by table position), only the remaining
  *quotient* bits are stored.  Displacement bookkeeping uses Cleary's
  two bitvectors: ``v[addr]`` ("virgin") marks that a group of entries
  with home address ``addr`` exists, and ``c[slot]`` ("change") marks
  the slot where a group starts.  Within one cluster (maximal run of
  occupied slots) groups appear in home-address order, so the *k*-th
  set ``v`` bit of a cluster corresponds to its *k*-th set ``c`` bit —
  that correspondence recovers every entry's home address and thus its
  full key (needed for rehash/grow).
- **Sparse**: slots live in 64-wide buckets, each a (bitmask, dense
  quotient list, dense value list) triple, so empty slots cost one bit
  (reference ``Bucket<val_t>``).

Insertion follows the reference's three cases
(``compact_sparse_hash.hpp:680-741``): empty home slot; existing group
(append at group end, shifting the cluster tail right by one slot and
shifting the tail's ``c`` bits with it); and new group inside an
existing cluster (pretend-set ``v``, insert after the preceding group,
then mark the inserted slot as a group start).

Keys are non-negative Python ints of declared ``key_width``; growing
either the table or the key width recomposes every stored key and
rebuilds, like the reference's ``grow_if_needed``.
"""

from __future__ import annotations

_A = 0x9E3779B97F4A7C15  # odd => bijective multiplication mod 2^w
_INV_CACHE: dict[int, int] = {}


def _inv(w: int) -> int:
    got = _INV_CACHE.get(w)
    if got is None:
        got = _INV_CACHE[w] = pow(_A, -1, 1 << w)
    return got


def _scramble(x: int, w: int) -> int:
    return (x * _A) & ((1 << w) - 1)


def _unscramble(h: int, w: int) -> int:
    return (h * _inv(w)) & ((1 << w) - 1)


class CompactSparseHash:
    """int key -> int value map storing only quotients (no keys)."""

    BUCKET = 64

    def __init__(self, key_width: int = 16, initial_log2: int = 4,
                 load_factor: float = 0.5):
        if not 0.0 < load_factor < 1.0:
            # a full table would deadlock the cluster walks and break
            # key recovery (there must always be an empty slot)
            raise ValueError("load_factor must be in (0, 1)")
        self.load_factor = load_factor
        self._init(max(1, initial_log2), key_width)

    # -- layout ------------------------------------------------------------

    def _init(self, a: int, key_width: int) -> None:
        self.a = a                      # log2 table size
        self.m = 1 << a                 # slots
        self.key_width = key_width
        # usable scramble width; quotient width = w - a (>= 1)
        self.w = max(a + 1, key_width)
        nb = (self.m + self.BUCKET - 1) // self.BUCKET
        self.bucket_mask = [0] * nb
        self.bucket_q: list[list[int]] = [[] for _ in range(nb)]
        self.bucket_v: list[list[int]] = [[] for _ in range(nb)]
        self.v = bytearray(self.m)
        self.c = bytearray(self.m)
        self.size = 0

    def clear(self) -> None:
        self._init(self.a, self.key_width)

    # -- sparse slot primitives (reference Bucket<val_t>) --------------------

    def _exists(self, pos: int) -> bool:
        return (self.bucket_mask[pos >> 6] >> (pos & 63)) & 1 == 1

    def _dense_index(self, pos: int) -> int:
        below = self.bucket_mask[pos >> 6] & ((1 << (pos & 63)) - 1)
        return below.bit_count()

    def _get(self, pos: int) -> tuple[int, int]:
        b, i = pos >> 6, self._dense_index(pos)
        return self.bucket_q[b][i], self.bucket_v[b][i]

    def _set_value(self, pos: int, value: int) -> None:
        b, i = pos >> 6, self._dense_index(pos)
        self.bucket_v[b][i] = value

    def _place_empty(self, pos: int, q: int, value: int) -> None:
        b, i = pos >> 6, self._dense_index(pos)
        self.bucket_mask[b] |= 1 << (pos & 63)
        self.bucket_q[b].insert(i, q)
        self.bucket_v[b].insert(i, value)

    def _overwrite(self, pos: int, q: int, value: int) -> None:
        b, i = pos >> 6, self._dense_index(pos)
        self.bucket_q[b][i] = q
        self.bucket_v[b][i] = value

    # -- key decomposition ---------------------------------------------------

    def _decompose(self, key: int) -> tuple[int, int]:
        h = _scramble(key, self.w)
        shift = self.w - self.a
        return h >> shift, h & ((1 << shift) - 1)

    def _compose(self, ia: int, q: int) -> int:
        shift = self.w - self.a
        return _unscramble((ia << shift) | q, self.w)

    # -- Cleary group search (reference search_existing_group) ---------------

    def _search_group(self, ia: int) -> tuple[int, int, int]:
        """Returns (group_start, group_end, terminator) for home ``ia``
        (requires ``v[ia]``); ranges are half-open mod ``m``."""
        mask = self.m - 1
        cursor = ia
        v_counter = 0
        while self._exists(cursor):
            v_counter += self.v[cursor]
            cursor = (cursor + 1) & mask
        terminator = cursor
        c_counter = v_counter
        while c_counter != 1:
            c_counter -= self.c[(cursor - 1) & mask]
            cursor = (cursor - 1) & mask
        group_end = cursor
        while c_counter != 0:
            c_counter -= self.c[(cursor - 1) & mask]
            cursor = (cursor - 1) & mask
        return cursor, group_end, terminator

    def _find_in_group(self, start: int, end: int, q: int):
        mask = self.m - 1
        i = start
        while i != end:
            if self._get(i)[0] == q:
                return i
            i = (i + 1) & mask
        return None

    # -- public map API --------------------------------------------------

    def get(self, key: int, default=None):
        if key.bit_length() > self.key_width:
            # wider keys were never inserted (insert grows the width
            # first); scrambling them at the current width would alias
            return default
        ia, q = self._decompose(key)
        if not self.v[ia]:
            return default
        start, end, _ = self._search_group(ia)
        pos = self._find_in_group(start, end, q)
        if pos is None:
            return default
        return self._get(pos)[1]

    def insert(self, key: int, value: int) -> None:
        """Insert or overwrite."""
        # overwrite of an existing key needs no growth (and must not
        # pay a full rebuild at the load boundary)
        if key.bit_length() <= self.key_width:
            ia, q = self._decompose(key)
            if self._exists(ia) and self.v[ia]:
                start, end, _ = self._search_group(ia)
                pos = self._find_in_group(start, end, q)
                if pos is not None:
                    self._set_value(pos, value)
                    return
        self._grow_if_needed(max(self.key_width, key.bit_length()))
        ia, q = self._decompose(key)
        mask = self.m - 1
        if not self._exists(ia):
            self._place_empty(ia, q, value)
            self.v[ia] = 1
            self.c[ia] = 1
            self.size += 1
        elif self.v[ia]:
            start, end, term = self._search_group(ia)
            pos = self._find_in_group(start, end, q)
            if pos is not None:
                self._set_value(pos, value)
                return
            self._insert_after(end, term, q, value)
            self.size += 1
        else:
            # new group inside an existing cluster: pretend v is set so
            # the search finds the predecessor group's end, insert
            # there, then mark it as a group start
            self.v[ia] = 1
            _, end, term = self._search_group(ia)
            self._insert_after(end, term, q, value)
            self.c[end] = 1
            self.size += 1

    def _insert_after(self, group_end: int, terminator: int, q: int,
                      value: int) -> None:
        mask = self.m - 1
        if not self._exists(group_end):
            self._place_empty(group_end, q, value)
            return
        # shift [group_end, terminator) right one slot, c bits included
        # (reference shift_insert_handler)
        i = terminator
        while i != group_end:
            prev = (i - 1) & mask
            self.c[i] = self.c[prev]
            i = prev
        i = terminator
        while i != group_end:
            prev = (i - 1) & mask
            pq, pv = self._get(prev)
            if self._exists(i):
                self._overwrite(i, pq, pv)
            else:
                self._place_empty(i, pq, pv)
            i = prev
        self._overwrite(group_end, q, value)
        self.c[group_end] = 0

    def __len__(self) -> int:
        return self.size

    # -- iteration / growth ----------------------------------------------

    def items(self):
        """Recover (key, value) pairs from quotients + v/c metadata
        (reference iter_all_t)."""
        if self.size == 0:
            return
        mask = self.m - 1
        # start scanning at an empty slot so no cluster wraps the origin
        origin = next(
            p for p in range(self.m) if not self._exists(p)
        )
        pos = origin
        homes: list[int] = []
        home_i = -1
        for _ in range(self.m):
            pos = (pos + 1) & mask
            if not self._exists(pos):
                homes.clear()
                home_i = -1
                continue
            if self.v[pos]:
                homes.append(pos)
            if self.c[pos]:
                home_i += 1
            q, val = self._get(pos)
            yield self._compose(homes[home_i], q), val

    def _grow_if_needed(self, key_width: int) -> None:
        needs_width = key_width > self.key_width
        needs_space = self.size + 1 > self.m * self.load_factor
        if not (needs_width or needs_space):
            return
        entries = list(self.items())
        a = self.a + (1 if needs_space else 0)
        self._init(a, key_width)
        # re-check space after width-only growth
        while self.size + len(entries) > self.m * self.load_factor:
            self._init(self.a + 1, key_width)
        for k, v in entries:
            ia, q = self._decompose(k)
            if not self._exists(ia):
                self._place_empty(ia, q, v)
                self.v[ia] = 1
                self.c[ia] = 1
                self.size += 1
            elif self.v[ia]:
                start, end, term = self._search_group(ia)
                self._insert_after(end, term, q, v)
                self.size += 1
            else:
                self.v[ia] = 1
                _, end, term = self._search_group(ia)
                self._insert_after(end, term, q, v)
                self.c[end] = 1
                self.size += 1
