"""Static low-entropy (SLE) coder (Dinklage 2015).

Re-design of the reference ``coders/SLECoder.hpp``: a consuming coder that
ranks k-mers (default 3-grams) and single literals by frequency, stores a
table of the top entries, and escape-codes everything else.

Our format (self-consistent; documented divergence from the reference's
implicit format, which we do not replicate bit-for-bit):

- header: compressed_int(num_kmers), then per k-mer its k=3 bytes;
  compressed_int(num_lits), then each literal byte. Entries are ordered by
  descending frequency (ties by value) — entry index IS the rank.
- literal stream: greedily at each position, if the next 3 literals match a
  table k-mer, emit 1-bit flag 1 + gamma(rank); else flag 0, then 1-bit
  flag 1 + gamma(lit-rank) if the literal is ranked, else flag 0 + 8-bit
  raw byte.
- non-literal ranges fall back to range-optimal binary.

Consuming: the encoder buffers *all* literals up front (they are known from
the literal iterator) and interleaving with other range encodes follows the
same positions as the reference's taxonomy requires.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from tudocomp_tpu.coders import base
from tudocomp_tpu.meta import Algorithm, Meta
from tudocomp_tpu.ranges import LiteralRange, Range
from tudocomp_tpu.utils.bits import bits_for_arr


def _gamma_tokens(v: np.ndarray):
    """Elias-gamma of each value as ONE token: b = bits_for(v) leading
    zeros + 1 + the b value bits => value (1<<b)|v, length 2b+1."""
    v = np.asarray(v, np.uint64)
    b = bits_for_arr(v).astype(np.uint64)
    return (np.uint64(1) << b) | v, (2 * b + 1).astype(np.int64)


K = 3
MAX_KMERS = 255
MAX_LITS = 255


def _rank_tables(chars: np.ndarray):
    """Top k-mer and literal ranking from the literal pre-pass
    (vectorized; ordering matches the Counter-based spec: descending
    count, ties by value)."""
    from tudocomp_tpu import native

    if chars.size > 4096 and native.available():
        got = native.sle_rank(chars, K, MAX_KMERS, MAX_LITS)
        if got is not None:
            keys, lit_arr = got
            return (
                [int(k).to_bytes(K, "big") for k in keys.tolist()],
                lit_arr.tolist(),
            )
    kmers: list[bytes] = []
    if chars.size >= K:
        win = np.lib.stride_tricks.sliding_window_view(chars, K)
        keys = win.astype(np.int64) @ (256 ** np.arange(K - 1, -1, -1))
        uniq, counts = np.unique(keys, return_counts=True)
        order = np.lexsort((uniq, -counts))[:MAX_KMERS]
        kmers = [
            int(uniq[i]).to_bytes(K, "big")
            for i in order
            if counts[i] > 1
        ]
    lit_counts = np.bincount(chars, minlength=256)
    present = np.flatnonzero(lit_counts)
    order = np.lexsort((present, -lit_counts[present]))[:MAX_LITS]
    lits = [int(present[i]) for i in order]
    return kmers, lits


class SLECoder(Algorithm):
    is_consuming = True

    @classmethod
    def meta(cls):
        return Meta("coder", "sle", "Static low-entropy encoding").\
            option_dynamic("kmer", K)

    class Encoder(base.Encoder):
        is_consuming = True

        def __init__(self, env, out, literals):
            super().__init__(env, out, literals)
            self.kmers, self.lits = _rank_tables(literals.chars)
            self.kmer_rank = {km: i for i, km in enumerate(self.kmers)}
            self.lit_rank = {l: i for i, l in enumerate(self.lits)}
            self._lit_rank_arr = np.full(256, -1, np.int64)
            for l, i in self.lit_rank.items():
                self._lit_rank_arr[l] = i
            # native matcher tables: kmer keys sorted ascending + the
            # rank of each sorted key; literal ranks as int32[256]
            keys = np.array(
                [int.from_bytes(km, "big") for km in self.kmers],
                np.int64,
            )
            order = np.argsort(keys, kind="stable")
            self._sorted_keys = np.ascontiguousarray(keys[order])
            self._key_rank = np.ascontiguousarray(order.astype(np.int64))
            self._lit_rank32 = np.ascontiguousarray(
                self._lit_rank_arr.astype(np.int32)
            )
            out.write_compressed_int(len(self.kmers))
            for km in self.kmers:
                for b in km:
                    out.write_int(b, 8)
            out.write_compressed_int(len(self.lits))
            for l in self.lits:
                out.write_int(l, 8)
            # pending buffer for k-mer matching across encode calls
            self._pending: list[int] = []

        def _flush_pending(self, final: bool) -> None:
            buf = self._pending
            limit = len(buf) if final else len(buf) - (K - 1)
            if limit <= 0:
                return
            if limit > 64:
                i = self._flush_bulk(limit)
                del buf[:i]
                return
            i = 0
            while i < limit:
                km = bytes(buf[i : i + K])
                rank = self.kmer_rank.get(km) if len(km) == K else None
                if rank is not None:
                    self.out.write_bit(1)
                    self.out.write_elias_gamma(rank)
                    i += K
                else:
                    self.out.write_bit(0)
                    lr = self.lit_rank.get(buf[i])
                    if lr is not None:
                        self.out.write_bit(1)
                        self.out.write_elias_gamma(lr)
                    else:
                        self.out.write_bit(0)
                        self.out.write_int(buf[i], 8)
                    i += 1
            del buf[:i]

        def _flush_bulk(self, limit: int) -> int:
            """Vectorized greedy matcher: jump-table pointer doubling over
            ``jump[i] = i+K if kmer at i else i+1``, then bulk token
            emission. Bit-identical to the scalar loop. The native C
            matcher (``tdc_sle_run_tokens``) takes over when built."""
            buf = np.asarray(self._pending, np.uint8)
            got = self._native_tokens(buf, limit)
            if got is not None:
                return got
            n = buf.size
            # K-gram integer keys
            if n >= K:
                win = np.lib.stride_tricks.sliding_window_view(buf, K)
                keys = win.astype(np.int64) @ (
                    256 ** np.arange(K - 1, -1, -1)
                )
            else:
                keys = np.zeros(0, np.int64)
            # tables precomputed in __init__ (same construction)
            order = self._key_rank
            sorted_keys = self._sorted_keys
            pos_in_sorted = np.searchsorted(sorted_keys, keys)
            pos_in_sorted = np.minimum(
                pos_in_sorted, max(0, sorted_keys.size - 1)
            )
            is_kmer = np.zeros(n, bool)
            ranks = np.zeros(n, np.int64)
            if sorted_keys.size and keys.size:
                hit = sorted_keys[pos_in_sorted] == keys
                is_kmer[: keys.size] = hit
                ranks[: keys.size] = np.where(
                    hit, order[pos_in_sorted], 0
                )
            # a k-mer match must fit entirely below `limit`+tail rules:
            # the scalar loop matches when i < limit and i+K <= len(buf)
            can_kmer = is_kmer & (np.arange(n) + K <= n)
            jump = np.where(can_kmer, np.arange(n) + K, np.arange(n) + 1)
            jump = np.minimum(jump, n)
            jump = np.concatenate([jump, [n]])
            # positions after 0..upper steps via in-place jump composition
            # (positions are monotone, so the emission count is a
            # searchsorted over them — no table pyramid needed)
            upper = limit + 1
            pos = np.zeros(upper + 1, np.int64)
            idx = np.arange(upper + 1, dtype=np.int64)
            t = jump
            b = 0
            while (1 << b) <= upper:
                mask = (idx >> b) & 1 == 1
                pos[mask] = t[pos[mask]]
                t = t[t]
                b += 1
            count = int(np.searchsorted(pos, limit))
            i_end = int(pos[count]) if count <= upper else limit
            pos = pos[:count]
            kk = can_kmer[pos]
            # tokens: 3 slots per emission
            g_val, g_len = _gamma_tokens(ranks[pos])
            lit = buf[pos]
            lit_rank = self._lit_rank_arr[lit]
            has_lr = lit_rank >= 0
            lg_val, lg_len = _gamma_tokens(np.maximum(lit_rank, 0))
            values = np.zeros(3 * count, np.uint64)
            lens = np.zeros(3 * count, np.int64)
            # slot 0: flag (1 for kmer, 0 otherwise)
            values[0::3] = kk
            lens[0::3] = 1
            # slot 1: kmer -> gamma(rank); else second flag
            values[1::3] = np.where(kk, g_val, has_lr)
            lens[1::3] = np.where(kk, g_len, 1)
            # slot 2: ranked literal gamma / raw byte
            values[2::3] = np.where(
                kk, 0, np.where(has_lr, lg_val, lit)
            )
            lens[2::3] = np.where(
                kk, 0, np.where(has_lr, lg_len, 8)
            )
            self.out.write_tokens(values, lens)
            return i_end

        def _native_tokens(self, buf: np.ndarray, limit: int):
            """Emit SLE tokens for ``buf[:limit]`` via the native matcher;
            returns the consumed count or None when native is absent."""
            from tudocomp_tpu import native

            if not native.available():
                return None
            got = native.sle_run_tokens(
                buf, limit, self._sorted_keys, self._key_rank, K,
                self._lit_rank32,
            )
            if got is None:
                return None
            consumed, values, lens = got
            if lens.size:
                self.out.write_tokens(values, lens)
            return consumed

        def encode(self, v, r: Range) -> None:
            if isinstance(r, LiteralRange):
                self._pending.append(int(v) & 0xFF)
                if len(self._pending) >= 4 * K:
                    self._flush_pending(final=False)
            else:
                self._flush_pending(final=True)
                super().encode(v, r)

        def encode_array(self, values, r: Range) -> None:
            if isinstance(r, LiteralRange):
                arr = np.asarray(values, np.uint8)
                if not self._pending and arr.size > 64:
                    # bulk path straight off the array (no list roundtrip);
                    # the un-consumed tail (< K bytes) stays pending
                    consumed = self._native_tokens(
                        arr, arr.size - (K - 1)
                    )
                    if consumed is not None:
                        self._pending.extend(arr[consumed:].tolist())
                        return
                self._pending.extend(arr.tolist())
                self._flush_pending(final=False)
            else:
                self._flush_pending(final=True)
                super().encode_array(values, r)

        def finish(self) -> None:
            self._flush_pending(final=True)

    class Decoder(base.Decoder):
        is_consuming = True

        def __init__(self, env, inp):
            super().__init__(env, inp)
            n_kmers = inp.read_compressed_int()
            self.kmers = [
                bytes(inp.read_int(8) for _ in range(K))
                for _ in range(n_kmers)
            ]
            n_lits = inp.read_compressed_int()
            self.lits = [inp.read_int(8) for _ in range(n_lits)]
            self.buffer: list[int] = []

        def eof(self) -> bool:
            return not self.buffer and self.inp.eof()

        def decode(self, r: Range) -> int:
            if not isinstance(r, LiteralRange):
                if self.buffer:
                    raise ValueError(
                        "sle: interleaved decode with buffered k-mer tail"
                    )
                return super().decode(r)
            if self.buffer:
                return self.buffer.pop(0)
            if self.inp.read_bit():
                km = self.kmers[self.inp.read_elias_gamma()]
                self.buffer = list(km[1:])
                return km[0]
            if self.inp.read_bit():
                return self.lits[self.inp.read_elias_gamma()]
            return self.inp.read_int(8)

        def decode_array(self, r: Range, count: int) -> np.ndarray:
            return np.array(
                [self.decode(r) for _ in range(count)], np.uint64
            )

        def decode_remaining_literals(self) -> bytes:
            """Whole-stream literal decode via the native runtime (the
            per-bit speculative numpy variant loses to the C walk)."""
            from tudocomp_tpu import native

            rd = self.inp
            if self.buffer or not native.available():
                out = bytearray()
                from tudocomp_tpu.ranges import literal_r

                while not self.eof():
                    out.append(self.decode(literal_r))
                return bytes(out)
            payload = np.packbits(rd._bits)
            got = native.sle_decode(
                payload, rd.total, rd.pos,
                b"".join(self.kmers), len(self.kmers), K,
                bytes(self.lits),
            )
            rd.pos = rd.total
            return got
