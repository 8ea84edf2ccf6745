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

K = 3
MAX_KMERS = 255
MAX_LITS = 255


def _rank_tables(chars: np.ndarray):
    """Top k-mer and literal ranking from the literal pre-pass."""
    kmers: list[bytes] = []
    if chars.size >= K:
        windows = np.lib.stride_tricks.sliding_window_view(chars, K)
        cnt = Counter(map(bytes, windows))
        kmers = [
            km
            for km, c in sorted(
                cnt.items(), key=lambda kv: (-kv[1], kv[0])
            )[:MAX_KMERS]
            if c > 1
        ]
    lit_cnt = Counter(chars.tolist())
    lits = [
        l
        for l, _ in sorted(lit_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
            :MAX_LITS
        ]
    ]
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
            i = 0
            # keep a K-1 tail unless final, so k-mers can span future calls
            limit = len(buf) if final else len(buf) - (K - 1)
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
                self._pending.extend(np.asarray(values, np.uint8).tolist())
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
