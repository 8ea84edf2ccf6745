"""LFS: longest-first substitution grammar compression.

Reference: ``compressors/lfs/`` (``LFSCompressor.hpp``,
``ESAStrategy.hpp``, ``STStrategy.hpp``, ``EncodeStrategy.hpp``).
Repeatedly pick the longest repeating factor (LRF) with >= 2
non-overlapping live occurrences, make it a dictionary rule, and replace
its occurrences with non-terminals.

Strategies (``computing_strat=``): ``esa`` finds LRFs from SA/LCP bins
(longest first); ``st`` walks suffix-tree internal nodes by string depth.
Both produce (dictionary, occurrence list) for the shared coding
strategy.

Wire format (= reference ``EncodeStrategy``): rule lengths as a delta
chain closed by the last length (len coder, gamma by default), rule
strings as literals, then the start string as ``0 literal`` /
``1 rule-id`` tokens (lit coder, huffman by default).
"""

from __future__ import annotations

import numpy as np

from tudocomp_tpu.coders import UNIVERSAL_CODER_NAMES
from tudocomp_tpu.coders.base import Literals, NoLiterals
from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.ds.suffix import TextDS
from tudocomp_tpu.ds.suffix_tree import SuffixTree
from tudocomp_tpu.io.bitio import BitReader, BitWriter
from tudocomp_tpu.meta import Algorithm, Meta
from tudocomp_tpu.ranges import Range, bit_r, literal_r
from tudocomp_tpu.registry import REGISTRY

UINT32_R = Range(0xFFFFFFFF)


def _select_nonoverlapping(positions, length, dead):
    """Greedy leftmost selection of pairwise non-overlapping, fully-live
    occurrences."""
    out = []
    last_end = -1
    for p in sorted(set(positions)):
        if p < last_end:
            continue
        if dead[p : p + length].any():
            continue
        out.append(p)
        last_end = p + length
    return out


class ESAStrategy(Algorithm):
    """LRFs from SA/LCP, longest first (reference ``ESAStrategy.hpp``)."""

    @classmethod
    def meta(cls):
        m = Meta("lfs_comp", "esa", "ESA-based LRF computation")
        m.option_dynamic("min_lrf", 2)
        return m

    def compute_rules(self, text: bytes):
        min_lrf = self.env.option("min_lrf").as_int()
        ds = TextDS(text)
        sa = ds.require_sa()
        lcp = ds.require_lcp()
        n = sa.size
        dead = np.zeros(n, bool)
        dictionary: list[tuple[int, int]] = []  # (offset, length)
        occurrences: list[tuple[int, int, int]] = []  # (pos, rule, len)
        if lcp.size == 0:
            return dictionary, occurrences
        order = np.argsort(-lcp, kind="stable")
        seen_intervals = set()
        for i in order.tolist():
            length = int(lcp[i])
            if length < min_lrf:
                break
            if dead[sa[i]]:  # this occurrence is already replaced
                continue
            # maximal SA interval [lo, hi] with lcp >= length around i
            lo = i
            while lo > 0 and lcp[lo] >= length:
                lo -= 1
            hi = i
            while hi + 1 < n and lcp[hi + 1] >= length:
                hi += 1
            if (lo, length) in seen_intervals:
                continue  # every member enumerates the same interval
            seen_intervals.add((lo, length))
            positions = sa[lo : hi + 1]
            selected = _select_nonoverlapping(
                positions.tolist(), length, dead
            )
            if len(selected) < 2:
                continue
            rule_id = len(dictionary)
            dictionary.append((int(selected[0]), length))
            for p in selected:
                dead[p : p + length] = True
                occurrences.append((p, rule_id, length))
        occurrences.sort()
        return dictionary, occurrences


class STStrategy(Algorithm):
    """LRFs from suffix-tree internal nodes by string depth
    (reference ``STStrategy.hpp``)."""

    @classmethod
    def meta(cls):
        m = Meta("lfs_comp", "st", "Suffix-tree LRF computation")
        m.option_dynamic("min_lrf", 2)
        return m

    def compute_rules(self, text: bytes):
        min_lrf = self.env.option("min_lrf").as_int()
        st = SuffixTree(text)
        n = st.n
        dead = np.zeros(n, bool)
        # leaves below each internal node: accumulate bottom-up
        order = np.argsort(-st.sdepth, kind="stable")
        leaves_below: dict[int, list[int]] = {}
        for v in range(len(st.parent)):
            if st.is_leaf[v]:
                p = int(st.parent[v])
                leaves_below.setdefault(p, []).append(int(st.suffix[v]))
        # push leaf sets upward (children processed before parents when
        # sorted by decreasing depth)
        for v in order.tolist():
            if st.is_leaf[v] or v == st.root:
                continue
            p = int(st.parent[v])
            leaves_below.setdefault(p, []).extend(
                leaves_below.get(v, [])
            )
        dictionary: list[tuple[int, int]] = []
        occurrences: list[tuple[int, int, int]] = []
        for v in order.tolist():
            if st.is_leaf[v] or v == st.root:
                continue
            length = int(st.sdepth[v])
            if length < min_lrf:
                continue
            selected = _select_nonoverlapping(
                leaves_below.get(v, []), length, dead
            )
            if len(selected) < 2:
                continue
            rule_id = len(dictionary)
            dictionary.append((int(selected[0]), length))
            for p in selected:
                dead[p : p + length] = True
                occurrences.append((p, rule_id, length))
        occurrences.sort()
        return dictionary, occurrences


class SimSTStrategy(STStrategy):
    """Simulated suffix tree variant (reference ``SimSTStrategy.hpp``);
    shares the st computation over the SA-built tree."""

    @classmethod
    def meta(cls):
        m = Meta("lfs_comp", "sim_st", "Simulated-ST LRF computation")
        m.option_dynamic("min_lrf", 2)
        return m


class BSTStrategy(STStrategy):
    """Binary-suffix-tree variant (reference ``BSTStrategy.hpp``)."""

    @classmethod
    def meta(cls):
        m = Meta("lfs_comp", "bst", "Binary-ST LRF computation")
        m.option_dynamic("min_lrf", 2)
        return m


class EncodeStrategy(Algorithm):
    """Shared coding strategy (reference ``EncodeStrategy.hpp``)."""

    @classmethod
    def meta(cls):
        m = Meta("lfs_comp_enc", "lfs_encode_strat", "LFS encoding")
        m.option_submeta(
            "lfs_lit_coder", "coder", default="huff",
            accepts=("ascii", "bit", "huff"),
        )
        m.option_submeta(
            "lfs_len_coder", "coder", default="gamma",
            accepts=UNIVERSAL_CODER_NAMES,
        )
        return m

    def encode(self, text: np.ndarray, dictionary, occurrences) -> bytes:
        out = BitWriter()
        lit_env = self.env.env_for_option("lfs_lit_coder")
        lit_coder = lit_env.cls.Encoder(
            lit_env, out, Literals(text, np.arange(text.size))
        )
        len_env = self.env.env_for_option("lfs_len_coder")
        len_coder = len_env.cls.Encoder(len_env, out, NoLiterals())

        # dictionary rule lengths: first absolute, then deltas, closed by
        # the last length (decoder subtracts down to zero)
        if dictionary:
            first_len = dictionary[0][1]
            s_length_r = Range(first_len)
            len_coder.encode(first_len, UINT32_R)
            last = first_len
            for _, length in dictionary[1:]:
                len_coder.encode(last - length, s_length_r)
                last = length
            len_coder.encode(last, s_length_r)
        else:
            len_coder.encode(0, UINT32_R)
        # rule strings
        for offset, length in dictionary:
            for k in range(length):
                lit_coder.encode(int(text[offset + k]), literal_r)
        # start string
        dict_r = Range(len(dictionary))
        pos = 0
        for start, rule_id, length in occurrences:
            while pos < start:
                lit_coder.encode(0, bit_r)
                lit_coder.encode(int(text[pos]), literal_r)
                pos += 1
            lit_coder.encode(1, bit_r)
            lit_coder.encode(rule_id, dict_r)
            pos += length
        while pos < text.size:
            lit_coder.encode(0, bit_r)
            lit_coder.encode(int(text[pos]), literal_r)
            pos += 1
        lit_coder.finish()
        return out.getvalue()

    def decode(self, data: bytes) -> bytes:
        inp = BitReader(data)
        lit_env = self.env.env_for_option("lfs_lit_coder")
        lit_dec = lit_env.cls.Decoder(lit_env, inp)
        len_env = self.env.env_for_option("lfs_len_coder")
        len_dec = len_env.cls.Decoder(len_env, inp)

        symbol_length = len_dec.decode(UINT32_R)
        s_length_r = Range(symbol_length)
        dict_lengths = [symbol_length]
        while symbol_length > 0:
            delta = len_dec.decode(s_length_r)
            symbol_length -= delta
            dict_lengths.append(symbol_length)
        dict_lengths.pop()

        dictionary = []
        for length in dict_lengths:
            dictionary.append(
                bytes(lit_dec.decode(literal_r) for _ in range(length))
            )
        dict_r = Range(len(dictionary))
        out = bytearray()
        while not lit_dec.eof():
            if lit_dec.decode(bit_r):
                out += dictionary[lit_dec.decode(dict_r)]
            else:
                out.append(lit_dec.decode(literal_r))
        return bytes(out)


class LFSCompressor(Compressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "lfs_comp", "LFS compression scheme")
        m.option_submeta("computing_strat", "lfs_comp", default="esa")
        m.option_submeta(
            "coding_strat", "lfs_comp_enc", default="lfs_encode_strat"
        )
        m.needs_sentinel_terminator()
        return m

    def compress(self, data: bytes) -> bytes:
        text = np.frombuffer(data, np.uint8)
        if text.size > 1:
            strat = self.env.instantiate("computing_strat")
            dictionary, occurrences = strat.compute_rules(data)
        else:
            dictionary, occurrences = [], []
        coding = self.env.instantiate("coding_strat")
        return coding.encode(text, dictionary, occurrences)

    def decompress(self, data: bytes) -> bytes:
        coding = self.env.instantiate("coding_strat")
        return coding.decode(data)


class LFS2Compressor(LFSCompressor):
    """Second LFS scheme (reference ``LFS2Compressor.hpp``): suffix-tree
    LRF selection with its own coder pair; shares the coding strategy."""

    @classmethod
    def meta(cls):
        m = Meta("compressor", "lfs2", "LFS2 compression scheme")
        m.option_submeta("computing_strat", "lfs_comp", default="st")
        m.option_submeta(
            "coding_strat", "lfs_comp_enc", default="lfs_encode_strat"
        )
        m.option_dynamic("min_lrf", 5)
        m.needs_sentinel_terminator()
        return m


class LFS2BSTCompressor(LFSCompressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "lfs2bst", "LFS2 with binary suffix tree")
        m.option_submeta("computing_strat", "lfs_comp", default="bst")
        m.option_submeta(
            "coding_strat", "lfs_comp_enc", default="lfs_encode_strat"
        )
        m.option_dynamic("min_lrf", 5)
        m.needs_sentinel_terminator()
        return m


for _cls in (ESAStrategy, STStrategy, SimSTStrategy, BSTStrategy,
             EncodeStrategy, LFSCompressor, LFS2Compressor,
             LFS2BSTCompressor):
    REGISTRY.register(_cls)
