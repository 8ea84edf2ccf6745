"""LZ78U: LZ78 factorization over the suffix tree (SEA'17).

Reference: ``compressors/LZ78UCompressor.hpp`` + ``compressors/lz78u/``.
One factor per freshly visited suffix-tree node; a factor is
``(ref to parent factor, edge-label string)``. Labels of length >=
``threshold`` are themselves sub-factorized against already-assigned
node factors (with 0-escaped cut values when a sub-reference overshoots).

Strategies (``comp=``): ``streaming`` writes refs/separators/characters
as they are produced with two interleaved coders (ref coder + string
coder, 0-terminated label strings); ``buffering`` records the emission
stream and replays it at the end so the string coder can build a real
literal table (reference ``StreamingStrategy.hpp`` /
``BufferingStrategy.hpp``). Wire format matches the reference stream
structure exactly.
"""

from __future__ import annotations

import numpy as np

from tudocomp_tpu.coders import (
    NON_CONSUMING_CODER_NAMES,
    UNIVERSAL_CODER_NAMES,
)
from tudocomp_tpu.coders.base import Literals, NoLiterals
from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.ds.suffix_tree import SuffixTree
from tudocomp_tpu.io.bitio import BitReader, BitWriter
from tudocomp_tpu.meta import Algorithm, Meta
from tudocomp_tpu.ranges import Range, len_r, literal_r
from tudocomp_tpu.registry import REGISTRY


class _Emission:
    """Recorded emission stream: (kind, payload) events.

    kind 0 = ref (payload (ref, range)), 1 = sep bit, 2 = char.
    """

    def __init__(self):
        self.events: list[tuple[int, object]] = []
        self.chars: list[int] = []

    def ref(self, r: int, rng: Range):
        self.events.append((0, (r, rng)))

    def sep(self, bit: bool):
        self.events.append((1, bit))

    def char(self, c: int):
        self.events.append((2, c))
        self.chars.append(c)

    def string(self, s: bytes):
        for c in s:
            self.char(c)
        self.char(0)


class StreamingStrategy(Algorithm):
    @classmethod
    def meta(cls):
        m = Meta("lz78u_strategy", "streaming", "Streaming LZ78U strategy")
        m.option_submeta(
            "string_coder", "coder", default="bit",
            accepts=UNIVERSAL_CODER_NAMES,
        )
        return m

    use_literals = False  # string coder gets NoLiterals


class BufferingStrategy(Algorithm):
    @classmethod
    def meta(cls):
        m = Meta("lz78u_strategy", "buffering", "Buffering LZ78U strategy")
        m.option_submeta(
            "string_coder", "coder", default="bit",
            accepts=NON_CONSUMING_CODER_NAMES,
        )
        return m

    use_literals = True  # string coder gets the full literal pre-pass


class LZ78UCompressor(Compressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "lz78u", "Lempel-Ziv 78 U")
        m.option_submeta("comp", "lz78u_strategy", default="buffering")
        m.option_submeta(
            "coder", "coder", accepts=UNIVERSAL_CODER_NAMES
        )
        m.option_dynamic("threshold", 3)
        m.needs_sentinel_terminator()
        m.escapes(0)
        return m

    # -- compression ---------------------------------------------------------

    def compress(self, data: bytes) -> bytes:
        threshold = self.env.option("threshold").as_int()
        T = np.frombuffer(data, np.uint8)
        st = SuffixTree(data)
        from tudocomp_tpu import native

        if native.available():
            got = native.lz78u_parse(
                st.parent, st.sdepth, st.is_leaf, st.leaf_of_rank,
                st.isa, T, threshold,
            )
            if got is not None:
                return self._encode_events(*got)
        R: dict[int, int] = {}  # internal node -> factor id
        em = _Emission()
        factor_count = 0

        def output(begin: int, end: int, ref: int):
            nonlocal factor_count
            while end > begin and T[end - 1] == 0:
                end -= 1
            em.ref(ref, Range(factor_count))
            if end - begin >= threshold:
                em.sep(False)
                pos = begin
                while pos < end:
                    leaf = st.select_leaf(int(st.isa[pos]))
                    path = st.root_path(leaf)
                    d = 1
                    parent = st.root
                    node = path[d]
                    while not st.is_leaf[node] and R.get(node, 0) != 0:
                        parent = node
                        d += 1
                        node = path[d]
                    depth = st.str_depth(parent)
                    if depth < threshold:
                        em.sep(False)
                        em.char(int(T[pos]))
                        pos += 1
                    else:
                        em.sep(True)
                        em.ref(R[parent], Range(factor_count))
                        pos += depth
                        if pos > end:
                            em.sep(True)
                            em.ref(0, Range(factor_count))
                            em.ref(pos - end, len_r)
                em.sep(False)
                em.char(0)
            else:
                em.sep(True)
                em.string(T[begin:end].tobytes())
            factor_count += 1

        pos = 0
        n = T.size
        while pos < n - 1:
            leaf = st.select_leaf(int(st.isa[pos]))
            path = st.root_path(leaf)
            par = path[-2]
            if par == st.root or R.get(par, 0) != 0:
                psd = st.str_depth(par)
                output(pos + psd, pos + psd + 1,
                       R.get(par, 0) if par != st.root else 0)
                pos += psd + 1
                continue
            d = 1
            parent = st.root
            node = path[d]
            while R.get(node, 0) != 0:
                parent = node
                d += 1
                node = path[d]
            begin = pos + st.str_depth(parent)
            end = pos + st.str_depth(node)
            output(begin, end, R.get(parent, 0))
            factor_id = factor_count  # output() already incremented
            R[node] = factor_id
            pos = end

        return self._encode_stream(em)

    def _encode_stream(self, em: _Emission) -> bytes:
        strategy = self.env.instantiate("comp")
        out = BitWriter()
        ref_env = self.env.env_for_option("coder")
        ref_coder = ref_env.cls.Encoder(ref_env, out, NoLiterals())
        sc_env = strategy.env.env_for_option("string_coder")
        lits = (
            Literals(np.asarray(em.chars, np.uint8),
                     np.arange(len(em.chars)))
            if type(strategy).use_literals else NoLiterals()
        )
        string_coder = sc_env.cls.Encoder(sc_env, out, lits)
        for kind, payload in em.events:
            if kind == 0:
                r, rng = payload
                ref_coder.encode(r, rng)
            elif kind == 1:
                out.write_bit(1 if payload else 0)
            else:
                string_coder.encode(payload, literal_r)
        return out.getvalue()

    def _encode_events(self, kind, value, aux) -> bytes:
        """Encode the native parse's event stream. For binary-field
        coders (bit / huffman) the whole stream is one vectorized
        write_tokens call; other coders replay the events scalar
        (bit-identical to the python walk either way)."""
        from tudocomp_tpu.coders.huffman import HuffmanCoder
        from tudocomp_tpu.coders.simple import BitCoder
        from tudocomp_tpu.compressors.lzss import _literal_tokens
        from tudocomp_tpu.utils.bits import bits_for_arr

        strategy = self.env.instantiate("comp")
        out = BitWriter()
        ref_env = self.env.env_for_option("coder")
        ref_coder = ref_env.cls.Encoder(ref_env, out, NoLiterals())
        sc_env = strategy.env.env_for_option("string_coder")
        chars = value[kind == 2].astype(np.uint8)
        lits = (
            Literals(chars, np.arange(chars.size))
            if type(strategy).use_literals else NoLiterals()
        )
        string_coder = sc_env.cls.Encoder(sc_env, out, lits)
        bulk = isinstance(
            ref_coder, (BitCoder.Encoder, HuffmanCoder.Encoder)
        ) and isinstance(
            string_coder, (BitCoder.Encoder, HuffmanCoder.Encoder)
        )
        if bulk:
            values = np.zeros(kind.size, np.uint64)
            lens = np.zeros(kind.size, np.int32)
            is_ref = kind == 0
            is_sep = kind == 1
            is_char = kind == 2
            values[is_ref] = value[is_ref].astype(np.uint64)
            ref_aux = aux[is_ref]
            lens[is_ref] = np.where(
                ref_aux >= 0,
                bits_for_arr(np.maximum(ref_aux, 0)).astype(np.int32),
                len_r.bits,
            )
            values[is_sep] = value[is_sep].astype(np.uint64)
            lens[is_sep] = 1
            cv, cl = _literal_tokens(string_coder, chars)
            values[is_char] = cv
            lens[is_char] = cl
            out.write_tokens(values, lens)
            return out.getvalue()
        for k_, v_, a_ in zip(
            kind.tolist(), value.tolist(), aux.tolist()
        ):
            if k_ == 0:
                ref_coder.encode(v_, Range(a_) if a_ >= 0 else len_r)
            elif k_ == 1:
                out.write_bit(v_)
            else:
                string_coder.encode(v_, literal_r)
        return out.getvalue()

    # -- decompression -------------------------------------------------------

    def decompress(self, data: bytes) -> bytes:
        strategy = self.env.instantiate("comp")
        inp = BitReader(data)
        ref_env = self.env.env_for_option("coder")
        ref_coder = ref_env.cls.Decoder(ref_env, inp)
        sc_env = strategy.env.env_for_option("string_coder")
        string_coder = sc_env.cls.Decoder(sc_env, inp)

        from tudocomp_tpu import native
        from tudocomp_tpu.coders import native_code_kind
        from tudocomp_tpu.coders.huffman import HuffmanCoder

        ref_kind = native_code_kind(ref_coder)
        str_kind = native_code_kind(string_coder)
        is_huff = isinstance(string_coder, HuffmanCoder.Decoder)
        if native.available() and (
            ref_kind is not None
            or isinstance(ref_coder, HuffmanCoder.Decoder)
        ) and (str_kind is not None or is_huff):
            lut = None
            if is_huff and string_coder.table is not None:
                lut_sym, lut_len = string_coder.table.build_lut()
                lut = (lut_sym, lut_len, string_coder.table.longest)
            got = native.lz78u_decode(
                np.packbits(inp._bits), inp.total, inp.pos, lut,
                out_hint=16 * len(data),
                ref_kind=ref_kind or 0, str_kind=str_kind or 0,
            )
            if got is not None:
                inp.pos = inp.total
                return got

        refs: list[int] = []
        strings: list[bytes] = []
        out = bytearray()

        def expand(index: int) -> bytes:
            parts = []
            while index != 0:
                parts.append(strings[index - 1])
                index = refs[index - 1]
            return b"".join(reversed(parts))

        factor_count = 0
        while not inp.eof():
            ref = ref_coder.decode(Range(factor_count))
            if inp.eof():
                break
            not_factorized = inp.read_bit()
            if not_factorized:
                buf = bytearray()
                while True:
                    c = string_coder.decode(literal_r)
                    if c == 0:
                        break
                    buf.append(c)
                label = bytes(buf)
            else:
                rebuilt = bytearray()
                while True:
                    is_sub_char = not inp.read_bit()
                    if is_sub_char:
                        rebuilt.append(string_coder.decode(literal_r))
                    else:
                        sub_ref = ref_coder.decode(Range(factor_count))
                        if sub_ref == 0:
                            cut = ref_coder.decode(len_r)
                            del rebuilt[len(rebuilt) - cut :]
                        else:
                            rebuilt.extend(expand(sub_ref))
                    if rebuilt and rebuilt[-1] == 0:
                        rebuilt.pop()
                        break
                label = bytes(rebuilt)
            refs.append(ref)
            strings.append(label)
            out.extend(expand(ref) + label)
            factor_count += 1
        out.append(0)  # restore the sentinel
        return bytes(out)


for _cls in (StreamingStrategy, BufferingStrategy, LZ78UCompressor):
    REGISTRY.register(_cls)
