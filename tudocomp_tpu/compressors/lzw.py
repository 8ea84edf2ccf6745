"""LZW compressor.

Format matches the reference ``compressors/LZWCompressor.hpp``: the
dictionary is pre-seeded with all 256 byte roots; each factor emits only
``ref in Range(factor_count + 256)`` (adaptive width). Decoding is the
classic (prefix-code, last-char) dictionary replay including the
self-referential ``k == dict_size`` case (``lzw/LZWDecoding.hpp:13-99``).
``dict_size`` (0 = unlimited) resets the dictionary when reached, checked
*before* reading each code, mirroring the reference decode loop.
"""

from __future__ import annotations

from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.coders.base import Literals
from tudocomp_tpu.io.bitio import BitReader, BitWriter
from tudocomp_tpu.meta import Meta
from tudocomp_tpu.ranges import Range


class LZWCompressor(Compressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "lzw", "Lempel-Ziv-Welch")
        from tudocomp_tpu.coders import UNIVERSAL_CODER_NAMES
        m.option_submeta(
            "coder", "coder", default="bit",
            accepts=UNIVERSAL_CODER_NAMES,
        )
        m.option_submeta("lz78trie", "lz78trie", default="ternary")
        m.option_dynamic("dict_size", 0)
        return m

    def compress(self, data: bytes) -> bytes:
        dict_max = self.env.option("dict_size").as_int()
        trie = self.env.instantiate("lz78trie")
        out = BitWriter()
        coder = self.coder_encoder(out, Literals.none())

        def reset():
            trie.clear()
            for i in range(256):
                trie.add_rootnode(i)

        reset()
        factor_count = 0
        it = iter(data)
        first = next(it, None)
        if first is None:
            coder.finish()
            return out.getvalue()
        node = first
        for c in it:
            child, is_new = trie.find_or_insert(node, c)
            if is_new:
                coder.encode(node, Range(factor_count + 256))
                factor_count += 1
                node = c
                if trie.size == dict_max:
                    reset()
                    factor_count = 0
            else:
                node = child
        coder.encode(node, Range(factor_count + 256))
        coder.finish()
        return out.getvalue()

    def decompress(self, data: bytes) -> bytes:
        dict_max = self.env.option("dict_size").as_int() or (1 << 32)
        decoder = self.coder_decoder(BitReader(data))
        out = bytearray()

        NONE = -1
        prefix: list[int] = []
        last: list[int] = []

        def reset():
            prefix.clear()
            last.clear()
            prefix.extend([NONE] * 256)
            last.extend(range(256))

        def rebuild(k: int) -> bytes:
            s = bytearray()
            while k != NONE:
                s.append(last[k])
                k = prefix[k]
            s.reverse()
            return bytes(s)

        reset()
        counter = 0
        i = NONE
        # the encoder resets after emitting (dict_size - 256) codes; mirror
        # that exactly (the reference's own decode-side reset lags by one
        # because dictionary entries are learned one code late)
        reset_after = dict_max - 256
        while True:
            if reset_after > 0 and counter == reset_after:
                reset()
                counter = 0
                i = NONE
            if decoder.eof():
                break
            k = decoder.decode(Range(counter + 256))
            counter += 1
            if k > len(prefix):
                raise ValueError(f"invalid compressed code {k}")
            if k == len(prefix):
                prefix.append(i)
                last.append(rebuild(i)[0])
                s = rebuild(k)
            else:
                s = rebuild(k)
                if i != NONE:
                    prefix.append(i)
                    last.append(s[0])
            out.extend(s)
            i = k
        return bytes(out)
