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
        out = BitWriter()
        coder = self.coder_encoder(out, Literals.none())
        if dict_max == 0 and data:
            fast = self._compress_bulk(data, out, coder)
            if fast is not None:
                return fast
        trie = self.env.instantiate("lz78trie")

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
        reader = BitReader(data)
        decoder = self.coder_decoder(reader)
        if self.env.option("dict_size").as_int() == 0:
            from tudocomp_tpu.coders.simple import BitCoder

            if isinstance(decoder, BitCoder.Decoder):
                fast = self._decompress_bulk(reader)
                if fast is not None:
                    return fast
        from tudocomp_tpu.coders import native_code_kind

        kind = native_code_kind(decoder)
        if kind is not None:
            import numpy as np

            from tudocomp_tpu import native

            if native.available():
                got = native.lzw_stream_decode(
                    np.packbits(reader._bits), reader.total, reader.pos,
                    kind, dict_max,
                )
                if got is not None:
                    return got
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


    supports_streaming = True

    def compress_stream(self, fin, fout) -> None:
        from tudocomp_tpu.compressors.lz78 import _lz78_compress_stream

        _lz78_compress_stream(self, fin, fout, lzw=True)

    def decompress_stream(self, fin, fout) -> None:
        from tudocomp_tpu.compressors.lz78 import (
            _lz78_decompress_stream,
        )

        _lz78_decompress_stream(self, fin, fout, lzw=True)

    # -- bulk fast paths (canonical parse; bit coder widths are a known
    #    function of the factor index) --------------------------------------

    def _compress_bulk(self, data, out, coder):
        import numpy as np

        from tudocomp_tpu import native
        from tudocomp_tpu.coders.simple import BitCoder
        from tudocomp_tpu.ranges import Range
        from tudocomp_tpu.utils.bits import bits_for_arr

        trie = self.env.instantiate("lz78trie")
        if trie.native_kind is None:
            return None
        got = native.lz78_parse(
            data, lzw=True, structure=trie.native_kind
        )
        if got is None:
            return None
        refs, _ = got
        if isinstance(coder, BitCoder.Encoder):
            n = refs.size
            widths = bits_for_arr(
                np.arange(n, dtype=np.uint64) + 256
            )
            out.write_tokens(refs.astype(np.uint64), widths)
        else:
            for fc, r in enumerate(refs.tolist()):
                coder.encode(r, Range(fc + 256))
        coder.finish()
        return out.getvalue()

    @staticmethod
    def _decompress_bulk(reader):
        import numpy as np

        from tudocomp_tpu import native
        from tudocomp_tpu.utils.bits import bits_for_arr

        avail = reader.total - reader.pos
        if avail == 0:
            return b""
        est = avail // 9 + 2
        per = bits_for_arr(
            np.arange(est, dtype=np.uint64) + 256
        ).astype(np.int64)
        cum = np.cumsum(per)
        hits = np.flatnonzero(cum == avail)
        if hits.size == 0:
            return None
        nfac = int(hits[0]) + 1
        save = reader.pos
        codes = reader.read_var_int_array(per[:nfac]).astype(np.uint32)
        got = native.lzw_expand(codes)
        if got is None:
            reader.pos = save  # leave the stream untouched for fallbacks
        return got
