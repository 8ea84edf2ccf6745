"""LZ78 compressor.

Format matches the reference ``compressors/LZ78Compressor.hpp``: each factor
is ``(ref in Range(factor_count), literal)`` — the reference bit width grows
with the number of factors emitted so far. The final partial phrase is
emitted as ``(parent_id, last_char)``. Decoding replays ``(index, literal)``
pairs, unrolling each phrase backward through parent pointers.

``dict_size`` (0 = unlimited) resets the dictionary when reached; the
reference marks its reset path broken (``LZ78Compressor.hpp:108``), ours is
implemented symmetrically in the decoder.
"""

from __future__ import annotations

from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.coders.base import Literals
from tudocomp_tpu.io.bitio import BitReader, BitWriter
from tudocomp_tpu.meta import Meta
from tudocomp_tpu.ranges import Range, literal_r


class LZ78Compressor(Compressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "lz78", "Lempel-Ziv 78")
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
        trie = self.env.instantiate("lz78trie")
        if dict_max == 0 and trie.native_kind is not None:
            # all tries produce the canonical LZ78 parse; the native
            # parser runs the structural class the strategy names
            # (hash / ternary TST / child-list binary)
            from tudocomp_tpu import native
            from tudocomp_tpu.coders.simple import BitCoder
            from tudocomp_tpu.utils.bits import bits_for_arr

            got = native.lz78_parse(data, structure=trie.native_kind)
            if got is not None:
                refs, chars = got
                if isinstance(coder, BitCoder.Encoder):
                    # ref width grows as bits_for(factor index): emit the
                    # whole stream as one bulk token write
                    import numpy as np

                    nfac = refs.size
                    widths = bits_for_arr(
                        np.arange(nfac, dtype=np.uint64)
                    )
                    values = np.empty(2 * nfac, np.uint64)
                    lens = np.empty(2 * nfac, np.int64)
                    values[0::2] = refs
                    lens[0::2] = widths
                    values[1::2] = chars
                    lens[1::2] = 8
                    out.write_tokens(values, lens)
                else:
                    for fc, (r, ch) in enumerate(
                        zip(refs.tolist(), chars.tolist())
                    ):
                        coder.encode(r, Range(fc))
                        coder.encode(ch, literal_r)
                coder.finish()
                return out.getvalue()

        trie.add_rootnode(0)
        factor_count = 0
        node = 0
        parent = 0
        c = 0
        for c in data:
            child, is_new = trie.find_or_insert(node, c)
            if is_new:
                coder.encode(node, Range(factor_count))
                coder.encode(c, literal_r)
                factor_count += 1
                parent = node = 0
                if dict_max and trie.size == dict_max:
                    trie.clear()
                    trie.add_rootnode(0)
                    factor_count = 0
            else:
                parent = node
                node = child
        if node != 0:
            coder.encode(parent, Range(factor_count))
            coder.encode(c, literal_r)
        coder.finish()
        return out.getvalue()

    def decompress(self, data: bytes) -> bytes:
        dict_max = self.env.option("dict_size").as_int()
        reader = BitReader(data)
        decoder = self.coder_decoder(reader)
        if dict_max == 0:
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
                got = native.lz78_stream_decode(
                    np.packbits(reader._bits), reader.total, reader.pos,
                    kind, dict_max,
                )
                if got is not None:
                    return got
        indices: list[int] = []
        literals: list[int] = []
        out = bytearray()
        factor_count = 0
        while not decoder.eof():
            index = decoder.decode(Range(factor_count))
            chr_ = decoder.decode(literal_r)
            indices.append(index)
            literals.append(chr_)
            # unroll phrase backward (reference lz78::Decompressor)
            buf = bytearray()
            literal = chr_
            while index != 0:
                buf.append(literal)
                literal = literals[index - 1]
                index = indices[index - 1]
            out.append(literal)
            out.extend(reversed(buf))
            factor_count += 1
            # mirror the encoder's dictionary reset (size = factors + root)
            if dict_max and factor_count + 1 == dict_max:
                indices.clear()
                literals.clear()
                factor_count = 0
        return bytes(out)

    supports_streaming = True

    def compress_stream(self, fin, fout) -> None:
        _lz78_compress_stream(self, fin, fout, lzw=False)

    def decompress_stream(self, fin, fout) -> None:
        _lz78_decompress_stream(self, fin, fout, lzw=False)

    @staticmethod
    def _decompress_bulk(reader) -> bytes | None:
        """Bulk BitCoder decode: factor widths are a known function of
        the factor index, so the whole stream reads in one vectorized
        pass and expands in the native runtime."""
        import numpy as np

        from tudocomp_tpu import native
        from tudocomp_tpu.utils.bits import bits_for_arr

        avail = reader.total - reader.pos
        if avail == 0:
            return b""
        # find the factor count: sum of (bits_for(f) + 8) == avail
        est = avail // 9 + 2
        per = bits_for_arr(np.arange(est, dtype=np.uint64)).astype(
            np.int64
        ) + 8
        cum = np.cumsum(per)
        hits = np.flatnonzero(cum == avail)
        if hits.size == 0:
            return None  # malformed or not a plain factor stream
        nfac = int(hits[0]) + 1
        widths = np.empty(2 * nfac, np.int64)
        widths[0::2] = per[:nfac] - 8
        widths[1::2] = 8
        save = reader.pos
        vals = reader.read_var_int_array(widths)
        refs = vals[0::2].astype(np.uint32)
        chars = vals[1::2].astype(np.uint8)
        expanded = native.lz78_expand(refs, chars)
        if expanded is None:
            reader.pos = save  # leave the stream untouched for fallbacks
            return None
        return expanded


#: streaming chunk size (state is the O(dict) trie handle; RSS stays
#: O(CHUNK + dict))
STREAM_CHUNK = 1 << 22

#: coder name -> native int-code kind (TdcBitWr put_code)
_CODE_KINDS = {"bit": 0, "gamma": 1, "delta": 2, "ternary": 3, "ascii": 4}


def _lz78_compress_stream(self, fin, fout, *, lzw: bool) -> None:
    """One-pass streaming encode for LZ78/LZW (reference ``as_stream()``
    parity: ``LZ78Compressor.hpp:67`` / ``LZWCompressor.hpp:42`` read the
    input byte stream once). The trie + growing code width carry across
    chunks in a native handle (the mtf-table pattern with O(dict) state);
    per-chunk bit runs splice through ``StreamBitSink`` — output
    byte-identical to the buffered path for every chunking."""
    from tudocomp_tpu import native
    from tudocomp_tpu.io.bitio import StreamBitSink

    kind = _CODE_KINDS.get(
        self.env.env_for_option("coder").cls.meta().name
    )
    if kind is None or not native.available():
        # no pure-VLC field format (huff needs a literal pre-pass) or no
        # native runtime: buffered fallback
        fout.write(self.compress(fin.read()))
        return
    dict_max = self.env.option("dict_size").as_int()
    stream = native.Lz78Stream(lzw, dict_max, kind)
    sink = StreamBitSink(fout)
    try:
        while True:
            chunk = fin.read(STREAM_CHUNK)
            final = not chunk
            packed, nbits = stream.feed(chunk, final)
            sink.append_packed(packed, nbits)
            if final:
                break
    finally:
        stream.close()
    sink.close()


def _lz78_decompress_stream(self, fin, fout, *, lzw: bool) -> None:
    """One-pass streaming decode for LZ78/LZW, mirroring the reference
    decompressors' single pass (``LZ78Compressor.hpp:16-38`` replays
    (ref, literal) pairs; ``lzw/LZWDecoding.hpp:13-49`` decode_step).
    The undecoded bit tail + the O(dict) (parent, char) expansion state
    carry across chunks in a native handle; factor expansion walks
    chains backward so output streams out without output-history
    buffering — byte-identical to the buffered decode at every
    chunking."""
    from tudocomp_tpu import native

    kind = _CODE_KINDS.get(
        self.env.env_for_option("coder").cls.meta().name
    )
    if kind is None or not native.available():
        fout.write(self.decompress(fin.read()))
        return
    dict_max = self.env.option("dict_size").as_int()
    stream = native.Lz78DecStream(lzw, dict_max, kind)
    try:
        while True:
            chunk = fin.read(STREAM_CHUNK)
            final = not chunk
            out = stream.feed(chunk, final)
            if out:
                fout.write(out)
            if final:
                break
    finally:
        stream.close()
