"""Literal pass-through into any coder.

Reference: ``compressors/LiteralEncoder.hpp:11-42`` (CLI name ``encode``):
compress = encode every input byte in the literal range; decompress = decode
literals until the bit stream is exhausted.
"""

from __future__ import annotations

import numpy as np

from tudocomp_tpu.coders.base import Literals
from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.io.bitio import BitReader, BitWriter
from tudocomp_tpu.meta import Meta
from tudocomp_tpu.ranges import literal_r


class LiteralEncoder(Compressor):
    @classmethod
    def meta(cls):
        m = Meta(
            "compressor",
            "encode",
            "Simply encodes the input's individual characters",
        )
        m.option_submeta("coder", "coder", default="bit")
        return m

    def compress(self, data: bytes) -> bytes:
        view = np.frombuffer(data, dtype=np.uint8)
        out = BitWriter()
        coder = self.coder_encoder(out, Literals(view))
        coder.encode_array(view, literal_r)
        coder.finish()
        return out.getvalue()

    def decompress(self, data: bytes) -> bytes:
        inp = BitReader(data)
        coder = self.coder_decoder(inp)
        if hasattr(coder, "decode_remaining_literals"):
            return coder.decode_remaining_literals()
        if hasattr(coder, "table") and coder.table is not None:
            # huffman: whole-tail bulk decode via the native LUT walk
            payload = np.packbits(inp._bits[inp.pos :])
            remaining_bits = inp.total - inp.pos
            count = self._count_huffman_symbols(coder, payload,
                                                remaining_bits)
            if count is not None:
                return coder.table.fast_decode(payload, count).tobytes()
        chunks = []
        while not coder.eof():
            chunks.append(coder.decode(literal_r))
        return bytes(chunks)

    @staticmethod
    def _count_huffman_symbols(coder, payload, remaining_bits):
        """Symbol count via the native LUT walk (the bulk decoder needs
        the count up front)."""
        from tudocomp_tpu import native

        try:
            _, lut_len = coder.table.build_lut()
        except ValueError:
            return None
        if not native.available():
            return None
        return native.huffman_count(
            payload, remaining_bits, lut_len, coder.table.longest
        )
