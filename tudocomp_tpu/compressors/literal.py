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
        chunks = []
        while not coder.eof():
            chunks.append(coder.decode(literal_r))
        return bytes(chunks)
