"""BWT compressor.

Reference: ``compressors/BWTCompressor.hpp`` — compress = raw BWT bytes of
the 0-sentineled input (forward transform is a pure SA gather); decompress
= LF-mapping walk, emitting the text plus the sentinel (the restriction
layer strips it).
"""

from __future__ import annotations

import numpy as np

from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.ds.bwt import bwt_decode, bwt_forward
from tudocomp_tpu.ds.suffix import suffix_array
from tudocomp_tpu.meta import Meta


class BWTCompressor(Compressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "bwt", "BWT Compressor")
        m.needs_sentinel_terminator()
        return m

    def compress(self, data: bytes) -> bytes:
        if not data.endswith(b"\x00"):
            raise ValueError("bwt requires a sentineled input")
        t = np.frombuffer(data, np.uint8)
        sa = suffix_array(t)
        return bwt_forward(t, sa).tobytes()

    def decompress(self, data: bytes) -> bytes:
        return bwt_decode(data) + b"\x00"
