"""Identity compressor (reference ``compressors/NoopCompressor.hpp``)."""

from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.meta import Meta


class NoopCompressor(Compressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "noop")
        m.option_dynamic("mode", "stream")
        m.option_dynamic("debug", False)
        return m

    def compress(self, data: bytes) -> bytes:
        return bytes(data)

    def decompress(self, data: bytes) -> bytes:
        return bytes(data)
