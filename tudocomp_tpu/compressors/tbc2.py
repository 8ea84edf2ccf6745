"""The flagship TBC2 device codec as a registered compressor.

``tbc2`` wraps ``models/blockcodec.BlockCodec`` (per-segment device RLE
+ shared canonical Huffman, self-describing TBC2 container) so the
flagship pipeline is reachable from the algorithm string and the CLI
like every other module — ``tdc -a "tbc2(min_code_len=4)" FILE``.

Options cover everything that changes *bytes or decode behavior*:

- ``offset``        RLE run-length bias (container header field)
- ``min_code_len``  Huffman minimum code length, 3..8 (trades payload
                    size against TPU decode slot count)
- ``dec``           decode kernel: ``auto`` (pallas on TPU, scan
                    elsewhere) | ``pallas`` | ``scan`` | ``host``

Speed-only kernel tuning (bit-identical output) stays on env vars by
design — it must not fragment jit caches or the option grid:
TDC_PACK_MODE (w4 word-element vs byte kernels) / TDC_PACK_PAIR /
TDC_PACK_QUAD / TDC_PACK_WINDOW / TDC_PACK_GROUP / TDC_OFFS_IMPL
(ops/segpack_pallas.py), TDC_DEC_KERNEL (overrides ``dec``),
TDC_MIN_CODE_LEN (overrides ``min_code_len``).

Reference counterpart: none (the reference is single-core C++); this
is the BASELINE.json config-1/2 pipeline (rle:encode(huff)) re-designed
TPU-first.
"""

from __future__ import annotations

from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.meta import Meta


class TBC2Compressor(Compressor):
    @classmethod
    def meta(cls):
        m = Meta(
            "compressor",
            "tbc2",
            "device segment codec: per-segment RLE + shared canonical "
            "Huffman (TBC2 container; models/blockcodec.py)",
        )
        m.option_dynamic("offset", 0)
        m.option_dynamic("min_code_len", 3)
        m.option_dynamic("dec", "auto")
        return m

    def _codec(self):
        from tudocomp_tpu.models.blockcodec import BlockCodec

        dec = self.env.option("dec").as_string()
        return BlockCodec(
            offset=self.env.option("offset").as_int(),
            min_code_len=self.env.option("min_code_len").as_int(),
            dec_kernel=None if dec in ("auto", "host") else dec,
        )

    def compress(self, data: bytes) -> bytes:
        return self._codec().compress(data)

    def decompress(self, data: bytes) -> bytes:
        import jax

        codec = self._codec()
        dec = self.env.option("dec").as_string()
        if dec == "host" or (
            dec == "auto" and jax.default_backend() != "tpu"
        ):
            return codec.decompress(data)
        return codec.decompress_device(data)
