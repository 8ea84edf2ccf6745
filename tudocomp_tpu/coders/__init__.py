"""Coders: bit-level integer encode/decode dispatched on Range types.

Each coder class has nested ``Encoder``/``Decoder`` classes (reference:
``Coder.hpp`` + ``coders/``). Consuming coders (arithmetic, sle) buffer
literals before emitting and cannot be interleaved with other coders on one
stream — the taxonomy below mirrors ``etc/registry_config.py:12-37``.
"""

from tudocomp_tpu.coders.base import Encoder, Decoder  # noqa: F401
from tudocomp_tpu.coders.simple import (  # noqa: F401
    ASCIICoder,
    BitCoder,
    EliasGammaCoder,
    EliasDeltaCoder,
    TernaryCoder,
)
from tudocomp_tpu.coders.huffman import HuffmanCoder  # noqa: F401
from tudocomp_tpu.coders.arithmetic import ArithmeticCoder  # noqa: F401
from tudocomp_tpu.coders.sle import SLECoder  # noqa: F401

#: coders usable for any value stream, interleaved freely
UNIVERSAL_CODERS = [ASCIICoder, BitCoder, EliasGammaCoder, EliasDeltaCoder,
                    TernaryCoder]
#: entropy coders that pre-scan literals but emit inline
ENTROPY_CODERS = [HuffmanCoder]
#: entropy coders that consume/buffer literals (cannot be interleaved)
CONSUMING_ENTROPY_CODERS = [ArithmeticCoder, SLECoder]

ALL_CODERS = UNIVERSAL_CODERS + ENTROPY_CODERS + CONSUMING_ENTROPY_CODERS
NON_CONSUMING_CODERS = UNIVERSAL_CODERS + ENTROPY_CODERS

#: CLI-enumeration name sets (reference ``etc/registry_config.py:12-37``)
UNIVERSAL_CODER_NAMES = ("ascii", "bit", "gamma", "delta", "ternary")
NON_CONSUMING_CODER_NAMES = UNIVERSAL_CODER_NAMES + ("huff",)
ALL_CODER_NAMES = NON_CONSUMING_CODER_NAMES + ("arithmetic", "sle")
LCPCOMP_CODER_NAMES = ("ascii", "huff", "sle")


def native_code_kind(decoder):
    """Map a decoder instance to the native runtime's int-code kind
    (``BitRd.read_code``): 0 bit, 1 gamma, 2 delta, 3 ternary,
    4 ascii; None for coders without a pure-VLC field format."""
    from tudocomp_tpu.coders.simple import (
        ASCIICoder, BitCoder, EliasDeltaCoder, EliasGammaCoder,
        TernaryCoder,
    )

    for cls, kind in (
        (BitCoder, 0), (EliasGammaCoder, 1), (EliasDeltaCoder, 2),
        (TernaryCoder, 3), (ASCIICoder, 4),
    ):
        if isinstance(decoder, cls.Decoder):
            return kind
    return None
