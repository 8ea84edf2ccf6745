"""Compressors: transform input bytes to a compressed stream and back.

Importing this package registers every compressor and coder with the global
registry (the Python equivalent of the reference's generated registration
TUs from ``etc/registry_config.py``).
"""

from tudocomp_tpu.registry import REGISTRY
from tudocomp_tpu import coders as _coders

from tudocomp_tpu.compressors.base import Compressor  # noqa: F401
from tudocomp_tpu.compressors.noop import NoopCompressor  # noqa: F401
from tudocomp_tpu.compressors.literal import LiteralEncoder  # noqa: F401
from tudocomp_tpu.compressors.rle import RunLengthEncoder  # noqa: F401
from tudocomp_tpu.compressors.mtf import MTFCompressor  # noqa: F401
from tudocomp_tpu.compressors.bwt import BWTCompressor  # noqa: F401
from tudocomp_tpu.compressors.chain import ChainCompressor  # noqa: F401
from tudocomp_tpu.compressors.lzss import (  # noqa: F401
    LZSSSlidingWindowCompressor,
    LZSSLCPCompressor,
)
from tudocomp_tpu.compressors.lz78 import LZ78Compressor  # noqa: F401
from tudocomp_tpu.compressors.lzw import LZWCompressor  # noqa: F401
from tudocomp_tpu.compressors.lz78_trie import ALL_TRIES  # noqa: F401
from tudocomp_tpu.compressors.lcpcomp import LCPCompressor  # noqa: F401
from tudocomp_tpu.compressors.repair import RePairCompressor  # noqa: F401
from tudocomp_tpu.compressors.esp import EspCompressor  # noqa: F401
from tudocomp_tpu.compressors.lz78u import LZ78UCompressor  # noqa: F401
from tudocomp_tpu.compressors.lfs import LFSCompressor  # noqa: F401
from tudocomp_tpu.compressors.blocks import BlocksCompressor  # noqa: F401

for _coder in _coders.ALL_CODERS:
    REGISTRY.register(_coder)

for _trie in ALL_TRIES:
    REGISTRY.register(_trie)

for _comp in (
    NoopCompressor,
    LiteralEncoder,
    RunLengthEncoder,
    MTFCompressor,
    BWTCompressor,
    ChainCompressor,
    LZSSSlidingWindowCompressor,
    LZSSLCPCompressor,
    LZ78Compressor,
    LZWCompressor,
    RePairCompressor,
    BlocksCompressor,
):
    REGISTRY.register(_comp)

from tudocomp_tpu.compressors.tbc2 import TBC2Compressor

REGISTRY.register(TBC2Compressor)

from tudocomp_tpu.generators import register_generators

register_generators(REGISTRY)
