"""tudocomp-tpu: a TPU-native lossless compression framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the tudocomp
framework (see SURVEY.md / ARCHITECTURE.md). Compressors and coders are
composable, registered, named modules selectable at runtime from an algorithm
string such as ``lzss_lcp(coder=huff, threshold=5)``.
"""

__version__ = "0.1.0"

from tudocomp_tpu.ranges import (  # noqa: F401
    Range,
    BitRange,
    LiteralRange,
    LengthRange,
    MinDistributedRange,
    bit_r,
    literal_r,
    uliteral_r,
    len_r,
    size_r,
)
