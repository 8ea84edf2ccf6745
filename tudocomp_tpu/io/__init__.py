from tudocomp_tpu.io.bitio import (  # noqa: F401
    BitWriter,
    BitReader,
    pack_tokens,
    finalize_stream,
    parse_stream,
    split_tokens,
)
