from tudocomp_tpu.ops.bitpack import (  # noqa: F401
    bits_for_u32,
    pack_tokens_device,
    unpack_fixed,
    words_to_stream,
    stream_to_words,
)
