from tudocomp_tpu.utils.bits import bits_for, bytes_for, idiv_ceil  # noqa: F401
