"""Flagship end-to-end device pipelines used by bench.py and
``__graft_entry__.py``."""

from tudocomp_tpu.models.blockcodec import BlockCodec  # noqa: F401
