"""Kernel-only vs full-stage timings: how much the XLA glue between
the Pallas kernels costs (bytes_from_words, escape selects, the u8 ->
i32 input expand, histogram, raw_words repack).

Usage: python -u etc/probe_glue.py [MB]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import make_corpus
    from tudocomp_tpu.models.blockcodec import (
        BlockCodec, huff_stage, rle_stage,
    )
    from tudocomp_tpu.ops.hufdec_jax import SEG, SEG_CAP
    from tudocomp_tpu.ops.rle_jax import bytes_from_words
    from tudocomp_tpu.ops.segpack_pallas import (
        _w4_mode, huffman_pack_segments, huffman_pack_segments_w4,
        rle_pack_segments, rle_pack_segments_w4,
    )

    codec = BlockCodec()
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    data = make_corpus(mb << 20)
    nc = (mb << 20) // SEG
    rows_in = jnp.asarray(data.reshape(nc, SEG))
    lens = jnp.full(nc, SEG, jnp.int32)

    # full stage-1 outputs (for stage-2 inputs); sel is STREAM WORDS
    sel, counts, rle_raw, hist = jax.block_until_ready(
        rle_stage(rows_in, lens, offset=0, sample=True)
    )
    table = codec._table_from_hist(np.asarray(hist, np.int64), True)
    sym_code, sym_len = codec._device_table(table)

    def timed(label, fn):
        fn()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        gb = (mb / 1024) / t
        print(f"{label:18s}: {t * 1e3:8.1f} ms   {gb:.3f} GB/s")

    if _w4_mode():
        rle_kernel = lambda: np.asarray(  # noqa: E731
            rle_pack_segments_w4(rows_in, lens, offset=0)[1][0]
        )
        huff_kernel = lambda: np.asarray(  # noqa: E731
            huffman_pack_segments_w4(sel, counts, sym_code, sym_len)[1][0]
        )
    else:
        rows = jax.jit(
            lambda w: bytes_from_words(w, SEG_CAP)
        )(sel)
        rle_kernel = lambda: np.asarray(  # noqa: E731
            rle_pack_segments(rows_in, lens, offset=0)[1][0]
        )
        huff_kernel = lambda: np.asarray(  # noqa: E731
            huffman_pack_segments(rows, counts, sym_code, sym_len)[1][0]
        )
    timed("rle_kernel", rle_kernel)
    timed("rle_stage", lambda: np.asarray(
        rle_stage(rows_in, lens, offset=0, sample=True)[1][0]
    ))
    timed("huff_kernel", huff_kernel)
    timed("huff_stage", lambda: np.asarray(
        huff_stage(sel, counts, sym_code, sym_len)[1][0]
    ))


if __name__ == "__main__":
    main()
