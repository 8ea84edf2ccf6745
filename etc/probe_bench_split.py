"""Split the bench.py encode chain into timed sub-chains (real chip).

Measures, at [MB] MiB (default 128, i.e. two 64 MiB dispatch batches):

  rle        all rle_stage dispatches, sync on the last rows output
  rle+tab    + histogram sum + device_table_build, sync on sym_code
  full       + all huff_stage dispatches, sync on the last bits output
             (this is exactly bench.py's encode_all chain)

The deltas separate the two Pallas kernels from the device table build
and any dispatch bubbles the table dependency creates.

Usage: python -u etc/probe_bench_split.py [MB]
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
    from tudocomp_tpu.ops.hufdec_jax import SEG
    from tudocomp_tpu.ops.huffman_jax import device_table_build

    codec = BlockCodec()
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    data = make_corpus(mb << 20)
    ENC_LANES = 32768
    batch_bytes = ENC_LANES * SEG
    n_batches = max(1, (mb << 20) // batch_bytes)
    seg_batches = [
        jnp.asarray(
            data[i * batch_bytes : (i + 1) * batch_bytes].reshape(
                ENC_LANES, SEG
            )
        )
        for i in range(n_batches)
    ]
    lens = jnp.full(ENC_LANES, SEG, jnp.int32)

    def chain(upto: str):
        stage1 = [
            rle_stage(b, lens, offset=0, sample=True) for b in seg_batches
        ]
        if upto == "rle":
            np.asarray(stage1[-1][1][0])
            return
        hist = stage1[0][3]
        for s in stage1[1:]:
            hist = hist + s[3]
        sym_code, sym_len = device_table_build(
            hist.astype(jnp.int32) + 1, max_len=16,
            min_len=codec._min_code_len(),
        )
        if upto == "tab":
            np.asarray(sym_code[0])
            return
        out = [
            huff_stage(rows, counts, sym_code, sym_len)
            for rows, counts, _, _ in stage1
        ]
        np.asarray(out[-1][1][0])

    size_gb = n_batches * batch_bytes / (1 << 30)
    prev = 0.0
    for upto in ("rle", "tab", "full"):
        chain(upto)  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            chain(upto)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(
            f"{upto:5s}: {t * 1e3:8.1f} ms  (+{(t - prev) * 1e3:7.1f} ms)"
            f"  cumulative {size_gb / t:.3f} GB/s"
        )
        prev = t


if __name__ == "__main__":
    main()
