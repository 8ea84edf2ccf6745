"""Encode-chain scheduling experiment (VERDICT r3 item 4).

The TPU executes one program's ops serially, so the ~17 ms device
canonical-table build (probe_bench_split) sits on the critical path of
the single-dispatch encode chain no matter where XLA schedules it. A
table built on the HOST can truly overlap: queue all RLE batches
async, pull batch 0's histogram (device keeps draining batches 1..N
during the tunnel round trip), build the table on host (~13 ms) inside
that window, then queue the Huffman batches.

Variants, 3 reps each, honest end sync:

  chain    bench.py's current single-jit chain (device table build)
  overlap  per-batch async dispatches + host table from batch 0's hist

Usage: python -u etc/probe_overlap.py [MB]
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
    from tudocomp_tpu.ops.huffman_jax import device_table_build

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    codec = BlockCodec()
    data = make_corpus(mb << 20)
    SEG = 2048
    ENC_LANES = 32768
    batch_bytes = ENC_LANES * SEG
    n_batches = max(1, (mb << 20) // batch_bytes)
    bs = [
        jnp.asarray(
            data[i * batch_bytes : (i + 1) * batch_bytes].reshape(
                ENC_LANES, SEG
            )
        )
        for i in range(n_batches)
    ]
    lens = jnp.full(ENC_LANES, SEG, jnp.int32)

    @jax.jit
    def chain(*bs):
        stage1 = [rle_stage(b, lens, offset=0, sample=True) for b in bs]
        hist = stage1[0][3]
        for s in stage1[1:]:
            hist = hist + s[3]
        sym_code, sym_len = device_table_build(
            hist.astype(jnp.int32) + 1, max_len=16, min_len=3
        )
        return [
            huff_stage(rows, counts, sym_code, sym_len)
            for rows, counts, _, _ in stage1
        ]

    def run_chain():
        out = chain(*bs)
        np.asarray(out[-1][1][0])
        return out

    def run_overlap():
        stage1 = [
            rle_stage(b, lens, offset=0, sample=True) for b in bs
        ]
        hist = np.asarray(stage1[0][3], np.int64)  # batch 0 only
        table = codec._table_from_hist(hist, True)
        sym_code, sym_len = codec._device_table(table)
        out = [
            huff_stage(rows, counts, sym_code, sym_len)
            for rows, counts, _, _ in stage1
        ]
        np.asarray(out[-1][1][0])
        return out

    for name, fn in (("chain", run_chain), ("overlap", run_overlap)):
        fn()  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        gb = n_batches * batch_bytes / (1 << 30)
        print(
            f"{name:8s} {best*1e3:8.1f} ms  {gb/best:6.3f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
