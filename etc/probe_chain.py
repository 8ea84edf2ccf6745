"""Bisect the bench encode chain on the real chip: times successively
longer prefixes of encode_all (each with one dependent sync) so the gap
between bench throughput and per-kernel cost is attributable.

Usage: python -u etc/probe_chain.py [MB]
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
    from tudocomp_tpu.models.blockcodec import BlockCodec, huff_stage, rle_stage
    from tudocomp_tpu.ops.hufdec_jax import SEG
    from tudocomp_tpu.ops.huffman_jax import device_table_build

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    codec = BlockCodec()
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

    def sync(x):
        np.asarray(np.asarray(x).ravel()[:1])

    def t3(fn):
        fn()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def stage1():
        return [
            rle_stage(b, lens, offset=0, sample=True) for b in seg_batches
        ]

    t = t3(lambda: sync(stage1()[-1][1]))
    print(f"rle x{n_batches}:        {t*1e3:8.1f} ms", flush=True)

    def to_table():
        s1 = stage1()
        hist = s1[0][3]
        for s in s1[1:]:
            hist = hist + s[3]
        code, ln = device_table_build(
            hist.astype(jnp.int32) + 1, max_len=16, min_len=3
        )
        return s1, code, ln

    t = t3(lambda: sync(to_table()[2]))
    print(f"rle+hist+table:   {t*1e3:8.1f} ms", flush=True)

    def full():
        s1, code, ln = to_table()
        out = [
            huff_stage(rows, counts, code, ln)
            for rows, counts, _, _ in s1
        ]
        sync(out[-1][1])

    t = t3(full)
    print(f"full encode:      {t*1e3:8.1f} ms  "
          f"{mb/1024/t:6.3f} GB/s", flush=True)

    # table build alone (device, warm hist on device)
    s1 = stage1()
    hist = s1[0][3]
    for s in s1[1:]:
        hist = hist + s[3]
    hist = (hist.astype(jnp.int32) + 1).block_until_ready()
    t = t3(
        lambda: sync(
            device_table_build(hist, max_len=16, min_len=3)[0]
        )
    )
    print(f"table alone:      {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
