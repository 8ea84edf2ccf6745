"""Flagship benchmark: device RLE+Huffman block encode on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures sustained single-chip encode throughput (input GB/s) of the
flagship block codec (models/blockcodec.py: device RLE -> histogram ->
canonical-Huffman gather-encode -> bitpack) streaming fixed-shape
8 x 1 MiB block batches (one compilation) over an enwik-like corpus,
after verifying a full container roundtrip on a sample.

Baseline: the reference is single-core C++; its own docs' comparison
table pegs the gzip -1 class at 33 ms/MB ~ 0.030 GB/s on `pc_dna.1MB`
(docs/Documentation.md:1762-1775); tudocomp's bwt/lcpcomp pipelines are
slower. vs_baseline normalizes against 0.030 GB/s.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_GBPS = 0.030
BLOCK = 1 << 20
BATCH = 8


def make_corpus(total_bytes: int) -> np.ndarray:
    """enwik-like mix: natural text + markup + runs + small-alphabet noise."""
    rng = np.random.default_rng(42)
    text = np.frombuffer(
        b"[[Category:Compression]] the quick brown fox jumps over the "
        b"lazy dog; <page><title>Anarchism</title> and so it goes on. ",
        np.uint8,
    )
    reps = total_bytes // (text.size * 2) + 1
    stream = np.tile(text, reps)[: total_bytes // 2]
    runs = np.repeat(
        rng.integers(32, 127, total_bytes // 64, dtype=np.uint8), 32
    )[: total_bytes // 4]
    noise = rng.integers(0, 64, total_bytes // 4, dtype=np.uint8)
    out = np.concatenate([stream, runs, noise])[:total_bytes]
    return out


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ["JAX_COMPILATION_CACHE_DIR"],
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tudocomp_tpu.models.blockcodec import (
        BlockCodec, pack_step, rle_histogram_step,
    )

    codec = BlockCodec(block_size=BLOCK, sub_chunks=8)

    # correctness gate: full container roundtrip on a sample
    sample = make_corpus(1 << 18).tobytes()
    small = BlockCodec(block_size=1 << 16, sub_chunks=8)
    assert small.decompress(small.compress(sample)) == sample

    n_mb = int(os.environ.get("TDC_BENCH_MB", "32"))
    data = make_corpus(n_mb << 20)
    n_batches = max(1, n_mb // BATCH)
    batches = [
        jnp.asarray(
            data[i * BATCH * BLOCK : (i + 1) * BATCH * BLOCK].reshape(
                BATCH, BLOCK
            )
        )
        for i in range(n_batches)
    ]
    lengths = jnp.full(BATCH, BLOCK, jnp.int32)

    def encode_all():
        # pass 1: RLE + histogram for every batch, ONE host sync for the
        # shared table (the per-batch results stay on device)
        stage1 = [
            rle_histogram_step(
                b, lengths, offset=codec.offset, cap=codec.cap
            )
            for b in batches
        ]
        hist = stage1[0][2]
        for _, _, h in stage1[1:]:
            hist = hist + h
        table = codec._table_from_hist(np.asarray(hist, np.int64))
        sym_code, sym_len = codec._device_table(table)
        # pass 2: per-sub-chunk Huffman + pack
        out = [
            pack_step(
                rb, rl, sym_code, sym_len, sub_chunks=codec.sub_chunks
            )
            for rb, rl, _ in stage1
        ]
        # one honest sync: pull one scalar that depends on the last output
        np.asarray(out[-1][1][0, 0])
        return table, stage1, out

    encode_all()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        table, stage1, out = encode_all()
        times.append(time.perf_counter() - t0)
    t_enc = min(times)

    # container assembly from the batched outputs (no extra compile)
    container = codec._assemble(
        data.tobytes(),
        np.concatenate([np.asarray(rl) for _, rl, _ in stage1]),
        np.concatenate([np.asarray(w) for w, _ in out]),
        np.concatenate([np.asarray(b) for _, b in out]),
        table,
    )
    dtimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = codec.decompress(container)
        dtimes.append(time.perf_counter() - t0)
    assert out == data.tobytes()
    t_dec = min(dtimes)

    size_gb = n_batches * BATCH / 1024
    gbps = size_gb / (t_enc + t_dec)
    print(
        json.dumps(
            {
                "metric": "blockcodec_encode_decode_gbps_per_chip",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 2),
                "encode_gbps": round(size_gb / t_enc, 4),
                "decode_gbps": round(size_gb / t_dec, 4),
                "ratio": round(len(container) / len(data), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
