"""Stage-level flagship kernel timings on the real chip.

Usage: python -u etc/probe_encode.py [MB]
Env: TDC_PACK_WINDOW=128|256 selects the placement formulation.

Times rle_stage / huff_stage / pallas decode separately with honest
transfer-backed syncs, so placement/window experiments can be compared
without a full bench.py run.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import numpy as np


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jaxcomp"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import make_corpus
    from tudocomp_tpu.models.blockcodec import (
        BlockCodec, huff_stage, rle_stage,
    )

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(
        f"window={os.environ.get('TDC_PACK_WINDOW', '256')} corpus={mb}MiB",
        flush=True,
    )
    data = make_corpus(mb << 20)
    lanes = (mb << 20) // 2048
    rows = jnp.asarray(data.reshape(lanes, 2048))
    lens = jnp.full(lanes, 2048, jnp.int32)

    codec = BlockCodec()

    def sync(x):
        np.asarray(x.ravel()[:1])

    def t3(fn):
        fn()  # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    s1_t, (r, c, rr, h) = t3(
        lambda: (lambda o: (sync(o[1]), o)[1])(
            rle_stage(rows, lens, offset=0, sample=True)
        )
    )
    print(f"rle_stage:  {s1_t*1e3:8.1f} ms  {mb/1024/s1_t:6.3f} GB/s",
          flush=True)
    table = codec._table_from_hist(np.asarray(h, np.int64), True)
    code, ln = codec._device_table(table)
    s2_t, out2 = t3(
        lambda: (lambda o: (sync(o[1]), o)[1])(
            huff_stage(r, c, code, ln)
        )
    )
    print(f"huff_stage: {s2_t*1e3:8.1f} ms  {mb/1024/s2_t:6.3f} GB/s",
          flush=True)
    tot = s1_t + s2_t
    print(f"kernels:    {tot*1e3:8.1f} ms  {mb/1024/tot:6.3f} GB/s",
          flush=True)

    # decode side: pallas lockstep kernel over this variant's container
    # (TDC_MIN_CODE_LEN changes d = slot count; measure both directions)
    from tudocomp_tpu.ops.hufdec_jax import (
        build_feed, decoder_tables, needed_steps,
    )
    from tudocomp_tpu.ops.hufdec_pallas import (
        decode_segments_pallas, snap_steps_pallas,
    )

    container = codec.compress(data.tobytes())
    (tbl, offset, orig_len, counts, flags, poff,
     pbytes) = codec._parse(container)
    t = decoder_tables(tbl)
    thresh = jnp.asarray(t["thresh"])
    offs = jnp.asarray(t["offs"])
    masks = jnp.asarray(t["masks"])
    dec_d = t.get("d", 11)
    flat = np.frombuffer(container, np.uint8)
    nseg_total = counts.shape[0]
    DEC_LANES = min(32768, -(-nseg_total // 8192) * 8192)
    need = needed_steps(pbytes, counts, dec_d)
    order = np.argsort(need, kind="stable")
    feeds = []
    for lo in range(0, nseg_total, DEC_LANES):
        idx = order[lo : lo + DEC_LANES]
        steps = snap_steps_pallas(int(need[idx].max()))
        feed, bc, hrw, rrw = build_feed(
            flat, idx, counts, flags, poff, pbytes, steps, DEC_LANES
        )
        feeds.append((jnp.asarray(feed), jnp.asarray(bc),
                      jnp.asarray(hrw), jnp.asarray(rrw)))

    def dec_all():
        outs = [
            decode_segments_pallas(
                f, c, h, r, thresh, offs, masks, offset=0, d=dec_d
            )
            for f, c, h, r in feeds
        ]
        np.asarray(outs[-1][0, -1, 0])
        return outs

    d_t, _ = t3(dec_all)
    print(f"pallas_dec: {d_t*1e3:8.1f} ms  {mb/1024/d_t:6.3f} GB/s"
          f"  (d={dec_d}, ratio {len(container)/data.size:.4f})",
          flush=True)

    # quick correctness: container roundtrip on a small slice
    sample = data[: 1 << 22].tobytes()
    comp = codec.compress(sample)
    assert codec.decompress(comp) == sample
    assert codec.decompress_device(comp) == sample
    print("roundtrip ok", flush=True)


if __name__ == "__main__":
    main()
