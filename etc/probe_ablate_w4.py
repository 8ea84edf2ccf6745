"""Stage ablation for the w4 huffman kernel (real chip).

Variants stop after successive stages; per-stage cost = delta:

  s0  read + trivial reduce
  s1  + one-hot table lookup dots
  s2  + quad fuse (_w4_fuse)
  s3  + offsets (_seg_excl_offsets)
  s4  full kernel (placement + combine)

Usage: python -u etc/probe_ablate_w4.py [MB]
"""

from __future__ import annotations

import functools
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
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import make_corpus
    from tudocomp_tpu.ops.segpack_pallas import (
        CAP_BYTES, HUF_WT, LANES, W4_ROWS, _I32, _place_quad,
        _seg_excl_offsets, _srl, _w4_fuse, _w4_planes,
        be_words_from_bytes,
    )

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    g = int(os.environ.get("TDC_PACK_GROUP", "16"))
    data = make_corpus(mb << 20)
    nc = (mb << 20) // CAP_BYTES
    words_np = None
    rows_u8 = jnp.asarray(data.reshape(nc, CAP_BYTES))
    words_be = jax.jit(be_words_from_bytes)(rows_u8)
    counts_np = np.full(nc, CAP_BYTES, np.int32)
    code = jnp.arange(256, dtype=jnp.uint32)
    ln = jnp.full(256, 8, jnp.uint32)

    def kernel(lengths_ref, data_ref, table_ref, words_ref, bits_ref,
               acc_ref, *, stage: int):
        c = pl.program_id(0)
        w = data_ref[...]
        table = table_ref[:, :]
        rows = g * W4_ROWS
        lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
        row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
        seg_idx = row // W4_ROWS
        in_seg_row = row % W4_ROWS
        planes = _w4_planes(w, big_endian=True)
        if stage == 0:
            words_ref[:, :] = jnp.zeros((g, HUF_WT), _I32)
            s = sum(jnp.sum(pk[:1, :1]) for pk in planes)
            bits_ref[:, :] = jnp.broadcast_to(
                s[None, None], (g, LANES)
            ).astype(_I32)
            return
        cnt = jnp.zeros((rows, LANES), _I32)
        for gi in range(g):
            cnt = jnp.where(seg_idx == gi, lengths_ref[c * g + gi], cnt)
        bins = lax.broadcasted_iota(_I32, (256, LANES), 0)
        B = W4_ROWS
        got_rows = [{"hi": [], "lo": [], "ln": []} for _ in range(4)]
        for r0 in range(0, rows, B):
            oh = jnp.concatenate(
                [
                    (bins == planes[k][r0 + i][None, :]).astype(
                        jnp.bfloat16
                    )
                    for i in range(B)
                    for k in range(4)
                ],
                axis=1,
            )
            got = lax.dot_general(
                table, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            j = 0
            for i in range(B):
                for k in range(4):
                    sl = got[:, j * LANES : (j + 1) * LANES]
                    got_rows[k]["hi"].append(sl[0:1])
                    got_rows[k]["lo"].append(sl[1:2])
                    got_rows[k]["ln"].append(sl[2:3])
                    j += 1
        vals, lens_ = [], []
        for k in range(4):
            hi = jnp.concatenate(got_rows[k]["hi"], axis=0).astype(_I32)
            lo = jnp.concatenate(got_rows[k]["lo"], axis=0).astype(_I32)
            lnk = jnp.concatenate(got_rows[k]["ln"], axis=0).astype(_I32)
            pos = in_seg_row * 512 + lane * 4 + k
            vals.append((hi << 8) | lo)
            lens_.append(jnp.where(pos < cnt, lnk, 0))
        if stage == 1:
            words_ref[:, :] = jnp.zeros((g, HUF_WT), _I32)
            s = sum(jnp.sum(v[:1, :1] + l[:1, :1])
                    for v, l in zip(vals, lens_))
            bits_ref[:, :] = jnp.broadcast_to(
                s[None, None], (g, LANES)
            )
            return
        va, la_, vb, lb, qlen = _w4_fuse(vals, lens_)
        if stage == 2:
            words_ref[:, :] = jnp.zeros((g, HUF_WT), _I32)
            s = jnp.sum(va[:1, :1] + vb[:1, :1] + la_[:1, :1] + lb[:1, :1])
            bits_ref[:, :] = jnp.broadcast_to(s[None, None], (g, LANES))
            return
        offs, row_base = _seg_excl_offsets(qlen, W4_ROWS)
        if stage == 3:
            words_ref[:, :] = jnp.zeros((g, HUF_WT), _I32)
            s = jnp.sum(offs[:1, :1] + row_base[:1, :1])
            bits_ref[:, :] = jnp.broadcast_to(s[None, None], (g, LANES))
            return
        _place_quad(
            va, la_, vb, lb, offs, row_base, acc_ref, words_ref,
            bits_ref, rows_per_seg=W4_ROWS, wt=HUF_WT, g=g, stride=1,
        )

    code_u = code.astype(jnp.uint32)
    table = jnp.stack(
        [
            ((code_u >> 8) & 0xFF).astype(jnp.float32),
            (code_u & 0xFF).astype(jnp.float32),
            ln.astype(jnp.float32),
        ]
        + [jnp.zeros(256, jnp.float32)] * 5,
        axis=0,
    ).astype(jnp.bfloat16)
    data_w = lax.bitcast_convert_type(words_be, jnp.int32).reshape(
        nc * W4_ROWS, LANES
    )
    counts = jnp.asarray(counts_np)

    prev = 0.0
    for stage in range(5):
        k = functools.partial(kernel, stage=stage)
        fn = jax.jit(
            lambda cts, dw: pl.pallas_call(
                k,
                grid=(nc // g,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(
                        (g * W4_ROWS, LANES), lambda c: (c, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((g, HUF_WT), lambda c: (c, 0)),
                    pl.BlockSpec((g, LANES), lambda c: (c, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((nc, HUF_WT), jnp.int32),
                    jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((g * 12, HUF_WT), jnp.float32)
                ],
                interpret=False,
            )(cts, dw, table)
        )

        def run():
            wds, bts = fn(counts, data_w)
            np.asarray(bts[0, 0])

        run()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(
            f"s{stage}: {t * 1e3:7.1f} ms   (+{(t - prev) * 1e3:7.1f} ms)"
        )
        prev = t


if __name__ == "__main__":
    main()
