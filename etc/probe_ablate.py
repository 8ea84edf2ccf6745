"""Ablation probe for the segment Huffman pack kernel (real chip).

Builds stripped-down variants of segpack_pallas._huffman_kernel that
stop after successive stages, so the per-stage cost on hardware is the
difference between adjacent variants:

  s0  read + trivial reduce           (dispatch + HBM floor)
  s1  + one-hot table lookup          (the (8,256)x(256,B*128) dots)
  s2  + segmented exclusive offsets   (tri matmul + log-shift scan)
  s3  + placement loop, dots only     (one-hot compares + matmuls,
                                       accumulated into ONE vmem tile
                                       at offset 0 - no dynamic slices)
  s4  + dynamic-slice accumulation    (the real acc_ref[...,pl.ds] +=)
  s5  full kernel                     (word combine + bits)

Usage: python -u etc/probe_ablate.py [MB]
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
        CAP_BYTES, HUF_ROWS, HUF_WT, LANES, _byte_planes_bf16, _I32,
        _mask32, _seg_excl_offsets, _srl,
    )

    G = 8
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    data = make_corpus(mb << 20)
    nc = (mb << 20) // CAP_BYTES
    rows_np = data.reshape(nc, CAP_BYTES)
    counts_np = np.full(nc, CAP_BYTES, np.int32)
    # a plausible table: 8-bit identity codes
    code = jnp.arange(256, dtype=jnp.uint32)
    ln = jnp.full(256, 8, jnp.uint32)

    def kernel(lengths_ref, data_ref, table_ref, words_ref, bits_ref,
               acc_ref, *, stage: int):
        c = pl.program_id(0)
        data = data_ref[...]
        rows = G * HUF_ROWS
        if stage == 0:
            words_ref[:, :] = jnp.zeros((G, HUF_WT), jnp.int32)
            bits_ref[:, :] = jnp.broadcast_to(
                jnp.sum(data, axis=1, keepdims=True)[:G], (G, LANES)
            )
            return
        table = table_ref[:, :]
        lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
        row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
        pos_in_seg = (row % HUF_ROWS) * LANES + lane
        seg_idx = row // HUF_ROWS
        B = HUF_ROWS
        bins = lax.broadcasted_iota(_I32, (256, LANES), 0)
        his, los, lns = [], [], []
        for r0 in range(0, rows, B):
            oh = jnp.concatenate(
                [
                    (bins == data[r0 + i][None, :]).astype(jnp.bfloat16)
                    for i in range(B)
                ],
                axis=1,
            )
            got = lax.dot_general(
                table, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for i in range(B):
                his.append(got[0:1, i * LANES : (i + 1) * LANES])
                los.append(got[1:2, i * LANES : (i + 1) * LANES])
                lns.append(got[2:3, i * LANES : (i + 1) * LANES])
        hi = jnp.concatenate(his, axis=0).astype(_I32)
        lo = jnp.concatenate(los, axis=0).astype(_I32)
        lens = jnp.concatenate(lns, axis=0).astype(_I32)
        values = (hi << 8) | lo
        cnt = jnp.zeros((rows, LANES), _I32)
        for gi in range(G):
            cnt = jnp.where(seg_idx == gi, lengths_ref[c * G + gi], cnt)
        lens = jnp.where(pos_in_seg < cnt, lens, 0)
        if stage == 1:
            words_ref[:, :] = jnp.zeros((G, HUF_WT), jnp.int32)
            bits_ref[:, :] = jnp.broadcast_to(
                jnp.sum(values + lens, axis=1, keepdims=True)[:G],
                (G, LANES),
            )
            return
        offs, row_base = _seg_excl_offsets(lens, HUF_ROWS)
        if stage == 2:
            words_ref[:, :] = jnp.zeros((G, HUF_WT), jnp.int32)
            bits_ref[:, :] = jnp.broadcast_to(
                jnp.sum(offs + row_base, axis=1, keepdims=True)[:G],
                (G, LANES),
            )
            return
        # placement math
        mask = jnp.where(lens >= 32, _I32(-1), (_I32(1) << lens) - 1)
        v = values & mask
        bitpos = offs & 31
        sh = 32 - bitpos - lens
        lsh = jnp.clip(sh, 0, 31)
        rsh = jnp.clip(-sh, 0, 31)
        part1 = jnp.where(sh >= 0, v << lsh, _srl(v, rsh))
        spill = jnp.where(
            sh < 0,
            (v & ((_I32(1) << rsh) - 1)) << ((32 - rsh) & 31),
            _I32(0),
        )
        w0 = _srl(offs, 5)
        acc_ref[:, :] = jnp.zeros((G * 8, HUF_WT), jnp.float32)
        p1_planes = _byte_planes_bf16(part1)
        sp_planes = _byte_planes_bf16(spill)
        WINDOW = 2 * LANES
        win_iota = lax.broadcasted_iota(_I32, (WINDOW, LANES), 0)
        for r in range(rows):
            grp = r // HUF_ROWS
            base = jnp.max(row_base[r : r + 1, :])
            planes = jnp.stack(
                [p[r] for p in p1_planes] + [p[r] for p in sp_planes],
                axis=0,
            )
            aligned = (base >> 12) * 128
            w0_local = w0[r][None, :] - aligned
            oh = (win_iota == w0_local).astype(jnp.bfloat16)
            contrib = lax.dot_general(
                planes, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if stage == 3:
                # fixed-offset accumulation only (no dynamic slices)
                acc_ref[grp * 8 : (grp + 1) * 8, 0:WINDOW] += contrib
            else:
                acc_ref[
                    grp * 8 : (grp + 1) * 8,
                    pl.ds(pl.multiple_of(aligned, LANES), WINDOW),
                ] += contrib
        if stage <= 4:
            words_ref[:, :] = jnp.zeros((G, HUF_WT), jnp.int32)
            bits_ref[:, :] = jnp.broadcast_to(
                acc_ref[0:G, 0:1].astype(_I32), (G, LANES)
            )
            return
        acc = acc_ref[:, :].astype(_I32).reshape(G, 8, HUF_WT)
        words_p1 = (
            (acc[:, 0, :] << 24) | (acc[:, 1, :] << 16)
            | (acc[:, 2, :] << 8) | acc[:, 3, :]
        )
        words_sp = (
            (acc[:, 4, :] << 24) | (acc[:, 5, :] << 16)
            | (acc[:, 6, :] << 8) | acc[:, 7, :]
        )
        lane_iota = lax.broadcasted_iota(_I32, (G, HUF_WT), 1)
        words_sp = jnp.where(
            lane_iota == 0, _I32(0), pltpu.roll(words_sp, 1, 1)
        )
        words_ref[:, :] = words_p1 | words_sp
        lens_sum_rows = jnp.sum(lens, axis=1, keepdims=True)
        totals = []
        for gi in range(G):
            r_last = (gi + 1) * HUF_ROWS - 1
            totals.append(
                (row_base[r_last, :1] + lens_sum_rows[r_last, :1])[None, :]
            )
        bits_ref[:, :] = jnp.broadcast_to(
            jnp.concatenate(totals, axis=0), (G, LANES)
        )

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run(data, counts, *, stage: int):
        data_i = data.astype(_I32).reshape(nc * HUF_ROWS, LANES)
        table = jnp.stack(
            [
                ((code >> 8) & 0xFF).astype(jnp.float32),
                (code & 0xFF).astype(jnp.float32),
                ln.astype(jnp.float32),
            ]
            + [jnp.zeros(256, jnp.float32)] * 5,
            axis=0,
        ).astype(jnp.bfloat16)
        words, bits = pl.pallas_call(
            functools.partial(kernel, stage=stage),
            grid=(nc // G,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (G * HUF_ROWS, LANES), lambda c: (c, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((G, HUF_WT), lambda c: (c, 0)),
                pl.BlockSpec((G, LANES), lambda c: (c, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, HUF_WT), jnp.int32),
                jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((G * 8, HUF_WT), jnp.float32)],
        )(counts, data_i, table)
        return words, bits

    dj = jnp.asarray(rows_np)
    cj = jnp.asarray(counts_np)

    def sync(x):
        np.asarray(x.ravel()[:1])

    prev = 0.0
    for stage in range(6):
        f = lambda: (lambda o: (sync(o[1]), o)[1])(run(dj, cj, stage=stage))
        f()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        print(
            f"s{stage}: {best*1e3:8.1f} ms   (+{(best-prev)*1e3:7.1f} ms)",
            flush=True,
        )
        prev = best


if __name__ == "__main__":
    main()
