"""Time int8-MXU placement variants against the bf16 formulation.

Placement math volume per grid step is fixed (one-hot build + small
dots + dynamic-slice accumulate); this probe times JUST that loop in
three dtype strategies on real data shapes:

  bf16     current: planes/one-hot bf16, f32 acc
  int8     planes as int8 (bias -128), one-hot int8, i32 acc
  int8raw  int8 without the bias-correction row (pure timing floor)

Usage: python -u etc/probe_int8.py [MB]
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
        CAP_BYTES, HUF_ROWS, HUF_WT, LANES, _byte_planes_bf16, _I32, _srl,
    )

    G = 8
    WINDOW = 2 * LANES
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    data = make_corpus(mb << 20)
    nc = (mb << 20) // CAP_BYTES
    rows_np = data.reshape(nc, CAP_BYTES)

    def kernel(data_ref, words_ref, bits_ref, accf_ref, acci_ref,
               *, mode: str, stride: int):
        data = data_ref[...]
        rows = G * HUF_ROWS
        # fake tokens: value = byte pair, len = 8..16ish, offsets = 10*pos
        lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
        row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
        values = (data << 8) | data
        lens = 8 + (data & 7)
        offs = (row % HUF_ROWS) * LANES * 10 + lane * 10
        row_base = (row % HUF_ROWS) * LANES * 10
        mask = (_I32(1) << lens) - 1
        v = values & mask
        bitpos = offs & 31
        sh = 32 - bitpos - lens
        lsh = jnp.clip(sh, 0, 31)
        rsh = jnp.clip(-sh, 0, 31)
        part1 = jnp.where(sh >= 0, v << lsh, _srl(v, rsh))
        spill = jnp.where(
            sh < 0, (v & ((_I32(1) << rsh) - 1)) << ((32 - rsh) & 31),
            _I32(0),
        )
        w0 = _srl(offs, 5)
        win_iota = lax.broadcasted_iota(_I32, (WINDOW, LANES), 0)
        if mode == "bf16":
            accf_ref[:, :] = jnp.zeros((G * 8, HUF_WT), jnp.float32)
            p1p = _byte_planes_bf16(part1)
            spp = _byte_planes_bf16(spill)
            for r in range(0, rows, stride):
                grp = r // HUF_ROWS
                base = jnp.max(row_base[r : r + 1, :])
                planes = jnp.stack(
                    [p[r] for p in p1p] + [p[r] for p in spp], axis=0
                )
                aligned = (base >> 12) * 128
                oh = (win_iota == (w0[r][None, :] - aligned)).astype(
                    jnp.bfloat16
                )
                accf_ref[
                    grp * 8 : (grp + 1) * 8,
                    pl.ds(pl.multiple_of(aligned, LANES), WINDOW),
                ] += lax.dot_general(
                    planes, oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            out = accf_ref[0:G, 0:1].astype(_I32)
        else:
            acci_ref[:, :] = jnp.zeros((G * 9, HUF_WT), jnp.int32)
            nplanes = 9 if mode == "int8" else 8

            def planes8(x):
                return [
                    ((_srl(x, s) & 0xFF) - 128).astype(jnp.int8)
                    for s in (24, 16, 8, 0)
                ]

            p1p = planes8(part1)
            spp = planes8(spill)
            ones = jnp.full((1, LANES), 1, jnp.int8)
            for r in range(0, rows, stride):
                grp = r // HUF_ROWS
                base = jnp.max(row_base[r : r + 1, :])
                ps = [p[r] for p in p1p] + [p[r] for p in spp]
                if mode == "int8":
                    planes = jnp.concatenate(
                        [jnp.stack(ps, axis=0), ones], axis=0
                    )
                else:
                    planes = jnp.stack(ps, axis=0)
                aligned = (base >> 12) * 128
                oh = (win_iota == (w0[r][None, :] - aligned)).astype(
                    jnp.int8
                )
                acci_ref[
                    grp * 9 : grp * 9 + nplanes,
                    pl.ds(pl.multiple_of(aligned, LANES), WINDOW),
                ] += lax.dot_general(
                    planes, oh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            out = acci_ref[0:G, 0:1]
        words_ref[:, :] = jnp.zeros((G, HUF_WT), jnp.int32)
        bits_ref[:, :] = jnp.broadcast_to(out, (G, LANES))

    @functools.partial(jax.jit, static_argnames=("mode", "stride"))
    def run(data, *, mode: str, stride: int):
        data_i = data.astype(_I32).reshape(nc * HUF_ROWS, LANES)
        return pl.pallas_call(
            functools.partial(kernel, mode=mode, stride=stride),
            grid=(nc // G,),
            in_specs=[
                pl.BlockSpec(
                    (G * HUF_ROWS, LANES), lambda c: (c, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec((G, HUF_WT), lambda c: (c, 0)),
                pl.BlockSpec((G, LANES), lambda c: (c, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, HUF_WT), jnp.int32),
                jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((G * 8, HUF_WT), jnp.float32),
                pltpu.VMEM((G * 9, HUF_WT), jnp.int32),
            ],
        )(data_i)

    dj = jnp.asarray(rows_np)

    def sync(x):
        np.asarray(x.ravel()[:1])

    for mode in ("bf16", "int8", "int8raw"):
        for stride in (1, 2):
            try:
                f = lambda: sync(run(dj, mode=mode, stride=stride)[1])
                f()
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    f()
                    best = min(best, time.perf_counter() - t0)
                print(f"{mode:8s} stride={stride}: {best*1e3:8.1f} ms",
                      flush=True)
            except Exception as e:
                print(f"{mode:8s} stride={stride}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
