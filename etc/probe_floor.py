"""Isolate the segment-pack kernels' data-movement floor (real chip).

Measures, at [MB] MiB:
  conv      the XLA u8 -> i32 astype+reshape pass alone
  s0_i32    trivial pallas kernel on PRE-converted i32 (no conversion)
  s0_g32    same with g=32 segments per grid step (amortizes steps)
  s0_u8     trivial kernel reading the u8 rows as bitcast i32 words
            (quarter VMEM/HBM traffic; no conversion pass at all)
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
    from tudocomp_tpu.ops.segpack_pallas import CAP_BYTES, HUF_ROWS, HUF_WT, LANES

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    data = make_corpus(mb << 20)
    nc = (mb << 20) // CAP_BYTES
    rows_np = data.reshape(nc, CAP_BYTES)

    def sync(x):
        np.asarray(x.ravel()[:1])

    def t3(fn):
        fn()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    dj = jnp.asarray(rows_np)

    conv = jax.jit(
        lambda d: d.astype(jnp.int32).reshape(nc * HUF_ROWS, LANES)
    )
    tc = t3(lambda: sync(conv(dj)))
    print(f"conv:    {tc*1e3:8.1f} ms", flush=True)

    def triv_kernel(data_ref, words_ref, bits_ref, *, g):
        data = data_ref[...]
        words_ref[:, :] = jnp.zeros((g, HUF_WT), jnp.int32)
        bits_ref[:, :] = jnp.broadcast_to(
            jnp.sum(data, axis=1, keepdims=True)[:g], (g, LANES)
        )

    def run_i32(data_i, g):
        return pl.pallas_call(
            functools.partial(triv_kernel, g=g),
            grid=(nc // g,),
            in_specs=[
                pl.BlockSpec(
                    (g * HUF_ROWS, LANES), lambda c: (c, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec((g, HUF_WT), lambda c: (c, 0)),
                pl.BlockSpec((g, LANES), lambda c: (c, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, HUF_WT), jnp.int32),
                jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
            ],
        )(data_i)

    data_i32 = jax.jit(
        lambda d: d.astype(jnp.int32).reshape(nc * HUF_ROWS, LANES)
    )(dj)
    data_i32.block_until_ready()

    for g in (8, 32):
        f = jax.jit(functools.partial(run_i32, g=g))
        t = t3(lambda: sync(f(data_i32)[1]))
        print(f"s0_i32 g={g}: {t*1e3:8.1f} ms", flush=True)

    # u8 rows bitcast to i32 words: (nc, 2048) u8 -> (nc*4, 128) i32
    def run_u8(words_in, g):
        def kernel(data_ref, words_ref, bits_ref):
            data = data_ref[...]  # (g*4, 128) i32 words = g segments
            words_ref[:, :] = jnp.zeros((g, HUF_WT), jnp.int32)
            bits_ref[:, :] = jnp.broadcast_to(
                jnp.sum(data, axis=1, keepdims=True)[:g], (g, LANES)
            )

        return pl.pallas_call(
            kernel,
            grid=(nc // g,),
            in_specs=[
                pl.BlockSpec(
                    (g * 4, LANES), lambda c: (c, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec((g, HUF_WT), lambda c: (c, 0)),
                pl.BlockSpec((g, LANES), lambda c: (c, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nc, HUF_WT), jnp.int32),
                jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
            ],
        )(words_in)

    words_view = jax.jit(
        lambda d: lax.bitcast_convert_type(
            d.reshape(nc, CAP_BYTES // 4, 4), jnp.int32
        ).reshape(nc * 4, LANES)
    )(dj)
    words_view.block_until_ready()
    for g in (8, 32):
        f = jax.jit(functools.partial(run_u8, g=g))
        t = t3(lambda: sync(f(words_view)[1]))
        print(f"s0_u8  g={g}: {t*1e3:8.1f} ms", flush=True)

    # and the bitcast itself
    tb = t3(
        lambda: sync(
            jax.jit(
                lambda d: lax.bitcast_convert_type(
                    d.reshape(nc, CAP_BYTES // 4, 4), jnp.int32
                ).reshape(nc * 4, LANES)
            )(dj)
        )
    )
    print(f"bitcast: {tb*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
