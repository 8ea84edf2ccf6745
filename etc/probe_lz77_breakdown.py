"""Stage breakdown for the exact device LZ77 matcher (VERDICT r3 #2).

Times each ingredient of _match_exact_device batched over 16 x 64 KiB
blocks on the real chip: SA, ISA, ANSV (pointer doubling), rank tables,
lifted LCP — to find where the 2.6 s/MiB (vs host 0.13) actually goes.

Usage: python -u etc/probe_lz77_breakdown.py [corpus]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")

import numpy as np


def timeit(fn, sync, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from etc import datasets

    name = sys.argv[1] if len(sys.argv) > 1 else "english"
    gen = getattr(datasets, f"gen_{name}")
    raw = np.frombuffer(gen(1 << 20), np.uint8)
    reps = -(-(1 << 20) // raw.size)
    text = np.tile(raw, reps)[: 1 << 20].copy()
    text[-1] = 0
    blocks = np.ascontiguousarray(text.reshape(16, 1 << 16))
    bj = jnp.asarray(blocks)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        np.asarray(leaves[0].ravel()[:1])
        return x

    from tudocomp_tpu.ops.lzss_jax import (
        _psv_indices, lifted_lcp, rank_tables,
    )
    from tudocomp_tpu.ops.suffix_jax import isa_device, suffix_array_device

    print(f"corpus={name}, 16 x 64 KiB batched", flush=True)

    f_sa = jax.jit(jax.vmap(suffix_array_device))
    t = timeit(lambda: f_sa(bj), sync)
    print(f"sa:          {t*1e3:8.1f} ms/MiB", flush=True)

    def sa_isa(x):
        sa = suffix_array_device(x)
        return sa, isa_device(sa)

    f_si = jax.jit(jax.vmap(sa_isa))
    t = timeit(lambda: f_si(bj), sync)
    print(f"sa+isa:      {t*1e3:8.1f} ms/MiB", flush=True)

    def ansv(x):
        sa = suffix_array_device(x)
        psv = _psv_indices(sa)
        rev = _psv_indices(sa[::-1])[::-1]
        return psv, rev

    f_ansv = jax.jit(jax.vmap(ansv))
    t = timeit(lambda: f_ansv(bj), sync)
    print(f"sa+ansv:     {t*1e3:8.1f} ms/MiB", flush=True)

    def ranks_only(x):
        r = rank_tables(x, 512)
        return r[512]

    f_rk = jax.jit(jax.vmap(ranks_only))
    t = timeit(lambda: f_rk(bj), sync)
    print(f"ranks(512):  {t*1e3:8.1f} ms/MiB", flush=True)

    def floors_only(x):
        # SA + ANSV + rank co-sort + level floors (everything except
        # candidate glue and refinement)
        n = x.shape[0]
        sa = suffix_array_device(x)
        isa = isa_device(sa)
        psv = _psv_indices(sa)
        rev = _psv_indices(sa[::-1])[::-1]
        nsv = jnp.where(rev >= 0, n - 1 - rev, -1)
        ranks = rank_tables(x, 512)
        levels = sorted(ranks.keys())
        import jax.lax as lax
        sorted_ = lax.sort(
            (isa,) + tuple(ranks[q] for q in levels), num_keys=1
        )
        r_sa = dict(zip(levels, sorted_[1:]))
        slot = jnp.arange(n, dtype=jnp.int32)
        l_up = jnp.zeros(n, jnp.int32)
        for q in levels:
            change = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), r_sa[q][1:] != r_sa[q][:-1]])
            gstart = lax.associative_scan(
                jnp.maximum, jnp.where(change, slot, -1))
            l_up = jnp.where((psv >= 0) & (gstart <= psv), q, l_up)
        return l_up

    f_fl = jax.jit(jax.vmap(floors_only))
    t = timeit(lambda: f_fl(bj), sync)
    print(f"sa+ansv+floor:{t*1e3:8.1f} ms/MiB", flush=True)

    def lift_only(x):
        n = x.shape[0]
        ranks = rank_tables(x, 512)
        pos = jnp.arange(n, dtype=jnp.int32)
        cand = jnp.maximum(pos - 17, -1)  # synthetic candidates
        limit = jnp.minimum(n - 1 - pos, 512)
        return lifted_lcp(ranks, 512, x, cand, limit)

    f_lf = jax.jit(jax.vmap(lift_only))
    t = timeit(lambda: f_lf(bj), sync)
    print(f"ranks+lift:  {t*1e3:8.1f} ms/MiB", flush=True)

    from tudocomp_tpu.ops.lzss_jax import _match_exact_device

    f_all = jax.jit(jax.vmap(
        lambda x: jnp.stack(_match_exact_device(x, max_len=512))
    ))
    t = timeit(lambda: f_all(bj), sync)
    print(f"full match:  {t*1e3:8.1f} ms/MiB", flush=True)


if __name__ == "__main__":
    main()
