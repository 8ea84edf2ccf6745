"""Primitive cost probe: gather vs sort vs scan on the real chip.

Calibrates the building blocks for the exact-LZ77 redesign (VERDICT r4):
flat 1M-element gathers, co-sorts, fill-forward shifts, while vs fori
pointer doubling. Shapes mirror the matcher: 16 x 64 KiB blocks.
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
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

    n = 1 << 16
    bsz = 16
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.permutation(np.tile(np.arange(n), (bsz, 1)),
                                    axis=1).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, n, (bsz, n)).astype(np.int32))

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        np.asarray(leaves[0].ravel()[:1])
        return x

    g1 = jax.jit(jax.vmap(lambda a, i: a[i]))
    t = timeit(lambda: g1(A, idx), sync)
    print(f"gather flat:     {t*1e3:8.2f} ms (16x64K)", flush=True)

    def g_take(a, i):
        return a.at[i].get(mode="promise_in_bounds")

    g2 = jax.jit(jax.vmap(g_take))
    t = timeit(lambda: g2(A, idx), sync)
    print(f"gather promise:  {t*1e3:8.2f} ms", flush=True)

    def g_sortback(a, i):
        # permutation-only gather: y[t] = a[p[t]] via two co-sorts
        t_ = jnp.arange(n, dtype=jnp.int32)
        _, ts = lax.sort((i, t_), num_keys=1)
        _, y = lax.sort((ts, a), num_keys=1)
        return y

    g3 = jax.jit(jax.vmap(g_sortback))
    t = timeit(lambda: g3(A, idx), sync)
    print(f"perm-gather 2sort:{t*1e3:7.2f} ms", flush=True)

    s1 = jax.jit(jax.vmap(lambda a: lax.sort(
        (a, a, a), num_keys=2)[2]))
    t = timeit(lambda: s1(A), sync)
    print(f"3-array sort:    {t*1e3:8.2f} ms", flush=True)

    def ff(a):
        # fill-forward of flagged values by log-shift (18 steps)
        f = (a & 7) == 0
        val = jnp.where(f, a, 0)
        have = f
        s = 1
        while s < n:
            vs = jnp.concatenate([jnp.zeros(s, jnp.int32), val[:-s]])
            hs = jnp.concatenate(
                [jnp.zeros(s, jnp.bool_), have[:-s]])
            val = jnp.where(have, val, vs)
            have = have | hs
            s *= 2
        return val

    f1 = jax.jit(jax.vmap(ff))
    t = timeit(lambda: f1(A), sync)
    print(f"fill-fwd shifts: {t*1e3:8.2f} ms", flush=True)

    c1 = jax.jit(jax.vmap(lambda a: jnp.cumsum(a)))
    t = timeit(lambda: c1(A), sync)
    print(f"cumsum:          {t*1e3:8.2f} ms", flush=True)

    cm = jax.jit(jax.vmap(
        lambda a: lax.associative_scan(jnp.maximum, a)))
    t = timeit(lambda: cm(A), sync)
    print(f"cummax(ascan):   {t*1e3:8.2f} ms", flush=True)

    # pointer doubling: while(any) vs fixed fori rounds
    from tudocomp_tpu.ops.lzss_jax import _psv_indices

    p1 = jax.jit(jax.vmap(_psv_indices))
    t = timeit(lambda: p1(A), sync)
    print(f"psv while_loop:  {t*1e3:8.2f} ms", flush=True)

    def psv_fori(a):
        m = a.shape[0]
        j = jnp.arange(m, dtype=jnp.int32)

        def body(_, jump):
            jc = jnp.clip(jump, 0, m - 1)
            walk = (jump >= 0) & (a[jc] >= a)
            return jnp.where(walk, jump[jc], jump)

        import math
        return lax.fori_loop(0, int(math.log2(m)) + 1, body, j - 1)

    p2 = jax.jit(jax.vmap(psv_fori))
    t = timeit(lambda: p2(A), sync)
    r1, r2 = p1(A), p2(A)
    eq = bool(jnp.all(r1 == r2))
    print(f"psv fori(17):    {t*1e3:8.2f} ms equal={eq}", flush=True)

    def psv_unrolled(a):
        m = a.shape[0]
        j = jnp.arange(m, dtype=jnp.int32)
        jump = j - 1
        import math
        for _ in range(int(math.log2(m)) + 1):
            jc = jnp.clip(jump, 0, m - 1)
            walk = (jump >= 0) & (a[jc] >= a)
            jump = jnp.where(walk, jump[jc], jump)
        return jump

    p3 = jax.jit(jax.vmap(psv_unrolled))
    t = timeit(lambda: p3(A), sync)
    eq = bool(jnp.all(p3(A) == r1))
    print(f"psv unrolled:    {t*1e3:8.2f} ms equal={eq}", flush=True)


if __name__ == "__main__":
    main()


def probe_rowgather() -> None:
    """Row-gather + one-hot select: y[t] = A[idx[t]] via gathering the
    W-wide row containing idx[t] (slice-like minor-dim gather) and
    selecting the lane with a compare-mask reduce. If TPU row gathers
    run near memcpy speed this beats the elementwise gather."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    n = 1 << 16
    bsz = 16
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.permutation(
        np.tile(np.arange(n), (bsz, 1)), axis=1).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, n, (bsz, n)).astype(np.int32))

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])
        return x

    for W in (8, 32, 128):
        def rg(a, i, W=W):
            rows = a.reshape(n // W, W)
            got = rows[i >> {8: 3, 32: 5, 128: 7}[W]]  # (n, W) row gather
            lane = i & (W - 1)
            sel = jnp.sum(
                jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (n, W), 1)
                    == lane[:, None],
                    got, 0),
                axis=1)
            return sel

        f = jax.jit(jax.vmap(rg))
        ref = jax.jit(jax.vmap(lambda a, i: a[i]))(A, idx)
        ok = bool(jnp.all(f(A, idx) == ref))
        f(A, idx)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(A, idx))
            best = min(best, time.perf_counter() - t0)
        print(f"rowgather W={W:3d}: {best*1e3:8.2f} ms ok={ok}",
              flush=True)


if __name__ == "__main__" and os.environ.get("TDC_PROBE_ROWGATHER"):
    probe_rowgather()
