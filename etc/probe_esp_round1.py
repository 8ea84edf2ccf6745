"""Stage timing inside one device ESP round at N=2^20 (round-5 work).

Times jitted stage slices with one dependent-scalar sync each,
min-of-3; the ~28 ms tunnel sync floor rides on every row, so compare
rows differentially.
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

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from etc import datasets

    from tudocomp_tpu.ops import esp_jax as E

    raw = np.frombuffer(datasets.gen_english(1 << 20), np.uint8)
    text = np.tile(raw, 2)[: 1 << 20].copy()
    text[-1] = 0
    N = 1 << 20
    pad = np.zeros(N, np.int32)
    pad[: text.size] = text
    s = jnp.asarray(pad)
    n = jnp.int32(text.size)
    I32 = jnp.int32

    def timeit(fn, *args):
        fn(*args)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    @functools.partial(jax.jit, static_argnames=("ilog",))
    def stage_starts(s, n, ilog):
        return E._round_block_starts(s, n, ilog)

    @jax.jit
    def stage_blocks(s, n):
        starts = E._round_block_starts(s, n, 3)
        pos = jnp.arange(N, dtype=I32)
        starts = (starts & (pos < n)) | (pos == 0)
        bid = jnp.cumsum(starts.astype(I32)) - 1
        nb0 = jnp.where(n > 0, jnp.max(jnp.where(starts, bid, -1)) + 1, 0)
        bstart0 = jnp.zeros(N, I32).at[
            jnp.where(starts, bid, N)
        ].set(pos, mode="drop")
        i = jnp.arange(N, dtype=I32)
        bnext0 = jnp.concatenate([bstart0[1:], jnp.zeros(1, I32)])
        lens0 = jnp.where(i + 1 < nb0, bnext0 - bstart0, n - bstart0)
        lens0 = jnp.where(i < nb0, lens0, 0)
        lens, nb = E._merge_one_blocks(lens0, nb0)
        return lens, nb

    @jax.jit
    def stage_full(s, n):
        return E._esp_round(s, n, jnp.int32(256), ilog=3)

    # isolated dedup on realistic keys
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 256, N, np.int32))
    b = jnp.asarray(rng.integers(0, 256, N, np.int32))
    valid = jnp.asarray(np.arange(N) < text.size // 2)
    seqpos = jnp.arange(N, dtype=jnp.int32) * 2

    @jax.jit
    def stage_dedup(a, b, seqpos, valid):
        return E._group_dedup((a, b), seqpos, valid)

    @jax.jit
    def one_sort5(a, b, seqpos, valid):
        idx = jnp.arange(N, dtype=I32)
        return lax.sort((a, b, seqpos, idx), num_keys=3)

    @jax.jit
    def one_sort3(a, b, seqpos, valid):
        idx = jnp.arange(N, dtype=I32)
        return lax.sort((idx, a, b), num_keys=1)

    @jax.jit
    def label4(s, n):
        buf = s
        for _ in range(4):
            buf = E._label_pass(buf)
        return buf

    @jax.jit
    def scans(s, n):
        x = jnp.cumsum(s)
        y = lax.cummax(s, axis=0)
        z = E._suffix_min(s)
        return x, y, z

    print(f"starts(ilog=3): {timeit(stage_starts, s, n, 3):8.1f} ms")
    print(f"starts+blocks:  {timeit(stage_blocks, s, n):8.1f} ms")
    print(f"full round:     {timeit(stage_full, s, n):8.1f} ms")
    print(f"dedup (1 call): {timeit(stage_dedup, a, b, seqpos, valid):8.1f} ms")
    print(f"sort 4op k3:    {timeit(one_sort5, a, b, seqpos, valid):8.1f} ms")
    print(f"sort 3op k1:    {timeit(one_sort3, a, b, seqpos, valid):8.1f} ms")
    print(f"label x4:       {timeit(label4, s, n):8.1f} ms")
    print(f"3 scans:        {timeit(scans, s, n):8.1f} ms")


if __name__ == "__main__":
    main()
