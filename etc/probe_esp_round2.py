"""Additive ablation of _esp_round at N=2^20: cumulative stage timing.

Each row adds one stage to the jitted program; the delta between rows
is that stage's cost (one scalar-sync per row, ~28 ms floor on all).
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

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from etc import datasets
    from jax import lax

    from tudocomp_tpu.ops import esp_jax as E

    I32 = jnp.int32
    raw = np.frombuffer(datasets.gen_english(1 << 20), np.uint8)
    text = np.tile(raw, 2)[: 1 << 20].copy()
    text[-1] = 0
    N = 1 << 20
    pad = np.zeros(N, np.int32)
    pad[: text.size] = text
    sj = jnp.asarray(pad)
    nj = jnp.int32(text.size)

    def body(s, n, base, stage):
        ilog = 3
        starts = E._round_block_starts(s, n, ilog)
        pos = jnp.arange(N, dtype=I32)
        starts = starts & (pos < n)
        starts = starts | (pos == 0)
        if stage == 0:
            return starts

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
        if stage == 1:
            return lens, nb

        bstart = jnp.cumsum(lens) - lens
        bvalid = i < nb
        clamp = lambda x: jnp.clip(x, 0, N - 1)  # noqa: E731
        a = s[clamp(bstart)]
        b = s[clamp(jnp.minimum(bstart + 1, n - 1))]
        c = s[clamp(jnp.minimum(bstart + 2, n - 1))]
        is3 = bvalid & (lens == 3)
        if stage == 2:
            return a, b, c

        posA = 2 * i
        newA, firstA = E._group_dedup((a, b), posA, bvalid)
        if stage == 3:
            return newA, firstA

        posB = 2 * i + 1
        newB, firstB = E._group_dedup((firstA, c), posB, is3)
        if stage == 4:
            return newB, firstB

        new_cnt = newA.astype(I32) + newB.astype(I32)
        pre = jnp.cumsum(new_cnt) - new_cnt
        idA_head = pre
        idB_head = pre + newA.astype(I32)
        R = pre[-1] + new_cnt[-1]
        idA = idA_head[clamp(firstA)]
        idB = idB_head[clamp(firstB)]
        if stage == 5:
            return idA, idB, R

        rules = jnp.zeros((N, 2), I32)
        rules = rules.at[jnp.where(newA, idA_head, N)].set(
            jnp.stack([a, b], axis=1), mode="drop"
        )
        rules = rules.at[jnp.where(newB, idB_head, N)].set(
            jnp.stack([base + idA, c], axis=1), mode="drop"
        )
        if stage == 6:
            return rules

        top = jnp.where(is3, idB, idA)
        s_next = jnp.where(bvalid, base + top, 0)
        return s_next, nb, rules, R

    def timeit(fn, *args):
        fn(*args)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    names = ["starts", "+blocks", "+sym gathers", "+dedupA", "+dedupB",
             "+id gathers", "+rules scatter", "+s_next (full)"]
    prev = 0.0
    for st in range(8):
        f = jax.jit(functools.partial(body, stage=st))
        t = timeit(f, sj, nj, jnp.int32(256))
        print(f"{names[st]:16s} {t:8.1f} ms  (+{t - prev:6.1f})")
        prev = t


if __name__ == "__main__":
    main()
