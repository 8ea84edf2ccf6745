"""Honest op-cost probes for the decode-kernel design (run on TPU).

Sync protocol per memory: block_until_ready does not sync through the
axon tunnel; pull a tiny dependent d2h transfer instead. Each probe
reports (total_ms - sync_floor_ms) so fast ops aren't drowned.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")


def sync(x):
    return float(np.asarray(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32))))


def bench(name, fn, *args, n=3):
    out = fn(*args)
    sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:50s} {dt:9.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    # sync floor
    z = jnp.zeros(8, jnp.float32)
    bench("sync floor (noop)", jax.jit(lambda x: x + 1), z)

    N = 100_000_000
    x = jax.random.randint(key, (N,), 0, 255, jnp.int32)
    idx = jax.random.randint(key, (N,), 0, N, jnp.int32)

    bench("elementwise add [100M]", jax.jit(lambda a: a + 3), x)
    bench("global gather x[idx] [100M from 100M]",
          jax.jit(lambda a, i: a[i]), x, idx)
    small_idx = idx % 256
    bench("small-table gather [100M from 256]",
          jax.jit(lambda a, i: a[i]), x[:256], small_idx)

    oh_idx = (idx[:8_000_000] % 256)
    tbl = jnp.arange(256, dtype=jnp.bfloat16)

    def onehot_lookup(i, t):
        oh = (i[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
        return jnp.dot(oh.astype(jnp.bfloat16), t,
                       preferred_element_type=jnp.float32)

    bench("one-hot matmul lookup [8M x 256]", jax.jit(onehot_lookup),
          oh_idx, tbl)

    B, S = 32768, 3072
    bx = jax.random.randint(key, (B, S), 0, 1 << 20, jnp.int32)
    bidx = jax.random.randint(key, (B, 2048), 0, S, jnp.int32)
    bench("batched take_along_axis [32K x 3072 -> 2048]",
          jax.jit(lambda a, i: jnp.take_along_axis(a, i, axis=1)), bx, bidx)
    bench("cumsum last axis [32K x 3072]",
          jax.jit(lambda a: jnp.cumsum(a, axis=1)), bx)
    bench("cumsum flat [100M]", jax.jit(lambda a: jnp.cumsum(a)), x)

    sk = jax.random.randint(key, (B, 5120), 0, 1 << 30, jnp.int32)
    sv = jax.random.randint(key, (B, 5120), 0, 255, jnp.int32)
    bench("lax.sort 2-op batched [32K x 5120]",
          jax.jit(lambda k, v: lax.sort((k, v), num_keys=1)[1]), sk, sv)
    sk2 = jax.random.randint(key, (B, 12288), 0, 1 << 30, jnp.int32)
    bench("lax.sort 2-op batched [32K x 12288]",
          jax.jit(lambda k, v: lax.sort((k, v), num_keys=1)[1]),
          sk2, jnp.tile(sv, (1, 3))[:, :12288])

    # word-fed lockstep scan: the gather-free decode shape.
    # xs feeds one u32 word per lane per step; the body does ~SLOTS
    # unrolled slot computations (window math + table compares).
    NSEG2 = 32768
    STEPS = 768
    SLOTS = 12
    feed = jax.random.randint(key, (STEPS, NSEG2), 0, 1 << 30, jnp.uint32)
    fc = jax.random.randint(key, (17,), 0, 1 << 16, jnp.int32)

    def scan_wordfed(feed):
        def step(carry, w):
            buf, bits = carry
            buf = (buf << 32) | w.astype(jnp.uint64)
            bits = bits + 32
            chars = []
            for _ in range(SLOTS):
                win = ((buf >> jnp.maximum(bits - 16, 0))
                       & jnp.uint64(0xFFFF)).astype(jnp.int32)
                ln = jnp.int32(17)
                for l in range(16, 3, -1):
                    ln = jnp.where(win >= (fc[l] << (16 - l)), l, ln)
                take = bits >= ln + 16
                bits = jnp.where(take, bits - ln, bits)
                chars.append(jnp.where(take, win & 255, 0).astype(jnp.uint8))
            return (buf, bits), jnp.stack(chars)

        init = (jnp.zeros(NSEG2, jnp.uint64), jnp.zeros(NSEG2, jnp.int32))
        _, ys = lax.scan(step, init, feed)
        return ys

    bench(f"word-fed scan {STEPS}x[{NSEG2}] x{SLOTS} slots",
          jax.jit(scan_wordfed), feed)

    # per-step single gather variant, for comparison
    pay = jax.random.randint(key, (NSEG2 * 1024,), 0, 1 << 30, jnp.uint32)
    pos0 = jax.random.randint(key, (NSEG2,), 0, NSEG2 * 512, jnp.int32)

    def scan_gather(pay, pos0):
        def step(pos, _):
            w = pay[pos % (NSEG2 * 1024)]
            adv = (w & 7).astype(jnp.int32) + 1
            return pos + adv, (w & 255).astype(jnp.uint8)

        pos, ys = lax.scan(step, pos0, None, length=STEPS)
        return ys

    bench(f"scan {STEPS} steps x [{NSEG2}] gather",
          jax.jit(scan_gather), pay, pos0)


if __name__ == "__main__":
    main()
