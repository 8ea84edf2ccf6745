"""Where does esp(rounds=device) time go? (round-5 work, VERDICT item 1)

Splits the 1 MiB esp_rounds_jax wall time into:
  - per-round device compute (each _esp_round bucket timed with one
    scalar sync, floor-corrected by chaining)
  - per-round host round trips (the (nb, R) scalar pull + the rules
    slice pull) as measured inside a real run
  - the host tail

Usage: python -u etc/probe_esp_breakdown.py [corpus]
"""

from __future__ import annotations

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

    name = sys.argv[1] if len(sys.argv) > 1 else "english"
    gen = getattr(datasets, f"gen_{name}")
    raw = np.frombuffer(gen(1 << 20), np.uint8)
    reps = -(-(1 << 20) // raw.size)
    text = np.tile(raw, reps)[: 1 << 20].copy()
    text[-1] = 0
    data = text.tobytes()

    from tudocomp_tpu.compressors.esp import iter_log
    from tudocomp_tpu.ops.esp_jax import _esp_round, _pad_pow2

    # --- replay the real round loop, attributing time -------------------
    s_host = np.frombuffer(data, np.uint8).astype(np.int64)
    base = 256
    N = _pad_pow2(s_host.size)
    pad = np.zeros(N, np.int32)
    pad[: s_host.size] = s_host
    s_dev = jnp.asarray(pad)
    n_cur = jnp.int32(s_host.size)

    # warm compile every bucket first (cold tunnels pollute timing)
    warm_s, warm_n, warm_base = s_dev, n_cur, base
    warmN = N
    while True:
        s_next, nb, rules, R = _esp_round(
            warm_s, warm_n, jnp.int32(warm_base), ilog=iter_log(warm_base)
        )
        nb_i, r_i = (int(v) for v in np.asarray(jnp.stack([nb, R])))
        warm_base += r_i
        if nb_i <= 4096:
            break
        warmN = _pad_pow2(nb_i)
        warm_s = s_next[:warmN]
        warm_n = nb

    # timed replay
    t_all0 = time.perf_counter()
    rounds = []
    while True:
        t0 = time.perf_counter()
        s_next, nb, rules, R = _esp_round(
            s_dev, n_cur, jnp.int32(base), ilog=iter_log(base)
        )
        t_disp = time.perf_counter() - t0
        t0 = time.perf_counter()
        nb_i, r_i = (int(v) for v in np.asarray(jnp.stack([nb, R])))
        t_scal = time.perf_counter() - t0
        t0 = time.perf_counter()
        ch = np.asarray(rules[:r_i], np.int64)
        t_rules = time.perf_counter() - t0
        rounds.append((N, nb_i, r_i, t_disp, t_scal, t_rules))
        base += r_i
        if nb_i <= 4096:
            break
        N = _pad_pow2(nb_i)
        s_dev = s_next[:N]
        n_cur = nb
    t_all = time.perf_counter() - t_all0

    print(f"corpus={name}  total device-phase: {t_all*1e3:.1f} ms")
    print("  N        nb      R     disp(ms) scal(ms) rules(ms)")
    td = ts = tr = 0.0
    for (Ni, nb_i, r_i, a, b, c) in rounds:
        print(f"  {Ni:8d} {nb_i:7d} {r_i:6d} {a*1e3:8.1f} {b*1e3:8.1f}"
              f" {c*1e3:8.1f}")
        td += a
        ts += b
        tr += c
    print(f"  sums: dispatch {td*1e3:.1f}  scalar-sync {ts*1e3:.1f}"
          f"  rules-pull {tr*1e3:.1f}")
    rt = sum(r[2] for r in rounds)
    print(f"  total rules pulled: {rt} ({rt*8/1e6:.2f} MB as int32x2)")

    # --- pure d2h bandwidth check at rule scale -------------------------
    buf = jnp.arange(600_000 * 2, dtype=jnp.int32).reshape(-1, 2)
    np.asarray(buf)  # warm
    t0 = time.perf_counter()
    np.asarray(buf)
    t = time.perf_counter() - t0
    print(f"d2h 4.8MB int32: {t*1e3:.1f} ms ({4.8/t:.1f} MB/s)")


if __name__ == "__main__":
    main()
