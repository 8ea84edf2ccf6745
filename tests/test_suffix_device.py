"""Device SA/ISA/BWT kernels vs the host specification."""

import numpy as np
import jax.numpy as jnp
import pytest

from tudocomp_tpu.ds.suffix import inverse_suffix_array, suffix_array
from tudocomp_tpu.ops.suffix_jax import (
    bwt_device,
    isa_device,
    suffix_array_device,
)


CASES = [
    b"banana\0",
    b"mississippi mississippi\0",
    b"aaaaaaaaaaaaaaa\0",
    b"\0",
    b"z\0",
]


def _rand_cases():
    rng = np.random.default_rng(3)
    return [
        bytes(rng.integers(1, 5, 999, dtype=np.uint8)) + b"\0",
        (b"abcab" * 321) + b"\0",
        bytes(rng.integers(1, 256, 2048, dtype=np.uint8)) + b"\0",
    ]


@pytest.mark.parametrize("case", CASES + _rand_cases())
def test_device_sa_isa_bwt(case):
    arr = np.frombuffer(case, np.uint8)
    sa_h = suffix_array(arr)
    sa_d = np.asarray(suffix_array_device(jnp.asarray(arr)))
    np.testing.assert_array_equal(sa_d, sa_h)
    isa_d = np.asarray(isa_device(jnp.asarray(sa_d)))
    np.testing.assert_array_equal(isa_d, inverse_suffix_array(sa_h))
    bwt_d = np.asarray(bwt_device(jnp.asarray(arr), jnp.asarray(isa_d)))
    np.testing.assert_array_equal(bwt_d, arr[(sa_h - 1) % arr.size])


def test_sais_matches_radix():
    """The linear-time SA-IS construction produces the identical suffix
    array as the radix prefix-doubling backend on adversarial inputs."""
    import numpy as np
    import pytest

    from tudocomp_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(17)
    cases = [
        b"", b"a", b"banana\x00", b"aaaaaaaaaa", b"ab" * 700,
        bytes(rng.integers(0, 256, 4000, dtype=np.uint8)),
        bytes(rng.integers(0, 2, 6000, dtype=np.uint8)),
        rng.choice(np.frombuffer(b"acgt", np.uint8), 5000)
        .astype(np.uint8).tobytes() + b"\x00",
    ]
    for d in cases:
        t = np.frombuffer(d, np.uint8)
        a = native.suffix_array(t, algo="sais")
        b = native.suffix_array(t, algo="radix")
        assert np.array_equal(a, b), len(d)


def test_unbwt_device_matches_host():
    """Orbit-doubling inverse BWT is bit-identical to the host LF walk."""
    import numpy as np

    from tudocomp_tpu.ds.bwt import bwt_decode, bwt_forward
    from tudocomp_tpu.ds.suffix import suffix_array
    from tudocomp_tpu.ops.suffix_jax import unbwt_device

    import jax.numpy as jnp

    rng = np.random.default_rng(29)
    cases = [
        b"banana\x00",
        b"mississippi river mississippi delta\x00",
        bytes(rng.integers(1, 255, 3000, dtype=np.uint8)) + b"\x00",
        b"a" * 700 + b"b" * 700 + b"\x00",
        b"x\x00",
    ]
    for data in cases:
        t = np.frombuffer(data, np.uint8)
        bwt = bwt_forward(t, suffix_array(t))
        want = bwt_decode(bwt.tobytes())
        got = np.asarray(unbwt_device(jnp.asarray(bwt))).tobytes()
        assert got == want, len(data)


def test_suffix_array_isa_ranks_full_and_truncated():
    """The fused doubling chain: full mode reproduces the plain SA and
    a true ISA, rank levels are exact q-gram equivalence classes for
    in-range positions AND collision-free for truncated tails;
    truncated mode orders by (L-gram class, position)."""
    import jax.numpy as jnp
    import numpy as np

    from tudocomp_tpu.ops.suffix_jax import (
        suffix_array_device, suffix_array_isa_ranks,
    )

    rng = np.random.default_rng(17)
    for n, L in ((1, 8), (7, 8), (200, 16), (515, 32)):
        text = rng.integers(97, 101, n, dtype=np.uint8)
        tj = jnp.asarray(text)
        sa, isa, ranks = (
            np.asarray(x) if not isinstance(x, dict) else x
            for x in suffix_array_isa_ranks(tj, L=L)
        )
        assert np.array_equal(sa, np.asarray(suffix_array_device(tj)))
        assert np.array_equal(isa[sa], np.arange(n))
        for q, r in ranks.items():
            r = np.asarray(r)
            grams = [text[i : i + q].tobytes() for i in range(n)]
            for i in range(n):
                for j in range(i + 1, n):
                    eq_rank = r[i] == r[j]
                    if i + q <= n and j + q <= n:
                        assert eq_rank == (grams[i] == grams[j]), (q, i, j)
                    else:
                        # truncated tails never alias anything
                        assert not eq_rank, (q, i, j)
        # truncated mode: (rank_L, position) order
        sa_t, isa_t, ranks_t = suffix_array_isa_ranks(
            tj, L=L, full=False
        )
        sa_t = np.asarray(sa_t)
        rL = np.asarray(ranks_t[max(ranks_t)]) if ranks_t else None
        assert np.array_equal(np.asarray(isa_t)[sa_t], np.arange(n))
        if rL is not None:
            keys = [(int(rL[p]), int(p)) for p in sa_t]
            assert keys == sorted(keys)


def test_window_fetch_and_settle():
    """_fetch_aligned_words returns the exact byte windows at every
    alignment, and _window_settle counts matched bytes exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tudocomp_tpu.ops.lzss_jax import (
        _fetch_aligned_words, _window_settle, _word_table,
    )

    rng = np.random.default_rng(23)
    n = 700
    text = rng.integers(0, 4, n, dtype=np.uint8)
    T4 = _word_table(jnp.asarray(text))
    idx = np.arange(n, dtype=np.int32)
    for W in (16, 64):
        got = np.asarray(
            jax.jit(lambda i: _fetch_aligned_words(T4, i, W))(
                jnp.asarray(idx)
            )
        )
        padded = np.concatenate([text, np.zeros(4 * W + 8, np.uint8)])
        for i in range(0, n, 37):
            want = padded[i : i + 4 * W]
            have = np.frombuffer(
                np.ascontiguousarray(got[i], ">u4").tobytes(), np.uint8
            )
            assert np.array_equal(have, want), (W, i)
    # settle: matched-byte counts against brute force
    a = np.arange(n, dtype=np.int32)
    b = np.minimum(a + 13, n - 1).astype(np.int32)
    W = 16
    wa = _fetch_aligned_words(T4, jnp.asarray(a), W)
    wb = _fetch_aligned_words(T4, jnp.asarray(b), W)
    m = np.asarray(_window_settle(wa, wb, W))
    padded = np.concatenate([text, np.zeros(4 * W + 8, np.uint8)])
    for i in range(0, n, 53):
        k = 0
        while k < 4 * W and padded[a[i] + k] == padded[b[i] + k]:
            k += 1
        assert int(m[i]) == k, i
