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
