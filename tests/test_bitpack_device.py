"""Device bit-packing must be bit-identical to the host specification."""

import jax
import jax.numpy as jnp
import numpy as np

from tudocomp_tpu.io.bitio import BitReader, finalize_stream, pack_tokens
from tudocomp_tpu.ops.bitpack import (
    bits_for_u32,
    pack_tokens_device,
    stream_to_words,
    unpack_fixed,
    words_to_stream,
)
from tudocomp_tpu.utils.bits import bits_for


def test_bits_for_u32_exact():
    vals = np.array(
        [0, 1, 2, 3, 4, 7, 8, 255, 256, 2**31 - 1, 2**31, 2**32 - 1],
        dtype=np.uint32,
    )
    got = jax.jit(bits_for_u32)(jnp.asarray(vals))
    assert np.asarray(got).tolist() == [bits_for(int(v)) for v in vals]


def _random_tokens(rng, n):
    lens = rng.integers(1, 33, size=n)
    vals = rng.integers(0, 2**32, size=n, dtype=np.uint64) & (
        (np.uint64(1) << lens.astype(np.uint64)) - np.uint64(1)
    )
    return vals.astype(np.uint32), lens.astype(np.uint8)


def test_device_pack_matches_host():
    rng = np.random.default_rng(11)
    for n in (1, 5, 64, 257, 4096):
        vals, lens = _random_tokens(rng, n)
        host_payload, host_total = pack_tokens(vals, lens)
        words, total = jax.jit(pack_tokens_device)(
            jnp.asarray(vals), jnp.asarray(lens)
        )
        assert int(total) == host_total
        dev_bytes = words_to_stream(np.asarray(words), int(total))
        host_bytes = finalize_stream(host_payload, host_total)
        assert dev_bytes == host_bytes


def test_device_pack_with_padding():
    """Zero-length padding tokens must not change the output."""
    rng = np.random.default_rng(12)
    vals, lens = _random_tokens(rng, 100)
    pad_v = np.concatenate([vals, np.full(28, 0xDEADBEEF, np.uint32)])
    pad_l = np.concatenate([lens, np.zeros(28, np.uint8)])
    w1, t1 = pack_tokens_device(jnp.asarray(vals), jnp.asarray(lens))
    w2, t2 = pack_tokens_device(jnp.asarray(pad_v), jnp.asarray(pad_l))
    assert int(t1) == int(t2)
    assert words_to_stream(np.asarray(w1), int(t1)) == words_to_stream(
        np.asarray(w2), int(t2)
    )


def test_unpack_fixed():
    rng = np.random.default_rng(13)
    for width in (1, 7, 8, 13, 31, 32):
        n = 200
        vals = rng.integers(0, 2**width, size=n, dtype=np.uint64).astype(
            np.uint32
        )
        lens = np.full(n, width, np.uint8)
        words, total = pack_tokens_device(jnp.asarray(vals), jnp.asarray(lens))
        got = unpack_fixed(words, 0, width, n)
        assert np.asarray(got).tolist() == vals.tolist()
        # with a nonzero traced start offset
        got2 = jax.jit(lambda w: unpack_fixed(w, width * 3, width, n - 3))(
            words
        )
        assert np.asarray(got2).tolist() == vals[3:].tolist()


def test_stream_to_words_roundtrip():
    rng = np.random.default_rng(14)
    vals, lens = _random_tokens(rng, 333)
    payload, total = pack_tokens(vals, lens)
    words = stream_to_words(payload)
    # decode all tokens back through unpack at cumulative offsets
    offs = np.concatenate([[0], np.cumsum(lens.astype(np.int64))[:-1]])
    r = BitReader(finalize_stream(payload, total))
    for v, l, o in zip(vals.tolist(), lens.tolist(), offs.tolist()):
        got = unpack_fixed(jnp.asarray(words), int(o), int(l), 1)
        assert int(np.asarray(got)[0]) == v == r.read_int(int(l))
