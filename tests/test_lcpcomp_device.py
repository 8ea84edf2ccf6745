"""Device lcpcomp factorization (ops/lcpcomp_jax.py): factor validity,
chain resolvability through every dec strategy, and quality parity."""

import numpy as np
import pytest

from tudocomp_tpu.ops.lcpcomp_jax import factorize_device
from tudocomp_tpu.registry import REGISTRY
import tudocomp_tpu.compressors  # noqa: F401


def _corpora():
    rng = np.random.default_rng(17)
    return [
        b"in the beginning was the word and the word " * 30 + b"\x00",
        (b"abcabcabcabcxyz" * 150) + b"\x00",
        bytes(rng.integers(0, 6, 4096, dtype=np.uint8)) + b"\x00",
        b"a" * 3000 + b"\x00",
        rng.choice(np.frombuffer(b"acgt", np.uint8), 5000)
        .astype(np.uint8).tobytes() + b"\x00",
    ]


def test_lcp_by_position_matches_host():
    """The round-5 SA-adjacent floor + probe + window-settle LCP equals
    the host LCP array (capped at max_len and both suffix lengths),
    pinned per text position."""
    import jax.numpy as jnp

    from tudocomp_tpu.ds.suffix import TextDS
    from tudocomp_tpu.ops.lcpcomp_jax import _lcp_by_position

    for data in _corpora():
        text = np.frombuffer(data, np.uint8)
        n = text.size
        ds = TextDS(data)
        sa = np.asarray(ds.require_sa(), np.int64)
        isa = np.asarray(ds.require_isa(), np.int64)
        lcp = np.asarray(ds.require_lcp(), np.int64)
        for max_len in (64, 4096):
            got_l, got_s = _lcp_by_position(
                jnp.asarray(text), max_len=max_len
            )
            got_l = np.asarray(got_l)
            got_s = np.asarray(got_s)
            ml = min(max_len, max(4, n - 1))
            for p in range(n):
                i = isa[p]
                if i == 0:
                    assert got_l[p] == 0
                    continue
                src = sa[i - 1]
                want = min(
                    int(lcp[i]), ml, n - 1 - p, n - int(src)
                )
                assert got_s[p] == src, (p, max_len)
                assert got_l[p] == want, (p, got_l[p], want, max_len)


def test_factor_validity():
    """Targets are disjoint, sources match their targets in the
    original text (the lcpcomp invariants)."""
    for data in _corpora():
        text = np.frombuffer(data, np.uint8)
        pos, src, ln = factorize_device(text, 5)
        assert (ln >= 5).all()
        assert (src >= 0).all() and (src != pos).all()
        assert ((pos + ln) <= text.size).all()
        order = np.argsort(pos)
        p, l = pos[order], ln[order]
        assert (p[1:] >= p[:-1] + l[:-1]).all(), "overlapping targets"
        for a, b, k in zip(pos.tolist(), src.tolist(), ln.tolist()):
            assert np.array_equal(text[a:a + k], text[b:b + k])


@pytest.mark.parametrize(
    "dec", ["scan", "compact", "MultimapListBuffer", "QueueListBuffer"]
)
def test_device_roundtrip_all_decoders(dec):
    """Chains emitted by the parallel schedule resolve through every
    decoder (cycle-free; the resolvers raise on cycles)."""
    for data in _corpora():
        spec = f"lcpcomp(coder=huff,comp=device,dec={dec})"
        c = REGISTRY.instantiate(spec)
        enc = c.compress(data)
        assert REGISTRY.instantiate(spec).decompress(enc) == data


def test_quality_parity_with_arrays():
    rng = np.random.default_rng(23)
    data = (
        b"the quick brown fox jumps over the lazy dog " * 120
        + bytes(rng.integers(0, 16, 2048, dtype=np.uint8)) + b"\x00"
    )
    sizes = {}
    for comp in ("arrays", "device"):
        spec = f"lcpcomp(coder=huff,threshold=5,comp={comp})"
        enc = REGISTRY.instantiate(spec).compress(data)
        assert REGISTRY.instantiate(spec).decompress(enc) == data
        sizes[comp] = len(enc)
    # the parallel schedule is the same greedy class: same size class
    # (measured: device <= arrays on english/dna/repetitive.1MB)
    assert sizes["device"] <= 1.1 * sizes["arrays"], sizes


def test_edge_shapes():
    for data in (b"", b"\x00", b"ab\x00", b"aaaa\x00"):
        text = np.frombuffer(data, np.uint8)
        pos, src, ln = factorize_device(text, 5)
        assert pos.size == src.size == ln.size
    text = np.frombuffer(b"abcabc\x00", np.uint8)
    assert factorize_device(text, 100)[0].size == 0
