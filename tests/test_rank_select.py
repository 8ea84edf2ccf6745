"""Rank/Select, SparseISA, CompressedLCP tests
(reference ``rank_select_tests.cpp`` / ``ds_tests.cpp``)."""

import numpy as np
import pytest

from tudocomp_tpu.ds.rank_select import BitVector, CompressedLCP, SparseISA
from tudocomp_tpu.ds.suffix import TextDS


@pytest.mark.parametrize("seed,n", [(0, 1), (1, 63), (2, 64), (3, 1000)])
def test_rank_select(seed, n):
    rng = np.random.default_rng(seed)
    bits = rng.random(n) < 0.3
    bv = BitVector(bits)
    ref_rank = np.concatenate([[0], np.cumsum(bits)])
    for i in range(n + 1):
        assert int(bv.rank1(i)) == ref_rank[i], i
        assert int(bv.rank0(i)) == i - ref_rank[i], i
    ones = np.flatnonzero(bits)
    for k, p in enumerate(ones, start=1):
        assert int(bv.select1(k)) == p
    zeros = np.flatnonzero(~bits)
    for k, p in enumerate(zeros, start=1):
        assert int(bv.select0(k)) == p


@pytest.mark.parametrize("t", [2, 3, 8])
def test_sparse_isa(t):
    text = b"abracadabra banana abracadabra\0"
    ds = TextDS(text)
    sa = ds.require_sa()
    isa = ds.require_isa()
    sisa = SparseISA(sa, t=t)
    for i in range(len(text)):
        assert sisa[i] == isa[i], i


def test_compressed_lcp():
    text = b"mississippi mississippi\0"
    ds = TextDS(text)
    sa = ds.require_sa()
    plcp = ds.require_plcp()
    lcp = ds.require_lcp()
    cl = CompressedLCP(sa, plcp)
    for i in range(len(text)):
        assert int(cl.plcp(i)) == plcp[i], i
        assert cl[i] == lcp[i], i


def test_textds_compressed_degree_matches_plain():
    """SparseISA / CompressedLCP wired through TextDS answer the same
    point queries as the plain arrays, and lzss_lcp(ds=compressed)
    produces the byte-identical stream."""
    import numpy as np

    from tudocomp_tpu import compressors as _register  # noqa: F401
    from tudocomp_tpu.ds.suffix import TextDS
    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(13)
    data = rng.choice(
        np.frombuffer(b"abracadabra ", np.uint8), 3000
    ).astype(np.uint8).tobytes() + b"\x00"
    ds = TextDS(data)
    isa = ds.require_isa()
    lcp = ds.require_lcp()
    s_isa = ds.require_isa_sparse()
    c_lcp = ds.require_lcp_compressed()
    for i in range(0, len(data), 7):
        assert s_isa[i] == isa[i]
        assert c_lcp[i] == lcp[i]
    plain = REGISTRY.instantiate("lzss_lcp(coder=bit)").compress(data)
    comp = REGISTRY.instantiate(
        "lzss_lcp(coder=bit,ds=compressed)"
    ).compress(data)
    assert plain == comp
