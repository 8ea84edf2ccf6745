"""ESP d_coding family: every coder roundtrips the D array exactly."""

import numpy as np
import pytest

from tudocomp_tpu.io.bitio import BitReader, BitWriter
from tudocomp_tpu.registry import REGISTRY
import tudocomp_tpu.compressors  # noqa: F401  (register)
from tudocomp_tpu.compressors.esp_dcoding import recover_D
from tudocomp_tpu.utils.bits import bits_for

VARIANTS = [
    "plain", "diff", "wavelet_tree", "succinct",
    "succinct(subseq=greedy)", "succinct(dx_coder=plain)",
    "huffman", "arithmetic", "range_fit",
]


def _cases():
    rng = np.random.default_rng(11)
    return [
        np.zeros(0, np.int64),
        np.array([5], np.int64),
        np.array([3, 3, 3, 3], np.int64),
        np.arange(100, dtype=np.int64) + 256,
        np.arange(100, dtype=np.int64)[::-1].copy() + 256,
        rng.integers(0, 1 << 12, 500, dtype=np.int64),
        np.repeat(rng.integers(0, 50, 40, dtype=np.int64), 13),
    ]


@pytest.mark.parametrize("variant", VARIANTS)
def test_dcoding_roundtrip(variant):
    coder = REGISTRY.instantiate(variant, type="d_coding")
    for rhs in _cases():
        width = bits_for(int(rhs.max(initial=1)))
        out = BitWriter()
        coder.encode(rhs, out, width)
        blob = out.getvalue()
        inp = BitReader(blob)
        dec = REGISTRY.instantiate(variant, type="d_coding").decode(
            inp, width, rhs.size
        )
        np.testing.assert_array_equal(
            np.asarray(dec, np.int64), rhs, err_msg=variant
        )


@pytest.mark.parametrize("subseq", ["optimal", "greedy"])
def test_decomposition_valid(subseq):
    """Every subsequence must be monotone in the claimed direction and
    the recovery must invert the decomposition."""
    rng = np.random.default_rng(3)
    strat = REGISTRY.instantiate(subseq, type="subseq")
    for n in (1, 2, 17, 400):
        sis = rng.permutation(n).astype(np.int64)
        dpi, b = strat.decompose(sis)
        assert dpi.min() >= 0 and dpi.max() < b.size
        for j in range(b.size):
            positions = sis[dpi == j]
            d = np.diff(positions)
            if b[j] == 0:
                assert (d > 0).all(), (subseq, j)
            else:
                assert (d < 0).all(), (subseq, j)
        # recovery: D = values at sis ranks
        vals = np.sort(rng.integers(0, 1000, n, dtype=np.int64))
        dsi = np.empty_like(dpi)
        dsi[sis] = dpi
        D = np.empty(n, np.int64)
        D[sis] = np.arange(n)  # rank of each position
        expect = vals[D]
        got = recover_D(dpi, dsi, b, vals)
        np.testing.assert_array_equal(got, expect)


def test_esp_default_uses_sorted_range_fit():
    """The default resolves to sorted(d_coding=range_fit) — best ratio
    across the 1 MiB suite corpora (wins only show beyond the sorted
    format's fixed ~32-byte unary lhs prefix, so compare configs by
    identity here, sizes in docs/BENCHMARKS.md)."""
    from tudocomp_tpu import cli

    data = (b"compressible compressible text " * 800)[:16000]
    blob = cli.compress("esp", data, raw=True)
    explicit = cli.compress(
        "esp(slp_coder=sorted(d_coding=range_fit))", data, raw=True
    )
    assert blob == explicit
    assert cli.decompress(blob, "esp") == data


def test_ipd_dictionaries_identical_grammar():
    """All three pair dictionaries (library dict, hash-framework map,
    bit-width-adaptive IntVector table) drive the host ESP rounds to
    the identical grammar, which matches the native kernel's."""
    import numpy as np

    from tudocomp_tpu import native
    from tudocomp_tpu.compressors.esp import (
        DynamicSizeIPD, HashMapIPD, StdUnorderedMapIPD, esp_rounds,
    )
    from tudocomp_tpu.registry import create_algo

    rng = np.random.default_rng(21)
    pieces = [
        b"abcabcabcabcabc",
        rng.choice(np.frombuffer(b"acgt", np.uint8), 600)
        .astype(np.uint8).tobytes(),
        bytes(rng.integers(0, 256, 400, dtype=np.uint8)),
        b"zzzzzzzzzzzz",
    ]
    for data in pieces:
        base = esp_rounds(data)  # native when available
        results = []
        try:
            native._lib = None
            native._tried = True
            for cls in (StdUnorderedMapIPD, HashMapIPD, DynamicSizeIPD):
                results.append(
                    esp_rounds(data, ipd=create_algo(cls))
                )
        finally:
            native._tried = False
            native._lib = None
        for rules, root, empty in results:
            assert np.array_equal(rules, base[0])
            assert root == base[1]
