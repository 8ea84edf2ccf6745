"""Golden wire-format tests (reference ``assert_eq_binary`` analog,
``test/test/util.hpp:261-364``): the exact compressed bit streams of
known inputs are pinned, so format changes cannot slip through silently.
If a change to a format is *intentional*, update the constants here and
say so in the commit."""

import pytest

from tudocomp_tpu import cli

GOLDEN = [
    ("rle", b"aaabbbbc",
     "61610162620263"),
    ("encode(coder=huff)", b"abracadabra",
     "8180800202b0b131b239439a8700"),
    ("encode(coder=gamma)", b"ABC",
     "01820308061d"),
    ("lzss(coder=bit)", b"abcabcabcabc",
     "30988c7d23"),
    ("lzss_lcp(coder=bit)", b"banana banana",
     "0000000e363ec4c2dc25200e8001"),
    ("lz78(coder=bit)", b"abababab",
     "3098962d843101"),
    ("lzw(coder=bit)", b"abababab",
     "3098a0102315"),
    ("bwt", b"banana",
     "616e6e62006161"),
    ("mtf", b"banana",
     "62626e010101"),
    ("repair(coder=bit)", b"abab abab",
     "000000023098aa882d"),
    # default = sorted(d_coding=range_fit) since round 2; the long zero
    # run is the reference sorted-format's unary lhs deltas (first lhs
    # ~257 -> 257 zero bits), negligible beyond toy inputs
    ("esp", b"abcabcabc",
     "2607030000000000000000000000004000000000000000000000000000000000"
     "000000540131004c60280df000"),
    ("esp(slp_coder=plain)", b"abcabcabc",
     "26066131400c70180c0a0207"),
    ("lcpcomp(coder=huff)", b"banana banana banana",
     "8180018102b0b13700100000000ab5a81d833ba006"),
]


@pytest.mark.parametrize("algo,data,expected", GOLDEN,
                         ids=[g[0] for g in GOLDEN])
def test_golden_bits(algo, data, expected):
    compressed = cli.compress(algo, data, raw=True)
    assert compressed.hex() == expected, (
        f"{algo}: wire format changed!\n"
        f"  expected {expected}\n  got      {compressed.hex()}"
    )
    assert cli.decompress(compressed, raw_algo=algo) == data
