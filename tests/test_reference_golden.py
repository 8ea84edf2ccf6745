"""Reference-format goldens: expected bytes derived BY HAND from the
reference sources (file:line cited per case).

The reference binary cannot be built in this environment — its cmake
hard-depends on ExternalProject git downloads (sdsl-lite, glog, gtest;
``cmakemodules/DownloadSDSL.cmake``) and there is no network egress. So
where the repo claims reference wire-format compatibility, this file
pins *independently hand-derived* expected bytes: each case's comment
walks the reference algorithm step by step so the derivation can be
checked against the reference source without running it. Both
directions are tested — our encoder must produce the reference bytes,
and our decoder must consume them.

(Distinct from test_golden.py, which pins self-produced streams to
detect accidental format drift.)
"""

from __future__ import annotations

from tudocomp_tpu.compressors import REGISTRY  # noqa: F401  (populates)
from tudocomp_tpu.io.restrictions import escape, unescape
from tudocomp_tpu.registry import REGISTRY as REG


def _comp(algostring: str):
    return REG.instantiate(algostring)


# ---------------------------------------------------------------------------
# vbyte — reference util/vbyte.hpp:28-38: little-endian 7-bit groups,
# high bit set on every byte except the last.
# ---------------------------------------------------------------------------

def test_vbyte_reference_bytes():
    from tudocomp_tpu.utils.vbyte import read_vbyte, write_vbyte

    #   0 -> one byte 0x00 (loop body runs once, v==0 after shift)
    # 127 -> 0x7f (fits 7 bits, no continuation)
    # 128 -> low7=0 cont -> 0x80, then v=1 -> 0x01
    # 300 -> 300=0b100101100: low7=0101100=0x2c|0x80=0xac, v=2 -> 0x02
    cases = {0: b"\x00", 127: b"\x7f", 128: b"\x80\x01", 300: b"\xac\x02"}
    for v, expect in cases.items():
        buf = bytearray()
        write_vbyte(buf, v)
        assert bytes(buf) == expect, v
        got, used = read_vbyte(expect, 0)
        assert (got, used) == (v, len(expect))


# ---------------------------------------------------------------------------
# rle — reference RunLengthEncoder.hpp:16-31 (rle_encode): emit first
# char; thereafter a char equal to its predecessor is doubled and
# followed by vbyte(extra_repeats + offset), where extra_repeats counts
# occurrences beyond the second.
# ---------------------------------------------------------------------------

def test_rle_reference_bytes():
    c = _comp("rle")
    # "abbbbc": emit 'a'; get 'b' != 'a' -> emit 'b'; get 'b' == prev ->
    # peek-consume two more 'b's (run=2), emit 'b' + vbyte(2)=0x02;
    # get 'c' -> emit 'c'.  => 61 62 62 02 63
    assert c.compress(b"abbbbc") == b"abb\x02c"
    assert c.decompress(b"abb\x02c") == b"abbbbc"
    # "aa": emit 'a'; get 'a' == prev, no further chars (run=0) ->
    # emit 'a' + vbyte(0)=0x00.  => 61 61 00
    assert c.compress(b"aa") == b"aa\x00"
    assert c.decompress(b"aa\x00") == b"aa"
    # no run: passthrough
    assert c.compress(b"abc") == b"abc"
    # offset option shifts the stored count: run+offset
    # (RunLengthEncoder.hpp:26 write_vbyte(os, run+offset))
    c1 = _comp("rle(offset=1)")
    assert c1.compress(b"abbbbc") == b"abb\x03c"
    assert c1.decompress(b"abb\x03c") == b"abbbbc"


# ---------------------------------------------------------------------------
# mtf — reference MTFCompressor.hpp:17-56: 256-entry iota table, each
# input byte is replaced by its current table index, which is then
# moved to the front.
# ---------------------------------------------------------------------------

def test_mtf_reference_bytes():
    c = _comp("mtf")
    # "abab": 'a'=97 at index 97 -> 0x61, table=[97,0..96,98..];
    # 'b'=98 still at index 98 -> 0x62, table=[98,97,0..96,99..];
    # 'a' now at index 1 -> 0x01; 'b' now at index 1 -> 0x01.
    assert c.compress(b"abab") == b"\x61\x62\x01\x01"
    assert c.decompress(b"\x61\x62\x01\x01") == b"abab"
    # first byte always encodes to itself (iota table)
    assert c.compress(b"\x00") == b"\x00"
    assert c.compress(b"zz") == b"z\x00"


# ---------------------------------------------------------------------------
# bwt — reference BWTCompressor.hpp:29-47 emits bwt::bwt(text, sa, i)
# for every i; ds/bwt.hpp:20-22: BWT[i] = sa[i]==0 ? text[n-1]
# : text[sa[i]-1]. The input view must be 0-terminated (the CLI's
# escaping layer guarantees it; DCHECK at BWTCompressor.hpp:33).
# ---------------------------------------------------------------------------

def test_bwt_reference_bytes():
    c = _comp("bwt")
    # "banana\0" (n=7). Sorted suffixes / SA:
    #   6 "\0"        -> text[5] = 'a'
    #   5 "a\0"       -> text[4] = 'n'
    #   3 "ana\0"     -> text[2] = 'n'
    #   1 "anana\0"   -> text[0] = 'b'
    #   0 "banana\0"  -> sa[i]==0 -> text[6] = '\0'
    #   4 "na\0"      -> text[3] = 'a'
    #   2 "nana\0"    -> text[1] = 'a'
    # => BWT = "annb\0aa"
    assert c.compress(b"banana\x00") == b"annb\x00aa"
    assert c.decompress(b"annb\x00aa") == b"banana\x00"

    # same through the restriction pipeline the CLI applies
    restr = REG.restrictions_of(c.env)
    prepared = escape(b"banana", restr)
    assert prepared == b"banana\x00"
    assert unescape(c.decompress(c.compress(prepared)), restr) == b"banana"


# ---------------------------------------------------------------------------
# chain semantics — reference ChainCompressor applies stages
# left-to-right on compress, right-to-left on decompress; byte output
# of each stage feeds the next verbatim.
# ---------------------------------------------------------------------------

def test_chain_rle_mtf_reference_bytes():
    c = _comp("chain(mtf, rle)")
    # mtf("aaab") = 61 00 00 62; rle of that = 61 00 00 00(vbyte run 0) 62
    assert c.compress(b"aaab") == b"a\x00\x00\x00b"
    assert c.decompress(b"a\x00\x00\x00b") == b"aaab"
