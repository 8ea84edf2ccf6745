"""Roundtrip test harness.

Python re-design of the reference's ``test/test/util.hpp``: an adversarial
corpus (empty/1-char, runs, periodic strings, multi-script UTF-8, code-like
text), generator-driven inputs, and a roundtrip runner that applies a
compressor's declared input restrictions on the test side before comparing
``decompress(compress(x)) == x``.
"""

from __future__ import annotations

from tudocomp_tpu.compressors import REGISTRY
from tudocomp_tpu.generators import fibonacci, random_uniform, run_rich, thue_morse
from tudocomp_tpu.io.restrictions import escape, unescape


def roundtrip_corpus() -> list[bytes]:
    cases = [
        b"",
        b"0",
        b"a",
        b"\xff",
        b"aa",
        b"ab",
        b"abcdebcdeabc",
        b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        b"aaaaaaaaabaaaaaaaaabaaaaaaaaabaaaaaaaaab",
        b"abcabcabcabcabcabcabcabcabcabcabc",
        b"abababababababababababab",
        b"foobar" * 30,
        bytes(range(1, 256)),
        b"to be or not to be, that is the question",
        # multi-script UTF-8 (reference uses Thai/Chinese/Russian/Japanese/Greek)
        "ไม้จัตวาไม้จัตวาไม้".encode(),
        "压缩压缩把数据压缩一下".encode(),
        "сжатие данных сжатие".encode(),
        "データ圧縮データ圧縮".encode(),
        "συμπίεση δεδομένων".encode(),
        # code-like text
        b"int main() { return 0; } // int main() { return 1; }",
        random_uniform(256, seed=17, lo=0, hi=255),
        random_uniform(1000, seed=3),
    ]
    return cases


def generator_corpus(n: int = 12) -> list[bytes]:
    return [
        fibonacci(n),
        thue_morse(n),
        run_rich(n),
        random_uniform(2**n, seed=n),
    ]


def roundtrip(algostring: str, raw: bytes, registry=None) -> bytes:
    """compress -> decompress with declared restrictions applied outside."""
    reg = registry or REGISTRY
    comp = reg.instantiate(algostring)
    restr = reg.restrictions_of(comp.env)
    prepared = escape(raw, restr)
    compressed = comp.compress(prepared)
    decompressed = comp.decompress(compressed)
    result = unescape(decompressed, restr)
    assert result == raw, (
        f"{algostring}: roundtrip mismatch on {raw[:60]!r}... "
        f"(got {result[:60]!r}...)"
    )
    return compressed


def assert_roundtrip_batch(algostring: str, registry=None) -> None:
    for case in roundtrip_corpus():
        roundtrip(algostring, case, registry)
