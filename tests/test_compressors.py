"""Compressor roundtrips over the adversarial corpus, per coder."""

import pytest

from helpers import assert_roundtrip_batch, generator_corpus, roundtrip

from tudocomp_tpu.compressors import REGISTRY  # populates registry


UNIVERSAL = ["ascii", "bit", "gamma", "delta", "ternary"]
NON_CONSUMING = UNIVERSAL + ["huff"]
ALL = NON_CONSUMING + ["arithmetic", "sle"]


def test_noop():
    assert_roundtrip_batch("noop")


@pytest.mark.parametrize("coder", ALL)
def test_encode(coder):
    assert_roundtrip_batch(f"encode({coder})")


def test_rle():
    assert_roundtrip_batch("rle")
    assert_roundtrip_batch("rle(offset=1)")


def test_rle_known_bytes():
    comp = REGISTRY.instantiate("rle")
    assert comp.compress(b"aaaa") == b"aa\x02"
    assert comp.compress(b"aab") == b"aa\x00b"
    assert comp.compress(b"abc") == b"abc"
    assert comp.decompress(b"aa\x02") == b"aaaa"


def test_mtf():
    assert_roundtrip_batch("mtf")


def test_mtf_known_bytes():
    comp = REGISTRY.instantiate("mtf")
    # 'a'=97: first output 97, second 'a' is index 0
    assert comp.compress(b"aa") == bytes([97, 0])
    assert comp.compress(b"ab") == bytes([97, 98])
    assert comp.compress(b"aba") == bytes([97, 98, 1])


def test_bwt():
    assert_roundtrip_batch("bwt")


def test_bwt_known():
    comp = REGISTRY.instantiate("bwt")
    # classic example: banana + sentinel
    assert comp.compress(b"banana\x00") == b"annb\x00aa"
    assert comp.decompress(b"annb\x00aa") == b"banana\x00"


@pytest.mark.parametrize("coder", UNIVERSAL)
def test_lzss_window(coder):
    # the reference registers lzss with universal coders only
    # (registry_config.py:236)
    assert_roundtrip_batch(f"lzss({coder})")


def test_lzss_options():
    assert_roundtrip_batch("lzss(bit, window=4, threshold=2)")
    assert_roundtrip_batch("lzss(bit, window=64)")


@pytest.mark.parametrize("coder", NON_CONSUMING)
def test_lzss_lcp(coder):
    # non-consuming coders only, like the reference
    # (registry_config.py:235)
    assert_roundtrip_batch(f"lzss_lcp({coder})")


@pytest.mark.parametrize("coder", ["bit", "gamma", "ternary"])
def test_lz78(coder):
    # universal coders only, like the reference (registry_config.py:232)
    assert_roundtrip_batch(f"lz78(coder={coder})")


def test_lz78_tries_same_output():
    data = b"abcabcabcabcaabbccababab" * 5
    outs = set()
    for trie in ("ternary", "binary", "hash", "cedar", "compact_sparse_hash"):
        outs.add(roundtrip(f"lz78(coder=bit, lz78trie={trie})", data))
    assert len(outs) == 1  # canonical parse regardless of trie


def test_lz78_dict_reset():
    assert_roundtrip_batch("lz78(coder=bit, dict_size=8)")


@pytest.mark.parametrize("coder", ["bit", "gamma", "ternary"])
def test_lzw(coder):
    assert_roundtrip_batch(f"lzw(coder={coder})")


def test_lzw_dict_reset():
    assert_roundtrip_batch("lzw(coder=bit, dict_size=260)")


def test_chain():
    assert_roundtrip_batch("chain(rle, encode(huff))")
    assert_roundtrip_batch("chain(bwt, chain(rle, chain(mtf, encode(huff))))")


def test_generators_roundtrip():
    for data in generator_corpus(10):
        for algo in ("encode(huff)", "lzss(bit)", "lz78(coder=bit)", "bwt"):
            roundtrip(algo, data)


def test_compression_actually_compresses():
    data = b"abcabcabcabc" * 200
    for algo in ("lzss(bit)", "lz78(coder=bit)", "lzw(coder=bit)",
                 "encode(huff)", "lzss_lcp(bit)"):
        comp = roundtrip(algo, data)
        assert len(comp) < len(data), algo


def test_repair_bulk_and_native_decode_identity():
    """The vectorized repair stream encoder is bit-identical to the
    scalar loop, and the native decoder matches the python decoder."""
    import numpy as np

    from tudocomp_tpu import native
    from tudocomp_tpu.compressors.repair import RePairCompressor
    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(2)
    pieces = [
        b"abcabcabc",
        rng.choice(np.frombuffer(b"ab ", np.uint8), 6000)
        .astype(np.uint8).tobytes(),
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
        b"",
    ]
    orig = RePairCompressor.__dict__["_encode_bulk"]
    for data in pieces:
        for spec in ("repair(coder=huff)", "repair(coder=bit)",
                     "repair(coder=huff,max_rules=7)"):
            enc_bulk = REGISTRY.instantiate(spec).compress(data)
            try:
                RePairCompressor._encode_bulk = staticmethod(
                    lambda *a, **k: False
                )
                enc_scalar = REGISTRY.instantiate(spec).compress(data)
            finally:
                RePairCompressor._encode_bulk = orig
            assert enc_bulk == enc_scalar, (spec, len(data))
            out_nat = REGISTRY.instantiate(spec).decompress(enc_bulk)
            try:
                native._lib = None
                native._tried = True
                out_py = REGISTRY.instantiate(spec).decompress(enc_bulk)
            finally:
                native._tried = False
                native._lib = None
            assert out_nat == out_py == data, (spec, len(data))


def test_flatten_reaches_sequential_fixed_point():
    """The vectorized FactorBuffer.flatten must land on the same fixed
    point as the sequential rewrite even for long 'blocked' chains
    where a containment failure at an intermediate factor prevents
    pointer doubling (each round advances only one chain level)."""
    import numpy as np

    from tudocomp_tpu.compressors.lzss import FactorBuffer

    # chain of k factors: factor i at pos p_i with src inside factor
    # i-1 at offset 2 and len shrinking by 1 -> full containment holds
    # only one level at a time for the tiny trailing factor
    k = 200
    base = 10
    pos, src, lng = [], [], []
    cur = base
    for i in range(k):
        ln = k + 4 - i  # shrinking lengths
        pos.append(cur)
        lng.append(ln)
        src.append(0 if i == 0 else pos[i - 1] + 2)
        cur += ln + 1
    # tiny fully-contained factor pointing at the chain's deep end
    pos.append(cur)
    lng.append(2)
    src.append(pos[-2] + 1)
    fb = FactorBuffer()
    fb.extend_arrays(
        np.array(pos, np.int64), np.array(src, np.int64),
        np.array(lng, np.int64),
    )
    fb.sort()
    fb.flatten()
    got_src = fb.arrays()[1].copy()

    # sequential reference (the pre-vectorization algorithm)
    p = np.array(pos, np.int64)
    l = np.array(lng, np.int64)
    end = int(p[-1] + l[-1])
    fmap = np.zeros(end, np.int64)
    for i in range(p.size):
        fmap[p[i] : p[i] + l[i]] = i + 1
    ref_src = list(src)
    for fi in range(p.size):
        s = ref_src[fi]
        while s < end and fmap[s]:
            j = fmap[s] - 1
            d = s - p[j]
            if d + l[fi] <= l[j]:
                s = ref_src[j] + d
            else:
                break
        ref_src[fi] = s
    assert got_src.tolist() == ref_src, (
        got_src[-3:], ref_src[-3:]
    )


def test_hashmap_double_prober_non_pow2_terminates():
    """Double hashing on prime/direct table sizes must not loop
    forever when the stride hits a cycle (HashMap falls back to a
    linear sweep after m probes)."""
    from tudocomp_tpu.registry import create_algo
    from tudocomp_tpu.utils.hash import (
        DoubleHashingProber, HashMap, NoopHasher, SizeManagerPrime,
    )

    m = HashMap(
        hasher=create_algo(NoopHasher),
        manager=create_algo(SizeManagerPrime),
        prober=create_algo(DoubleHashingProber),
    )
    for k in range(40):  # collides heavily mod 17 before growth
        m.insert(k * 17 + 15, k)
    for k in range(40):
        assert m.get(k * 17 + 15) == k


def test_arithmetic_native_matches_python():
    """The native arithmetic block-code kernels emit/consume the exact
    Python stream (flush-and-restart boundaries included)."""
    import numpy as np

    from tudocomp_tpu import native
    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(13)
    cases = [
        b"abcd" * 300,
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
        bytes(rng.integers(65, 68, 2000, dtype=np.uint8)),
        b"z", b"", b"\x00" * 64,
    ]
    for data in cases:
        enc_nat = REGISTRY.instantiate(
            "encode(coder=arithmetic)"
        ).compress(data)
        try:
            native._lib = None
            native._tried = True
            enc_py = REGISTRY.instantiate(
                "encode(coder=arithmetic)"
            ).compress(data)
            dec_py = REGISTRY.instantiate(
                "encode(coder=arithmetic)"
            ).decompress(enc_nat)
        finally:
            native._tried = False
            native._lib = None
        assert enc_nat == enc_py, len(data)
        assert dec_py == data, len(data)
        got = REGISTRY.instantiate(
            "encode(coder=arithmetic)"
        ).decompress(enc_nat)
        assert got == data, len(data)


def test_vlc_remaining_literals_match_python():
    """The native whole-tail VLC walker (gamma/delta/ternary) and the
    fixed-8 bulk read (bit/ascii) decode exactly what the per-symbol
    Python loop does."""
    import numpy as np

    from tudocomp_tpu import native
    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(21)
    cases = [
        b"banana band bandana " * 40,
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
        b"", b"\x00\xff" * 50,
    ]
    for coder in ("bit", "ascii", "gamma", "delta", "ternary"):
        for data in cases:
            enc = REGISTRY.instantiate(
                f"encode(coder={coder})"
            ).compress(data)
            fast = REGISTRY.instantiate(
                f"encode(coder={coder})"
            ).decompress(enc)
            try:
                native._lib = None
                native._tried = True
                slow = REGISTRY.instantiate(
                    f"encode(coder={coder})"
                ).decompress(enc)
            finally:
                native._tried = False
                native._lib = None
            assert fast == slow == data, (coder, len(data))


def test_lzss_window_native_matches_python():
    """Native sliding-window factorize+encode and the stream decoder
    are bit-identical to the Python paths across coders/windows."""
    import numpy as np

    from tudocomp_tpu import native
    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(33)
    cases = [
        b"tobeornottobe" * 60,
        bytes(rng.integers(0, 256, 2000, dtype=np.uint8)),
        b"", b"q", b"ab" * 400,
    ]
    for coder in ("bit", "gamma", "ascii"):
        for w, t in ((16, 3), (3, 2)):
            for data in cases:
                spec = f"lzss(coder={coder},window={w},threshold={t})"
                enc_nat = REGISTRY.instantiate(spec).compress(data)
                try:
                    native._lib = None
                    native._tried = True
                    enc_py = REGISTRY.instantiate(spec).compress(data)
                    dec_py = REGISTRY.instantiate(spec).decompress(
                        enc_nat
                    )
                finally:
                    native._tried = False
                    native._lib = None
                assert enc_nat == enc_py, (coder, w, len(data))
                assert dec_py == data, (coder, w, len(data))
                assert REGISTRY.instantiate(spec).decompress(
                    enc_nat
                ) == data


def test_lz78_lzw_vlc_stream_decode():
    """The native lz78/lzw whole-stream decoders (any code kind, dict
    resets included) equal the Python replay."""
    import numpy as np

    from tudocomp_tpu import native
    from tudocomp_tpu.registry import REGISTRY

    data = b"abcabc abc abcd abcde " * 40 + bytes(range(64))
    for comp in ("lz78", "lzw"):
        for coder in ("gamma", "ternary", "ascii"):
            for ds in (0, 100):
                spec = (f"{comp}(coder={coder},lz78trie=ternary,"
                        f"dict_size={ds})")
                enc = REGISTRY.instantiate(spec).compress(data)
                fast = REGISTRY.instantiate(spec).decompress(enc)
                try:
                    native._lib = None
                    native._tried = True
                    slow = REGISTRY.instantiate(spec).decompress(enc)
                finally:
                    native._tried = False
                    native._lib = None
                assert fast == slow == data, (comp, coder, ds)


def test_lz78u_vlc_stream_decode():
    """The lz78u native decoder handles every universal ref/string
    coder combination (gamma/delta/ternary/ascii field codes) exactly
    like the Python replay."""
    import numpy as np

    from tudocomp_tpu import native
    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(44)
    cases = [
        b"banana banana bandana " * 30 + b"\x00",
        bytes(rng.integers(1, 200, 2500, dtype=np.uint8)) + b"\x00",
        b"\x01\x00",
    ]
    for comp in ("streaming", "buffering"):
        for rc in ("bit", "gamma", "ascii"):
            for sc in ("gamma", "ternary",
                       "huff" if comp == "buffering" else "delta"):
                spec = (f"lz78u(coder={rc},comp={comp}("
                        f"string_coder={sc}))")
                for data in cases:
                    enc = REGISTRY.instantiate(spec).compress(data)
                    fast = REGISTRY.instantiate(spec).decompress(enc)
                    try:
                        native._lib = None
                        native._tried = True
                        slow = REGISTRY.instantiate(spec).decompress(
                            enc
                        )
                    finally:
                        native._tried = False
                        native._lib = None
                    assert fast == slow == data, (comp, rc, sc)


def test_native_strategy_kernels_match_python():
    """Bulldozer / SimST / BST native kernels and repair VLC decode
    equal their Python walks byte-for-byte."""
    import numpy as np

    from tudocomp_tpu import native
    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(55)
    cases = [
        b"abcabc abcabc xyz " * 35 + b"\x00",
        bytes(rng.integers(97, 104, 3000, dtype=np.uint8)) + b"\x00",
        b"\x00", b"cccccccc\x00",
    ]
    specs = [
        "lcpcomp(coder=huff,comp=bulldozer)",
        "lfs_comp(computing_strat=sim_st)",
        "lfs_comp(computing_strat=bst)",
        "repair(coder=gamma)",
        "repair(coder=ascii)",
    ]
    for spec in specs:
        for data in cases:
            d = data if "lcpcomp" not in spec else data
            enc_nat = REGISTRY.instantiate(spec).compress(d)
            try:
                native._lib = None
                native._tried = True
                enc_py = REGISTRY.instantiate(spec).compress(d)
                dec_py = REGISTRY.instantiate(spec).decompress(enc_nat)
            finally:
                native._tried = False
                native._lib = None
            if "bulldozer" in spec:
                # bulldozer pins encode equality (same SA/LCP inputs);
                # lfs/repair grammars legally differ between the native
                # and Python builders - only decode equality is pinned
                assert enc_nat == enc_py, (spec, len(d))
            assert dec_py == d
            assert REGISTRY.instantiate(spec).decompress(enc_nat) == d
            assert REGISTRY.instantiate(spec).decompress(enc_py) == d
