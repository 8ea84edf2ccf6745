"""Device pipeline tests: RLE kernel vs host spec, flagship roundtrip."""

import functools

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from tudocomp_tpu.compressors.rle import rle_decode, rle_encode
from tudocomp_tpu.coders.huffman import HuffmanTable
from tudocomp_tpu.models.blockcodec import BlockCodec
from tudocomp_tpu.ops.rle_jax import bytes_from_words, rle_encode_device

from tests.helpers import roundtrip_corpus

CORPUS = roundtrip_corpus()


_CAP = 8192  # fixed shape -> one compilation for the whole corpus


@functools.partial(jax.jit, static_argnums=(2,))
def _rle_dev_jit(padded, length, offset):
    words, n_bytes = rle_encode_device(padded, length, offset)
    return bytes_from_words(words, _CAP + _CAP // 2 + 8), n_bytes


def _device_rle(data: bytes, offset: int = 0) -> np.ndarray:
    assert len(data) <= _CAP
    padded = np.zeros(_CAP, np.uint8)
    padded[: len(data)] = np.frombuffer(data, np.uint8)
    out_cap, n_bytes = _rle_dev_jit(jnp.asarray(padded), len(data), offset)
    return np.asarray(out_cap)[: int(n_bytes)]


@pytest.mark.parametrize("offset", [0, 1])
def test_device_rle_matches_host(offset):
    cases = [
        b"", b"a", b"aaa", b"abc", b"aabbccdd", b"a" * 300,
        b"ab" * 50 + b"c" * 1000 + bytes(range(256)) * 3,
    ] + [c for c in CORPUS if c]
    for data in cases:
        if not data:
            continue
        host = rle_encode(np.frombuffer(data, np.uint8), offset)
        dev = _device_rle(data, offset)
        assert dev.tobytes() == host.tobytes(), data[:40]


def test_device_rle_padding_isolated():
    # padding beyond `length` must not merge with a trailing run
    raw = np.zeros(64, np.uint8)
    raw[:10] = ord("x")
    words, n_bytes = rle_encode_device(jnp.asarray(raw), 10, 0)
    dev = np.asarray(bytes_from_words(words, int(n_bytes)))
    host = rle_encode(np.full(10, ord("x"), np.uint8), 0)
    assert dev.tobytes() == host.tobytes()
    assert rle_decode(dev) == b"x" * 10


def test_huffman_fast_decode_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.choice(
        np.frombuffer(b"abcde\xff\x00", np.uint8), size=5000,
        p=[0.4, 0.2, 0.15, 0.1, 0.05, 0.05, 0.05],
    )
    counts = np.bincount(data, minlength=256)
    table = HuffmanTable.from_counts(counts, max_len=31)
    from tudocomp_tpu.io.bitio import BitWriter

    w = BitWriter()
    w.write_tokens(table.sym_code[data], table.sym_len[data].astype(np.int64))
    # raw payload bytes without final-byte convention
    from tudocomp_tpu.io.bitio import pack_tokens

    payload, total_bits = pack_tokens(
        table.sym_code[data].astype(np.uint64),
        table.sym_len[data].astype(np.int64),
    )
    got = table.fast_decode(payload, data.size)
    np.testing.assert_array_equal(got, data)


def test_blockcodec_roundtrip():
    codec = BlockCodec()
    rng = np.random.default_rng(1)
    cases = [c for c in CORPUS] + [
        rng.integers(0, 4, 5 * 2048 + 17, dtype=np.uint8).tobytes(),
        b"\x00" * (2 * 4096),
        bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
        b"ab" * 3000,  # run-of-2-heavy: rle_raw escape path
    ]
    for data in cases:
        comp = codec.compress(data)
        assert codec.decompress(comp) == data, data[:40]


def test_batchsplit_invariant_with_overpadded_bucket(monkeypatch):
    """On the TPU backend every batch pads to the ONE full compiled
    shape — _bucket() can exceed batch_lanes. compress() must trim each
    batch's outputs to its real lane count before concatenating, or the
    first batch's pad rows become (empty) frames for every later
    segment. Mimic the TPU bucket rule on CPU by over-padding."""
    import tudocomp_tpu.models.blockcodec as bc

    monkeypatch.setattr(bc, "_bucket", lambda n, full=0: 128)
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 64, 100 * 2048, dtype=np.uint8))
    split = BlockCodec(batch_lanes=32).compress(data)
    monkeypatch.undo()
    single = BlockCodec().compress(data)
    assert split == single
    assert BlockCodec().decompress(split) == data


def test_blockcodec_device_decode_matches_host():
    """The TPU lockstep decoder (pure XLA; runs on any backend) must be
    bit-identical to the host/native specification decoder."""
    codec = BlockCodec()
    rng = np.random.default_rng(5)
    cases = [c for c in CORPUS if c] + [
        b"a" * 5000,
        bytes(rng.integers(0, 4, 50000, dtype=np.uint8)),
        bytes(
            rng.choice(
                np.frombuffer(b"abc \n", np.uint8), 30000,
                p=[0.4, 0.3, 0.1, 0.15, 0.05],
            )
        ),
        b"\x00" * 10000 + b"ab" * 3000,
        bytes(rng.integers(0, 256, 10000, dtype=np.uint8)),
    ]
    for data in cases:
        comp = codec.compress(data)
        assert codec.decompress(comp) == data, ("host", data[:40])
        assert codec.decompress_device(comp) == data, ("dev", data[:40])


def test_blockcodec_compresses():
    codec = BlockCodec()
    data = (b"the quick brown fox " * 400)[: 1 << 13]
    comp = codec.compress(data)
    assert len(comp) < len(data) // 2
    assert codec.decompress(comp) == data


def test_device_rle_long_run_continuation_pieces():
    # runs > RUN_CAP=8192 use single-char continuation pieces; host,
    # device, and the (reference-semantics) decoder must all agree
    cap = 1 << 15

    @functools.partial(jax.jit, static_argnums=(2,))
    def dev(padded, length, offset):
        words, n_bytes = rle_encode_device(padded, length, offset)
        return bytes_from_words(words, cap + cap // 2 + 8), n_bytes

    for offset in (0, 3):
        for data in [
            b"a" * 8193,
            b"a" * 20000 + b"b" + b"a" * 9000,
            b"q" * 8192 + b"q",  # continuation piece of length 1
            b"r" * 16384,
        ]:
            padded = np.zeros(cap, np.uint8)
            padded[: len(data)] = np.frombuffer(data, np.uint8)
            out, n_bytes = dev(jnp.asarray(padded), len(data), offset)
            got = np.asarray(out)[: int(n_bytes)]
            host = rle_encode(np.frombuffer(data, np.uint8), offset)
            assert got.tobytes() == host.tobytes(), (offset, len(data))
            assert rle_decode(host, offset) == data


def test_native_rle_decode_rejects_malformed():
    # regression for ADVICE r1: run < offset must not underflow
    from tudocomp_tpu import native

    if not native.available():
        pytest.skip("native runtime unavailable")
    # vbyte(1) with offset 5 -> run would be negative
    bad = np.frombuffer(b"aa\x01", np.uint8)
    with pytest.raises(ValueError):
        native.rle_decode(bad, 5)
    # overlong vbyte continuation chain must be rejected, not shift UB
    bad2 = np.frombuffer(b"aa" + b"\xff" * 12 + b"\x01", np.uint8)
    with pytest.raises(ValueError):
        native.rle_decode(bad2, 0)


def test_huffman_pack_pairing_bit_identical(monkeypatch):
    """TDC_PACK_PAIR=1 (paired placement) must produce the exact words,
    bit counts, and container bytes of the unpaired kernel."""
    from tudocomp_tpu.ops.segpack_pallas import (
        CAP_BYTES, huffman_pack_segments,
    )

    rng = np.random.default_rng(7)
    nc = 16
    # mixed-entropy rows + per-segment counts covering odd/even tails
    data = rng.choice(
        np.frombuffer(b"aabbbcdefgh\x00\xff", np.uint8),
        size=(nc, CAP_BYTES),
    ).astype(np.uint8)
    counts = rng.integers(0, CAP_BYTES + 1, nc).astype(np.int32)
    counts[0], counts[1], counts[2] = 0, 1, CAP_BYTES
    pos = np.arange(CAP_BYTES)[None, :]
    data = np.where(pos < counts[:, None], data, 0).astype(np.uint8)
    hist = np.bincount(data[pos < counts[:, None]], minlength=256)
    table = HuffmanTable.from_counts(np.maximum(hist, 1), max_len=16)

    outs = {}
    for flag in ("0", "1", "quad"):
        monkeypatch.setenv("TDC_PACK_PAIR", "1" if flag == "1" else "0")
        monkeypatch.setenv("TDC_PACK_QUAD", "1" if flag == "quad" else "0")
        words, bits = huffman_pack_segments(
            jnp.asarray(data), jnp.asarray(counts),
            jnp.asarray(table.sym_code.astype(np.uint32)),
            jnp.asarray(table.sym_len.astype(np.int32)),
        )
        outs[flag] = (np.asarray(words), np.asarray(bits))
    for flag in ("1", "quad"):
        np.testing.assert_array_equal(outs["0"][1], outs[flag][1])
        np.testing.assert_array_equal(outs["0"][0], outs[flag][0])

    monkeypatch.setenv("TDC_PACK_PAIR", "1")
    codec = BlockCodec()
    sample = b"".join(CORPUS)[: 1 << 16]
    comp = codec.compress(sample)
    assert codec.decompress(comp) == sample
    monkeypatch.setenv("TDC_PACK_PAIR", "0")
    assert BlockCodec().compress(sample) == comp


def test_rle_pack_pairing_bit_identical(monkeypatch):
    """With TDC_PACK_PAIR=1 the RLE kernel splits run tokens across the
    run's last two positions; words and byte counts must be identical."""
    from tudocomp_tpu.ops.segpack_pallas import (
        SEG_BYTES, rle_pack_segments,
    )

    rng = np.random.default_rng(11)
    nc = 16
    rows = []
    for i in range(nc):
        if i % 4 == 0:  # long runs incl. 2-byte vbytes (len > 129)
            rows.append(np.repeat(
                rng.integers(0, 256, 8, dtype=np.uint8), 256))
        elif i % 4 == 1:  # no runs
            rows.append(np.arange(SEG_BYTES, dtype=np.uint8))
        elif i % 4 == 2:  # run-of-2 heavy
            rows.append(np.repeat(
                rng.integers(0, 256, SEG_BYTES // 2, dtype=np.uint8), 2))
        else:  # mixed text-like
            rows.append(rng.choice(
                np.frombuffer(b"aab\ncd  eee", np.uint8), size=SEG_BYTES))
    data = np.stack([r[:SEG_BYTES] for r in rows]).astype(np.uint8)
    lens = rng.integers(0, SEG_BYTES + 1, nc).astype(np.int32)
    lens[0], lens[1] = SEG_BYTES, 1

    for offset in (0, 1, 125):
        outs = {}
        for flag in ("0", "1", "quad"):
            monkeypatch.setenv("TDC_PACK_PAIR", "1" if flag == "1" else "0")
            monkeypatch.setenv("TDC_PACK_QUAD", "1" if flag == "quad" else "0")
            words, nbytes = rle_pack_segments(
                jnp.asarray(data), jnp.asarray(lens), offset=offset
            )
            outs[flag] = (np.asarray(words), np.asarray(nbytes))
        for flag in ("1", "quad"):
            np.testing.assert_array_equal(outs["0"][1], outs[flag][1])
            np.testing.assert_array_equal(outs["0"][0], outs[flag][0])


def test_min_code_len_4_schedule(monkeypatch):
    """TDC_MIN_CODE_LEN=4 builds a table whose shortest code is 4 bits;
    decoder_tables then selects the 8-slot schedule and both device
    decoders roundtrip with it."""
    from tudocomp_tpu.ops.hufdec_jax import decoder_tables

    monkeypatch.setenv("TDC_MIN_CODE_LEN", "4")
    codec = BlockCodec()
    rng = np.random.default_rng(9)
    data = (
        b"".join(CORPUS)[: 3 * 2048 + 100]
        + np.repeat(rng.integers(0, 200, 40, dtype=np.uint8), 150).tobytes()
        + bytes(rng.integers(0, 256, 2048, dtype=np.uint8))
    )
    comp = codec.compress(data)
    from tudocomp_tpu.ops.hufdec_jax import slots_for

    tbl = codec._parse(comp)[0]
    mn = int(tbl.lengths.min())
    assert mn >= 4
    d = decoder_tables(tbl)["d"]
    assert d == slots_for(mn) and d <= 8
    assert codec.decompress(comp) == data  # host/native path
    for kernel in ("scan", "pallas"):
        monkeypatch.setenv("TDC_DEC_KERNEL", kernel)
        assert codec.decompress_device(comp) == data, kernel


def test_pack_mode_byte_matches_w4(monkeypatch):
    """TDC_PACK_MODE=byte (the cross-checked spec kernels) must produce
    the exact stage outputs and container bytes of the w4 default —
    w4 became the default in round 3 and the byte path would otherwise
    go unexercised (ADVICE r3)."""
    from tudocomp_tpu.models.blockcodec import (
        SEG, huff_stage, rle_stage,
    )

    rng = np.random.default_rng(13)
    nc = 16
    rows = rng.choice(
        np.frombuffer(b"aaabbcde\nf \x00\xffgg", np.uint8),
        size=(nc, SEG),
    ).astype(np.uint8)
    rows[3] = np.repeat(rng.integers(0, 256, SEG // 128,
                                     dtype=np.uint8), 128)
    lens = rng.integers(0, SEG + 1, nc).astype(np.int32)
    lens[0], lens[1], lens[2] = 0, 1, SEG
    rows = np.where(np.arange(SEG)[None, :] < lens[:, None],
                    rows, 0).astype(np.uint8)
    hist = np.bincount(
        rows[np.arange(SEG)[None, :] < lens[:, None]], minlength=256)
    table = HuffmanTable.from_counts(np.maximum(hist, 1), max_len=16)

    outs = {}
    sample = b"".join(CORPUS)[: 1 << 16]
    for mode in ("w4", "byte"):
        monkeypatch.setenv("TDC_PACK_MODE", mode)
        rle_stage.clear_cache()  # _w4_mode() is read at trace time
        huff_stage.clear_cache()
        sel, counts, rle_raw, h = rle_stage(
            jnp.asarray(rows), jnp.asarray(lens), offset=0, sample=False
        )
        words, bits, huff_raw = huff_stage(
            sel, counts,
            jnp.asarray(table.sym_code.astype(np.uint32)),
            jnp.asarray(table.sym_len.astype(np.uint32)),
        )
        outs[mode] = tuple(
            np.asarray(x) for x in
            (sel, counts, rle_raw, h, words, bits, huff_raw)
        )
        comp = BlockCodec().compress(sample)
        assert BlockCodec().decompress(comp) == sample, mode
        outs[mode + "_container"] = comp
    for a, b in zip(outs["w4"], outs["byte"]):
        np.testing.assert_array_equal(a, b)
    assert outs["w4_container"] == outs["byte_container"]
    monkeypatch.delenv("TDC_PACK_MODE", raising=False)
    rle_stage.clear_cache()
    huff_stage.clear_cache()
