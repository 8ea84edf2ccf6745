"""Wire-format tests: the bit stream spec (io/spec.md) pinned bit-by-bit.

Mirrors the coverage of the reference's bit I/O tests (incl. the EOF /
final-byte edge cases) plus vectorized-vs-scalar equality.
"""

import numpy as np
import pytest

from tudocomp_tpu.io.bitio import (
    BitReader,
    BitWriter,
    finalize_stream,
    pack_tokens,
    parse_stream,
    split_tokens,
)
from tudocomp_tpu.utils.bits import bits_for, bits_for_arr, bytes_for, idiv_ceil


def test_bits_for():
    assert bits_for(0) == 1
    assert bits_for(1) == 1
    assert bits_for(2) == 2
    assert bits_for(3) == 2
    assert bits_for(4) == 3
    assert bits_for(255) == 8
    assert bits_for(256) == 9
    assert idiv_ceil(7, 2) == 4
    assert idiv_ceil(8, 2) == 4
    assert bytes_for(0) == 1
    assert bytes_for(255) == 1
    assert bytes_for(256) == 2
    assert bytes_for(65536) == 3


def test_bits_for_arr():
    vals = np.array(
        [0, 1, 2, 3, 4, 255, 256, 2**31, 2**32 - 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    got = bits_for_arr(vals)
    want = [bits_for(int(v)) for v in vals]
    assert got.tolist() == want


# --- finalization rule, byte-exact ------------------------------------------


def test_empty_stream_is_single_zero_byte():
    w = BitWriter()
    assert w.getvalue() == b"\x00"
    r = BitReader(b"\x00")
    assert r.eof()
    assert r.total == 0


def test_final_byte_small_counts():
    # k payload bits, k <= 5: count OR'd into the low 3 bits of last byte
    for k in range(1, 6):
        w = BitWriter()
        for _ in range(k):
            w.write_bit(1)
        data = w.getvalue()
        assert len(data) == 1
        expect = ((0xFF << (8 - k)) & 0xFF) | k
        assert data[0] == expect
        r = BitReader(data)
        assert r.total == k
        for _ in range(k):
            assert r.read_bit() == 1
        assert r.eof()


def test_final_byte_marker_counts():
    # k in {6,7}: padded payload byte + marker byte with value k
    for k in (6, 7):
        w = BitWriter()
        for _ in range(k):
            w.write_bit(1)
        data = w.getvalue()
        assert len(data) == 2
        assert data[0] == (0xFF << (8 - k)) & 0xFF
        assert data[1] == k
        r = BitReader(data)
        assert r.total == k
        assert [r.read_bit() for _ in range(k)] == [1] * k
        assert r.eof()


def test_final_byte_full_byte_appends_zero():
    w = BitWriter()
    w.write_int(0xAB, 8)
    data = w.getvalue()
    assert data == b"\xab\x00"
    r = BitReader(data)
    assert r.total == 8
    assert r.read_int(8) == 0xAB
    assert r.eof()


def test_write_int_msb_first():
    w = BitWriter()
    w.write_int(0b101, 3)  # 101 + count 3 in low bits
    assert w.getvalue()[0] == 0b101_00_011


def test_wide_write_int():
    w = BitWriter()
    v = 0x0123456789ABCDEF
    w.write_int(v, 64)
    r = BitReader(w.getvalue())
    assert r.read_int(64) == v
    w2 = BitWriter()
    w2.write_int((1 << 100) - 3, 100)
    r2 = BitReader(w2.getvalue())
    assert r2.read_int(100) == (1 << 100) - 3


# --- integer codes ------------------------------------------------------------


def roundtrip_code(write_name, read_name, values, **kw):
    w = BitWriter()
    for v in values:
        getattr(w, write_name)(v, **kw)
    r = BitReader(w.getvalue())
    got = [getattr(r, read_name)(**kw) for _ in values]
    assert got == list(values)
    assert r.eof()


EDGE_VALUES = [0, 1, 2, 3, 4, 5, 7, 8, 100, 255, 256, 1000, 2**16, 2**31 - 1]


def test_unary_roundtrip():
    roundtrip_code("write_unary", "read_unary", [0, 1, 2, 3, 10, 40, 100])


def test_unary_bits():
    w = BitWriter()
    w.write_unary(3)  # 0001
    assert w.getvalue()[0] == 0b0001_0_100


def test_ternary_roundtrip():
    roundtrip_code("write_ternary", "read_ternary", EDGE_VALUES)


def test_ternary_bits():
    # ternary(0) = just terminator "11"
    w = BitWriter()
    w.write_ternary(0)
    assert w.getvalue()[0] == 0b11_000_010
    # ternary(5): v-1=4 = 1 + 1*3 -> digits (1,1) -> 01 01 then 11
    w = BitWriter()
    w.write_ternary(5)
    assert w.getvalue() == bytes([0b010111_00, 6])  # 6 payload bits -> marker


def test_gamma_roundtrip():
    roundtrip_code("write_elias_gamma", "read_elias_gamma", EDGE_VALUES)


def test_gamma_bits():
    # gamma(0): unary(1)="01" + int(0,1)="0" -> 010
    w = BitWriter()
    w.write_elias_gamma(0)
    assert w.getvalue()[0] == 0b010_00_011
    # gamma(5): bits_for(5)=3, unary(3)="0001" + "101"
    w = BitWriter()
    w.write_elias_gamma(5)
    assert w.getvalue() == bytes([0b0001101_0, 7])


def test_delta_roundtrip():
    roundtrip_code("write_elias_delta", "read_elias_delta", EDGE_VALUES)


def test_compressed_int_roundtrip():
    roundtrip_code(
        "write_compressed_int", "read_compressed_int", EDGE_VALUES
    )
    roundtrip_code(
        "write_compressed_int", "read_compressed_int", EDGE_VALUES, b=3
    )


def test_compressed_int_bits():
    # v=0: flag 0 + 0000000
    w = BitWriter()
    w.write_compressed_int(0)
    assert w.getvalue() == bytes([0b0_0000000, 0])
    # v=200 = 0b11001000: block0=1001000 flag1, block1=0000001 flag0
    w = BitWriter()
    w.write_compressed_int(200)
    data = w.getvalue()
    bits = "1" + "1001000" + "0" + "0000001"
    packed = int(bits, 2).to_bytes(2, "big")
    assert data == packed + b"\x00"


# --- mixed-sequence determinism ------------------------------------------------


def test_mixed_sequence():
    rng = np.random.default_rng(42)
    ops = []
    w = BitWriter()
    for _ in range(500):
        kind = rng.integers(0, 6)
        v = int(rng.integers(0, 2**20))
        if kind == 0:
            w.write_bit(v & 1)
            ops.append(("bit", v & 1))
        elif kind == 1:
            width = int(rng.integers(1, 33))
            v &= (1 << width) - 1
            w.write_int(v, width)
            ops.append(("int", v, width))
        elif kind == 2:
            w.write_unary(v % 70)
            ops.append(("unary", v % 70))
        elif kind == 3:
            w.write_ternary(v)
            ops.append(("ternary", v))
        elif kind == 4:
            w.write_elias_gamma(v)
            ops.append(("gamma", v))
        else:
            w.write_elias_delta(v)
            ops.append(("delta", v))
    r = BitReader(w.getvalue())
    for op in ops:
        if op[0] == "bit":
            assert r.read_bit() == op[1]
        elif op[0] == "int":
            assert r.read_int(op[2]) == op[1]
        elif op[0] == "unary":
            assert r.read_unary() == op[1]
        elif op[0] == "ternary":
            assert r.read_ternary() == op[1]
        elif op[0] == "gamma":
            assert r.read_elias_gamma() == op[1]
        else:
            assert r.read_elias_delta() == op[1]
    assert r.eof()


# --- vectorized writers == scalar writers ------------------------------------


def test_int_array_matches_scalar():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**16, size=1000, dtype=np.uint64)
    w1 = BitWriter()
    w1.write_int_array(vals, 17)
    w2 = BitWriter()
    for v in vals:
        w2.write_int(int(v), 17)
    assert w1.getvalue() == w2.getvalue()
    r = BitReader(w1.getvalue())
    assert r.read_int_array(17, 1000).tolist() == vals.tolist()


def test_gamma_array_matches_scalar():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2**20, size=500, dtype=np.uint64)
    w1 = BitWriter()
    w1.write_gamma_array(vals)
    w2 = BitWriter()
    for v in vals:
        w2.write_elias_gamma(int(v))
    assert w1.getvalue() == w2.getvalue()


def test_delta_array_matches_scalar():
    rng = np.random.default_rng(2)
    vals = np.concatenate(
        [
            rng.integers(0, 2**40, size=300, dtype=np.uint64),
            np.array([0, 1, 2**63, 2**64 - 1], dtype=np.uint64),
        ]
    )
    w1 = BitWriter()
    w1.write_delta_array(vals)
    w2 = BitWriter()
    for v in vals:
        w2.write_elias_delta(int(v))
    assert w1.getvalue() == w2.getvalue()


def test_unary_array_matches_scalar():
    vals = np.array([0, 1, 31, 32, 33, 100, 5], dtype=np.int64)
    w1 = BitWriter()
    w1.write_unary_array(vals)
    w2 = BitWriter()
    for v in vals:
        w2.write_unary(int(v))
    assert w1.getvalue() == w2.getvalue()


def test_split_tokens():
    v, l = split_tokens(
        np.array([0x1_FFFF_FFFF, 5], np.uint64), np.array([33, 3], np.int64)
    )
    assert l.tolist() == [1, 32, 3]
    assert v.tolist() == [1, 0xFFFF_FFFF, 5]


def test_pack_parse_inverse():
    rng = np.random.default_rng(7)
    for n in (0, 1, 7, 64, 1000):
        lens = rng.integers(1, 33, size=n)
        vals = rng.integers(0, 2**32, size=n, dtype=np.uint64) & (
            (np.uint64(1) << lens.astype(np.uint64)) - np.uint64(1)
        )
        payload, total = pack_tokens(vals, lens)
        assert total == int(lens.sum())
        data = finalize_stream(payload, total)
        p2, t2 = parse_stream(data)
        assert t2 == total
        r = BitReader(data)
        for v, l in zip(vals.tolist(), lens.tolist()):
            assert r.read_int(int(l)) == v
        assert r.eof()
