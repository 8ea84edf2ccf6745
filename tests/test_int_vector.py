"""IntVector tests (reference ``generic_int_vector_tests.cpp``)."""

import numpy as np
import pytest

from tudocomp_tpu.ds.int_vector import BitVector, DynamicIntVector, IntVector


@pytest.mark.parametrize("width", [1, 3, 8, 13, 32, 40, 64])
def test_pack_roundtrip(width):
    rng = np.random.default_rng(width)
    hi = (1 << width) - 1
    vals = rng.integers(0, hi, 100, dtype=np.uint64) if hi else np.zeros(
        100, np.uint64
    )
    iv = IntVector(vals, width)
    assert iv.bit_size() == 100 * width
    packed = iv.to_bytes()
    assert len(packed) == (100 * width + 7) // 8
    back = IntVector.from_bytes(packed, width, 100)
    np.testing.assert_array_equal(back.as_array(), vals)


def test_width_repack_and_compress():
    iv = IntVector([1, 5, 7], 8)
    w3 = iv.set_width(3)
    assert w3.width == 3 and list(w3.as_array()) == [1, 5, 7]
    assert iv.compress().width == 3
    with pytest.raises(ValueError):
        IntVector([8], 3)


def test_bytes_identity_for_width8():
    iv = IntVector(np.frombuffer(b"hello", np.uint8), 8)
    assert iv.to_bytes() == b"hello"


def test_dynamic_widening():
    dv = DynamicIntVector()
    dv.append(1)
    assert dv.width == 1
    dv.append(300)
    assert dv.width == 9
    assert list(dv.as_array()) == [1, 300]


def test_bitvector():
    bv = BitVector([1, 0, 1, 1])
    assert bv.width == 1
    assert bv.to_bytes() == bytes([0b10110000])
