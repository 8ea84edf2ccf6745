"""Debug/paranoid invariant layer (reference IF_DEBUG/IF_PARANOID)."""

import numpy as np
import pytest

from tudocomp_tpu import debug


def test_paranoid_enabled_in_tests():
    assert debug.PARANOID and debug.DEBUG


def test_kraft_check():
    debug.check_kraft(np.array([1, 2, 2]))  # full equality
    with pytest.raises(debug.InvariantError):
        debug.check_kraft(np.array([1, 2, 2, 2]))  # over-full
    with pytest.raises(debug.InvariantError):
        debug.check_kraft(np.array([2, 2, 2]))  # deficient vs full=True
    debug.check_kraft(np.array([2, 2, 2]), full=False)


def test_assert_permutation():
    debug.assert_permutation(np.array([2, 0, 1]))
    with pytest.raises(debug.InvariantError):
        debug.assert_permutation(np.array([2, 0, 2]))
    with pytest.raises(debug.InvariantError):
        debug.assert_permutation(np.array([0, 1, 3]))


def test_lf_invariant():
    from tudocomp_tpu.ds.bwt import bwt_decode

    text = b"yabbadabbado"
    from tudocomp_tpu.ds.suffix import suffix_array

    t = text + b"\x00"
    sa = suffix_array(t)
    bwt = bytes(np.frombuffer(t, np.uint8)[(sa - 1) % len(t)])
    assert bwt_decode(bwt) == text
    with pytest.raises(debug.InvariantError):
        debug.check_lf(np.array([0, 2, 2]), np.array([1, 2, 3]))
