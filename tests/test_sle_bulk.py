"""SLE bulk-vs-scalar encode equivalence + speed guard."""

import numpy as np

from tudocomp_tpu.coders.base import Literals
from tudocomp_tpu.coders.sle import SLECoder
from tudocomp_tpu.io.bitio import BitWriter
from tudocomp_tpu.ranges import literal_r
from tudocomp_tpu.registry import create_algo


def _encode(data: np.ndarray, bulk: bool) -> bytes:
    algo = create_algo(SLECoder)
    w = BitWriter()
    enc = SLECoder.Encoder(algo.env, w, Literals(data))
    if not bulk:
        # force the scalar loop by disabling the bulk threshold
        enc._flush_bulk = None
        real = type(enc)._flush_pending

        def scalar_flush(final):
            buf = enc._pending
            limit = len(buf) if final else len(buf) - 2
            i = 0
            while i < limit:
                km = bytes(buf[i : i + 3])
                rank = enc.kmer_rank.get(km) if len(km) == 3 else None
                if rank is not None:
                    enc.out.write_bit(1)
                    enc.out.write_elias_gamma(rank)
                    i += 3
                else:
                    enc.out.write_bit(0)
                    lr = enc.lit_rank.get(buf[i])
                    if lr is not None:
                        enc.out.write_bit(1)
                        enc.out.write_elias_gamma(lr)
                    else:
                        enc.out.write_bit(0)
                        enc.out.write_int(buf[i], 8)
                    i += 1
            del buf[:i]

        enc._flush_pending = scalar_flush
    enc.encode_array(data, literal_r)
    enc.finish()
    return w.getvalue()


def test_bulk_matches_scalar():
    rng = np.random.default_rng(5)
    for trial in range(10):
        n = int(rng.integers(1, 5000))
        data = rng.choice(
            np.frombuffer(b"aabbbcdefgh\x00\xff ", np.uint8), n
        ).astype(np.uint8)
        assert _encode(data, True) == _encode(data, False), trial


def test_native_paths_match_python():
    """Native SLE kernels (rank tables, run tokens, factor stream,
    decode) and the native token packer are bit-identical to the
    numpy/python reference paths."""
    import pytest

    from tudocomp_tpu import compressors as _register  # noqa: F401
    from tudocomp_tpu import native
    from tudocomp_tpu.registry import REGISTRY

    if not native.available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    pieces = [
        rng.choice(np.frombuffer(b"abcabcXYZ \x00", np.uint8), 9000)
        .astype(np.uint8).tobytes(),
        bytes(rng.integers(0, 256, 6000, dtype=np.uint8)),
    ]
    for raw in pieces:
        for spec in (
            "encode(coder=sle)",
            "lcpcomp(coder=sle,threshold=5,comp=arrays,dec=scan)",
        ):
            data = raw + b"\x00" if "lcpcomp" in spec else raw
            comp_nat = REGISTRY.instantiate(spec).compress(data)
            out_nat = REGISTRY.instantiate(spec).decompress(comp_nat)
            try:
                native._lib = None
                native._tried = True
                comp_py = REGISTRY.instantiate(spec).compress(data)
                out_py = REGISTRY.instantiate(spec).decompress(comp_nat)
            finally:
                native._tried = False
                native._lib = None
            assert comp_nat == comp_py
            assert out_nat == out_py == data


def test_native_pack_tokens_matches_numpy():
    from tudocomp_tpu import native
    import pytest

    if not native.available():
        pytest.skip("native runtime unavailable")
    from tudocomp_tpu.io.bitio import pack_tokens

    rng = np.random.default_rng(3)
    for n in (1, 7, 513, 4096):
        lens = rng.integers(1, 33, n)
        values = rng.integers(0, 2**32, n, dtype=np.uint64)
        pay_c, tot_c = native.pack_tokens32(values, lens)
        # numpy reference (force the fallback by size or direct call)
        from tudocomp_tpu.io import bitio

        ends = np.cumsum(lens)
        got = pack_tokens(values, lens)  # may itself be native
        try:
            native._lib = None
            native._tried = True
            pay_np, tot_np = pack_tokens(values, lens)
        finally:
            native._tried = False
            native._lib = None
        assert tot_c == tot_np == int(ends[-1])
        assert bytes(pay_c) == bytes(pay_np)
