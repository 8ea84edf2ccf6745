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
