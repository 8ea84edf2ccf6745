"""Run-length encoder (byte-level).

Format follows the reference ``compressors/RunLengthEncoder.hpp``: a run
of ``n >= 2`` equal bytes is stored as the byte twice followed by
``vbyte(n - 2 + offset)``; single bytes are stored verbatim. One
TPU-native amendment (see ``ops/rle_jax.py``): runs are split into pieces
of at most ``RUN_CAP = 8192`` bytes, so every piece's wire contribution
fits one 32-bit packer token. The reference decoder keeps ``prev = c``
armed after a run (``RunLengthEncoder.hpp`` rle_decode), so a
continuation piece of length ``L`` is encoded as the *single* byte
followed by ``vbyte(L - 1 + offset)`` — one char, not two — which the
reference decoder expands as ``run + 1`` copies. Split output is
therefore decodable by the reference tool bit-for-bit; cost is 3 bytes
per 8 KiB of run.
"""

from __future__ import annotations

import numpy as np

from tudocomp_tpu.compressors.base import Compressor
from tudocomp_tpu.meta import Meta
from tudocomp_tpu.utils.vbyte import encode_vbyte_array

RUN_CAP = 8192


def rle_encode(arr: np.ndarray, offset: int = 0) -> np.ndarray:
    if arr.size == 0:
        return arr
    boundary = np.empty(arr.size, bool)
    boundary[0] = True
    np.not_equal(arr[1:], arr[:-1], out=boundary[1:])
    run_starts = np.flatnonzero(boundary)
    run_lens = np.diff(np.append(run_starts, arr.size))
    run_chars = arr[run_starts]
    # split runs into <= RUN_CAP pieces; the first piece of a run uses the
    # doubled-char form, continuation pieces the single-char form (the
    # reference decoder's prev stays armed after a run)
    n_pieces = -(-run_lens // RUN_CAP)
    chars = np.repeat(run_chars, n_pieces)
    lens = np.full(chars.size, RUN_CAP, np.int64)
    ends_cum = np.cumsum(n_pieces)
    lens[ends_cum - 1] = run_lens - (n_pieces - 1) * RUN_CAP
    is_first = np.zeros(chars.size, bool)
    is_first[ends_cum - n_pieces] = True
    has_vb = ~is_first | (lens >= 2)
    v = (np.where(is_first, lens - 2, lens - 1)[has_vb] + offset).astype(
        np.uint64
    )
    run_payload = encode_vbyte_array(v)
    vlens = np.zeros(chars.size, np.int64)
    if has_vb.any():
        nb = np.ones(v.shape, np.int64)
        vv = v.copy()
        for _ in range(9):
            vv >>= np.uint64(7)
            nb += (vv > 0).astype(np.int64)
        vlens[has_vb] = nb
    nchars = np.where(has_vb & is_first, 2, 1)
    out_lens = nchars + vlens
    out_ends = np.cumsum(out_lens)
    total = int(out_ends[-1])
    out = np.empty(total, np.uint8)
    out_starts = out_ends - out_lens
    out[out_starts] = chars
    doubled = has_vb & is_first
    out[out_starts[doubled] + 1] = chars[doubled]
    # scatter vbyte payloads after the char(s)
    if has_vb.any():
        v_starts = (out_starts + nchars)[has_vb]
        vl = vlens[has_vb]
        tot = int(vl.sum())
        ramp = np.arange(tot) - np.repeat(np.cumsum(vl) - vl, vl)
        out[np.repeat(v_starts, vl) + ramp] = run_payload
    return out


def rle_decode(arr: np.ndarray, offset: int = 0) -> bytes:
    out = bytearray()
    data = arr.tolist()
    i = 0
    n = len(data)
    prev = -1
    while i < n:
        c = data[i]
        out.append(c)
        i += 1
        if c == prev:
            # read vbyte run length
            run = 0
            shift = 0
            while True:
                b = data[i]
                i += 1
                run |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            run -= offset
            out.extend([c] * run)
            prev = c  # reference keeps prev armed after a run
        else:
            prev = c
    return bytes(out)


class RunLengthEncoder(Compressor):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "rle", "Run Length Encoding Compressor")
        m.option_dynamic("offset", 0)
        return m

    def compress(self, data: bytes) -> bytes:
        off = self.env.option("offset").as_int()
        return rle_encode(np.frombuffer(data, np.uint8), off).tobytes()

    def decompress(self, data: bytes) -> bytes:
        from tudocomp_tpu import native

        off = self.env.option("offset").as_int()
        return native.rle_decode(np.frombuffer(data, np.uint8), off)
