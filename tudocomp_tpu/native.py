"""Loader/bindings for the native host runtime (``native/tdc_native.cpp``).

Compiles the C++ kernels once with the system toolchain (g++ -O3) into a
cached shared object and binds them via ctypes. Every entry point has a
pure-Python/numpy fallback, so the framework works without a compiler;
``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "tdc_native.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "tdc_native.so")
_STAMP = _SO + ".srchash"

_lock = threading.Lock()
_lib = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # Rebuild whenever the source hash recorded next to the artifact does
    # not match — a stale or foreign .so (wrong -march, unreviewed binary)
    # is never loaded.
    want = _src_hash()
    if os.path.exists(_SO) and os.path.exists(_STAMP):
        try:
            with open(_STAMP) as f:
                if f.read().strip() == want:
                    return True
        except OSError:
            pass
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", _SRC, "-o", _SO,
            ],
            check=True, capture_output=True, timeout=120,
        )
        with open(_STAMP, "w") as f:
            f.write(want)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.tdc_mtf_encode.argtypes = [u8p, u8p, ctypes.c_int64]
        lib.tdc_mtf_decode.argtypes = [u8p, u8p, ctypes.c_int64]
        lib.tdc_bwt_decode.argtypes = [u8p, u8p, ctypes.c_int64]
        lib.tdc_bwt_decode.restype = ctypes.c_int
        lib.tdc_rle_decode.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.tdc_rle_decode.restype = ctypes.c_int64
        lib.tdc_huffman_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, u8p,
            ctypes.c_int, u8p,
        ]
        lib.tdc_huffman_decode.restype = ctypes.c_int64
        lib.tdc_huffman_count.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int,
        ]
        lib.tdc_huffman_count.restype = ctypes.c_int64
        lib.tdc_sle_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, ctypes.c_int64,
            ctypes.c_int, u8p, ctypes.c_int64, u8p, ctypes.c_int64,
        ]
        lib.tdc_sle_decode.restype = ctypes.c_int64
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.tdc_lzss_lcp_factorize.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, ctypes.c_int64,
        ]
        lib.tdc_lzss_lcp_factorize.restype = ctypes.c_int64
        lib.tdc_lz78_parse.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
            u32p, u8p, ctypes.c_int64,
        ]
        lib.tdc_lz78_parse.restype = ctypes.c_int64
        lib.tdc_lz78_expand.argtypes = [
            u32p, u8p, ctypes.c_int64, u8p, ctypes.c_int64,
        ]
        lib.tdc_lz78_expand.restype = ctypes.c_int64
        lib.tdc_lzw_expand.argtypes = [
            u32p, ctypes.c_int64, u8p, ctypes.c_int64,
        ]
        lib.tdc_lzw_expand.restype = ctypes.c_int64
        lib.tdc_slp_derive.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, u8p, ctypes.c_int64,
        ]
        lib.tdc_slp_derive.restype = ctypes.c_int64
        lib.tdc_lcpcomp_arrays.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, ctypes.c_int64,
        ]
        lib.tdc_lcpcomp_arrays.restype = ctypes.c_int64
        lib.tdc_lcpcomp_heap.argtypes = lib.tdc_lcpcomp_arrays.argtypes
        lib.tdc_lcpcomp_heap.restype = ctypes.c_int64
        lib.tdc_plcp.argtypes = [u8p, i64p, ctypes.c_int64, i64p]
        lib.tdc_suffix_array.argtypes = [u8p, ctypes.c_int64, i64p]
        lib.tdc_suffix_array_sais.argtypes = [u8p, ctypes.c_int64, i64p]
        # int32 index stack (n < 2^31): the reference's bits_for(n)
        # width management role on the hot host paths (IntVector /
        # CompressMode, ds/TextDS.hpp:140-147) — halves SA/ISA/LCP
        # memory at every realistic size
        lib.tdc_suffix_array_sais32.argtypes = [
            u8p, ctypes.c_int64, i32p,
        ]
        lib.tdc_plcp32.argtypes = [u8p, i32p, ctypes.c_int64, i32p]
        lib.tdc_lzss_lcp_factorize32.argtypes = [
            i32p, i32p, i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p, ctypes.c_int64,
        ]
        lib.tdc_lzss_lcp_factorize32.restype = ctypes.c_int64
        lib.tdc_lcpcomp_arrays32.argtypes = [
            i32p, i32p, i32p, ctypes.c_int64, ctypes.c_int64,
            i32p, i32p, i32p, ctypes.c_int64,
        ]
        lib.tdc_lcpcomp_arrays32.restype = ctypes.c_int64
        lib.tdc_lcpcomp_heap32.argtypes = lib.tdc_lcpcomp_arrays32.argtypes
        lib.tdc_lcpcomp_heap32.restype = ctypes.c_int64
        lib.tdc_suffix_tree.argtypes = [
            i64p, i64p, ctypes.c_int64, i64p, i64p, u8p, i64p, i64p,
        ]
        lib.tdc_suffix_tree.restype = ctypes.c_int64
        lib.tdc_suffix_tree32.argtypes = [
            i32p, i32p, ctypes.c_int64, i32p, i32p, u8p, i32p, i32p,
        ]
        lib.tdc_suffix_tree32.restype = ctypes.c_int64
        lib.tdc_lzss_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int64, i64p, i64p, i64p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_lzss_decode.restype = ctypes.c_int64
        lib.tdc_lfs2_parse.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u32p, u32p, u32p, u8p, i64p, i64p, ctypes.c_int64,
        ]
        lib.tdc_lfs2_parse.restype = ctypes.c_int64
        lib.tdc_lfs_parse.argtypes = lib.tdc_lfs2_parse.argtypes
        lib.tdc_lfs_parse.restype = ctypes.c_int64
        lib.tdc_repair.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64,
            i32p, ctypes.c_int64, i32p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_repair.restype = ctypes.c_int64
        lib.tdc_esp_rounds.argtypes = [
            u8p, ctypes.c_int64, i32p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_esp_rounds.restype = ctypes.c_int64
        lib.tdc_slp_dep_sort.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, i64p,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_slp_dep_sort.restype = ctypes.c_int64
        lib.tdc_lcpcomp_compact.argtypes = [
            ctypes.c_int64, u8p, i64p, ctypes.c_int64,
            i64p, i64p, i64p, ctypes.c_int64, u8p,
        ]
        lib.tdc_lcpcomp_compact.restype = ctypes.c_int64
        lib.tdc_monotone_decompose.argtypes = [
            i64p, ctypes.c_int64, i64p, u8p, ctypes.c_int64,
        ]
        lib.tdc_monotone_decompose.restype = ctypes.c_int64
        lib.tdc_tbc2_parse.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u32p, u8p, i64p, i64p,
        ]
        lib.tdc_tbc2_parse.restype = ctypes.c_int64
        lib.tdc_tbc2_decode.argtypes = [
            u8p, u32p, u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            u8p, u8p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, u8p,
        ]
        lib.tdc_tbc2_decode.restype = ctypes.c_int64
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        lib.tdc_sle_run_tokens.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, ctypes.c_int, i32p,
            u64p, i64p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_sle_run_tokens.restype = ctypes.c_int64
        lib.tdc_factor_stream_sle.argtypes = [
            u8p, ctypes.c_int64, i64p, i64p, i64p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            i64p, i64p, ctypes.c_int64, ctypes.c_int, i32p,
            u64p, i64p, ctypes.c_int64,
        ]
        lib.tdc_factor_stream_sle.restype = ctypes.c_int64
        lib.tdc_lzss_decode_sle.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int64, ctypes.c_int, u8p, ctypes.c_int64,
            ctypes.c_int, u8p, ctypes.c_int64,
            i64p, i64p, i64p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_lzss_decode_sle.restype = ctypes.c_int64
        lib.tdc_pack_tokens32.argtypes = [
            u32p, u8p, ctypes.c_int64, u8p,
        ]
        lib.tdc_pack_tokens32.restype = ctypes.c_int64
        lib.tdc_sle_rank.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, i64p, ctypes.c_int64,
            u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_sle_rank.restype = ctypes.c_int64
        lib.tdc_lz78u_parse.argtypes = [
            i64p, i64p, u8p, i64p, i64p, u8p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u8p, i64p, i64p, ctypes.c_int64,
        ]
        lib.tdc_lz78u_parse32.argtypes = [
            i32p, i32p, u8p, i32p, i32p, u8p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u8p, i32p, i32p, ctypes.c_int64,
        ]
        lib.tdc_lz78u_parse32.restype = ctypes.c_int64
        lib.tdc_lz78u_parse.restype = ctypes.c_int64
        lib.tdc_lz78u_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int64,
        ]
        lib.tdc_lz78u_decode.restype = ctypes.c_int64
        lib.tdc_lz78_parse_struct.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
            ctypes.c_int, u32p, u8p, ctypes.c_int64,
        ]
        lib.tdc_lz78_parse_struct.restype = ctypes.c_int64
        lib.tdc_repair_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, u8p,
            ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int64,
        ]
        lib.tdc_repair_decode.restype = ctypes.c_int64
        lib.tdc_arith_encode.argtypes = [
            u8p, ctypes.c_int64, u64p, ctypes.c_uint64,
            u64p, ctypes.c_int64,
        ]
        lib.tdc_arith_encode.restype = ctypes.c_int64
        lib.tdc_arith_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, u64p,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64, u8p,
        ]
        lib.tdc_arith_decode.restype = ctypes.c_int64
        lib.tdc_vlc_literals.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            u8p, ctypes.c_int64,
        ]
        lib.tdc_vlc_literals.restype = ctypes.c_int64
        lib.tdc_lzss_window_encode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, u8p, ctypes.c_int64,
        ]
        lib.tdc_lzss_window_encode.restype = ctypes.c_int64
        lib.tdc_lzss_window_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, u8p, ctypes.c_int64,
        ]
        lib.tdc_lzss_window_decode.restype = ctypes.c_int64
        lib.tdc_mtf_encode_s.argtypes = [u8p, u8p, ctypes.c_int64, u8p]
        lib.tdc_mtf_decode_s.argtypes = [u8p, u8p, ctypes.c_int64, u8p]
        i64p_s = ctypes.POINTER(ctypes.c_int64)
        lib.tdc_rle_decode_s.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int64,
            i64p_s, ctypes.c_int, i64p_s,
        ]
        lib.tdc_rle_decode_s.restype = ctypes.c_int64
        lib.tdc_lzss_window_encode_s.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            u8p, ctypes.c_int64, i64p_s,
        ]
        lib.tdc_lzss_window_encode_s.restype = ctypes.c_int64
        lib.tdc_lz78_stream_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int64, u8p, ctypes.c_int64,
        ]
        lib.tdc_lz78_stream_decode.restype = ctypes.c_int64
        lib.tdc_lz78s_new.argtypes = [ctypes.c_int, ctypes.c_int64]
        lib.tdc_lz78s_new.restype = ctypes.c_void_p
        lib.tdc_lz78s_free.argtypes = [ctypes.c_void_p]
        lib.tdc_lz78s_free.restype = None
        lib.tdc_lz78s_feed.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_int64,
        ]
        lib.tdc_lz78s_feed.restype = ctypes.c_int64
        lib.tdc_lz78ds_new.argtypes = [
            ctypes.c_int, ctypes.c_int64, ctypes.c_int,
        ]
        lib.tdc_lz78ds_new.restype = ctypes.c_void_p
        lib.tdc_lz78ds_free.argtypes = [ctypes.c_void_p]
        lib.tdc_lz78ds_free.restype = None
        lib.tdc_lz78ds_feed.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.tdc_lz78ds_feed.restype = ctypes.c_int64
        lib.tdc_lz78ds_take.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64,
        ]
        lib.tdc_lz78ds_take.restype = ctypes.c_int64
        lib.tdc_lzssds_new.argtypes = [ctypes.c_int64, ctypes.c_int]
        lib.tdc_lzssds_new.restype = ctypes.c_void_p
        lib.tdc_lzssds_free.argtypes = [ctypes.c_void_p]
        lib.tdc_lzssds_free.restype = None
        lib.tdc_lzssds_feed.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.tdc_lzssds_feed.restype = ctypes.c_int64
        lib.tdc_lzssds_take.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int64,
        ]
        lib.tdc_lzssds_take.restype = ctypes.c_int64
        lib.tdc_lzw_stream_decode.argtypes = \
            lib.tdc_lz78_stream_decode.argtypes
        lib.tdc_lzw_stream_decode.restype = ctypes.c_int64
        lib.tdc_lfs_start_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, u8p,
            ctypes.c_int, ctypes.c_int, i64p, ctypes.c_int64,
            u8p, ctypes.c_int64,
        ]
        lib.tdc_lfs_start_decode.restype = ctypes.c_int64
        lib.tdc_lfs2_decode.argtypes = \
            lib.tdc_lfs_start_decode.argtypes
        lib.tdc_lfs2_decode.restype = ctypes.c_int64
        lib.tdc_lcpcomp_bulldozer.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, ctypes.c_int64,
        ]
        lib.tdc_lcpcomp_bulldozer.restype = ctypes.c_int64
        lib.tdc_lfs_simst.argtypes = [
            i64p, i64p, u8p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, i64p, i64p, ctypes.c_int64,
            i64p, i64p, i64p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_lfs_simst.restype = ctypes.c_int64
        lib.tdc_lfs_bst.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, i64p, i64p, ctypes.c_int64,
            i64p, i64p, i64p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.tdc_lfs_bst.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---- wrappers with fallback -------------------------------------------


def mtf_encode(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from tudocomp_tpu.compressors.mtf import mtf_encode as py

        return py(data)
    inp = np.frombuffer(data, np.uint8)
    out = np.empty(inp.size, np.uint8)
    lib.tdc_mtf_encode(inp, out, inp.size)
    return out.tobytes()


def mtf_decode(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from tudocomp_tpu.compressors.mtf import mtf_decode as py

        return py(data)
    inp = np.frombuffer(data, np.uint8)
    out = np.empty(inp.size, np.uint8)
    lib.tdc_mtf_decode(inp, out, inp.size)
    return out.tobytes()


def bwt_decode(bwt_bytes: bytes) -> bytes:
    lib = _load()
    if lib is None:
        from tudocomp_tpu.ds.bwt import bwt_decode as py

        return py(bwt_bytes)
    inp = np.frombuffer(bwt_bytes, np.uint8)
    if inp.size <= 1:
        return b""
    out = np.empty(inp.size - 1, np.uint8)
    lib.tdc_bwt_decode(inp, out, inp.size)
    return out.tobytes()


def rle_decode(arr: np.ndarray, offset: int = 0) -> bytes:
    lib = _load()
    if lib is None:
        from tudocomp_tpu.compressors.rle import rle_decode as py

        return py(arr, offset)
    inp = np.ascontiguousarray(arr, np.uint8)
    cap = max(64, inp.size * 4)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_rle_decode(inp, inp.size, out, cap, offset)
        if got == -2:
            raise ValueError("malformed RLE stream")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def lzss_lcp_factorize(sa, isa, lcp, threshold: int):
    """Returns (pos, src, len) arrays (index dtype matches the inputs:
    int32 when the DS stack is int32), or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    dt = np.int32 if np.asarray(sa).dtype == np.int32 else np.int64
    fn = (lib.tdc_lzss_lcp_factorize32 if dt == np.int32
          else lib.tdc_lzss_lcp_factorize)
    sa = np.ascontiguousarray(sa, dt)
    isa = np.ascontiguousarray(isa, dt)
    lcp = np.ascontiguousarray(lcp, dt)
    n = sa.size
    # each factor advances the scan by >= max(1, threshold) positions
    cap = max(16, n // max(1, threshold) + 1)
    pos = np.empty(cap, dt)
    src = np.empty(cap, dt)
    length = np.empty(cap, dt)
    got = fn(sa, isa, lcp, n, threshold, pos, src, length, cap)
    if got < 0:
        raise RuntimeError("factor buffer overflow")
    return pos[:got], src[:got], length[:got]


def lz78_parse(data: bytes, lzw: bool = False, dict_limit: int = 0,
               structure: str = "hash"):
    """LZ78/LZW canonical parse over the named trie structure
    ("hash", "ternary", "binary", "cedar"). Returns (refs u32[],
    chars u8[]) or None; every structure yields the identical parse."""
    lib = _load()
    if lib is None:
        return None
    inp = np.frombuffer(data, np.uint8)
    cap = max(16, inp.size + 2)
    refs = np.empty(cap, np.uint32)
    chars = np.empty(cap, np.uint8)
    if structure == "hash":
        got = lib.tdc_lz78_parse(
            inp, inp.size, int(lzw), dict_limit, refs, chars, cap
        )
    else:
        kind = {"ternary": 0, "binary": 1, "cedar": 2}[structure]
        got = lib.tdc_lz78_parse_struct(
            inp, inp.size, int(lzw), dict_limit, kind, refs, chars, cap
        )
    if got < 0:
        raise RuntimeError("lz78 parse buffer overflow")
    return refs[:got], chars[:got]


def lz78_expand(refs: np.ndarray, chars: np.ndarray):
    """Expand (ref, char) factors to text; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    refs = np.ascontiguousarray(refs, np.uint32)
    chars = np.ascontiguousarray(chars, np.uint8)
    cap = max(64, int(chars.size) * 4)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_lz78_expand(refs, chars, refs.size, out, cap)
        if got == -2:
            raise ValueError("malformed LZ78 stream: forward factor ref")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4
def lzw_expand(codes: np.ndarray):
    """Expand LZW codes to text; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint32)
    cap = max(64, int(codes.size) * 8)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_lzw_expand(codes, codes.size, out, cap)
        if got == -2:
            raise ValueError("invalid LZW code")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def slp_derive(pairs: np.ndarray, root: int):
    """Expand a binary SLP to text; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pairs = np.ascontiguousarray(pairs, np.int64).reshape(-1)
    cap = 1 << 16
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_slp_derive(pairs, pairs.size // 2, root, out, cap)
        if got == -2:
            raise ValueError("invalid SLP rule reference")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4
def lcpcomp_factorize(sa, isa, lcp, threshold: int, strategy="arrays"):
    """lcpcomp arrays/heap factorization. Returns (pos, src, len) or None.
    Index dtype follows the inputs (int32 stack when n < 2^31)."""
    lib = _load()
    if lib is None:
        return None
    dt = np.int32 if np.asarray(sa).dtype == np.int32 else np.int64
    if dt == np.int32:
        fn = (lib.tdc_lcpcomp_heap32 if strategy == "heap"
              else lib.tdc_lcpcomp_arrays32)
    else:
        fn = (lib.tdc_lcpcomp_heap if strategy == "heap"
              else lib.tdc_lcpcomp_arrays)
    sa = np.ascontiguousarray(sa, dt)
    isa = np.ascontiguousarray(isa, dt)
    lcp = np.ascontiguousarray(lcp, dt).copy()
    n = sa.size
    # every factor zeroes >= threshold LCP entries, so the count is
    # bounded by n / max(1, threshold)
    cap = max(16, n // max(1, threshold) + 1)
    pos = np.empty(cap, dt)
    src = np.empty(cap, dt)
    length = np.empty(cap, dt)
    got = fn(sa, isa, lcp, n, threshold, pos, src, length, cap)
    if got < 0:
        raise RuntimeError("factor buffer overflow")
    return pos[:got], src[:got], length[:got]


def lcpcomp_arrays_factorize(sa, isa, lcp, threshold: int):
    return lcpcomp_factorize(sa, isa, lcp, threshold, "arrays")
def plcp(text: np.ndarray, phi: np.ndarray):
    """Karkkainen PLCP; None if native unavailable. Output dtype
    follows ``phi`` (int32 stack for n < 2^31)."""
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(text, np.uint8)
    if np.asarray(phi).dtype == np.int32:
        ph = np.ascontiguousarray(phi, np.int32)
        out = np.empty(t.size, np.int32)
        lib.tdc_plcp32(t, ph, t.size, out)
    else:
        ph = np.ascontiguousarray(phi, np.int64)
        out = np.empty(t.size, np.int64)
        lib.tdc_plcp(t, ph, t.size, out)
    return out
def suffix_array(text: np.ndarray, algo: str = "sais"):
    """Suffix array; None if native unavailable. ``sais`` (default) is
    the linear-time induced-sorting construction; ``radix`` the
    O(n log n) prefix-doubling one (same output — the SA is unique).
    Returns int32 for n < 2^31 (the whole host DS stack runs at
    bits_for-class width, reference CompressMode ds/TextDS.hpp:140-147),
    int64 above."""
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(text, np.uint8)
    if algo == "sais" and t.size < (1 << 31):
        out = np.empty(t.size, np.int32)
        lib.tdc_suffix_array_sais32(t, t.size, out)
        return out
    out = np.empty(t.size, np.int64)
    if algo == "sais":
        lib.tdc_suffix_array_sais(t, t.size, out)
    else:
        lib.tdc_suffix_array(t, t.size, out)
    return out
_EMPTY_LUT = np.zeros(1, np.uint8)


def lzss_decode_stream(payload, nbits, start_bit, n, flen_min,
                       w_src, w_len, w_dist, lut=None, mode=0,
                       code_kind=0):
    """Native factor-stream decode. mode 0 -> text bytes; mode 1 ->
    (literals, pos, src, len) for forward-capable resolution. None if
    native unavailable. ``code_kind``: 0 = fixed widths (+optional
    Huffman LUT literals), 1/2/3/4 = gamma/delta/ternary/ascii fields."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    if lut is None:
        lut_sym = lut_len = _EMPTY_LUT
        k = 0
    else:
        lut_sym, lut_len, k = lut
        lut_sym = np.ascontiguousarray(lut_sym, np.uint8)
        lut_len = np.ascontiguousarray(lut_len, np.uint8)
    out_cap = max(64, n + 64)
    out = np.empty(out_cap, np.uint8)
    fcap = max(16, n + 1)
    fpos = np.empty(fcap, np.int64)
    fsrc = np.empty(fcap, np.int64)
    flen = np.empty(fcap, np.int64)
    nfac = ctypes.c_int64(0)
    got = lib.tdc_lzss_decode(
        payload, nbits, start_bit, n, flen_min,
        w_src, w_len, w_dist, lut_sym, lut_len, k, mode, code_kind,
        out, out_cap, fpos, fsrc, flen, fcap, ctypes.byref(nfac),
    )
    if got == -2:
        raise ValueError("malformed factor stream")
    if got < 0:
        raise RuntimeError("factor decode overflow")
    if mode == 0:
        return out[:got].tobytes()
    m = nfac.value
    return out[:got], fpos[:m], fsrc[:m], flen[:m]


def suffix_tree(sa: np.ndarray, lcp: np.ndarray):
    """Build the lcp-interval suffix tree. Returns (parent, sdepth,
    is_leaf, suffix, leaf_of_rank, node_count) or None."""
    lib = _load()
    if lib is None:
        return None
    dt = np.int32 if np.asarray(sa).dtype == np.int32 else np.int64
    fn = lib.tdc_suffix_tree32 if dt == np.int32 else lib.tdc_suffix_tree
    sa = np.ascontiguousarray(sa, dt)
    lcp = np.ascontiguousarray(lcp, dt)
    n = sa.size
    cap = 2 * n + 2
    parent = np.empty(cap, dt)
    sdepth = np.empty(cap, dt)
    is_leaf = np.empty(cap, np.uint8)
    suffix = np.empty(cap, dt)
    leaf_of_rank = np.empty(max(1, n), dt)
    m = fn(sa, lcp, n, parent, sdepth, is_leaf, suffix, leaf_of_rank)
    return (
        parent[:m], sdepth[:m], is_leaf[:m].astype(bool), suffix[:m],
        leaf_of_rank[:n], m,
    )


def sle_decode(payload, nbits, start_bit, kmers: bytes, n_kmers, k,
               lits: bytes):
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    km = np.frombuffer(kmers, np.uint8) if kmers else np.zeros(1, np.uint8)
    lt = np.frombuffer(lits, np.uint8) if lits else np.zeros(1, np.uint8)
    cap = max(64, nbits)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_sle_decode(
            payload, nbits, start_bit, km, n_kmers, k, lt, lt.size,
            out, cap,
        )
        if got == -2:
            raise ValueError("malformed sle stream")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def huffman_count(payload: np.ndarray, nbits: int, lut_len: np.ndarray,
                  k: int):
    lib = _load()
    if lib is None:
        return None
    got = lib.tdc_huffman_count(
        np.ascontiguousarray(payload, np.uint8), nbits,
        np.ascontiguousarray(lut_len, np.uint8), k,
    )
    if got < 0:
        raise ValueError("malformed huffman stream")
    return got


def huffman_decode(payload: np.ndarray, count: int, lut_sym: np.ndarray,
                   lut_len: np.ndarray, k: int):
    """Returns decoded symbols or None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    out = np.empty(count, np.uint8)
    got = lib.tdc_huffman_decode(
        payload, payload.size, count,
        np.ascontiguousarray(lut_sym, np.uint8),
        np.ascontiguousarray(lut_len, np.uint8), k, out,
    )
    if got < 0:
        raise ValueError("native huffman decode failed")
    return out


def tbc2_parse(data: bytes, pos: int, nseg: int):
    """Parse TBC2 per-segment frames. Returns (counts u32, flags u8,
    poff i64, pbytes i64) arrays, or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    counts = np.empty(max(nseg, 1), np.uint32)
    flags = np.empty(max(nseg, 1), np.uint8)
    poff = np.empty(max(nseg, 1), np.int64)
    pbytes = np.empty(max(nseg, 1), np.int64)
    got = lib.tdc_tbc2_parse(
        buf, buf.size, pos, nseg, counts, flags, poff, pbytes
    )
    if got < 0:
        raise ValueError("malformed TBC2 container")
    return counts[:nseg], flags[:nseg], poff[:nseg], pbytes[:nseg]


def tbc2_decode(data: bytes, counts, flags, poff, pbytes, orig_len: int,
                seg: int, table, offset: int):
    """Decode all TBC2 segments on host cores (GIL-free native kernel,
    thread pool over segment ranges). Returns bytes or None."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    counts = np.ascontiguousarray(counts, np.uint32)
    flags = np.ascontiguousarray(flags, np.uint8)
    poff = np.ascontiguousarray(poff, np.int64)
    pbytes = np.ascontiguousarray(pbytes, np.int64)
    nseg = counts.size
    if table is not None:
        lut_sym, lut_len = table.build_lut()
        k = table.longest
    else:
        lut_sym = lut_len = _EMPTY_LUT
        k = 0
    out = np.empty(orig_len, np.uint8)

    def run(lo, hi):
        return lib.tdc_tbc2_decode(
            buf, counts, flags, poff, pbytes, lo, hi,
            lut_sym, lut_len, k, seg, orig_len, offset, out,
        )

    if nseg >= 64:
        import os
        from concurrent.futures import ThreadPoolExecutor

        nw = min(os.cpu_count() or 4, 16)
        step = -(-nseg // nw)
        with ThreadPoolExecutor(nw) as ex:
            rets = list(
                ex.map(
                    lambda lo: run(lo, min(lo + step, nseg)),
                    range(0, nseg, step),
                )
            )
    else:
        rets = [run(0, nseg)]
    if any(r < 0 for r in rets):
        raise ValueError("malformed TBC2 payload")
    return out.tobytes()


def monotone_decompose(sis: np.ndarray):
    """Decompose a permutation into monotone subsequences
    (ESP succinct coding). Returns (Dpi i64, b u8 bits) or None."""
    lib = _load()
    if lib is None:
        return None
    sis = np.ascontiguousarray(sis, np.int64)
    n = sis.size
    dpi = np.empty(max(n, 1), np.int64)
    b = np.empty(max(n, 1), np.uint8)
    got = lib.tdc_monotone_decompose(sis, n, dpi, b, max(n, 1))
    if got < 0:
        raise RuntimeError("decomposition overflow")
    return dpi[:n], b[:got]


def lcpcomp_compact_decode(n, lit_bytes, lit_pos, fpos, fsrc, flen):
    """CompactDec forward-bucket resolution. Returns bytes or None."""
    lib = _load()
    if lib is None:
        return None
    lit_bytes = np.ascontiguousarray(lit_bytes, np.uint8)
    lit_pos = np.ascontiguousarray(lit_pos, np.int64)
    fpos = np.ascontiguousarray(fpos, np.int64)
    fsrc = np.ascontiguousarray(fsrc, np.int64)
    flen = np.ascontiguousarray(flen, np.int64)
    out = np.empty(n, np.uint8)
    got = lib.tdc_lcpcomp_compact(
        n, lit_bytes, lit_pos, lit_pos.size, fpos, fsrc, flen,
        fpos.size, out,
    )
    if got == -2:
        raise ValueError("malformed lcpcomp factor stream")
    if got == -3:
        raise ValueError("unresolvable lcpcomp factor chain")
    return out.tobytes()


def lfs2_parse(sa, lcp, n_text: int, min_lrf: int):
    """LFS2 two-layer parse. Returns (fl_nts, fl_off, sl_nts,
    nts_start, nts_len) arrays or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    sa = np.ascontiguousarray(sa, np.int64)
    lcp = np.ascontiguousarray(lcp, np.int64)
    m = sa.size
    n = n_text
    fl_nts = np.zeros(max(n, 1), np.uint32)
    fl_off = np.zeros(max(n, 1), np.uint32)
    sl_nts = np.zeros(max(n, 1), np.uint32)
    sl_dead = np.zeros(max(n, 1), np.uint8)
    cap = max(16, n // 2 + 1)
    nts_start = np.empty(cap, np.int64)
    nts_len = np.empty(cap, np.int64)
    got = lib.tdc_lfs2_parse(
        sa, lcp, m, n, min_lrf, fl_nts, fl_off, sl_nts, sl_dead,
        nts_start, nts_len, cap,
    )
    if got < 0:
        raise RuntimeError("lfs2 NT buffer overflow")
    return fl_nts, fl_off, sl_nts, nts_start[:got], nts_len[:got]


def lfs_parse(sa, lcp, n_text: int, min_lrf: int):
    """Single-layer longest-first parse (the LFS st/esa strategies:
    rules need >= 2 first-layer occurrences, no in-rule substitution).
    Returns (fl_nts, fl_off, nts_start, nts_len) or None."""
    lib = _load()
    if lib is None:
        return None
    sa = np.ascontiguousarray(sa, np.int64)
    lcp = np.ascontiguousarray(lcp, np.int64)
    m = sa.size
    n = n_text
    fl_nts = np.zeros(max(n, 1), np.uint32)
    fl_off = np.zeros(max(n, 1), np.uint32)
    sl_nts = np.zeros(max(n, 1), np.uint32)
    sl_dead = np.zeros(max(n, 1), np.uint8)
    cap = max(16, n // 2 + 1)
    nts_start = np.empty(cap, np.int64)
    nts_len = np.empty(cap, np.int64)
    got = lib.tdc_lfs_parse(
        sa, lcp, m, n, min_lrf, fl_nts, fl_off, sl_nts, sl_dead,
        nts_start, nts_len, cap,
    )
    if got < 0:
        raise RuntimeError("lfs NT buffer overflow")
    return fl_nts, fl_off, nts_start[:got], nts_len[:got]


def repair(text: np.ndarray, max_rules: int):
    """Re-Pair grammar via the near-linear native kernel. Returns
    (start: int64[], rules: list[(left, right)]) or None."""
    lib = _load()
    if lib is None or text.size >= (1 << 31):
        return None
    text = np.ascontiguousarray(text, np.uint8)
    n = text.size
    rules_cap = max(16, n // 2 + 1)
    rules_out = np.empty(2 * rules_cap, np.int32)
    start_out = np.empty(max(n, 1), np.int32)
    start_len = ctypes.c_int64(0)
    got = lib.tdc_repair(
        text, n, min(max_rules, rules_cap), rules_out, rules_cap,
        start_out, ctypes.byref(start_len),
    )
    if got < 0:
        return None
    pairs = rules_out[: 2 * got].reshape(-1, 2)
    rules = [(int(l), int(r)) for l, r in pairs.tolist()]
    return start_out[: start_len.value].astype(np.int64), rules


def esp_rounds(data: bytes):
    """Full ESP grammar construction (bit-identical to the Python
    ``esp_rounds``). Returns (rules: int64[R,2], root) or None."""
    lib = _load()
    n = len(data)
    if lib is None or n == 0 or n >= (1 << 31):
        return None
    buf = np.frombuffer(data, np.uint8)
    cap = n + 16
    rules_out = np.empty(2 * cap, np.int32)
    root = ctypes.c_int64(0)
    got = lib.tdc_esp_rounds(
        np.ascontiguousarray(buf), n, rules_out, cap, ctypes.byref(root)
    )
    if got < 0:
        return None
    rules = rules_out[: 2 * got].astype(np.int64).reshape(-1, 2)
    return rules, int(root.value)


def slp_dep_sort(rules: np.ndarray, root: int):
    """Dependency sort (identical permutation to the Python
    ``slp_dep_sort``). Returns (sorted_rules, new_root) or None."""
    lib = _load()
    if lib is None:
        return None
    rules = np.ascontiguousarray(rules, np.int64)
    n = rules.shape[0]
    out = np.empty((max(n, 1), 2), np.int64)
    new_root = ctypes.c_int64(0)
    got = lib.tdc_slp_dep_sort(
        rules.reshape(-1), n, root, out.reshape(-1),
        ctypes.byref(new_root),
    )
    if got < 0:
        raise ValueError("SLP dependency cycle")
    return out[:n], int(new_root.value)


def sle_run_tokens(buf: np.ndarray, limit: int, sorted_keys: np.ndarray,
                   key_rank: np.ndarray, kk: int, lit_rank: np.ndarray):
    """SLE greedy-matcher token emission for one literal run. Returns
    (consumed, values u64, lens i64) or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buf, np.uint8)
    n = buf.size
    cap = 3 * max(1, n) + 4
    values = np.empty(cap, np.uint64)
    lens = np.empty(cap, np.int64)
    ntok = ctypes.c_int64(0)
    got = lib.tdc_sle_run_tokens(
        buf, n, limit, sorted_keys, key_rank, sorted_keys.size, kk,
        lit_rank, values, lens, cap, ctypes.byref(ntok),
    )
    if got < 0:
        raise RuntimeError("sle token overflow")
    m = ntok.value
    return int(got), values[:m], lens[:m]


def factor_stream_sle_encode(text: np.ndarray, fpos, fsrc, flen,
                             w_src: int, w_len: int, w_dist: int,
                             flen_min: int, sorted_keys, key_rank,
                             kk: int, lit_rank):
    """Whole SLE factor-stream body (after the 4 header fields) as one
    token array pair, or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, np.uint8)
    fpos = np.ascontiguousarray(fpos, np.int64)
    fsrc = np.ascontiguousarray(fsrc, np.int64)
    flen = np.ascontiguousarray(flen, np.int64)
    covered = int(flen.sum())
    gap_bytes = text.size - covered
    cap = 3 * max(1, gap_bytes) + 4 * fpos.size + 8
    values = np.empty(cap, np.uint64)
    lens = np.empty(cap, np.int64)
    got = lib.tdc_factor_stream_sle(
        text, text.size, fpos, fsrc, flen, fpos.size,
        w_src, w_len, w_dist, flen_min,
        sorted_keys, key_rank, sorted_keys.size, kk, lit_rank,
        values, lens, cap,
    )
    if got < 0:
        raise RuntimeError("sle factor-stream token overflow")
    return values[:got], lens[:got]


def lzss_decode_stream_sle(payload, nbits, start_bit, n, flen_min,
                           w_src, w_len, w_dist, kmers: bytes, kk: int,
                           lits: bytes, mode=0):
    """Native factor-stream decode with SLE gap literals. Same returns
    as :func:`lzss_decode_stream`, or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    km = np.frombuffer(kmers, np.uint8) if kmers else np.zeros(1, np.uint8)
    n_kmers = len(kmers) // kk if kmers else 0
    lt = np.frombuffer(lits, np.uint8) if lits else np.zeros(1, np.uint8)
    n_lits = len(lits)
    out_cap = max(64, n + 64)
    out = np.empty(out_cap, np.uint8)
    fcap = max(16, n + 1)
    fpos = np.empty(fcap, np.int64)
    fsrc = np.empty(fcap, np.int64)
    flen = np.empty(fcap, np.int64)
    nfac = ctypes.c_int64(0)
    got = lib.tdc_lzss_decode_sle(
        payload, nbits, start_bit, n, flen_min,
        w_src, w_len, w_dist, km, n_kmers, kk, lt, n_lits, mode,
        out, out_cap, fpos, fsrc, flen, fcap, ctypes.byref(nfac),
    )
    if got == -2:
        raise ValueError("malformed sle factor stream")
    if got < 0:
        raise RuntimeError("factor decode overflow")
    if mode == 0:
        return out[:got].tobytes()
    m = nfac.value
    return out[:got], fpos[:m], fsrc[:m], flen[:m]


def pack_tokens32(values: np.ndarray, lens: np.ndarray):
    """Pack (value, len<=32) tokens MSB-first (bit-identical to
    ``io.bitio.pack_tokens``). Returns (payload u8, total_bits) or None."""
    lib = _load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, np.uint32)
    lens = np.ascontiguousarray(lens, np.uint8)
    n = values.size
    cap = (int(lens.sum(dtype=np.int64)) + 7) // 8 + 1
    out = np.empty(max(1, cap), np.uint8)
    total = lib.tdc_pack_tokens32(values, lens, n, out)
    return out[: (total + 7) // 8], int(total)


def sle_rank(chars: np.ndarray, kk: int, max_kmers: int, max_lits: int):
    """SLE rank tables: (kmer key list int64, literal byte list) ordered
    by descending count (ties by value), or None."""
    lib = _load()
    if lib is None:
        return None
    chars = np.ascontiguousarray(chars, np.uint8)
    keys = np.empty(max(1, max_kmers), np.int64)
    lits = np.empty(max(1, max_lits), np.uint8)
    n_lits = ctypes.c_int64(0)
    nk = lib.tdc_sle_rank(
        chars, chars.size, kk, keys, max_kmers, lits, max_lits,
        ctypes.byref(n_lits),
    )
    return keys[:nk], lits[: n_lits.value]


def lz78u_parse(parent, sdepth, is_leaf, leaf_of_rank, isa,
                text: np.ndarray, threshold: int):
    """LZ78U suffix-tree factorization event stream:
    (kind u8, value i64, aux i64) arrays, or None."""
    lib = _load()
    if lib is None:
        return None
    dt = np.int32 if np.asarray(parent).dtype == np.int32 else np.int64
    fn = lib.tdc_lz78u_parse32 if dt == np.int32 else lib.tdc_lz78u_parse
    parent = np.ascontiguousarray(parent, dt)
    sdepth = np.ascontiguousarray(sdepth, dt)
    is_leaf = np.ascontiguousarray(
        np.asarray(is_leaf).astype(np.uint8)
    )
    leaf_of_rank = np.ascontiguousarray(leaf_of_rank, dt)
    isa = np.ascontiguousarray(isa, dt)
    text = np.ascontiguousarray(text, np.uint8)
    n = text.size
    # ~3 events/char typical; grow on overflow instead of sizing the
    # buffers for the worst case up front (the former flat 8n int64
    # buffers were 17 resident bytes/char at 100 MB)
    cap = 4 * max(64, n)
    while True:
        kind = np.empty(cap, np.uint8)
        value = np.empty(cap, dt)
        aux = np.empty(cap, dt)
        got = fn(
            parent, sdepth, is_leaf, leaf_of_rank, isa, text,
            n, parent.size, threshold, kind, value, aux, cap,
        )
        if got >= 0:
            break
        cap *= 2
        if cap > 64 * max(64, n):
            raise RuntimeError("lz78u event overflow")
    # copies release the cap-sized buffers
    return kind[:got].copy(), value[:got].copy(), aux[:got].copy()


def lz78u_decode(payload, nbits, start_bit, lut, out_hint: int,
                 ref_kind: int = 0, str_kind: int = 0):
    """Native LZ78U stream decode. Returns bytes or None.
    ``ref_kind``/``str_kind`` select the ref-coder and string-coder
    int codes (0 fixed/LUT, 1-4 gamma/delta/ternary/ascii)."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    if lut is None:
        lut_sym = lut_len = _EMPTY_LUT
        k = 0
    else:
        lut_sym, lut_len, k = lut
        lut_sym = np.ascontiguousarray(lut_sym, np.uint8)
        lut_len = np.ascontiguousarray(lut_len, np.uint8)
    cap = max(4096, out_hint)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_lz78u_decode(
            payload, nbits, start_bit, lut_sym, lut_len, k,
            ref_kind, str_kind, out, cap,
        )
        if got == -2:
            raise ValueError("malformed lz78u stream")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def repair_decode(payload, nbits, start_bit, lut, out_hint: int,
                  code_kind: int = 0):
    """Native Re-Pair stream decode. Returns bytes or None."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    if lut is None:
        lut_sym = lut_len = _EMPTY_LUT
        k = 0
    else:
        lut_sym, lut_len, k = lut
        lut_sym = np.ascontiguousarray(lut_sym, np.uint8)
        lut_len = np.ascontiguousarray(lut_len, np.uint8)
    cap = max(4096, out_hint)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_repair_decode(
            payload, nbits, start_bit, lut_sym, lut_len, k,
            code_kind, out, cap,
        )
        if got == -2:
            raise ValueError("malformed repair stream")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def arith_encode(data: np.ndarray, cum: np.ndarray, total: int):
    """64-bit block codes for the arithmetic coder's literal stream
    (incl. final lower + terminator), or None without the runtime."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.uint8)
    cum = np.ascontiguousarray(cum, np.uint64)
    cap = max(16, data.size // 4 + 16)
    while True:
        out = np.empty(cap, np.uint64)
        got = lib.tdc_arith_encode(data, data.size, cum, total, out, cap)
        if got >= 0:
            return out[:got]
        cap *= 4


def arith_decode(payload: np.ndarray, nbits: int, start_bit: int,
                 syms: np.ndarray, cums: np.ndarray, total: int,
                 count: int):
    """Decode ``count`` literals from the arithmetic block stream, or
    None without the runtime. Raises on malformed input."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    syms = np.ascontiguousarray(syms, np.uint8)
    cums = np.ascontiguousarray(cums, np.uint64)
    out = np.empty(max(1, count), np.uint8)
    got = lib.tdc_arith_decode(
        payload, nbits, start_bit, syms, cums, syms.size, total,
        count, out,
    )
    if got == -2:
        raise ValueError("malformed arithmetic stream")
    return out[:count]


def vlc_literals(payload: np.ndarray, nbits: int, start_bit: int,
                 kind: int):
    """Decode a whole gamma(1)/delta(2)/ternary(3) literal tail, or
    None without the runtime / on a non-literal stream (caller falls
    back to the per-symbol walk)."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    cap = max(64, nbits)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_vlc_literals(payload, nbits, start_bit, kind,
                                   out, cap)
        if got == -2:
            return None
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def lzss_window_encode(text: np.ndarray, window: int, threshold: int,
                       code_kind: int):
    """Factorize+encode the sliding-window LZSS stream in one native
    pass. Returns (packed bytes, nbits) or None."""
    lib = _load()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, np.uint8)
    cap_bits = max(256, text.size * 18 + 256)
    out = np.zeros((cap_bits + 7) // 8, np.uint8)
    got = lib.tdc_lzss_window_encode(
        text, text.size, window, threshold, code_kind, out, cap_bits
    )
    if got < 0:
        return None  # pathological expansion: python path handles it
    return out, int(got)


def lzss_window_decode(payload: np.ndarray, nbits: int, start_bit: int,
                       window: int, code_kind: int):
    """Decode the sliding-window LZSS stream, or None without the
    runtime. Raises on malformed input."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    cap = max(64, nbits * 2 + 64)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_lzss_window_decode(
            payload, nbits, start_bit, window, code_kind, out, cap
        )
        if got == -2:
            raise ValueError("malformed lzss stream")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def _stream_decode(fn_name, payload, nbits, start_bit, code_kind,
                   dict_max):
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    fn = getattr(lib, fn_name)
    cap = max(64, nbits * 2 + 64)
    while True:
        out = np.empty(cap, np.uint8)
        got = fn(payload, nbits, start_bit, code_kind, dict_max, out, cap)
        if got == -2:
            raise ValueError("malformed stream")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def lz78_stream_decode(payload, nbits, start_bit, code_kind, dict_max):
    """Whole-stream LZ78 decode for any code kind (growing ref widths,
    dict reset), or None without the runtime."""
    return _stream_decode("tdc_lz78_stream_decode", payload, nbits,
                          start_bit, code_kind, dict_max)


def lzw_stream_decode(payload, nbits, start_bit, code_kind, dict_max):
    """Whole-stream LZW decode (classic prefix-code dictionary incl.
    the self-referential case and reset lag), or None."""
    return _stream_decode("tdc_lzw_stream_decode", payload, nbits,
                          start_bit, code_kind, dict_max)


def lfs_start_decode(payload, nbits, start_bit, lut, w_id,
                     dict_lens: np.ndarray):
    """Decode the LFS rule strings + start string (flags + literals /
    rule ids). ``lut`` is (sym, len, k) or None for plain 8-bit
    literals. None without the runtime."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    if lut is None:
        lut_sym = lut_len = _EMPTY_LUT
        k = 0
    else:
        lut_sym, lut_len, k = lut
        lut_sym = np.ascontiguousarray(lut_sym, np.uint8)
        lut_len = np.ascontiguousarray(lut_len, np.uint8)
    lens = np.ascontiguousarray(dict_lens, np.int64)
    cap = max(64, nbits * 2 + 64)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_lfs_start_decode(
            payload, nbits, start_bit, lut_sym, lut_len, k, w_id,
            lens, lens.size, out, cap,
        )
        if got == -2:
            raise ValueError("malformed lfs stream")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def lfs2_decode(payload, nbits, start_bit, lut, w_id,
                dict_lens: np.ndarray):
    """Decode the LFS2 two-layer rule set + start stream, or None
    without the runtime."""
    lib = _load()
    if lib is None:
        return None
    payload = np.ascontiguousarray(payload, np.uint8)
    if lut is None:
        lut_sym = lut_len = _EMPTY_LUT
        k = 0
    else:
        lut_sym, lut_len, k = lut
        lut_sym = np.ascontiguousarray(lut_sym, np.uint8)
        lut_len = np.ascontiguousarray(lut_len, np.uint8)
    lens = np.ascontiguousarray(dict_lens, np.int64)
    cap = max(64, nbits * 2 + 64)
    while True:
        out = np.empty(cap, np.uint8)
        got = lib.tdc_lfs2_decode(
            payload, nbits, start_bit, lut_sym, lut_len, k, w_id,
            lens, lens.size, out, cap,
        )
        if got == -2:
            raise ValueError("malformed lfs2 stream")
        if got >= 0:
            return out[:got].tobytes()
        cap *= 4


def lcpcomp_bulldozer(sa, lcp, threshold):
    """Native bulldozer interval sweep; (pos, src, len) arrays or None."""
    lib = _load()
    if lib is None:
        return None
    sa = np.ascontiguousarray(sa, np.int64)
    lcp = np.ascontiguousarray(lcp, np.int64)
    n = sa.size
    cap = max(16, n + 1)
    fpos = np.empty(cap, np.int64)
    fsrc = np.empty(cap, np.int64)
    flen = np.empty(cap, np.int64)
    got = lib.tdc_lcpcomp_bulldozer(
        sa, lcp, n, threshold, fpos, fsrc, flen, cap
    )
    if got < 0:
        return None
    return fpos[:got], fsrc[:got], flen[:got]


def lfs_simst(parent, sdepth, is_leaf, suffix, n, min_lrf):
    """Native SimST LRF computation. Returns (dictionary list,
    occurrences list) matching SimSTStrategy.compute_rules, or None."""
    lib = _load()
    if lib is None:
        return None
    parent = np.ascontiguousarray(parent, np.int64)
    sdepth = np.ascontiguousarray(sdepth, np.int64)
    is_leaf = np.ascontiguousarray(
        np.asarray(is_leaf).astype(np.uint8), np.uint8
    )
    suffix = np.ascontiguousarray(suffix, np.int64)
    nn = parent.size
    d_cap = max(16, n + 1)
    o_cap = max(16, 2 * n + 1)
    d_start = np.empty(d_cap, np.int64)
    d_len = np.empty(d_cap, np.int64)
    o_pos = np.empty(o_cap, np.int64)
    o_rule = np.empty(o_cap, np.int64)
    o_len = np.empty(o_cap, np.int64)
    nd = ctypes.c_int64(0)
    got = lib.tdc_lfs_simst(
        parent, sdepth, is_leaf, suffix, nn, n, min_lrf,
        d_start, d_len, d_cap, o_pos, o_rule, o_len, o_cap,
        ctypes.byref(nd),
    )
    if got < 0:
        return None
    m = nd.value
    dictionary = list(zip(d_start[:m].tolist(), d_len[:m].tolist()))
    order = np.lexsort((o_rule[:got], o_pos[:got]))
    occurrences = [
        (int(o_pos[i]), int(o_rule[i]), int(o_len[i])) for i in order
    ]
    return dictionary, occurrences


def lfs_bst(parent, sdepth, suffix, n, min_lrf):
    """Native BST LRF computation matching BSTStrategy.compute_rules,
    or None."""
    lib = _load()
    if lib is None:
        return None
    parent = np.ascontiguousarray(parent, np.int64)
    sdepth = np.ascontiguousarray(sdepth, np.int64)
    suffix = np.ascontiguousarray(suffix, np.int64)
    nn = parent.size
    d_cap = max(16, n + 1)
    o_cap = max(16, 2 * n + 1)
    d_start = np.empty(d_cap, np.int64)
    d_len = np.empty(d_cap, np.int64)
    o_pos = np.empty(o_cap, np.int64)
    o_rule = np.empty(o_cap, np.int64)
    o_len = np.empty(o_cap, np.int64)
    nd = ctypes.c_int64(0)
    got = lib.tdc_lfs_bst(
        parent, sdepth, suffix, nn, n, min_lrf,
        d_start, d_len, d_cap, o_pos, o_rule, o_len, o_cap,
        ctypes.byref(nd),
    )
    if got < 0:
        return None
    m = nd.value
    dictionary = list(zip(d_start[:m].tolist(), d_len[:m].tolist()))
    order = np.lexsort((o_rule[:got], o_pos[:got]))
    occurrences = [
        (int(o_pos[i]), int(o_rule[i]), int(o_len[i])) for i in order
    ]
    return dictionary, occurrences


# ---- streaming (O(window)-memory) wrappers --------------------------------


def mtf_stream(data: bytes, table: np.ndarray, decode: bool = False) -> bytes:
    """One MTF chunk with carried 256-entry table state (modified in
    place). Reference parity: MTFCompressor over ``as_stream()``."""
    lib = _load()
    inp = np.frombuffer(data, np.uint8)
    out = np.empty(inp.size, np.uint8)
    if lib is not None:
        fn = lib.tdc_mtf_decode_s if decode else lib.tdc_mtf_encode_s
        fn(inp, out, inp.size, table)
        return out.tobytes()
    tbl = table.tolist()
    for i, c in enumerate(inp.tolist()):
        if decode:
            j = c
            c = tbl[j]
            out[i] = c
        else:
            j = tbl.index(c)
            out[i] = j
        if j:
            del tbl[j]
            tbl.insert(0, c)
    table[:] = tbl
    return out.tobytes()


def rle_decode_stream(chunk: np.ndarray, offset: int, prev: int,
                      final: bool):
    """Decode one RLE chunk. Returns (out bytes, consumed, prev'); the
    unconsumed tail (a token split by the chunk edge) must be re-fed
    with the next chunk."""
    lib = _load()
    if lib is None:
        # pure-python: parse tokens, stop before a cut vbyte
        data = chunk.tolist()
        out = bytearray()
        i = 0
        n = len(data)
        while i < n:
            tok = i
            c = data[i]
            i += 1
            if c == prev:
                run = 0
                shift = 0
                term = False
                while i < n:
                    b = data[i]
                    i += 1
                    run |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        term = True
                        break
                if not term:
                    if final:
                        raise ValueError("malformed RLE stream")
                    i = tok
                    break
                out.append(c)
                out.extend([c] * (run - offset))
                prev = c
            else:
                out.append(c)
                prev = c
        return bytes(out), i, prev
    inp = np.ascontiguousarray(chunk, np.uint8)
    cap = max(4096, inp.size * 4)
    while True:
        out = np.empty(cap, np.uint8)
        prev_io = ctypes.c_int64(prev)
        consumed = ctypes.c_int64(0)
        got = lib.tdc_rle_decode_s(
            inp, inp.size, out, cap, offset, ctypes.byref(prev_io),
            1 if final else 0, ctypes.byref(consumed),
        )
        if got == -2:
            raise ValueError("malformed RLE stream")
        if got >= 0:
            return out[:got].tobytes(), int(consumed.value), int(prev_io.value)
        cap *= 4


class Lz78Stream:
    """Stateful streaming LZ78/LZW parse+encode (tdc_lz78s_*): the
    dictionary, walk node, and factor counter live in a native handle;
    each feed() returns the chunk's completed factors as a (packed,
    nbits) bit run for StreamBitSink splicing. Byte-identical to the
    buffered compressors for every chunking. None-constructible check
    via native.available()."""

    def __init__(self, lzw: bool, dict_limit: int, code_kind: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.tdc_lz78s_new(int(lzw), dict_limit)
        if not self._h:
            raise MemoryError("tdc_lz78s_new failed")
        self._kind = code_kind

    def feed(self, chunk: bytes, final: bool):
        """Returns (packed u8[], nbits) for this chunk's factors."""
        inp = np.frombuffer(chunk, np.uint8)
        if inp.size == 0:
            inp = np.zeros(1, np.uint8)  # ndpointer rejects NULL
            n = 0
        else:
            n = inp.size
        # worst case per factor: ascii ref (<= 20 digits + ':') + raw
        # literal = 176 bits; plus the final flush factor
        cap_bits = (n + 2) * 184 + 64
        out = np.zeros((cap_bits + 7) // 8, np.uint8)
        got = self._lib.tdc_lz78s_feed(
            self._h, inp, n, 1 if final else 0, self._kind,
            out, cap_bits,
        )
        if got < 0:
            raise ValueError("lz78 stream encode overflow")
        return out, int(got)

    def close(self) -> None:
        if self._h:
            self._lib.tdc_lz78s_free(self._h)
            self._h = None

    def __del__(self):  # belt and braces; close() is the real path
        try:
            self.close()
        except Exception:
            pass


class Lz78DecStream:
    """Stateful streaming LZ78/LZW decode (tdc_lz78ds_*): the bit tail
    and the O(dict) (parent, char) expansion state live in a native
    handle; each feed() decodes every token completed inside the chunk
    (rolling back to the token start on bit underrun) and take()
    drains the decoded bytes. Byte-identical to the buffered
    decompressors for every chunking."""

    def __init__(self, lzw: bool, dict_limit: int, code_kind: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.tdc_lz78ds_new(int(lzw), dict_limit, code_kind)
        if not self._h:
            raise MemoryError("tdc_lz78ds_new failed")

    def feed(self, chunk: bytes, final: bool) -> bytes:
        inp = np.frombuffer(chunk, np.uint8)
        if inp.size == 0:
            inp = np.zeros(1, np.uint8)
            n = 0
        else:
            n = inp.size
        got = self._lib.tdc_lz78ds_feed(
            self._h, inp, n, 1 if final else 0
        )
        if got == -2:
            raise ValueError("malformed lz78/lzw stream")
        if got < 0:
            raise ValueError("lz78 stream decode failure")
        out = np.zeros(max(1, int(got)), np.uint8)
        took = self._lib.tdc_lz78ds_take(self._h, out, int(got))
        assert took == got
        return out[:got].tobytes()

    def close(self) -> None:
        if self._h:
            self._lib.tdc_lz78ds_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class LzssDecStream:
    """Stateful streaming LZSS sliding-window decode (tdc_lzssds_*):
    O(window) output tail + undecoded bit tail in a native handle;
    byte-identical to the buffered decode for every chunking."""

    def __init__(self, window: int, code_kind: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.tdc_lzssds_new(window, code_kind)
        if not self._h:
            raise MemoryError("tdc_lzssds_new failed")

    def feed(self, chunk: bytes, final: bool) -> bytes:
        inp = np.frombuffer(chunk, np.uint8)
        if inp.size == 0:
            inp = np.zeros(1, np.uint8)
            n = 0
        else:
            n = inp.size
        got = self._lib.tdc_lzssds_feed(
            self._h, inp, n, 1 if final else 0
        )
        if got == -2:
            raise ValueError("malformed lzss stream")
        if got < 0:
            raise ValueError("lzss stream decode failure")
        out = np.zeros(max(1, int(got)), np.uint8)
        took = self._lib.tdc_lzssds_take(self._h, out, int(got))
        assert took == got
        return out[:got].tobytes()

    def close(self) -> None:
        if self._h:
            self._lib.tdc_lzssds_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def lzss_window_encode_stream(buf: np.ndarray, start: int, abs_base: int,
                              final: bool, window: int, threshold: int,
                              code_kind: int):
    """Factorize+encode positions [start, limit) of one chunk buffer
    (limit = len-window unless final). Returns (packed, nbits, next_i)
    or None without the native runtime."""
    lib = _load()
    if lib is None:
        return None
    buf = np.ascontiguousarray(buf, np.uint8)
    span = max(64, buf.size - start)
    cap_bits = span * 18 + 256
    out = np.zeros((cap_bits + 7) // 8, np.uint8)
    next_i = ctypes.c_int64(0)
    got = lib.tdc_lzss_window_encode_s(
        buf, buf.size, start, abs_base, 1 if final else 0, window,
        threshold, code_kind, out, cap_bits, ctypes.byref(next_i),
    )
    if got < 0:
        raise ValueError("lzss stream encode failed")
    return out, int(got), int(next_i.value)
