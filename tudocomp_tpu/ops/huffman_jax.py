"""Device-side Huffman: masked histogram + table-driven gather-encode.

The TPU formulation of the reference coder (``coders/HuffmanCoder.hpp``):
the *table* (an inherently sequential ~256-element problem) is built on
host from a device-computed histogram; encode is then a pure gather
``(sym_code[b], sym_len[b])`` followed by the universal bitpack kernel.
Across chips, per-shard histograms merge with ``psum`` and the shared table
broadcasts to all shards (SURVEY.md §2.7).

Codeword lengths are limited to <= 31 bits so a codeword always fits one
packer token (see ``limit_codelengths`` in ``coders/huffman.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tudocomp_tpu.ops.bitpack import pack_tokens_device

_U32 = jnp.uint32


def masked_histogram(data: jnp.ndarray, length) -> jnp.ndarray:
    """256-bin histogram of ``data.ravel()[:length]`` (uint8 input)."""
    flat = data.reshape(-1).astype(jnp.int32)
    w = (jnp.arange(flat.shape[0]) < jnp.asarray(length)).astype(_U32)
    return jnp.zeros(256, _U32).at[flat].add(w)


def table_lookup_mxu(idx_u8: jnp.ndarray, columns):
    """Small-table lookup as a one-hot matmul on the MXU.

    TPU dynamic gather from a 256-entry table is ~50x slower than
    streaming a one-hot through the systolic array (measured on v5e:
    252ms vs 38ms for 12M lookups, and a Pallas-fused version is faster
    still). Each column must hold values < 256 so bf16 stays exact.

    ``idx_u8``: uint8 indices, any shape with size % 128 == 0 (padded by
    caller). ``columns``: iterable of u32[256] arrays with entries < 256.
    Returns a list of u32 arrays shaped like ``idx_u8``.
    """
    shape = idx_u8.shape
    x = idx_u8.reshape(-1, 128).astype(jnp.int32)
    oh = (
        x[..., None] == jnp.arange(256, dtype=jnp.int32)
    ).astype(jnp.bfloat16)
    tab = jnp.stack(
        [c.astype(jnp.float32) for c in columns], axis=1
    ).astype(jnp.bfloat16)
    r = jax.lax.dot_general(
        oh, tab, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return [r[..., k].astype(_U32).reshape(shape) for k in range(len(columns))]


def lookup_codes(flat_u8: jnp.ndarray, sym_code: jnp.ndarray,
                 sym_len: jnp.ndarray):
    """(codeword, length) per byte, via 4 byte-plane MXU lookups."""
    n = flat_u8.shape[0]
    pad = (-n) % 128
    if pad:
        flat_u8 = jnp.concatenate(
            [flat_u8, jnp.zeros(pad, flat_u8.dtype)]
        )
    sym_code = sym_code.astype(_U32)
    b0, b1, b2, b3, ln = table_lookup_mxu(
        flat_u8,
        (
            sym_code >> 24, (sym_code >> 16) & _U32(0xFF),
            (sym_code >> 8) & _U32(0xFF), sym_code & _U32(0xFF),
            sym_len.astype(_U32),
        ),
    )
    values = (b0 << _U32(24)) | (b1 << _U32(16)) | (b2 << _U32(8)) | b3
    return values[:n], ln[:n]


def huffman_encode_tokens(
    data: jnp.ndarray, length, sym_code: jnp.ndarray, sym_len: jnp.ndarray
):
    """Token arrays coding ``data[:length]`` with a canonical table."""
    flat = data.reshape(-1)
    values, lens = lookup_codes(flat, sym_code, sym_len)
    mask = jnp.arange(flat.shape[0]) < jnp.asarray(length)
    return values, jnp.where(mask, lens, _U32(0))


def huffman_pack_device(
    data: jnp.ndarray, length, sym_code: jnp.ndarray, sym_len: jnp.ndarray
):
    """Gather-encode + pack. Returns ``(words, total_bits)``."""
    values, lens = huffman_encode_tokens(data, length, sym_code, sym_len)
    return pack_tokens_device(values, lens)
