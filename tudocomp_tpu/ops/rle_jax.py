"""Device run-length encoding as a token-emission kernel.

Re-derivation of the reference format (``compressors/RunLengthEncoder.hpp``:
run of n >= 2 equal bytes -> byte, byte, vbyte(n - 2 + offset); single byte
verbatim) as an array program (no sequential loop):

1. run boundaries  = elementwise neq with left neighbor
2. run lengths     = distance to next boundary (reverse cummin of boundary
                     indices) — computed *at run starts only*
3. token emission  = 2 token slots per input position:
                     slot 0: ``c`` (8 bits) or ``cc`` (16 bits) at run starts
                     slot 1: the vbyte payload as ONE MSB-first token
                             (<= 4 vbyte bytes = 32 bits, i.e. run lengths
                             < 2^28 — far above any block size we use)
4. packing         = the universal bitpack kernel; all token lengths are
                     multiples of 8, so the packed words ARE the RLE byte
                     stream.

Bit-exact vs the host specification ``compressors/rle.py:rle_encode``.
Positions >= ``length`` (padding in fixed-shape batches) emit nothing and
never merge with real runs (a boundary is forced at ``length``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from tudocomp_tpu.ops.bitpack import pack_tokens_device

_U32 = jnp.uint32


def vbyte_token(v: jnp.ndarray):
    """Vectorized vbyte (7 data bits + continuation MSB, little-endian byte
    order) of ``v < 2**28`` as a single MSB-first token ``(value, bits)``."""
    v = v.astype(_U32)
    nb = (
        jnp.ones(v.shape, jnp.int32)
        + (v >= _U32(1 << 7)).astype(jnp.int32)
        + (v >= _U32(1 << 14)).astype(jnp.int32)
        + (v >= _U32(1 << 21)).astype(jnp.int32)
    )
    value = jnp.zeros(v.shape, _U32)
    for k in range(4):
        byte = ((v >> _U32(7 * k)) & _U32(0x7F)) | jnp.where(
            k < nb - 1, _U32(0x80), _U32(0)
        )
        shift = jnp.clip((nb - 1 - k) * 8, 0, 31).astype(_U32)
        value = value | jnp.where(k < nb, byte << shift, _U32(0))
    return value, nb * 8


def rle_tokens(block: jnp.ndarray, length, offset: int = 0):
    """RLE token arrays for ``block[:length]``.

    Returns ``(values: u32[2N], lens: u32[2N])`` in emission order.
    """
    a = block.astype(_U32)
    n = a.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    length = jnp.asarray(length, jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), a[1:] != a[:-1]]
    ) | (idx >= length)
    # next boundary strictly after i (reverse cummin over boundary indices)
    b_idx = jnp.where(boundary, idx, jnp.int32(n))
    rcm = lax.cummin(b_idx, reverse=True)
    nxt = jnp.concatenate([rcm[1:], jnp.full(1, n, jnp.int32)])
    run_len = jnp.minimum(nxt, length) - idx
    is_start = boundary & (idx < length)
    is_run = is_start & (run_len >= 2)
    # slot 0: char (8 bits) or doubled char (16 bits)
    v0 = jnp.where(is_run, (a << _U32(8)) | a, a)
    l0 = jnp.where(is_start, jnp.where(is_run, 16, 8), 0)
    # slot 1: vbyte(run_len - 2 + offset)
    vb_val, vb_bits = vbyte_token(
        jnp.maximum(run_len - 2 + offset, 0).astype(_U32)
    )
    v1 = vb_val
    l1 = jnp.where(is_run, vb_bits, 0)
    values = jnp.stack([v0, v1], axis=1).reshape(-1)
    lens = jnp.stack([l0, l1], axis=1).reshape(-1).astype(_U32)
    return values, lens


def rle_encode_device(block: jnp.ndarray, length, offset: int = 0):
    """RLE byte stream of ``block[:length]`` as packed big-endian words.

    Returns ``(words: u32[2N+1], n_bytes: i32)``.
    """
    values, lens = rle_tokens(block, length, offset)
    words, total_bits = pack_tokens_device(values, lens)
    return words, total_bits >> 3


def bytes_from_words(words: jnp.ndarray, count: int) -> jnp.ndarray:
    """First ``count`` (static) bytes of a big-endian uint32 word buffer."""
    b = jnp.stack(
        [(words >> _U32(sh)) & _U32(0xFF) for sh in (24, 16, 8, 0)],
        axis=-1,
    ).reshape(*words.shape[:-1], -1)
    return b[..., :count].astype(jnp.uint8)
