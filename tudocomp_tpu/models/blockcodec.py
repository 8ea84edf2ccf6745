"""Flagship device pipeline: block-parallel RLE + shared canonical Huffman.

This is BASELINE.json config 1/2 re-designed TPU-first (reference
counterparts: ``compressors/RunLengthEncoder.hpp`` + ``coders/
HuffmanCoder.hpp``, composed like ``rle:encode(huff)``):

- the input splits into fixed-size **blocks** (the data-parallel unit over
  chips, see ``parallel/pipeline.py``);
- each block RLEs on device (token emission + bitpack — no sequential
  loop);
- ONE canonical Huffman table is built (host, ~256-element problem) from
  the device-computed *global* histogram of RLE bytes — across chips the
  histogram merges with psum and the table broadcasts (SURVEY.md §2.7);
- each block's RLE bytes split into ``sub_chunks`` fixed slices that
  Huffman-pack **independently** (gather + bitpack). Sub-chunk framing is
  the TPU-native wire-format decision: it costs a few bytes per chunk and
  buys (a) sequence-parallel encode across chips within a block and
  (b) embarrassingly parallel decode.

Container layout (integers are byte-aligned vbyte):

    magic "TBC1" | vbyte(header_len) |
    header (finished bit stream): block_size, sub_chunks, offset, orig_len,
        table flag + huffman table (as coders/huffman.py) |
    per block: vbyte(rle_len), sub_chunks x vbyte(chunk_bits),
        payload bytes per chunk (byte-aligned)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tudocomp_tpu.coders.huffman import HuffmanTable
from tudocomp_tpu.native import rle_decode
from tudocomp_tpu.io.bitio import BitReader, BitWriter
from tudocomp_tpu.ops.bitpack_pallas import (
    pack_bytes_huffman_chunks,
    pack_tokens_chunks,
    rle_pack_chunks,
)
from tudocomp_tpu.ops.hist_pallas import histogram_chunks
from tudocomp_tpu.ops.rle_jax import bytes_from_words, rle_tokens
from tudocomp_tpu.utils.vbyte import read_vbyte, write_vbyte

def PACK_TILE() -> int:
    """Token tile for the Pallas pack: large on TPU for MXU efficiency,
    small under CPU interpret mode (tests) to avoid padding waste."""
    return 4096 if jax.default_backend() == "tpu" else 256


def _pad_tokens(values, lens, tile):
    """Pad token arrays to a tile multiple with zero-length tokens."""
    n = values.shape[-1]
    pad = (-n) % tile
    if pad:
        values = jnp.pad(values, ((0, 0), (0, pad)))
        lens = jnp.pad(lens, ((0, 0), (0, pad)))
    return values, lens


def _pad_bytes(data, tile):
    n = data.shape[-1]
    pad = (-n) % tile
    if pad:
        data = jnp.pad(data, ((0, 0), (0, pad)))
    return data

MAGIC = b"TBC1"


def rle_capacity(block_size: int, sub_chunks: int) -> int:
    """Worst-case RLE output bytes (1.5x: length-2 runs), aligned so every
    sub-chunk is a multiple of 4 bytes."""
    cap = block_size + block_size // 2 + 8
    align = 4 * sub_chunks
    return cap + (-cap) % align


#: blocks with RLE capacity below this use the full histogram — for
#: small blocks the fixed table overhead dominates, not the hist pass
TABLE_SAMPLE_MIN_CAP = 1 << 18


def table_histogram(rle_bytes, rle_lens, cap: int, tile: int):
    """Histogram for table construction, sampled 1/8 for large blocks
    (the one-hot hist kernel is VMEM-bandwidth bound)."""
    if cap >= TABLE_SAMPLE_MIN_CAP:
        sample_cap = max(tile, (cap >> 3) // tile * tile)
        return histogram_chunks(
            _pad_bytes(rle_bytes[:, :sample_cap], tile),
            jnp.minimum(rle_lens, sample_cap),
            tile=tile,
        )
    return histogram_chunks(_pad_bytes(rle_bytes, tile), rle_lens, tile=tile)


@functools.partial(jax.jit, static_argnames=("offset", "cap"))
def rle_histogram_step(blocks, lengths, *, offset: int, cap: int):
    """Stage 1 (per batch of blocks): device RLE + table histogram.

    Token emission is elementwise XLA; the variable-length pack and the
    histogram run in the Pallas kernels (ops/bitpack_pallas.py,
    ops/hist_pallas.py). For large blocks the table histogram samples the
    first 1/8 of each block's RLE bytes (the zstd approach; the +1 in
    ``_table_from_hist`` keeps every byte value encodable).

    Returns ``(rle_bytes: u8[B,cap], rle_lens: i32[B], hist: u32[256])``.
    """
    tile = PACK_TILE()
    words, rle_lens = rle_pack_chunks(
        blocks, lengths, tile=tile, offset=offset
    )
    rle_bytes = jax.vmap(lambda w: bytes_from_words(w, cap))(words)
    hist = table_histogram(rle_bytes, rle_lens, cap, tile)
    return rle_bytes, rle_lens, hist


@functools.partial(jax.jit, static_argnames=("sub_chunks",))
def pack_step(rle_bytes, rle_lens, sym_code, sym_len, *, sub_chunks: int):
    """Stage 2: fused per-sub-chunk Huffman lookup + Pallas pack — the
    (code, len) table rides the MXU inside the pack kernel, so no token
    arrays round-trip through HBM.

    Returns ``(words: u32[B,S,Wc], bits: i32[B,S])``.
    """
    b, cap = rle_bytes.shape
    cs = cap // sub_chunks
    chunks = rle_bytes.reshape(b * sub_chunks, cs)
    starts = jnp.arange(sub_chunks, dtype=jnp.int32) * cs
    chunk_lens = jnp.clip(
        rle_lens[:, None] - starts[None, :], 0, cs
    ).reshape(-1)
    tile = PACK_TILE()
    chunks = _pad_bytes(chunks, tile)
    words, bits = pack_bytes_huffman_chunks(
        chunks, chunk_lens, sym_code, sym_len, tile=tile
    )
    wc = words.shape[-1]
    return (
        words.reshape(b, sub_chunks, wc),
        bits.reshape(b, sub_chunks),
    )


@functools.partial(
    jax.jit, static_argnames=("offset", "cap", "sub_chunks")
)
def flagship_step(
    blocks, lengths, sym_code, sym_len, *, offset: int, cap: int,
    sub_chunks: int,
):
    """The full fused encode step (histogram emitted for the next batch's
    table — the two-pass pipeline software-pipelines over batches)."""
    rle_bytes, rle_lens, hist = rle_histogram_step(
        blocks, lengths, offset=offset, cap=cap
    )
    words, bits = pack_step(
        rle_bytes, rle_lens, sym_code, sym_len, sub_chunks=sub_chunks
    )
    return words, bits, rle_lens, hist


class BlockCodec:
    """Host orchestration: split -> device encode -> container assembly."""

    def __init__(
        self, block_size: int = 1 << 20, sub_chunks: int = 8,
        offset: int = 0,
    ):
        self.block_size = block_size
        self.sub_chunks = sub_chunks
        self.offset = offset
        self.cap = rle_capacity(block_size, sub_chunks)

    # -- encode --------------------------------------------------------------

    def split_blocks(self, data: bytes):
        n = len(data)
        bs = self.block_size
        n_blocks = max(1, -(-n // bs))
        arr = np.zeros((n_blocks, bs), np.uint8)
        flat = np.frombuffer(data, np.uint8)
        for i in range(n_blocks):
            piece = flat[i * bs : (i + 1) * bs]
            arr[i, : piece.size] = piece
        lengths = np.minimum(
            np.full(n_blocks, bs, np.int32),
            n - bs * np.arange(n_blocks, dtype=np.int64),
        ).astype(np.int32)
        return arr, lengths

    def compress(self, data: bytes) -> bytes:
        blocks, lengths = self.split_blocks(data)
        n_blocks = blocks.shape[0]
        # pad the batch to a power of two: one compilation per size bucket
        b2 = 1 << (n_blocks - 1).bit_length() if n_blocks > 1 else 1
        if b2 != n_blocks:
            blocks = np.pad(blocks, ((0, b2 - n_blocks), (0, 0)))
            lengths = np.pad(lengths, (0, b2 - n_blocks))
        rle_bytes, rle_lens, hist = rle_histogram_step(
            jnp.asarray(blocks), jnp.asarray(lengths),
            offset=self.offset, cap=self.cap,
        )
        hist = np.asarray(hist, np.int64)
        table = self._table_from_hist(hist)
        sym_code, sym_len = self._device_table(table)
        words, bits = pack_step(
            rle_bytes, rle_lens, sym_code, sym_len,
            sub_chunks=self.sub_chunks,
        )
        return self._assemble(
            data, np.asarray(rle_lens)[:n_blocks],
            np.asarray(words)[:n_blocks], np.asarray(bits)[:n_blocks],
            table,
        )

    def _table_from_hist(self, hist: np.ndarray):
        hist = np.asarray(hist, np.int64)
        if self.cap >= TABLE_SAMPLE_MIN_CAP:
            # the histogram was sampled: +1 keeps every byte value
            # encodable at sub-0.1% ratio cost
            hist = hist + 1
        if (hist > 0).sum() <= 1:
            return None
        # 16-bit cap keeps codes pair-mergeable for the packer
        return HuffmanTable.from_counts(hist, max_len=16)

    @staticmethod
    def _device_table(table):
        if table is None:
            # identity 8-bit "code" so the device path is still exercised
            return (
                jnp.arange(256, dtype=jnp.uint32),
                jnp.full(256, 8, jnp.uint32),
            )
        return (
            jnp.asarray(table.sym_code.astype(np.uint32)),
            jnp.asarray(table.sym_len.astype(np.uint32)),
        )

    def _assemble(self, data, rle_lens, words, bits, table) -> bytes:
        out = bytearray(MAGIC)
        head = BitWriter()
        head.write_compressed_int(self.block_size)
        head.write_compressed_int(self.sub_chunks)
        head.write_compressed_int(self.offset)
        head.write_compressed_int(len(data))
        if table is None:
            head.write_bit(0)
        else:
            head.write_bit(1)
            table.write(head)
        header = head.getvalue()
        write_vbyte(out, len(header))
        out += header
        n_blocks = words.shape[0]
        be_words = words.astype(">u4")
        for bi in range(n_blocks):
            write_vbyte(out, int(rle_lens[bi]))
            for s in range(self.sub_chunks):
                write_vbyte(out, int(bits[bi, s]))
            for s in range(self.sub_chunks):
                nbytes = (int(bits[bi, s]) + 7) // 8
                out += be_words[bi, s].view(np.uint8)[:nbytes].tobytes()
        return bytes(out)

    # -- decode (host specification; device decode: ops/hufdec_jax.py) ------

    def decompress(self, data: bytes) -> bytes:
        if data[:4] != MAGIC:
            raise ValueError("bad magic")
        header_len, pos = read_vbyte(data, 4)
        head = BitReader(data[pos : pos + header_len])
        pos += header_len
        block_size = head.read_compressed_int()
        sub_chunks = head.read_compressed_int()
        offset = head.read_compressed_int()
        orig_len = head.read_compressed_int()
        table = HuffmanTable.read(head) if head.read_bit() else None
        cap = rle_capacity(block_size, sub_chunks)
        cs = cap // sub_chunks
        if table is not None:
            table.build_lut()  # build once before the worker pool

        # pass 1: scan block frames (cheap); pass 2: decode blocks in a
        # thread pool — the native kernels release the GIL, so sub-chunk
        # Huffman walks and RLE expansion run on all host cores
        frames = []  # (rle_len, [(payload_off, nbytes, clen)])
        done = 0
        while done < orig_len:
            rle_len, pos = read_vbyte(data, pos)
            chunks = []
            chunk_bits = []
            for _ in range(sub_chunks):
                cb, pos = read_vbyte(data, pos)
                chunk_bits.append(cb)
            for s in range(sub_chunks):
                nbytes = (chunk_bits[s] + 7) // 8
                clen = min(max(rle_len - s * cs, 0), cs)
                chunks.append((pos, nbytes, clen))
                pos += nbytes
            frames.append((rle_len, chunks))
            done += min(block_size, orig_len - done)

        def decode_block(frame):
            rle_len, chunks = frame
            rle = np.zeros(rle_len, np.uint8)
            for s, (off, nbytes, clen) in enumerate(chunks):
                if clen == 0:
                    continue
                payload = np.frombuffer(data, np.uint8, nbytes, off)
                if table is None:
                    syms = payload[:clen]  # identity 8-bit codes
                else:
                    syms = table.fast_decode(payload, clen)
                rle[s * cs : s * cs + clen] = syms
            return rle_decode(rle, offset)

        if len(frames) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor() as ex:
                parts = list(ex.map(decode_block, frames))
        else:
            parts = [decode_block(f) for f in frames]
        return b"".join(parts)[:orig_len]
