"""Pallas TPU kernel for variable-length bit packing.

The XLA formulation (``ops/bitpack.py``: cumsum + segment_sum) is
scatter-bound: measured on v5e, segment_sum runs ~0.3 s per 1M tokens and
searchsorted-based gather variants are worse. This kernel reaches memory
speed by re-mapping the problem onto the MXU:

- the grid walks token tiles **sequentially**, carrying (bit-in-word,
  base word index, partial word) in SMEM — the bitstream dependency
  collapses into 3 scalars;
- in-tile exclusive bit-offset cumsum = triangular-ones matmuls (MXU);
- word placement = one-hot(word-index) matmuls on 4 byte planes: every
  f32 accumulation is an exact integer < 256 because all token bit
  ranges are disjoint;
- each tile DMAs a fixed-size word window to HBM at its dynamic base
  word; the partial tail word is re-written by the next tile
  (append-only, sequential grid) — no read-modify-write.

Layout discipline (Mosaic): every vector's last dim is 128-aligned —
words live on the LANE axis as (1, wt) / (8, wt); all integer math is
int32 with ``lax.shift_right_logical`` (Mosaic has no u32<->f32 casts).

Token contract: ``lens[i] <= 32`` bits of ``values[i]``, MSB-first;
``lens == 0`` tokens contribute nothing (fixed-shape padding). Output is
bit-identical to ``ops/bitpack.py:pack_tokens_device`` / the host spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_I32 = jnp.int32


def _wt_for(tile: int, max_bits: int) -> int:
    """Accumulator width: enough words for the tile's bits (+ carry
    slack) AND for the last row's 384-word aligned placement window."""
    by_bits = tile * max_bits // 32 + 2 * LANES
    by_window = ((4095 + max_bits * tile) // 4096) * 128 + 3 * LANES
    return max(by_bits, by_window)


def _srl(x, n):
    return lax.shift_right_logical(x, jnp.broadcast_to(_I32(n), x.shape) if isinstance(n, int) else n)


def _byte_planes_bf16(x):
    """(rows, 128) i32 bit pattern -> 4 x (rows, 128) bf16 byte planes."""
    return [
        (_srl(x, 24) & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
        (_srl(x, 16) & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
        (_srl(x, 8) & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
        (x & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
    ]


def _pack_tile(values, lens, words_ref, acc_ref, out_words_ref,
               carry_ref, state_ref, dma_sem, *, rows: int, wt: int):
    """Shared tile body: pack (rows,128) int32 (values, lens<=32) tokens
    into the chunk's output stream with the superword carry protocol."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        # bit position within the current 128-word superword and the
        # (128-aligned) base word index — DMA offsets must be lane-tile
        # aligned, so flushing happens at superword granularity and the
        # unflushed tail lives in carry_ref.
        state_ref[0] = _I32(0)
        state_ref[1] = _I32(0)
        carry_ref[:, :] = jnp.zeros((1, LANES), _I32)

    s0 = state_ref[0]  # in [0, 4096)
    base = state_ref[1]  # multiple of 128

    # bit-offset exclusive cumsum in row-major order, no narrow vectors:
    # in-row: strict-lower-tri matmul; row base: broadcast row sums via
    # an all-ones matmul, then cumsum down the sublane axis.
    lens_bf = lens.astype(jnp.float32).astype(jnp.bfloat16)
    tri = (
        lax.broadcasted_iota(_I32, (LANES, LANES), 0)
        < lax.broadcasted_iota(_I32, (LANES, LANES), 1)
    ).astype(jnp.bfloat16)
    excl_in_row = lax.dot_general(
        lens_bf, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_I32)  # exact: sums < 2**16
    ones = jnp.ones((LANES, LANES), jnp.bfloat16)
    row_sums = lax.dot_general(
        lens_bf, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, 128), every lane = row total
    # inclusive scan down sublanes by log-shift adds (no cumsum in Mosaic)
    incl = row_sums
    shift = 1
    while shift < rows:
        shifted = jnp.concatenate(
            [jnp.zeros((shift, LANES), incl.dtype), incl[:-shift]], axis=0
        )
        incl = incl + shifted
        shift *= 2
    row_base = (incl - row_sums).astype(_I32)
    offs = s0 + row_base + excl_in_row
    tile_bits = jnp.sum(lens)

    # split each token into a word-aligned part + spill into next word
    mask = jnp.where(lens >= 32, _I32(-1), (_I32(1) << lens) - 1)
    v = values & mask
    bitpos = offs & 31
    sh = 32 - bitpos - lens  # in [-31, 32]
    lsh = jnp.clip(sh, 0, 31)
    rsh = jnp.clip(-sh, 0, 31)
    part1 = jnp.where(sh >= 0, v << lsh, _srl(v, rsh))
    spill = jnp.where(
        sh < 0,
        (v & ((_I32(1) << rsh) - 1)) << ((32 - rsh) & 31),
        _I32(0),
    )
    w0 = _srl(offs, 5)  # word index within tile, < wt - 1

    acc_ref[:, :] = jnp.zeros((8, wt), jnp.float32)
    p1_planes = _byte_planes_bf16(part1)
    sp_planes = _byte_planes_bf16(spill)
    # per-row placement through a narrow 384-word window: a row's 128
    # tokens span <= 129 words, so the one-hot is (WINDOW, 128) instead
    # of (wt, 128) — ~6x less VMEM traffic. The window starts at the
    # row's 128-aligned superword, so the accumulate slice stays legal.
    WINDOW = 3 * LANES
    win_iota = lax.broadcasted_iota(_I32, (WINDOW, LANES), 0)
    row_start_bits = s0 + row_base  # (rows, 128); same value per lane
    for r in range(rows):
        aligned = (jnp.max(row_start_bits[r : r + 1, :]) >> 12) * 128
        w0_local = w0[r][None, :] - aligned
        oh1 = (win_iota == w0_local).astype(jnp.bfloat16)
        planes = jnp.stack(
            [p[r] for p in p1_planes] + [p[r] for p in sp_planes], axis=0
        )  # (8, 128)
        acc_ref[:, pl.ds(pl.multiple_of(aligned, LANES), WINDOW)] += (
            lax.dot_general(
                planes, oh1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )

    acc = acc_ref[:, :]  # (8, wt) exact small ints
    b = [acc[k : k + 1, :].astype(_I32) for k in range(8)]
    words_p1 = (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]
    words_sp = (b[4] << 24) | (b[5] << 16) | (b[6] << 8) | b[7]
    lane_iota = lax.broadcasted_iota(_I32, (1, wt), 1)
    words_sp = jnp.where(
        lane_iota == 0, _I32(0), pltpu.roll(words_sp, 1, 1)
    )  # spill belongs one word after its token's w0
    words = words_p1 | words_sp  # (1, wt); disjoint bits -> OR == ADD

    # fold the carried (unflushed) superword tail into local words [0,128)
    words = words | jnp.concatenate(
        [carry_ref[:, :], jnp.zeros((1, wt - LANES), _I32)], axis=1
    )
    out_words_ref[:, :] = words

    t_end = s0 + tile_bits
    flushed = (_srl(t_end, 12)) * 128  # whole superwords now final
    state_ref[0] = t_end & 4095
    state_ref[1] = base + flushed
    carry_ref[:, :] = out_words_ref[
        :, pl.ds(pl.multiple_of(flushed, LANES), LANES)
    ]

    c = pl.program_id(0)
    dma = pltpu.make_async_copy(
        out_words_ref.at[:, :],
        words_ref.at[c, :, pl.ds(pl.multiple_of(base, LANES), wt)],
        dma_sem,
    )
    dma.start()
    dma.wait()
    return tile_bits


def _pack_kernel(
    values_ref, lens_ref, words_ref,
    acc_ref, out_words_ref, carry_ref, state_ref, dma_sem,
    *, rows: int, wt: int,
):
    _pack_tile(
        values_ref[0], lens_ref[0], words_ref, acc_ref, out_words_ref,
        carry_ref, state_ref, dma_sem, rows=rows, wt=wt,
    )


def _pack_huffman_kernel(
    lengths_ref, data_ref, table_ref, words_ref,
    acc_ref, out_words_ref, carry_ref, state_ref, dma_sem,
    *, rows: int, wt: int, tile: int,
):
    """Fused canonical-Huffman lookup + pack: bytes in, bit stream out.

    The (code_hi, code_lo, len) table rides the MXU as an (8, 256)
    matrix against a per-row one-hot of the byte values — no token
    arrays ever touch HBM. Codes must be <= 16 bits.
    """
    c = pl.program_id(0)
    t = pl.program_id(1)
    data = data_ref[0]  # (rows, 128) int32 byte values
    table = table_ref[:, :]  # (8, 256) bf16: rows 0..2 = hi, lo, len

    length = lengths_ref[c]
    base_pos = t * tile
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
    pos = base_pos + row * LANES + lane

    bins = lax.broadcasted_iota(_I32, (256, LANES), 0)
    his = []
    los = []
    lns = []
    for r in range(rows):
        oh = (bins == data[r][None, :]).astype(jnp.bfloat16)  # (256,128)
        got = lax.dot_general(
            table, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, 128)
        his.append(got[0:1, :])
        los.append(got[1:2, :])
        lns.append(got[2:3, :])
    hi = jnp.concatenate(his, axis=0).astype(_I32)
    lo = jnp.concatenate(los, axis=0).astype(_I32)
    lens = jnp.concatenate(lns, axis=0).astype(_I32)
    values = (hi << 8) | lo
    lens = jnp.where(pos < length, lens, _I32(0))
    _pack_tile(
        values, lens, words_ref, acc_ref, out_words_ref,
        carry_ref, state_ref, dma_sem, rows=rows, wt=wt,
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pack_bytes_huffman_chunks(
    data: jnp.ndarray, lengths: jnp.ndarray,
    sym_code: jnp.ndarray, sym_len: jnp.ndarray, *,
    tile: int = 2048, interpret: bool | None = None,
):
    """Huffman-encode + pack per-chunk byte buffers in one fused kernel.

    ``data: u8[C, N]`` (N % tile == 0), ``lengths: i32[C]`` mask the
    tails; codes must be <= 16 bits. Returns ``(words u32[C,cap],
    bits i32[C])`` — ``bits`` comes from a table lookup reduction.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    csize, n = data.shape
    assert n % tile == 0 and tile % LANES == 0
    rows = tile // LANES
    wt = _wt_for(tile, 16)
    cap = n // 2 + wt + LANES
    data_i = data.astype(jnp.int32).reshape(csize, n // LANES, LANES)
    code = sym_code.astype(jnp.uint32)
    table = jnp.stack(
        [
            ((code >> 8) & 0xFF).astype(jnp.float32),
            (code & 0xFF).astype(jnp.float32),
            sym_len.astype(jnp.float32),
        ]
        + [jnp.zeros(256, jnp.float32)] * 5,
        axis=0,
    ).astype(jnp.bfloat16)

    kernel = functools.partial(
        _pack_huffman_kernel, rows=rows, wt=wt, tile=tile
    )
    words = pl.pallas_call(
        kernel,
        grid=(csize, n // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, rows, LANES), lambda ci, ti: (ci, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((csize, 1, cap), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, wt), jnp.float32),
            pltpu.VMEM((1, wt), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths.astype(jnp.int32), data_i, table)
    # total bits per chunk: sum of masked symbol code lengths (dynamic
    # gather is slow on TPU — use the one-hot MXU lookup)
    from tudocomp_tpu.ops.huffman_jax import table_lookup_mxu

    (lens_all,) = table_lookup_mxu(
        data.reshape(-1), (sym_len.astype(jnp.uint32),)
    )
    mask = (
        jnp.arange(n, dtype=jnp.int32)[None, :] < lengths[:, None]
    )
    bits = jnp.sum(
        jnp.where(mask, lens_all.reshape(csize, n).astype(jnp.int32), 0),
        axis=1, dtype=jnp.int32,
    )
    return lax.bitcast_convert_type(words[:, 0, :], jnp.uint32), bits


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pack_tokens_chunks(
    values: jnp.ndarray, lens: jnp.ndarray, *,
    tile: int = 2048, interpret: bool | None = None,
):
    """Pack per-chunk token streams on device.

    ``values, lens: u32[C, N]`` (N % tile == 0, tile % 128 == 0).
    Returns ``(words: u32[C, cap], bits: i32[C])`` where
    ``cap = N + tile + 256``; only the first ``ceil(bits/32)`` words per
    chunk are meaningful.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, n = values.shape
    assert n % tile == 0 and tile % LANES == 0
    rows = tile // LANES
    # max words one tile can touch: carried superword (<=127 words +
    # partial) + 32*tile new bits
    wt = tile + 2 * LANES
    cap = n + wt + LANES
    n_tiles = n // tile
    values = lax.bitcast_convert_type(
        values.astype(jnp.uint32), jnp.int32
    ).reshape(c, n // LANES, LANES)
    lens = lens.astype(jnp.int32).reshape(c, n // LANES, LANES)

    grid = (c, n_tiles)
    kernel = functools.partial(_pack_kernel, rows=rows, wt=wt)
    spec_in = pl.BlockSpec(
        (1, rows, LANES), lambda ci, ti: (ci, ti, 0),
        memory_space=pltpu.VMEM,
    )
    words = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_in, spec_in],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((c, 1, cap), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, wt), jnp.float32),
            pltpu.VMEM((1, wt), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(values, lens)
    bits = jnp.sum(lens, axis=(1, 2), dtype=jnp.int32)
    return lax.bitcast_convert_type(words[:, 0, :], jnp.uint32), bits


def _rle_pack_kernel(
    lengths_ref, data_ref, words_ref,
    acc_ref, out_words_ref, carry_ref, state_ref, rle_state_ref, dma_sem,
    *, rows: int, wt: int, tile: int, cap: int, offset: int,
):
    """Fused RLE: boundaries, start-of-run cummax, capped-piece token
    emission AND bit packing in one kernel (ops/rle_jax.py spec).

    Pieces emit at their END positions; the end decision for a position
    needs the NEXT byte, so each grid step emits tokens for the
    positions one before its own (window shifted by one) and the grid
    runs one extra step per chunk. Carries: the previous tile's last
    byte, the running start-of-run position, and the total bit count.
    """
    from tudocomp_tpu.ops.rle_jax import RUN_CAP

    c = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init_rle():
        rle_state_ref[0] = _I32(-1)  # previous byte (-1: none)
        rle_state_ref[1] = _I32(0)   # start of current run
        rle_state_ref[2] = _I32(0)   # total bits emitted

    length = lengths_ref[c]
    data = data_ref[0]  # (rows, 128) int32 bytes
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
    pos = t * tile + row * LANES + lane

    # prev[i] = byte at pos-1 (carry for the tile's first position)
    rolled = pltpu.roll(data, 1, 1)  # lane-1 shift (wraps)
    row_last = jnp.max(
        jnp.where(lane == LANES - 1, data, _I32(-1)),
        axis=1, keepdims=True,
    )  # (rows, 1): each row's last byte
    prev_rows = jnp.concatenate(
        [jnp.full((1, 1), rle_state_ref[0], _I32), row_last[:-1]], axis=0
    )  # (rows, 1): previous row's last byte
    prev = jnp.where(lane == 0, prev_rows, rolled)

    boundary = (data != prev) | (pos == 0) | (pos >= length)

    # inclusive running max of boundary positions (start of run at pos)
    b_idx = jnp.where(boundary, pos, _I32(-1))
    m = b_idx
    shift = 1
    while shift < LANES:  # in-row lane cummax by log shifts
        sh = pltpu.roll(m, shift, 1)
        m = jnp.maximum(m, jnp.where(lane >= shift, sh, _I32(-1)))
        shift *= 2
    row_max = jnp.max(m, axis=1, keepdims=True)  # (rows, 1)
    rm = row_max
    shift = 1
    while shift < rows:  # down-sublane cummax of row maxima
        rm = jnp.maximum(
            rm,
            jnp.concatenate(
                [jnp.full((shift, 1), _I32(-1)), rm[:-shift]], axis=0
            ),
        )
        shift *= 2
    prev_row_max = jnp.concatenate(
        [jnp.full((1, 1), _I32(-1)), rm[:-1]], axis=0
    )
    sor = jnp.maximum(
        jnp.maximum(m, prev_row_max), rle_state_ref[1]
    )  # (rows,128): start of run at each position (inclusive)

    # emission for e = pos - 1: end of piece iff boundary at pos or cap
    e = pos - 1
    c_e = prev  # byte at e
    sor_e_prev = jnp.where(lane == 0,
                           jnp.concatenate([
                               jnp.full((1, 1), rle_state_ref[1], _I32),
                               jnp.max(jnp.where(
                                   lane == LANES - 1, sor, _I32(-1)
                               ), axis=1, keepdims=True)[:-1],
                           ], axis=0),
                           pltpu.roll(sor, 1, 1))
    since = e - sor_e_prev
    piece_len = (since % RUN_CAP) + 1
    is_end = (boundary | (piece_len == RUN_CAP)) & (e >= 0) & (e < length)
    is_cont = since >= RUN_CAP  # continuation piece: single char + vbyte
    is_run = is_cont | (piece_len >= 2)

    # vbyte(piece_len - 2 + offset), or - 1 for continuation pieces,
    # as one <= 16-bit token (ops/rle_jax.py spec)
    v = jnp.maximum(
        jnp.where(is_cont, piece_len - 1, piece_len - 2) + offset, 0
    )
    two = v >= 128
    b0 = (v & 0x7F) | jnp.where(two, _I32(0x80), _I32(0))
    b1 = _srl(v, 7) & 0x7F
    vb_val = jnp.where(two, (b0 << 8) | b1, b0)
    vb_bits = jnp.where(two, 16, 8)
    cc = jnp.where(is_cont, c_e, (c_e << 8) | c_e)
    head_bits = jnp.where(is_cont, 8, 16)
    run_val = (cc << vb_bits) | vb_val
    values = jnp.where(is_run, run_val, c_e)
    lens = jnp.where(is_end, jnp.where(is_run, head_bits + vb_bits, 8), 0)

    tile_bits = _pack_tile(
        values, lens, words_ref, acc_ref, out_words_ref,
        carry_ref, state_ref, dma_sem, rows=rows, wt=wt,
    )

    # update RLE carries
    rle_state_ref[0] = jnp.max(
        jnp.where((row == rows - 1) & (lane == LANES - 1), data, _I32(-1))
    )
    rle_state_ref[1] = jnp.max(sor)
    rle_state_ref[2] = rle_state_ref[2] + tile_bits

    # final step: publish the chunk's total bits in the tail superword
    @pl.when(t == pl.num_programs(1) - 1)
    def _publish():
        lane1 = lax.broadcasted_iota(_I32, (1, LANES), 1)
        carry_ref[:, :] = jnp.where(
            lane1 == 0, rle_state_ref[2], _I32(0)
        )
        dma2 = pltpu.make_async_copy(
            carry_ref.at[:, :],
            words_ref.at[c, :, pl.ds(cap - LANES, LANES)],
            dma_sem,
        )
        dma2.start()
        dma2.wait()


@functools.partial(
    jax.jit, static_argnames=("tile", "offset", "interpret")
)
def rle_pack_chunks(
    data: jnp.ndarray, lengths: jnp.ndarray, *,
    tile: int = 2048, offset: int = 0, interpret: bool | None = None,
):
    """Fused RLE encode: bytes in -> packed RLE byte stream out.

    ``data: u8[C, N]`` (N % tile == 0); returns
    ``(words u32[C, cap], rle_bytes_len i32[C])`` — the packed stream is
    byte-aligned RLE output (all token lengths are multiples of 8).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    csize, n = data.shape
    assert n % tile == 0 and tile % LANES == 0
    rows = tile // LANES
    wt = _wt_for(tile, 32)
    cap = n + wt + 2 * LANES
    cap += (-cap) % LANES
    # one extra tile step (shifted emission window) + padding data tile
    data_i = jnp.pad(
        data.astype(jnp.int32), ((0, 0), (0, tile))
    ).reshape(csize, (n + tile) // LANES, LANES)

    kernel = functools.partial(
        _rle_pack_kernel, rows=rows, wt=wt, tile=tile, cap=cap,
        offset=offset,
    )
    words = pl.pallas_call(
        kernel,
        grid=(csize, n // tile + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, rows, LANES), lambda ci, ti: (ci, ti, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((csize, 1, cap), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, wt), jnp.float32),
            pltpu.VMEM((1, wt), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lengths.astype(jnp.int32), data_i)
    bits = words[:, 0, cap - LANES]
    return (
        lax.bitcast_convert_type(words[:, 0, :], jnp.uint32),
        _srl(bits, 3),
    )
