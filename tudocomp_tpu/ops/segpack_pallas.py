"""Per-segment Pallas packers: G independent segments per grid step.

The TBC2 pipeline packs each 2 KiB segment into its own bit stream
(models/blockcodec.py). The general chunked packers in
``bitpack_pallas.py`` carry bitstream state across grid steps in SMEM,
which forces chunk = grid-row and made the segment pipeline run one
~7 us grid step per segment (16K steps per 16 MiB batch). Segments
need **no carry at all** — every segment's stream starts at bit 0 and
its worst-case size is statically bounded — so these kernels pack
``G = 8`` segments per grid step with plain blocked input/output specs:
no SMEM state, no manual DMA, 16x fewer grid steps.

Shared structure per step (rows = G * rows_per_segment, 128 lanes):

- token emission (fused RLE boundary logic or fused canonical-Huffman
  one-hot table lookup, same math as bitpack_pallas.py);
- *segmented* exclusive bit-offset scan: in-row strict-lower-triangular
  ones matmul (MXU) + down-sublane Hillis-Steele log-shift adds masked
  at segment-group boundaries (``row % rows_per_seg >= shift``);
- word placement through per-row 384-word one-hot windows on 4 byte
  planes into a per-segment f32 accumulator ``acc[G, 8, WT]`` — exact,
  because all token bit ranges are disjoint and every sum < 256;
- plane combine + per-segment spill roll (lane roll is row-local, so
  segment streams never bleed into each other).

Outputs are big-endian u32 word rows per segment plus total bits —
bit-identical to the chunked kernels and the host spec.

Fusion note (round 4): a single-pass RLE->Huffman kernel (huff-map
each RLE token byte at emission, one placement instead of two) was
designed and rejected. The blocker is worst-case per-ROW expansion:
runs of two emit 3 stream bytes per 2 input bytes (cc pair + vbyte),
so an input word row can emit 768 symbols = 12,288 bits = 384 words —
the placement window must grow from 384 to 512 words and the
placement one-hot volume grows ~2.2x, eating the saved second pass.
The two-stage split avoids this because the Huffman stage reads the
COMPACTED stream (rows are stream rows, bounded 512 symbols). The
intermediate sel_words HBM round trip the fusion would remove costs
<1 ms at 64 MiB; the encode critical path is placement compute, not
traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
G = 8  # base segments-per-grid-step granularity (callers pad nc to G)


def _group(nc: int, interpret: bool) -> int:
    """Segments per grid step (TDC_PACK_GROUP tuning knob). Round-3
    v5e sweeps at 64 MiB (tunnel-sync floor ~28 ms included in every
    number). Byte kernels: pair+g16 won — rle 50.0 / huff 50.1 ms vs
    55.1 / 57.6 for single+g8; quad slower (58.3 / 54.3). w4 kernels:
    g32 won — rle 42.4 / huff 46.2 vs 44.8 / 49.5 at g16 and
    41.4 / 52.0 at g64 (the offsets block is latency-bound per grid
    step — w4 ablation: +11.2 ms at g16 for ~10 chained small ops —
    so fewer, fatter steps amortize it until VMEM pressure bites)."""
    import os

    if _w4_mode():
        default = 4 * G
    else:
        default = 2 * G if _pair() else G
    want = int(os.environ.get("TDC_PACK_GROUP", str(default)))
    if interpret:
        return G
    for g in (want, G):
        if g % G == 0 and nc % g == 0 and g <= nc:
            return g
    return G
_I32 = jnp.int32

SEG_BYTES = 2048          # input bytes per segment (RLE stage)
RLE_ROWS = SEG_BYTES // LANES          # 16

# Huffman-stage input cap: the rle_raw escape clamps every segment's
# symbol count to <= SEG_BYTES (models/blockcodec.py rle_stage), so the
# huffman kernel never sees more than 2048 live symbols per segment.
CAP_BYTES = 2048          # RLE bytes per segment (huffman stage input)
HUF_ROWS = CAP_BYTES // LANES          # 16

# Placement window: 256 covers any row. A row's tokens start within
# 127 words of its 128-word-aligned base, and a row emits at most 64
# words: huffman = 128 symbols x <= 16 bits; RLE <= 12 bits per input
# byte amortized (worst piece: run of 2 -> 24 bits, needs offset < 126
# so the length-2 vbyte stays one byte) + one 32-bit straddle token.
#
# TDC_PACK_WINDOW=128 switches to the rotate formulation: tokens place
# into a row-local 128-wide window at w0 - (row_base >> 5) in [0, 66),
# the (8, 128) matmul result rolls by (row_base >> 5) % 128 lanes
# (tpu dynamic rotate), and wrap-masked halves accumulate into the
# 256-word span at the row's 128-aligned block. Bit-identical; halves
# the one-hot compare volume (the placement loop's dominant term).
WINDOW = 2 * LANES


def _window() -> int:
    import os

    w = int(os.environ.get("TDC_PACK_WINDOW", str(WINDOW)))
    return w if w in (LANES, WINDOW) else WINDOW


def _pair() -> bool:
    """TDC_PACK_PAIR=1 enables paired placement.

    Pairing fuses lane-adjacent codes (<= 16 bits each, so a pair is
    <= 32 bits — the same part1+spill shape as a single token) and
    merges row pairs, halving the placement loop's matmul volume.
    Composes with either window formulation: under the 256-word aligned
    window a merged row spans two rows' emission (<= 128 words) past a
    128-aligned base (<= 127 words); under the 128-word rotate window a
    merged row's tokens all start within 128 words of its OWN first
    bit (two rows emit <= 4096 bits and every token starts strictly
    before their end), so ``w0 - (row_base >> 5) <= 127`` still holds.
    """
    import os

    return os.environ.get("TDC_PACK_PAIR", "1") == "1"


def _quad() -> bool:
    """TDC_PACK_QUAD=1 fuses FOUR lane-adjacent tokens per placement
    unit (<= 64 bits, carried as a word-aligned A/B value pair that
    shares one one-hot: A at the unit's word, B exactly one word later)
    and merges four rows, quartering the placement loop at a 384-word
    window (4 rows emit <= 256 words past a <= 127-word base). Takes
    precedence over TDC_PACK_PAIR; both produce bit-identical streams.
    """
    import os

    return os.environ.get("TDC_PACK_QUAD", "0") == "1" and _window() == WINDOW

# Accumulator/out widths: max stream words + one window of slack above
# the last row's aligned base (aligned <= (max_bits >> 12) * 128).
RLE_WT = 896              # 640 max aligned base + 256 window
HUF_WT = 1152             # 896 max aligned base + 256 window


def _srl(x, n):
    return lax.shift_right_logical(
        x, jnp.broadcast_to(_I32(n), x.shape) if isinstance(n, int) else n
    )


def _byte_planes_bf16(x):
    return [
        (_srl(x, 24) & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
        (_srl(x, 16) & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
        (_srl(x, 8) & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
        (x & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
    ]


def _offs_impl() -> str:
    """Offsets-scan implementation (TDC_OFFS_IMPL): 'shift' (log-shift
    Hillis-Steele over sublane concatenates), 'mxu' (block-diagonal
    triangular matmul over hi/lo byte planes), 'roll' (log-shift via
    pltpu.roll along sublanes — no concatenates), 'dot' (chained
    exact-f32 MXU dots, no sequential steps). Round-3 v5e sweep at
    64 MiB (sync floor ~28 ms included): shift 51.2/53.6 ms (rle/huff),
    mxu 58.7/60.3, roll 62.6/51.4, dot 57.3/52.6 — the ablation's s2
    cost is many small vector ops, not the scan structure (even the
    scan-free 'dot' loses to 'shift'), so 'shift' stays default and
    the alternatives remain for re-measurement on other chips."""
    import os

    v = os.environ.get("TDC_OFFS_IMPL", "shift")
    return v if v in ("shift", "mxu", "roll", "dot") else "shift"


def _seg_excl_offsets(lens, rows_per_seg: int):
    """Per-position exclusive bit offsets within each segment group.

    lens: (rows, 128) i32. Rows belong to segment ``row // rows_per_seg``.
    Returns (offs, row_start): exclusive offset per token and each
    row's starting bit (all lanes broadcast). Three bit-identical
    implementations, selected by ``TDC_OFFS_IMPL`` (see _offs_impl).
    """
    rows = lens.shape[0]
    lens_bf = lens.astype(jnp.float32).astype(jnp.bfloat16)
    tri = (
        lax.broadcasted_iota(_I32, (LANES, LANES), 0)
        < lax.broadcasted_iota(_I32, (LANES, LANES), 1)
    ).astype(jnp.bfloat16)
    impl = _offs_impl()
    if impl == "dot":
        # Chained-dot formulation: no sequential scan steps, no i32
        # intermediates. dot1 contracts lens (bf16-exact: token lens
        # <= 64) against [strict-tri | ones] in one issue, yielding
        # excl-in-row AND per-row totals as f32. dot2 contracts the
        # block-diagonal strict row triangle against those totals with
        # f32 inputs at HIGHEST precision — the 3-pass bf16 split is
        # exact here (0/1 matrix x integers < 2**17 < 2**24).
        tri_ones = jnp.concatenate(
            [tri, jnp.ones((LANES, LANES), jnp.bfloat16)], axis=1
        )
        d1 = lax.dot_general(
            lens_bf, tri_ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, 256): [excl_in_row | row_sums]
        excl_f = d1[:, :LANES]
        row_sums_f = d1[:, LANES:]
        r_i = lax.broadcasted_iota(_I32, (rows, rows), 0)
        r_j = lax.broadcasted_iota(_I32, (rows, rows), 1)
        seg_tri = (
            (r_i // rows_per_seg == r_j // rows_per_seg) & (r_i < r_j)
        ).astype(jnp.float32)  # [k, r] = 1 iff row k precedes r in-seg
        row_base_f = lax.dot_general(
            seg_tri, row_sums_f, (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        row_base = row_base_f.astype(_I32)
        return (row_base_f + excl_f).astype(_I32), row_base
    excl_in_row = lax.dot_general(
        lens_bf, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_I32)
    row_idx = lax.broadcasted_iota(_I32, (rows, LANES), 0)
    in_group = row_idx % rows_per_seg
    if impl == "mxu":
        # row total broadcast to every lane: offsets are monotone, so
        # the lane max of the inclusive value IS the row total
        row_sums = jnp.max(excl_in_row + lens, axis=1, keepdims=True)
        row_sums = jnp.broadcast_to(row_sums, (rows, LANES))
        r_i = lax.broadcasted_iota(_I32, (rows, rows), 0)
        r_j = lax.broadcasted_iota(_I32, (rows, rows), 1)
        seg_tri = (
            (r_i // rows_per_seg == r_j // rows_per_seg) & (r_j < r_i)
        ).astype(jnp.bfloat16)
        # hi/lo < 256 byte planes ride one concatenated dot (row totals
        # reach 2**15, too wide for exact bf16 inputs); f32 accumulates
        # <= rows_per_seg terms < 2**16 exactly
        planes = jnp.concatenate(
            [
                _srl(row_sums, 8).astype(jnp.float32).astype(jnp.bfloat16),
                (row_sums & 0xFF).astype(jnp.float32).astype(jnp.bfloat16),
            ],
            axis=1,
        )
        acc = lax.dot_general(
            seg_tri, planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row_base = (
            acc[:, :LANES].astype(_I32) << 8
        ) + acc[:, LANES:].astype(_I32)
        return row_base + excl_in_row, row_base
    ones = jnp.ones((LANES, LANES), jnp.bfloat16)
    row_sums = lax.dot_general(
        lens_bf, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(_I32)  # (rows, 128) every lane = row total
    # segmented inclusive scan down sublanes (Hillis-Steele, masked at
    # group boundaries). shifts up to rows_per_seg cover any group size
    # that is a power of two or < 2*max_shift.
    incl = row_sums
    shift = 1
    while shift < rows_per_seg:
        if impl == "roll":
            shifted = pltpu.roll(incl, shift, 0)
        else:
            shifted = jnp.concatenate(
                [jnp.zeros((shift, LANES), _I32), incl[:-shift]], axis=0
            )
        incl = incl + jnp.where(in_group >= shift, shifted, 0)
        shift *= 2
    row_base = incl - row_sums
    offs = row_base + excl_in_row
    # segment total: inclusive value at the group's last row
    return offs, row_base


def _pair_merge(values, lens, offs):
    """Fuse lane-adjacent tokens and merge row pairs for placement.

    Input tokens must be <= 16 bits. Returns arrays of the same shape
    whose EVEN rows hold one placement unit per lane: even lanes carry
    row r's pairs (tokens at lanes 2i, 2i+1 fused into <= 32 bits
    starting at token 2i's offset), odd lanes carry row r+1's pairs.
    Odd rows are garbage and must be skipped (placement stride 2).

    A fused pair's value is the two tokens' bits concatenated MSB-first
    at the even token's offset, matching the sequential bitstream spec.
    Zero-length tokens anywhere are fine: with len_even == 0 the pair
    degenerates to the odd token, and its exclusive offset equals the
    even lane's (offsets advance by token length).
    """
    rows = values.shape[0]
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    l_odd = pltpu.roll(lens, LANES - 1, 1)  # lane i <- lens[i+1]
    v_odd = pltpu.roll(values, LANES - 1, 1)
    mask_e = (_I32(1) << lens) - 1
    mask_o = (_I32(1) << l_odd) - 1
    pv = ((values & mask_e) << l_odd) | (v_odd & mask_o)
    plen = lens + l_odd

    def up(x):  # shift rows up by one: row r <- row r+1
        return jnp.concatenate(
            [x[1:], jnp.zeros((1, LANES), x.dtype)], axis=0
        )

    even_lane = (lane & 1) == 0
    mv = jnp.where(even_lane, pv, pltpu.roll(up(pv), 1, 1))
    ml = jnp.where(even_lane, plen, pltpu.roll(up(plen), 1, 1))
    mo = jnp.where(even_lane, offs, pltpu.roll(up(offs), 1, 1))
    return mv, ml, mo


def _quad_merge(values, lens, offs):
    """Fuse four lane-adjacent tokens (<= 16 bits each) into one unit
    and merge row quads. Returns ``(vA, lA, vB, lB, offs_m)`` whose rows
    with ``r % 4 == 0`` hold one unit per lane: lane ``4i+k`` carries
    the quad of original row ``r+k`` at lanes ``[4i, 4i+4)``. A unit's
    bits are the four tokens' MSB-first concatenation (<= 64 bits)
    split word-aligned: A = the first ``min(32, total)`` bits at the
    unit's offset, B = the rest at offset+32, so B's word is exactly
    A's + 1 and its in-word bit position equals A's.
    """
    rows = values.shape[0]
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    # lane pairing (pairs at even lanes; token lens <= 16)
    l_o = pltpu.roll(lens, LANES - 1, 1)
    v_o = pltpu.roll(values, LANES - 1, 1)
    pv = ((values & ((_I32(1) << lens) - 1)) << l_o) | (
        v_o & ((_I32(1) << l_o) - 1)
    )
    pl_ = lens + l_o  # <= 32
    # pair-of-pairs: quads at lanes % 4 == 0
    p2v = pltpu.roll(pv, LANES - 2, 1)
    p2l = pltpu.roll(pl_, LANES - 2, 1)
    qlen = pl_ + p2l  # <= 64
    la = jnp.minimum(qlen, 32)
    lb = qlen - la
    fits = qlen <= 32
    # fits: A = pv ++ p2v right-aligned. p2l = 32 forces pl_ = 0.
    va_f = _shl32(pv, p2l) | (p2v & _mask32(p2l))
    # else: A = pv's pl_ bits then p2v's top 32-pl_ bits (pl_ >= 1
    # here, since p2l <= 32 alone cannot exceed 32)
    va_s = _shl32(pv, 32 - pl_) | _shr32(p2v, qlen - 32)
    va = jnp.where(fits, va_f, va_s)
    vb = jnp.where(fits, _I32(0), p2v & _mask32(lb))

    def upk(x, k):
        return jnp.concatenate(
            [x[k:], jnp.zeros((k, LANES), x.dtype)], axis=0
        )

    lm = lane & 3
    outs = []
    for x in (va, la, vb, lb, offs):
        m = x
        for k in (1, 2, 3):
            m = jnp.where(lm == k, pltpu.roll(upk(x, k), k, 1), m)
        outs.append(m)
    return tuple(outs)


def _mask32(l):
    """(1 << l) - 1 for l in [0, 32] without shift UB."""
    return jnp.where(
        l >= 32, _I32(-1), (_I32(1) << jnp.clip(l, 0, 31)) - 1
    )


def _shl32(x, n):
    return jnp.where(n >= 32, _I32(0), x << jnp.clip(n, 0, 31))


def _shr32(x, n):
    return jnp.where(n >= 32, _I32(0), _srl(x, jnp.clip(n, 0, 31)))


def _parts(values, lens, bitpos):
    """part1 (bits landing in the token's word) and spill (bits landing
    one word later) for tokens of lens in [0, 32] at bit position
    ``bitpos`` — the single-token placement math, factored out."""
    v = values & _mask32(lens)
    sh = 32 - bitpos - lens
    lsh = jnp.clip(sh, 0, 31)
    rsh = jnp.clip(-sh, 0, 31)
    part1 = jnp.where(sh >= 0, v << lsh, _srl(v, rsh))
    spill = jnp.where(
        sh < 0,
        (v & ((_I32(1) << rsh) - 1)) << ((32 - rsh) & 31),
        _I32(0),
    )
    return part1, spill


def _place_quad(va, la, vb, lb, offs, row_base, acc_ref, out_ref,
                bits_ref, *, rows_per_seg: int, wt: int, g: int,
                stride: int = 4):
    """Quad placement: one one-hot per unit covers three word slots —
    set0 = A's part1 at w0, set1 = A's spill | B's part1 at w0+1 (bit-
    disjoint: B nonempty forces lA = 32, so A's spill is [0, bitpos)
    and B's part1 is [bitpos, ..)), set2 = B's spill at w0+2. 12 byte
    planes per unit row; final words = set0 | roll(set1,1) | roll(set2,2).

    ``stride=4``: unit rows at r % 4 == 0 over byte rows (_quad_merge
    layout). ``stride=1``: every row is a unit row (the w4 kernels'
    word-element layout, 4 stream bytes per lane).
    """
    rows = va.shape[0]
    window = 3 * LANES
    bitpos = offs & 31
    p1a, spa = _parts(va, la, bitpos)
    p1b, spb = _parts(vb, lb, bitpos)
    mid = spa | p1b
    w0 = _srl(offs, 5)

    # Round-4 negative result: a kron-factored one-hot ([w0 == w] =
    # [w0>>4 == s]*[w0&15 == b], dot against the 16-wide factor, ~2x
    # less VPU compare volume) is rejected by Mosaic on real TPU —
    # the (12*24, 16) -> (12, 384) result reshape is an unsupported
    # sublane->lane shape cast (works in interpret mode only).
    acc_ref[:, :] = jnp.zeros((g * 12, wt), jnp.float32)
    a_planes = _byte_planes_bf16(p1a)
    m_planes = _byte_planes_bf16(mid)
    b_planes = _byte_planes_bf16(spb)
    win_iota = lax.broadcasted_iota(_I32, (window, LANES), 0)
    for r in range(0, rows, stride):
        grp = r // rows_per_seg
        base = jnp.max(row_base[r : r + 1, :])
        planes = jnp.stack(
            [p[r] for p in a_planes]
            + [p[r] for p in m_planes]
            + [p[r] for p in b_planes],
            axis=0,
        )  # (12, 128)
        aligned = (base >> 12) * 128
        w0_local = w0[r][None, :] - aligned
        oh = (win_iota == w0_local).astype(jnp.bfloat16)
        acc_ref[
            grp * 12 : (grp + 1) * 12,
            pl.ds(pl.multiple_of(aligned, LANES), window),
        ] += lax.dot_general(
            planes, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = acc_ref[:, :].astype(_I32).reshape(g, 12, wt)

    def words(k):
        return (
            (acc[:, k, :] << 24) | (acc[:, k + 1, :] << 16)
            | (acc[:, k + 2, :] << 8) | acc[:, k + 3, :]
        )

    lane_iota = lax.broadcasted_iota(_I32, (g, wt), 1)
    w_m = jnp.where(
        lane_iota == 0, _I32(0), pltpu.roll(words(4), 1, 1)
    )
    w_b = jnp.where(
        lane_iota < 2, _I32(0), pltpu.roll(words(8), 2, 1)
    )
    out_ref[:, :] = words(0) | w_m | w_b

    lens_sum_rows = jnp.sum(la + lb, axis=1, keepdims=True)
    totals = []
    for gi in range(g):
        r_last = (gi + 1) * rows_per_seg - stride
        base = row_base[r_last, :1]
        last = lens_sum_rows[r_last, :1]
        totals.append((base + last)[None, :])
    bits = jnp.concatenate(totals, axis=0)  # (g, 1)
    bits_ref[:, :] = jnp.broadcast_to(bits, (g, LANES))


def _place_and_combine(values, lens, offs, row_base, acc_ref, out_ref,
                       bits_ref, *, rows_per_seg: int, wt: int,
                       g: int = G, stride: int = 1):
    """Place tokens into per-segment accumulators and write word rows.

    With ``stride=2`` only even rows place (paired layout from
    ``_pair_merge``); totals still cover every original row because
    merged row sums equal the two fused rows' bit totals.
    """
    rows = values.shape[0]
    mask = jnp.where(lens >= 32, _I32(-1), (_I32(1) << lens) - 1)
    v = values & mask
    bitpos = offs & 31
    sh = 32 - bitpos - lens
    lsh = jnp.clip(sh, 0, 31)
    rsh = jnp.clip(-sh, 0, 31)
    part1 = jnp.where(sh >= 0, v << lsh, _srl(v, rsh))
    spill = jnp.where(
        sh < 0,
        (v & ((_I32(1) << rsh) - 1)) << ((32 - rsh) & 31),
        _I32(0),
    )
    w0 = _srl(offs, 5)

    acc_ref[:, :] = jnp.zeros((g * 8, wt), jnp.float32)
    p1_planes = _byte_planes_bf16(part1)
    sp_planes = _byte_planes_bf16(spill)
    window = _window()
    # stride 2 (pair) composes with both windows: a merged row's tokens
    # all start within 128 words of its own first bit (see _pair).
    assert stride in (1, 2) or window == WINDOW
    win_iota = lax.broadcasted_iota(_I32, (window, LANES), 0)
    lane8 = lax.broadcasted_iota(_I32, (8, LANES), 1)
    for r in range(0, rows, stride):
        grp = r // rows_per_seg
        base = jnp.max(row_base[r : r + 1, :])
        planes = jnp.stack(
            [p[r] for p in p1_planes] + [p[r] for p in sp_planes], axis=0
        )  # (8, 128)
        if window == WINDOW:
            aligned = (base >> 12) * 128
            w0_local = w0[r][None, :] - aligned
            oh = (win_iota == w0_local).astype(jnp.bfloat16)
            acc_ref[
                grp * 8 : (grp + 1) * 8,
                pl.ds(pl.multiple_of(aligned, LANES), WINDOW),
            ] += lax.dot_general(
                planes, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            # rotate formulation: row-local 128-wide window + dynamic
            # lane roll to the absolute position, wrap-masked into the
            # 256-word span at the row's 128-aligned block
            base_w = base >> 5
            w0_local = w0[r][None, :] - base_w  # in [0, 66)
            oh = (win_iota == w0_local).astype(jnp.bfloat16)
            contrib = lax.dot_general(
                planes, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8, 128) at window lane v = w0 - base_w
            amt = base_w & (LANES - 1)
            rolled = pltpu.roll(contrib, amt, 1)
            no_wrap = lane8 >= amt  # lane v+amt < 128: stays in block
            blk = (base_w >> 7) * 128
            acc_ref[
                grp * 8 : (grp + 1) * 8,
                pl.ds(pl.multiple_of(blk, LANES), 2 * LANES),
            ] += jnp.concatenate(
                [
                    jnp.where(no_wrap, rolled, 0.0),
                    jnp.where(no_wrap, 0.0, rolled),
                ],
                axis=1,
            )

    acc = acc_ref[:, :].astype(_I32).reshape(g, 8, wt)
    words_p1 = (
        (acc[:, 0, :] << 24) | (acc[:, 1, :] << 16)
        | (acc[:, 2, :] << 8) | acc[:, 3, :]
    )
    words_sp = (
        (acc[:, 4, :] << 24) | (acc[:, 5, :] << 16)
        | (acc[:, 6, :] << 8) | acc[:, 7, :]
    )
    lane_iota = lax.broadcasted_iota(_I32, (g, wt), 1)
    words_sp = jnp.where(
        lane_iota == 0, _I32(0), pltpu.roll(words_sp, 1, 1)
    )
    out_ref[:, :] = words_p1 | words_sp
    # total bits per segment = row base + row total at each group's end
    lens_sum_rows = jnp.sum(lens, axis=1, keepdims=True)  # (rows, 1)
    totals = []
    for gi in range(g):
        r_last = (gi + 1) * rows_per_seg - stride
        base = row_base[r_last, :1]
        last = lens_sum_rows[r_last, :1]
        totals.append((base + last)[None, :])
    bits = jnp.concatenate(totals, axis=0)  # (g, 1)
    bits_ref[:, :] = jnp.broadcast_to(bits, (g, LANES))


def _huffman_kernel(lengths_ref, data_ref, table_ref, words_ref, bits_ref,
                    acc_ref, *, wt: int, g: int = G, pair: bool = False,
                    quad: bool = False):
    c = pl.program_id(0)
    data = data_ref[...]  # (g*HUF_ROWS, 128) i32 bytes
    table = table_ref[:, :]  # (8, 256) bf16
    rows = g * HUF_ROWS
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
    pos_in_seg = (row % HUF_ROWS) * LANES + lane
    seg_idx = row // HUF_ROWS

    # table lookup: one (8,256)x(256, B*128) dot per B-row block instead
    # of a dot per row — same one-hot volume, 16x fewer MXU issues (the
    # small-matmul loop is issue-bound, not MAC-bound)
    B = HUF_ROWS
    bins = lax.broadcasted_iota(_I32, (256, LANES), 0)
    his, los, lns = [], [], []
    for r0 in range(0, rows, B):
        # one-hot per row first, then concat along lanes: each
        # (256, 128) one-hot is a fresh full tile with offset {0,0},
        # which keeps tpu.concatenate legal (concatenating the raw
        # 1x128 row slices carries their differing sublane offsets
        # into the non-concat dim — Mosaic rejects that layout)
        oh = jnp.concatenate(
            [
                (bins == data[r0 + i][None, :]).astype(jnp.bfloat16)
                for i in range(B)
            ],
            axis=1,
        )  # (256, B*128) lane-major row block
        got = lax.dot_general(
            table, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, B*128)
        for i in range(B):
            his.append(got[0:1, i * LANES : (i + 1) * LANES])
            los.append(got[1:2, i * LANES : (i + 1) * LANES])
            lns.append(got[2:3, i * LANES : (i + 1) * LANES])
    hi = jnp.concatenate(his, axis=0).astype(_I32)
    lo = jnp.concatenate(los, axis=0).astype(_I32)
    lens = jnp.concatenate(lns, axis=0).astype(_I32)
    values = (hi << 8) | lo
    # mask past each segment's count (SMEM scalar reads)
    cnt = jnp.zeros((rows, LANES), _I32)
    for gi in range(g):
        cnt = jnp.where(seg_idx == gi, lengths_ref[c * g + gi], cnt)
    lens = jnp.where(pos_in_seg < cnt, lens, 0)
    offs, row_base = _seg_excl_offsets(lens, HUF_ROWS)
    if quad:
        va, la, vb, lb, offs_m = _quad_merge(values, lens, offs)
        _place_quad(
            va, la, vb, lb, offs_m, row_base, acc_ref, words_ref,
            bits_ref, rows_per_seg=HUF_ROWS, wt=wt, g=g,
        )
        return
    stride = 1
    if pair:
        values, lens, offs = _pair_merge(values, lens, offs)
        stride = 2
    _place_and_combine(
        values, lens, offs, row_base, acc_ref, words_ref, bits_ref,
        rows_per_seg=HUF_ROWS, wt=wt, g=g, stride=stride,
    )


def _rle_kernel(lengths_ref, data_ref, words_ref, bits_ref, acc_ref,
                *, offset: int, wt: int, g: int = G, pair: bool = False,
                quad: bool = False):
    c = pl.program_id(0)
    data = data_ref[...]  # (g*RLE_ROWS, 128) i32 bytes
    rows = g * RLE_ROWS
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
    pos = (row % RLE_ROWS) * LANES + lane  # position within segment
    seg_idx = row // RLE_ROWS

    length = jnp.zeros((rows, LANES), _I32)
    for gi in range(g):
        length = jnp.where(seg_idx == gi, lengths_ref[c * g + gi], length)

    # prev byte within segment (row-local roll + segmented row carry)
    rolled = pltpu.roll(data, 1, 1)
    row_last = jnp.max(
        jnp.where(lane == LANES - 1, data, _I32(-1)), axis=1, keepdims=True
    )
    prev_rows = jnp.concatenate(
        [jnp.full((1, 1), _I32(-1)), row_last[:-1]], axis=0
    )
    prev = jnp.where(lane == 0, prev_rows, rolled)
    prev = jnp.where(pos == 0, _I32(-1), prev)  # segment start

    boundary = (data != prev) | (pos == 0) | (pos >= length)

    # start-of-run = segmented cummax of boundary positions
    b_idx = jnp.where(boundary, pos, _I32(-1))
    m = b_idx
    shift = 1
    while shift < LANES:
        sh = pltpu.roll(m, shift, 1)
        m = jnp.maximum(m, jnp.where(lane >= shift, sh, _I32(-1)))
        shift *= 2
    in_group = row % RLE_ROWS
    rm = jnp.max(m, axis=1, keepdims=True)
    shift = 1
    while shift < RLE_ROWS:
        shifted = jnp.concatenate(
            [jnp.full((shift, 1), _I32(-1)), rm[:-shift]], axis=0
        )
        rm = jnp.maximum(
            rm, jnp.where(in_group[:, :1] >= shift, shifted, _I32(-1))
        )
        shift *= 2
    prev_row_max = jnp.concatenate(
        [jnp.full((1, 1), _I32(-1)), rm[:-1]], axis=0
    )
    prev_row_max = jnp.where(in_group[:, :1] == 0, _I32(-1), prev_row_max)
    sor = jnp.maximum(m, prev_row_max)

    # piece ends: next byte differs / end of segment data
    nxt = pltpu.roll(data, LANES - 1, 1)  # roll by -1
    row_first = jnp.min(
        jnp.where(lane == 0, data, _I32(1 << 30)), axis=1, keepdims=True
    )
    next_rows = jnp.concatenate(
        [row_first[1:], jnp.full((1, 1), _I32(-1))], axis=0
    )
    nxt = jnp.where(lane == LANES - 1, next_rows, nxt)
    next_boundary = (nxt != data) | (
        ((pos + 1) % SEG_BYTES) == 0
    ) | (pos + 1 >= length)
    piece_len = pos - sor + 1
    is_end = next_boundary & (pos < length)
    is_run = piece_len >= 2

    v = jnp.maximum(piece_len - 2 + offset, 0)
    two = v >= 128
    b0 = (v & 0x7F) | jnp.where(two, _I32(0x80), _I32(0))
    b1 = _srl(v, 7) & 0x7F
    vb_val = jnp.where(two, (b0 << 8) | b1, b0)
    vb_bits = jnp.where(two, 16, 8)
    cc = (data << 8) | data
    stride = 1
    if pair or quad:
        # Split each run token across the run's last two positions —
        # the char pair (16 bits) at the penult, the vbyte (8/16 bits)
        # at the end — so every emission is <= 16 bits. The bitstream
        # is unchanged (cc precedes vb at consecutive offsets); with
        # all tokens <= 16 bits the huffman stage's pair+merge halves
        # the placement loop here too. A run piece has >= 2 positions,
        # so the penult always exists inside the piece, and a position
        # is never both a piece end and the next piece's penult (the
        # next piece would need len >= 2 while starting after it).
        def from_next(x):
            r = pltpu.roll(x, LANES - 1, 1)
            first = jnp.min(
                jnp.where(lane == 0, x, _I32(1 << 30)),
                axis=1, keepdims=True,
            )
            nr = jnp.concatenate(
                [first[1:], jnp.zeros((1, 1), _I32)], axis=0
            )
            return jnp.where(lane == LANES - 1, nr, r)

        pen = (
            from_next(is_end.astype(_I32)) & from_next(is_run.astype(_I32))
        ) == 1
        values = jnp.where(is_end & is_run, vb_val, data)
        values = jnp.where(pen, cc, values)
        lens = jnp.where(is_end, jnp.where(is_run, vb_bits, 8), 0)
        lens = jnp.where(pen, 16, lens)
    else:
        run_val = (cc << vb_bits) | vb_val
        values = jnp.where(is_run, run_val, data)
        lens = jnp.where(is_end, jnp.where(is_run, 16 + vb_bits, 8), 0)

    offs, row_base = _seg_excl_offsets(lens, RLE_ROWS)
    if quad:
        va, la, vb, lb, offs_m = _quad_merge(values, lens, offs)
        _place_quad(
            va, la, vb, lb, offs_m, row_base, acc_ref, words_ref,
            bits_ref, rows_per_seg=RLE_ROWS, wt=wt, g=g,
        )
        return
    if pair:
        values, lens, offs = _pair_merge(values, lens, offs)
        stride = 2
    _place_and_combine(
        values, lens, offs, row_base, acc_ref, words_ref, bits_ref,
        rows_per_seg=RLE_ROWS, wt=wt, g=g, stride=stride,
    )


def rle_pack_segments(data, lengths, *, offset: int = 0,
                      interpret: bool | None = None):
    """Fused per-segment RLE: ``data u8[NC, 2048]`` (NC % 8 == 0) ->
    ``(words u32[NC, RLE_WT], rle_bytes i32[NC])``."""
    # offset >= 126 would let a run of 2 emit a 2-byte vbyte (32 bits
    # per 2 input bytes), breaking the 12-bit/byte stream bound RLE_WT
    # and the placement WINDOW are sized for.
    assert 0 <= offset <= 125, offset
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc = data.shape[0]
    return _rle_pack_jit(
        data, lengths, offset=offset, interpret=interpret,
        g=_group(nc, interpret), pair=_pair(), quad=_quad(),
    )


@functools.partial(
    jax.jit, static_argnames=("offset", "interpret", "g", "pair", "quad")
)
def _rle_pack_jit(data, lengths, *, offset: int, interpret: bool,
                  g: int, pair: bool = False, quad: bool = False):
    nc, n = data.shape
    assert n == SEG_BYTES and nc % g == 0
    data_i = data.astype(_I32).reshape(nc * RLE_ROWS, LANES)
    kernel = functools.partial(
        _rle_kernel, offset=offset, wt=RLE_WT, g=g, pair=pair, quad=quad
    )
    words, bits = pl.pallas_call(
        kernel,
        grid=(nc // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (g * RLE_ROWS, LANES), lambda c: (c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((g, RLE_WT), lambda c: (c, 0)),
            pl.BlockSpec((g, LANES), lambda c: (c, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, RLE_WT), jnp.int32),
            jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g * (12 if quad else 8), RLE_WT), jnp.float32)
        ],
        interpret=interpret,
    )(lengths.astype(_I32), data_i)
    return (
        lax.bitcast_convert_type(words, jnp.uint32),
        _srl(bits[:, 0], 3),
    )


def huffman_pack_segments(data, counts, sym_code, sym_len, *,
                          interpret: bool | None = None):
    """Fused per-segment Huffman lookup + pack: ``data u8[NC, 2048]``
    (NC % 8 == 0), codes <= 16 bits ->
    ``(words u32[NC, HUF_WT], bits i32[NC])``."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc = data.shape[0]
    return _huffman_pack_jit(
        data, counts, sym_code, sym_len, interpret=interpret,
        g=_group(nc, interpret), pair=_pair(), quad=_quad(),
    )


@functools.partial(
    jax.jit, static_argnames=("interpret", "g", "pair", "quad")
)
def _huffman_pack_jit(data, counts, sym_code, sym_len, *,
                      interpret: bool, g: int, pair: bool = False,
                      quad: bool = False):
    nc, n = data.shape
    assert n == CAP_BYTES and nc % g == 0
    data_i = data.astype(_I32).reshape(nc * HUF_ROWS, LANES)
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
        _huffman_kernel, wt=HUF_WT, g=g, pair=pair, quad=quad
    )
    words, bits = pl.pallas_call(
        kernel,
        grid=(nc // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (g * HUF_ROWS, LANES), lambda c: (c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, HUF_WT), lambda c: (c, 0)),
            pl.BlockSpec((g, LANES), lambda c: (c, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, HUF_WT), jnp.int32),
            jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g * (12 if quad else 8), HUF_WT), jnp.float32)
        ],
        interpret=interpret,
    )(counts.astype(_I32), data_i, table)
    return lax.bitcast_convert_type(words, jnp.uint32), bits[:, 0]


# ---------------------------------------------------------------------------
# Word-element ("w4") kernels: 4 stream bytes per lane element
# ---------------------------------------------------------------------------
#
# The byte kernels spend their time in many small full-width vector
# ops (the offsets scan and boundary scans run one element per BYTE).
# These variants load each segment as 512 stream-ordered u32 words —
# 4 bytes per lane element — so every scan (run boundaries, exclusive
# bit offsets) runs at QUARTER volume, token fusion into <= 64-bit
# quad units comes free (the four tokens are co-located across byte
# planes at the same (row, lane); no _quad_merge rolls), and placement
# runs _place_quad at stride 1 over rows/4 rows. Streams are
# bit-identical to the byte kernels and the host spec.
#
# Width check (window 3*LANES): a word row is 512 bytes; its tokens
# span <= 512 * 16 = 8192 bits = 256 words past its base, and the last
# word row of a segment starts at <= 3/4 of the segment's max stream
# (huffman 24576 bits -> aligned base <= 768 words, 768 + 384 = 1152 =
# HUF_WT; rle 18432 -> 512, 512 + 384 = 896 = RLE_WT).

W4_ROWS = SEG_BYTES // (4 * LANES)  # 4 word rows per segment


def _w4_mode() -> bool:
    """TDC_PACK_MODE=w4|byte selects the word-element kernels (v5e
    round-3 sweep at 64 MiB, ~28 ms sync floor included: w4+g32
    rle 42.4 ms / huff 46.2 ms vs byte pair+g16 52.0 / 51.4 -> w4 is
    the default; the byte kernels remain the cross-checked spec
    pair and the TDC_PACK_PAIR/QUAD/WINDOW laboratory)."""
    import os

    return os.environ.get("TDC_PACK_MODE", "w4") == "w4"


def _w4_planes(w, big_endian: bool):
    """Byte planes in STREAM order: plane k = byte at offset 4*e + k."""
    shifts = (24, 16, 8, 0) if big_endian else (0, 8, 16, 24)
    return [_srl(w, sh) & 0xFF for sh in shifts]


def _w4_fuse(vals, lens_):
    """Concatenate four co-located <= 16-bit tokens (stream order,
    plane 0 first) into one <= 64-bit unit, split word-aligned A/B
    (same convention as _quad_merge: A = first min(32, total) bits,
    B = the rest, placed exactly one word later)."""
    v0, v1, v2, v3 = vals
    l0, l1, l2, l3 = lens_
    v01 = ((v0 & _mask32(l0)) << l1) | (v1 & _mask32(l1))
    l01 = l0 + l1  # <= 32
    v23 = ((v2 & _mask32(l2)) << l3) | (v3 & _mask32(l3))
    l23 = l2 + l3
    qlen = l01 + l23  # <= 64
    la = jnp.minimum(qlen, 32)
    lb = qlen - la
    fits = qlen <= 32
    # not fits forces l01 >= 1 (l23 alone cannot exceed 32)
    va_f = _shl32(v01, l23) | (v23 & _mask32(l23))
    va_s = _shl32(v01, 32 - l01) | _shr32(v23, qlen - 32)
    va = jnp.where(fits, va_f, va_s)
    vb = jnp.where(fits, _I32(0), v23 & _mask32(lb))
    return va, la, vb, lb, qlen


def _huffman_kernel_w4(lengths_ref, data_ref, table_ref, words_ref,
                       bits_ref, acc_ref, *, wt: int, g: int):
    c = pl.program_id(0)
    w = data_ref[...]  # (g*W4_ROWS, 128) i32 big-endian rle-stream words
    table = table_ref[:, :]  # (16, 16) f32: T[hi, lo] = code<<8 | len
    rows = g * W4_ROWS
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
    seg_idx = row // W4_ROWS
    in_seg_row = row % W4_ROWS
    planes = _w4_planes(w, big_endian=True)

    cnt = jnp.zeros((rows, LANES), _I32)
    for gi in range(g):
        cnt = jnp.where(seg_idx == gi, lengths_ref[c * g + gi], cnt)

    # per-byte (code, len) lookup via TWO-LEVEL nibble one-hots
    # (round 4): the 256-bin one-hot cost 256 VPU compares per byte —
    # the kernel's largest elementwise term. Instead the wrapper packs
    # the table as T[hi, lo] = (code << 8 | len) < 2^24 (exact in
    # f32); per block: M = T @ lo_onehot selects each byte's hi-ROW,
    # then one masked sum over 16 hi rows picks the entry — 32
    # compares + 16 multiply-adds per byte, ~4x less one-hot volume.
    # table_ref here is (16, 16) f32 with T[hi, lo] = code<<8|len; the
    # dot contracts the 16-wide lo axis directly.
    bins16 = lax.broadcasted_iota(_I32, (16, LANES), 0)
    B = W4_ROWS
    got_rows = [{"code": [], "ln": []} for _ in range(4)]
    for r0 in range(0, rows, B):
        cols = [
            planes[k][r0 + i] for i in range(B) for k in range(4)
        ]
        lo_oh = jnp.concatenate(
            [
                (bins16 == (c_ & 15)[None, :]).astype(jnp.float32)
                for c_ in cols
            ],
            axis=1,
        )  # (16, B*4*128)
        m = lax.dot_general(
            table, lo_oh, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (16, B*4*128): row h = packed T[h, lo_j]
        j = 0
        for i in range(B):
            for k in range(4):
                hi_n = _srl(cols[i * 4 + k], 4)  # byte >> 4
                msl = m[:, j * LANES : (j + 1) * LANES]
                sel = jnp.sum(
                    jnp.where(
                        bins16 == hi_n[None, :], msl, 0.0
                    ),
                    axis=0,
                )
                packed = sel.astype(_I32)[None, :]
                got_rows[k]["code"].append(_srl(packed, 8))
                got_rows[k]["ln"].append(packed & 0xFF)
                j += 1
    vals, lens_ = [], []
    for k in range(4):
        code = jnp.concatenate(got_rows[k]["code"], axis=0)
        ln = jnp.concatenate(got_rows[k]["ln"], axis=0)
        pos = in_seg_row * 512 + lane * 4 + k
        vals.append(code)
        lens_.append(jnp.where(pos < cnt, ln, 0))

    va, la_, vb, lb, qlen = _w4_fuse(vals, lens_)
    offs, row_base = _seg_excl_offsets(qlen, W4_ROWS)
    _place_quad(
        va, la_, vb, lb, offs, row_base, acc_ref, words_ref, bits_ref,
        rows_per_seg=W4_ROWS, wt=wt, g=g, stride=1,
    )


def _rle_kernel_w4(lengths_ref, data_ref, words_ref, bits_ref, acc_ref,
                   *, offset: int, wt: int, g: int):
    c = pl.program_id(0)
    w = data_ref[...]  # (g*W4_ROWS, 128) i32 LE-bitcast input words
    rows = g * W4_ROWS
    lane = lax.broadcasted_iota(_I32, (rows, LANES), 1)
    row = lax.broadcasted_iota(_I32, (rows, LANES), 0)
    seg_idx = row // W4_ROWS
    in_seg_row = row % W4_ROWS
    p = _w4_planes(w, big_endian=False)

    length = jnp.zeros((rows, LANES), _I32)
    for gi in range(g):
        length = jnp.where(seg_idx == gi, lengths_ref[c * g + gi], length)
    pos = [in_seg_row * 512 + lane * 4 + k for k in range(4)]

    # prev byte per plane (plane 0's prev = previous element's plane 3,
    # with row carry; segment start -> -1 sentinel)
    rolled3 = pltpu.roll(p[3], 1, 1)
    row_last = jnp.max(
        jnp.where(lane == LANES - 1, p[3], _I32(-1)),
        axis=1, keepdims=True,
    )
    prev_rows = jnp.concatenate(
        [jnp.full((1, 1), _I32(-1)), row_last[:-1]], axis=0
    )
    prev0 = jnp.where(lane == 0, prev_rows, rolled3)
    prev0 = jnp.where(pos[0] == 0, _I32(-1), prev0)
    prev = [prev0, p[0], p[1], p[2]]
    boundary = [
        (p[k] != prev[k]) | (pos[k] == 0) | (pos[k] >= length)
        for k in range(4)
    ]

    # next byte per plane (plane 3's next = next element's plane 0)
    nxt3 = pltpu.roll(p[0], LANES - 1, 1)
    row_first = jnp.min(
        jnp.where(lane == 0, p[0], _I32(1 << 30)),
        axis=1, keepdims=True,
    )
    next_rows = jnp.concatenate(
        [row_first[1:], jnp.full((1, 1), _I32(-1))], axis=0
    )
    nxt3 = jnp.where(lane == LANES - 1, next_rows, nxt3)
    nxt = [p[1], p[2], p[3], nxt3]
    next_boundary = [
        (nxt[k] != p[k]) | (pos[k] == SEG_BYTES - 1)
        | (pos[k] + 1 >= length)
        for k in range(4)
    ]

    # start-of-run: segmented cummax of boundary positions at ELEMENT
    # granularity, then a 4-step plane chain inside the element
    b_idx = [
        jnp.where(boundary[k], pos[k], _I32(-1)) for k in range(4)
    ]
    m_elem = jnp.maximum(
        jnp.maximum(b_idx[0], b_idx[1]), jnp.maximum(b_idx[2], b_idx[3])
    )
    m = m_elem
    shift = 1
    while shift < LANES:
        sh = pltpu.roll(m, shift, 1)
        m = jnp.maximum(m, jnp.where(lane >= shift, sh, _I32(-1)))
        shift *= 2
    rm = jnp.max(m, axis=1, keepdims=True)
    shift = 1
    while shift < W4_ROWS:
        shifted = jnp.concatenate(
            [jnp.full((shift, 1), _I32(-1)), rm[:-shift]], axis=0
        )
        rm = jnp.maximum(
            rm,
            jnp.where(in_seg_row[:, :1] >= shift, shifted, _I32(-1)),
        )
        shift *= 2
    prev_row_max = jnp.concatenate(
        [jnp.full((1, 1), _I32(-1)), rm[:-1]], axis=0
    )
    prev_row_max = jnp.where(
        in_seg_row[:, :1] == 0, _I32(-1), prev_row_max
    )
    excl_in_row = jnp.where(lane == 0, _I32(-1), pltpu.roll(m, 1, 1))
    excl_elem = jnp.maximum(excl_in_row, prev_row_max)
    sor = []
    acc = excl_elem
    for k in range(4):
        acc = jnp.maximum(acc, b_idx[k])
        sor.append(acc)

    # token emission per plane (pair-split: char pair at the run's
    # penult position, vbyte at its end — every token <= 16 bits)
    run_end = []
    values = []
    lens_ = []
    for k in range(4):
        piece_len = pos[k] - sor[k] + 1
        is_end = next_boundary[k] & (pos[k] < length)
        is_run = piece_len >= 2
        run_end.append((is_end & is_run).astype(_I32))
        v = jnp.maximum(piece_len - 2 + offset, 0)
        two = v >= 128
        b0 = (v & 0x7F) | jnp.where(two, _I32(0x80), _I32(0))
        b1 = _srl(v, 7) & 0x7F
        vb_val = jnp.where(two, (b0 << 8) | b1, b0)
        vb_bits = jnp.where(two, 16, 8)
        values.append(jnp.where(is_end & is_run, vb_val, p[k]))
        lens_.append(
            jnp.where(is_end, jnp.where(is_run, vb_bits, 8), 0)
        )
    # penult marker: next stream byte ends a run piece
    re3 = pltpu.roll(run_end[0], LANES - 1, 1)
    re_first = jnp.min(
        jnp.where(lane == 0, run_end[0], _I32(1 << 30)),
        axis=1, keepdims=True,
    )
    re_rows = jnp.concatenate(
        [re_first[1:], jnp.zeros((1, 1), _I32)], axis=0
    )
    re3 = jnp.where(lane == LANES - 1, re_rows, re3)
    pen_src = [run_end[1], run_end[2], run_end[3], re3]
    for k in range(4):
        penk = pen_src[k] == 1
        cc = (p[k] << 8) | p[k]
        values[k] = jnp.where(penk, cc, values[k])
        lens_[k] = jnp.where(penk, 16, lens_[k])

    va, la_, vb, lb, qlen = _w4_fuse(values, lens_)
    offs, row_base = _seg_excl_offsets(qlen, W4_ROWS)
    _place_quad(
        va, la_, vb, lb, offs, row_base, acc_ref, words_ref, bits_ref,
        rows_per_seg=W4_ROWS, wt=wt, g=g, stride=1,
    )


def be_words_from_bytes(rows_u8):
    """Big-endian u32 stream words from byte rows ``u8[..., 4k]``
    (byte 0 lands in the top byte of word 0) — one bitcast + swaps."""
    le = lax.bitcast_convert_type(
        rows_u8.reshape(*rows_u8.shape[:-1], rows_u8.shape[-1] // 4, 4),
        jnp.uint32,
    )
    return (
        ((le & 0xFF) << 24) | ((le & 0xFF00) << 8)
        | ((le >> 8) & 0xFF00) | (le >> 24)
    )


def rle_pack_segments_w4(data, lengths, *, offset: int = 0,
                         interpret: bool | None = None):
    """w4 variant of rle_pack_segments: identical contract/streams."""
    assert 0 <= offset <= 125, offset
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc = data.shape[0]
    return _rle_pack_w4_jit(
        data, lengths, offset=offset, interpret=interpret,
        g=_group(nc, interpret),
    )


@functools.partial(
    jax.jit, static_argnames=("offset", "interpret", "g")
)
def _rle_pack_w4_jit(data, lengths, *, offset: int, interpret: bool,
                     g: int):
    nc, n = data.shape
    assert n == SEG_BYTES and nc % g == 0
    words_le = lax.bitcast_convert_type(
        data.reshape(nc, SEG_BYTES // 4, 4), jnp.uint32
    )
    data_w = lax.bitcast_convert_type(words_le, jnp.int32).reshape(
        nc * W4_ROWS, LANES
    )
    kernel = functools.partial(
        _rle_kernel_w4, offset=offset, wt=RLE_WT, g=g
    )
    words, bits = pl.pallas_call(
        kernel,
        grid=(nc // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (g * W4_ROWS, LANES), lambda c: (c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((g, RLE_WT), lambda c: (c, 0)),
            pl.BlockSpec((g, LANES), lambda c: (c, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, RLE_WT), jnp.int32),
            jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g * 12, RLE_WT), jnp.float32)
        ],
        interpret=interpret,
    )(lengths.astype(_I32), data_w)
    return (
        lax.bitcast_convert_type(words, jnp.uint32),
        _srl(bits[:, 0], 3),
    )


def huffman_pack_segments_w4(words_be, counts, sym_code, sym_len, *,
                             interpret: bool | None = None):
    """w4 variant of huffman_pack_segments taking the rle STREAM WORDS
    ``u32[NC, 512]`` (big-endian) instead of unpacked bytes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nc = words_be.shape[0]
    return _huffman_pack_w4_jit(
        words_be, counts, sym_code, sym_len, interpret=interpret,
        g=_group(nc, interpret),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "g"))
def _huffman_pack_w4_jit(words_be, counts, sym_code, sym_len, *,
                         interpret: bool, g: int):
    nc, n = words_be.shape
    assert n == CAP_BYTES // 4 and nc % g == 0
    data_w = lax.bitcast_convert_type(words_be, jnp.int32).reshape(
        nc * W4_ROWS, LANES
    )
    # packed nibble table for the two-level lookup: T[hi, lo] =
    # (code << 8) | len — codes <= 16 bits, so entries < 2^24 stay
    # exact in f32 through the dot + masked-sum select
    packed = (
        (sym_code.astype(jnp.uint32) << 8)
        | sym_len.astype(jnp.uint32)
    ).astype(jnp.float32)
    table = packed.reshape(16, 16)
    kernel = functools.partial(_huffman_kernel_w4, wt=HUF_WT, g=g)
    words, bits = pl.pallas_call(
        kernel,
        grid=(nc // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (g * W4_ROWS, LANES), lambda c: (c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, HUF_WT), lambda c: (c, 0)),
            pl.BlockSpec((g, LANES), lambda c: (c, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nc, HUF_WT), jnp.int32),
            jax.ShapeDtypeStruct((nc, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g * 12, HUF_WT), jnp.float32)
        ],
        interpret=interpret,
    )(counts.astype(_I32), data_w, table)
    return lax.bitcast_convert_type(words, jnp.uint32), bits[:, 0]
