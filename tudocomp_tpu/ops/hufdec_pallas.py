"""Pallas (Mosaic) decoder for the TBC2 flagship container.

Same lockstep decode schedule as the XLA scan in ``hufdec_jax.py``
(reference semantics: canonical walk ``coders/HuffmanCoder.hpp:377-397``
+ RLE expansion ``compressors/RunLengthEncoder.hpp:36-49``) but the
step loop runs *inside* one kernel. The scan decoder's cost is per-step
XLA dispatch (~20-30 us/step at 16K lanes; each step is a handful of
elementwise ops on [lanes] vectors — far too small to fill the chip).
Here a grid step owns a (8, 128) = 1024-lane tile and executes
``CH = 16`` feed steps x ``D = 11`` unrolled decode slots as straight
VPU code over in-register state, so the only per-step cost is the
vector ALU work itself.

Layout (one segment = one lane of an (8, 128) tile):

- feed      i32[B, steps*8, 128]   big-endian payload words, step-major
- counts    i32[B, 8, 128]         symbols per segment
- raw/rleraw i32[B, 8, 128]        escape flags (1/0)
- thresh/offs SMEM i32[16], masks SMEM i32[64] (8 bit-planes x 8 words)
- out       i32[B, steps*D*8, 128] packed records ``char << 16 | end``

State (9 vars x (8, 128) i32) lives in a VMEM scratch that persists
across the sequential chunk grid dimension; it is re-initialized when
``chunk == 0``. All slot math is elementwise i32 with vector shift
amounts (same ops the segment packers already use in-kernel).

Bit-identical to ``hufdec_jax.decode_segments`` by construction: same
refill rule (add one 32-bit word when <= 31 bits buffered), same
16-threshold canonical length detection, same bit-sliced symbol map,
same fused RLE record state machine, same slot validity rule. Extra
padded steps (buckets are multiples of CH) only run drained lanes whose
slots emit zero-delta records — the host ``np.repeat`` finish ignores
them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tudocomp_tpu.ops.hufdec_jax import D, SEG

LANES = 128
SUB = 8
BLOCK = SUB * LANES  # 1024 segments per grid tile
CH = 16              # feed steps per chunk grid step

#: static step buckets (multiples of CH, each >= the matching scan
#: bucket in hufdec_jax.S_BUCKETS so `snap` always finds a fit)
P_BUCKETS = (208, 336, 528)

_I32 = jnp.int32


def snap_steps_pallas(need: int) -> int:
    for s in P_BUCKETS:
        if need <= s:
            return s
    return P_BUCKETS[-1]


def _srl(x, n):
    if isinstance(n, int):
        n = jnp.broadcast_to(_I32(n), x.shape)
    return lax.shift_right_logical(x, n)


def _decode_kernel(thresh_ref, offs_ref, masks_ref, feed_ref, counts_ref,
                   raw_ref, rleraw_ref, out_ref, state_ref, *,
                   offset: int, steps: int, d: int = D):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        z = jnp.zeros((SUB, LANES), _I32)
        for i in range(9):
            state_ref[i * SUB : (i + 1) * SUB, :] = (
                jnp.full((SUB, LANES), -1, _I32) if i == 4 else z
            )

    counts = counts_ref[0]
    raw = raw_ref[0] != 0
    rleraw = rleraw_ref[0] != 0

    def ld(i):
        return state_ref[i * SUB : (i + 1) * SUB, :]

    carry = tuple(ld(i) for i in range(9))

    def step(t, carry):
        (hi, lo, bits, done, armed, vb_pend, vb_char, vb_acc,
         out_end) = carry
        w = feed_ref[0, pl.ds(t * SUB, SUB), :]
        # refill: place w's 32 bits after the `bits` valid bits
        refill = bits <= 31
        sh = jnp.minimum(bits, 31)
        sh1 = jnp.maximum(sh, 1)
        hi = jnp.where(
            refill, hi | jnp.where(sh == 0, w, _srl(w, sh)), hi
        )
        lo = jnp.where(
            refill, lo | jnp.where(sh == 0, _I32(0), w << (32 - sh1)), lo
        )
        bits = bits + jnp.where(refill, 32, 0)

        for slot_i in range(d):
            win = _srl(hi, 16)
            ln = jnp.ones((SUB, LANES), _I32)
            for l in range(16):
                ln = ln + (win < thresh_ref[l]).astype(_I32)
            ln = jnp.minimum(ln, 16)
            ln = jnp.where(raw, _I32(8), ln)
            prefix = _srl(win, 16 - ln)
            off_sel = jnp.zeros((SUB, LANES), _I32)
            for l in range(16):
                off_sel = jnp.where(ln == l + 1, offs_ref[l], off_sel)
            idx = jnp.clip(prefix + off_sel, 0, 255)
            # bit-sliced 256-entry symbol map (8 planes x 8 words)
            word_i = _srl(idx, 5)
            bit_i = idx & 31
            byte = jnp.zeros((SUB, LANES), _I32)
            for k in range(8):
                wk = jnp.zeros((SUB, LANES), _I32)
                for wi in range(8):
                    wk = jnp.where(
                        word_i == wi, masks_ref[k * 8 + wi], wk
                    )
                byte = byte | ((_srl(wk, bit_i) & 1) << k)
            byte = jnp.where(raw, _srl(win, 8), byte)
            valid = (bits >= 16) & (done < counts)
            take = jnp.where(valid, ln, 0)
            take1 = jnp.maximum(take, 1)
            hi = jnp.where(
                take == 0, hi, (hi << take1) | _srl(lo, 32 - take1)
            )
            lo = jnp.where(take == 0, lo, lo << take1)
            bits = bits - take
            done = done + valid.astype(_I32)

            # RLE record state machine (RunLengthEncoder.hpp semantics)
            is_vb = vb_pend > 0
            shift7 = 7 * jnp.maximum(vb_pend - 1, 0)
            new_acc = vb_acc | ((byte & 0x7F) << shift7)
            cont = (byte & 0x80) != 0
            trig = (~is_vb) & (byte == armed) & ~rleraw
            delta = jnp.where(
                ~valid, 0,
                jnp.where(
                    is_vb & ~cont, new_acc - offset + 1,
                    jnp.where(is_vb | trig, 0, 1),
                ),
            )
            delta = jnp.clip(delta, 0, SEG)
            char = jnp.where(is_vb, vb_char, byte)
            vb_pend = jnp.where(
                ~valid, vb_pend,
                jnp.where(
                    is_vb,
                    jnp.where(cont, jnp.minimum(vb_pend + 1, 3), 0),
                    jnp.where(trig, 1, 0),
                ),
            )
            vb_char = jnp.where(valid & trig, byte, vb_char)
            vb_acc = jnp.where(
                ~valid, vb_acc, jnp.where(is_vb & cont, new_acc, 0)
            )
            armed = jnp.where(valid & ~is_vb, byte, armed)
            out_end = jnp.minimum(out_end + delta, SEG)
            out_ref[0, pl.ds((t * d + slot_i) * SUB, SUB), :] = (
                (char << 16) | out_end
            )
        return (hi, lo, bits, done, armed, vb_pend, vb_char, vb_acc,
                out_end)

    # t is chunk-local: feed/out refs are the c-th chunk's blocks
    carry = lax.fori_loop(0, CH, step, carry, unroll=False)
    for i in range(9):
        state_ref[i * SUB : (i + 1) * SUB, :] = carry[i]


@functools.partial(
    jax.jit, static_argnames=("offset", "steps", "interpret", "d")
)
def _decode_pallas_jit(feed, counts, raw, rleraw, thresh, offs, masks,
                       *, offset: int, steps: int, interpret: bool,
                       d: int = D):
    b = feed.shape[0]
    assert steps % CH == 0 and feed.shape[1] == steps * SUB
    kernel = functools.partial(
        _decode_kernel, offset=offset, steps=steps, d=d
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, steps // CH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, CH * SUB, LANES), lambda i, c: (i, c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, SUB, LANES), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, SUB, LANES), lambda i, c: (i, 0, 0)),
            pl.BlockSpec((1, SUB, LANES), lambda i, c: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, CH * d * SUB, LANES), lambda i, c: (i, c, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, steps * d * SUB, LANES), _I32),
        scratch_shapes=[pltpu.VMEM((9 * SUB, LANES), _I32)],
        interpret=interpret,
    )(thresh, offs, masks, feed, counts, raw, rleraw)
    return out


def decode_segments_pallas(feed, counts, raw_flags, rle_raw_flags,
                           thresh, offs, masks, *, offset: int = 0,
                           interpret: bool | None = None, d: int = D):
    """Drop-in decoder: feed u32[nseg, steps] (steps in P_BUCKETS,
    nseg % 1024 == 0) -> packed records i32[B, steps*d*8, 128] on
    device. Unpack on the host with :func:`unpack_records`."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nseg, steps = feed.shape
    assert nseg % BLOCK == 0, nseg
    b = nseg // BLOCK
    feed_p = jnp.transpose(
        jnp.asarray(feed).astype(jnp.uint32).reshape(
            b, SUB, LANES, steps
        ),
        (0, 3, 1, 2),
    ).reshape(b, steps * SUB, LANES)
    feed_p = lax.bitcast_convert_type(feed_p, _I32)

    def tile(v, dt=_I32):
        return jnp.asarray(v).astype(dt).reshape(b, SUB, LANES)

    return _decode_pallas_jit(
        feed_p, tile(counts), tile(raw_flags), tile(rle_raw_flags),
        jnp.asarray(thresh, _I32), jnp.asarray(offs, _I32),
        jnp.asarray(masks, _I32).reshape(64),
        offset=offset, steps=steps, interpret=interpret, d=d,
    )


def unpack_records(packed: np.ndarray):
    """Host: packed i32[B, steps*D*8, 128] -> (chars u8[nseg, S],
    ends u16[nseg, S]) in segment order (S = steps * D)."""
    b, s8, _ = packed.shape
    s = s8 // SUB
    arr = np.asarray(packed).reshape(b, s, SUB, LANES)
    arr = arr.transpose(0, 2, 3, 1).reshape(b * BLOCK, s)
    chars = (arr >> 16).astype(np.uint8)
    ends = (arr & 0xFFFF).astype(np.uint16)
    return chars, ends
