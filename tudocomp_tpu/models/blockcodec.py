"""Flagship device pipeline: segment-parallel RLE + shared canonical Huffman.

This is BASELINE.json config 1/2 re-designed TPU-first (reference
counterparts: ``compressors/RunLengthEncoder.hpp`` + ``coders/
HuffmanCoder.hpp``, composed like ``rle:encode(huff)``):

- the input splits into fixed **segments** of ``SEG = 2048`` output
  bytes — the lockstep SIMD unit for both encode and decode, and the
  data-parallel unit across chips (``parallel/pipeline.py``);
- each segment RLEs independently on device (the Pallas fused kernel's
  per-chunk state reset makes segments self-contained runs);
- ONE canonical Huffman table (min code length 3, max 16) is built on
  the host from the device-computed histogram of RLE bytes — across
  chips the histogram merges with psum and the table broadcasts;
- each segment's RLE bytes Huffman-pack independently (fused Pallas
  lookup+pack kernel), with two per-segment worst-case escapes:
  ``rle_raw`` (RLE would expand: symbols are the verbatim input bytes)
  and ``huff_raw`` (coding would expand: payload is the verbatim
  symbol bytes). The escapes bound every segment to <= SEG symbols and
  <= 8*count payload bits — the static guarantees the TPU decoder's
  lockstep schedule is built on (``ops/hufdec_jax.py``).

Container layout (TBC2; integers are byte-aligned vbyte):

    magic "TBC2" | vbyte(header_len) |
    header (finished bit stream): seg_size, offset, orig_len,
        table flag + huffman table (as coders/huffman.py) |
    per segment: vbyte(count << 2 | rle_raw << 1 | huff_raw),
        vbyte(payload_bytes), payload (byte-aligned)

Per-segment framing costs ~4 bytes per 2 KiB (~0.2%) and buys fully
parallel decode on both TPU (lockstep scan) and host (native batch
kernel, all cores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tudocomp_tpu.coders.huffman import HuffmanTable
from tudocomp_tpu.io.bitio import BitReader, BitWriter
from tudocomp_tpu.ops.segpack_pallas import (
    _w4_mode,
    be_words_from_bytes,
    huffman_pack_segments,
    huffman_pack_segments_w4,
    rle_pack_segments,
    rle_pack_segments_w4,
)
from tudocomp_tpu.ops.hist_pallas import histogram_chunks
from tudocomp_tpu.ops.hufdec_jax import (
    D as DEC_D,
    DEC_STEPS,
    SEG,
    SEG_CAP,
    decode_segments,
    decoder_tables,
    expand_records,
)
from tudocomp_tpu.ops.rle_jax import bytes_from_words
from tudocomp_tpu.utils.vbyte import read_vbyte, write_vbyte

MAGIC = b"TBC2"

#: payload words kept per segment: bits <= 8 * count <= 16384 -> 512
PAYLOAD_WORDS = 512

#: segments per device batch (16 MiB of output per batch)
BATCH_LANES = 8192

#: table-histogram cap (segments): when sampling is on, only the first
#: HIST_SEGS segments (16 MiB) feed the 1-in-8 histogram — zstd-style
#: bounded sampling. This makes the canonical table a function of the
#: FIRST dispatch batch alone, so the host can pull that histogram and
#: build the table while later RLE batches drain on device (the TPU
#: executes one program's ops serially, so a device-side table build
#: would sit ~17 ms on the encode critical path instead).
HIST_SEGS = 8192


def _bucket(n: int, full: int = BATCH_LANES) -> int:
    """Batch-shape bucket. On TPU every batch pads to the one full
    shape — lanes are parallel so small inputs cost latency, not time,
    and tunnel compiles cost minutes per new shape. On CPU (tests,
    interpret-mode Pallas) small power-of-two buckets (>= the kernel
    group size of 8) keep the interpreter cheap."""
    import jax

    if jax.default_backend() == "tpu":
        return full
    return max(8, 1 << max(0, (n - 1)).bit_length())


@functools.partial(
    jax.jit, static_argnames=("offset", "sample", "hist")
)
def rle_stage(seg_rows, seg_lens, *, offset: int, sample: bool,
              hist: bool = True, hist_limit=None):
    """Stage 1: per-segment device RLE + escape + table histogram.

    seg_rows: u8[NC, SEG], seg_lens: i32[NC]. Returns
    ``(sel_words u32[NC, SEG_CAP//4] big-endian stream words of the
    escape-selected byte stream, counts i32[NC], rle_raw bool[NC],
    hist u32[256])``. Words are zero past ``counts`` so the container
    bytes are deterministic — on the ``rle_raw`` branch this holds
    because callers MUST zero-pad ``seg_rows`` past ``seg_lens`` (all
    do: split_segments / the sharded pipeline build zero-initialised
    row buffers); the RLE branch masks internally. The inter-stage payload is WORDS (not
    unpacked bytes): the w4 kernels consume them directly, and the
    byte stream only materializes for the 1-in-8 histogram sample.

    ``hist=False`` skips the histogram entirely (batches past the
    HIST_SEGS cap); ``hist_limit`` (traced i32) masks segments at
    LOCAL index >= limit out of the histogram so a batch straddling
    the global cap contributes exactly its first ``hist_limit``
    segments. Both leave sel/counts/rle_raw untouched.
    """
    pack = rle_pack_segments_w4 if _w4_mode() else rle_pack_segments
    words, rle_lens = pack(seg_rows, seg_lens, offset=offset)
    rle_raw = rle_lens > seg_lens  # RLE would expand: keep input bytes
    input_words = be_words_from_bytes(seg_rows)
    # only the first SEG_CAP bytes (SEG_CAP/4 words) of the RLE stream
    # can survive: longer streams lose to the rle_raw escape
    sel = jnp.where(
        rle_raw[:, None], input_words, words[:, : SEG_CAP // 4]
    )
    counts = jnp.where(rle_raw, seg_lens, rle_lens).astype(jnp.int32)
    if not hist:
        return sel, counts, rle_raw, jnp.zeros(256, jnp.uint32)
    if sample:  # 1-in-8 segments feed the table histogram (zstd-style)
        sub, subc, stride = sel[::8], counts[::8], 8
    else:
        sub, subc, stride = sel, counts, 1
    if hist_limit is not None:
        idx = jnp.arange(subc.shape[0], dtype=jnp.int32) * stride
        subc = jnp.where(idx < hist_limit, subc, 0)
    sub_rows = bytes_from_words(sub, SEG_CAP)
    h = histogram_chunks(sub_rows, subc, tile=SEG_CAP)
    return sel, counts, rle_raw, h


@jax.jit
def huff_stage(sel_words, counts, sym_code, sym_len):
    """Stage 2: fused per-segment Huffman lookup + Pallas pack, with the
    ``huff_raw`` escape resolved on device (payload = verbatim bytes
    whenever coding would not strictly shrink the segment).

    ``sel_words``: the rle_stage stream words u32[NC, SEG_CAP//4].
    Returns ``(words u32[NC, PAYLOAD_WORDS], bits i32[NC],
    huff_raw bool[NC])``.
    """
    if _w4_mode():
        words, bits = huffman_pack_segments_w4(
            sel_words, counts, sym_code, sym_len
        )
    else:
        rows = bytes_from_words(sel_words, SEG_CAP)
        words, bits = huffman_pack_segments(
            rows, counts, sym_code, sym_len
        )
    huff_raw = bits >= counts * 8
    out = jnp.where(
        huff_raw[:, None],
        sel_words[:, :PAYLOAD_WORDS],
        words[:, :PAYLOAD_WORDS].astype(jnp.uint32),
    )
    bits = jnp.where(huff_raw, counts * 8, bits)
    return out, bits, huff_raw


class BlockCodec:
    """Host orchestration: split -> device encode -> container assembly.

    ``batch_lanes`` segments are processed per device dispatch (padded
    to power-of-two buckets so compilations are reused).
    """

    def __init__(self, offset: int = 0, batch_lanes: int = BATCH_LANES,
                 min_code_len: int | None = None,
                 dec_kernel: str | None = None, **_compat):
        # _compat swallows the retired TBC1 knobs (block_size,
        # sub_chunks) so older call sites keep working.
        self.offset = offset
        self.batch_lanes = batch_lanes
        self.min_code_len = min_code_len
        self.dec_kernel = dec_kernel

    # -- encode --------------------------------------------------------------

    def split_segments(self, data: bytes):
        n = len(data)
        nseg = -(-n // SEG)
        arr = np.zeros((nseg, SEG), np.uint8)
        flat = np.frombuffer(data, np.uint8)
        arr.reshape(-1)[:n] = flat
        lens = np.minimum(
            np.full(nseg, SEG, np.int64),
            n - SEG * np.arange(nseg, dtype=np.int64),
        ).astype(np.int32)
        return arr, lens

    def compress(self, data: bytes) -> bytes:
        n = len(data)
        if n == 0:
            return self._assemble_empty()
        seg_rows, seg_lens = self.split_segments(data)
        nseg = seg_rows.shape[0]
        rows_l, counts_l, rleraw_l, lanes_l = [], [], [], []
        hist_dev = None
        # one global sampling decision per input (not per batch bucket)
        # so the container bytes are identical across batch splits,
        # backends, and mesh shapes (parallel/pipeline.py uses the
        # same rule); batches start at multiples of 8, so per-batch
        # rows[::8] equals the global 1-in-8 segment sample. When
        # sampled, the histogram additionally caps at the FIRST
        # HIST_SEGS segments (same global rule in the sharded paths),
        # so only batches intersecting [0, HIST_SEGS) compute one.
        sampled = self.sample_rule(nseg)
        for lo in range(0, nseg, self.batch_lanes):
            hi = min(lo + self.batch_lanes, nseg)
            b = _bucket(hi - lo)
            br = np.zeros((b, SEG), np.uint8)
            br[: hi - lo] = seg_rows[lo:hi]
            bl = np.zeros(b, np.int32)
            bl[: hi - lo] = seg_lens[lo:hi]
            hist_on = (not sampled) or lo < HIST_SEGS
            limit = None
            if sampled and hist_on and lo + b > HIST_SEGS:
                limit = jnp.int32(HIST_SEGS - lo)
            rows, counts, rleraw, h = rle_stage(
                jnp.asarray(br), jnp.asarray(bl),
                offset=self.offset, sample=sampled,
                hist=hist_on, hist_limit=limit,
            )
            rows_l.append(rows)
            counts_l.append(counts)
            rleraw_l.append(rleraw)
            lanes_l.append(hi - lo)
            if hist_on:
                hist_dev = h if hist_dev is None else hist_dev + h
        # host table build: the histogram pull only waits for the first
        # batch (HIST_SEGS cap) while the remaining queued RLE batches
        # keep the device busy through the tunnel round trip + ~13 ms
        # build — true host/device overlap, unlike a device-side build
        # (the TPU runs one program's ops serially, so the in-chain
        # device_table_build sat ~17 ms on the encode critical path).
        table = self._table_from_hist(
            np.asarray(hist_dev, np.int64), sampled
        )
        sym_code, sym_len = self._device_table(table)
        words_l, bits_l, hraw_l = [], [], []
        for rows, counts, nl in zip(rows_l, counts_l, lanes_l):
            w, b, hr = huff_stage(rows, counts, sym_code, sym_len)
            # trim to the batch's REAL lane count before concatenating:
            # _bucket() may pad past batch_lanes (on TPU every batch
            # takes the one full compiled shape), so a tail-trim of the
            # concatenation would keep pad rows from earlier batches
            words_l.append(np.asarray(w)[:nl])
            bits_l.append(np.asarray(b)[:nl])
            hraw_l.append(np.asarray(hr)[:nl])
        counts_np = np.concatenate(
            [np.asarray(c)[:nl] for c, nl in zip(counts_l, lanes_l)]
        )[:nseg]
        rleraw_np = np.concatenate(
            [np.asarray(r)[:nl] for r, nl in zip(rleraw_l, lanes_l)]
        )[:nseg]
        words_np = np.concatenate(words_l)[:nseg]
        bits_np = np.concatenate(bits_l)[:nseg]
        hraw_np = np.concatenate(hraw_l)[:nseg]
        return self._assemble(
            n, table, counts_np, rleraw_np, hraw_np, words_np, bits_np
        )

    @staticmethod
    def sample_rule(nseg: int) -> bool:
        """Histogram sampling (1-in-8 segments, zstd-style) kicks in at
        64 segments (128 KiB); below that the exact histogram is free."""
        return nseg >= 64

    def _min_code_len(self) -> int:
        # min 3: the TPU decoder drains D=11 slots * 3 bits >= 32 bits
        # per feed word (hufdec_jax.py); forcing 3 over 2 costs <0.2%
        # ratio post-RLE and cuts slots 31%. min_code_len=4 trades
        # ~1.5% payload for an 8-slot decode schedule (decoder_tables
        # derives slots from the table itself). Settable via the
        # ``tbc2(min_code_len=...)`` option; TDC_MIN_CODE_LEN env
        # overrides for experiments.
        import os

        env = os.environ.get("TDC_MIN_CODE_LEN")
        if env is not None:
            mn = int(env)
        elif self.min_code_len is not None:
            mn = int(self.min_code_len)
        else:
            mn = 3
        return min(max(mn, 3), 8)

    def _table_from_hist(self, hist, sampled: bool):
        hist = np.asarray(hist, np.int64)
        if sampled:
            hist = hist + 1  # sampled histogram: keep all bytes encodable
        if (hist > 0).sum() <= 1:
            return None
        # 16-bit cap: packer tokens (see _min_code_len for the floor)
        return HuffmanTable.from_counts(
            hist, max_len=16, min_len=self._min_code_len()
        )

    @staticmethod
    def _device_table(table):
        if table is None:
            # identity: bits == 8*count everywhere -> all huff_raw
            return (
                jnp.arange(256, dtype=jnp.uint32),
                jnp.full(256, 8, jnp.uint32),
            )
        return (
            jnp.asarray(table.sym_code.astype(np.uint32)),
            jnp.asarray(table.sym_len.astype(np.uint32)),
        )

    def _header(self, orig_len: int, table) -> bytes:
        head = BitWriter()
        head.write_compressed_int(SEG)
        head.write_compressed_int(self.offset)
        head.write_compressed_int(orig_len)
        if table is None:
            head.write_bit(0)
        else:
            head.write_bit(1)
            table.write(head)
        return head.getvalue()

    def _assemble_empty(self) -> bytes:
        out = bytearray(MAGIC)
        header = self._header(0, None)
        write_vbyte(out, len(header))
        out += header
        return bytes(out)

    def _assemble(self, orig_len, table, counts, rleraw, hraw, words,
                  bits) -> bytes:
        """Vectorized container assembly (no per-segment Python loop)."""
        out = bytearray(MAGIC)
        header = self._header(orig_len, table)
        write_vbyte(out, len(header))
        out += header
        out += self._frames(counts, rleraw, hraw, words, bits)
        return bytes(out)

    def _frames(self, counts, rleraw, hraw, words, bits) -> bytes:
        """Per-segment frame bytes for a (slice of a) segment batch —
        the container body after the header. Hosts of a multi-process
        job frame their own contiguous segment ranges with this and
        write them at offsets from a size all-gather
        (``parallel/distributed.compress_distributed``)."""
        from tudocomp_tpu.utils.vbyte import encode_vbyte_array

        nseg = counts.shape[0]
        meta1 = (
            (counts.astype(np.uint64) << np.uint64(2))
            | (rleraw.astype(np.uint64) << np.uint64(1))
            | hraw.astype(np.uint64)
        )
        pbytes = ((bits.astype(np.int64) + 7) // 8)
        meta2 = pbytes.astype(np.uint64)

        def vb_lens(v):
            nb = np.ones(v.shape, np.int64)
            vv = v.copy()
            for _ in range(9):
                vv >>= np.uint64(7)
                nb += (vv > 0).astype(np.int64)
            return nb

        m1_payload = encode_vbyte_array(meta1)
        m2_payload = encode_vbyte_array(meta2)
        l1 = vb_lens(meta1)
        l2 = vb_lens(meta2)
        seg_sizes = l1 + l2 + pbytes
        seg_starts = np.concatenate([[0], np.cumsum(seg_sizes)[:-1]])
        total = int(seg_sizes.sum())
        buf = np.zeros(total, np.uint8)

        def ragged_place(dst_starts, lens, src, src_starts):
            """buf[dst_starts[i] + j] = src[src_starts[i] + j]."""
            tot = int(lens.sum())
            if tot == 0:
                return
            piece = np.repeat(np.arange(lens.size), lens)
            within = np.arange(tot) - np.repeat(
                np.cumsum(lens) - lens, lens
            )
            buf[dst_starts[piece] + within] = src[src_starts[piece] + within]

        l1_starts = np.cumsum(l1) - l1
        l2_starts = np.cumsum(l2) - l2
        ragged_place(seg_starts, l1, m1_payload, l1_starts)
        ragged_place(seg_starts + l1, l2, m2_payload, l2_starts)
        payload_bytes = np.ascontiguousarray(
            words, dtype=">u4"
        ).view(np.uint8).reshape(nseg, -1)
        ragged_place(
            seg_starts + l1 + l2, pbytes,
            payload_bytes.reshape(-1),
            np.arange(nseg, dtype=np.int64) * payload_bytes.shape[1],
        )
        return buf.tobytes()

    # -- container parse (shared by host + device decode) --------------------

    def _parse(self, data: bytes):
        if data[:4] != MAGIC:
            raise ValueError("bad magic")
        header_len, pos = read_vbyte(data, 4)
        head = BitReader(data[pos : pos + header_len])
        pos += header_len
        seg_size = head.read_compressed_int()
        if seg_size != SEG:
            raise ValueError("unsupported segment size")
        offset = head.read_compressed_int()
        orig_len = head.read_compressed_int()
        table = HuffmanTable.read(head) if head.read_bit() else None
        nseg = -(-orig_len // SEG)
        from tudocomp_tpu import native

        parsed = native.tbc2_parse(data, pos, nseg)
        if parsed is None:
            counts = np.zeros(nseg, np.int64)
            flags = np.zeros(nseg, np.uint8)
            poff = np.zeros(nseg, np.int64)
            pbytes = np.zeros(nseg, np.int64)
            for i in range(nseg):
                m1, pos = read_vbyte(data, pos)
                m2, pos = read_vbyte(data, pos)
                counts[i] = m1 >> 2
                flags[i] = m1 & 3
                poff[i] = pos
                pbytes[i] = m2
                pos += m2
        else:
            counts, flags, poff, pbytes = parsed
        return table, offset, orig_len, counts, flags, poff, pbytes

    # -- host decode (specification path; native batch kernel) ---------------

    def decompress(self, data: bytes) -> bytes:
        (table, offset, orig_len, counts, flags, poff,
         pbytes) = self._parse(data)
        if orig_len == 0:
            return b""
        nseg = counts.shape[0]
        if table is not None:
            table.build_lut()
        from tudocomp_tpu import native

        out = native.tbc2_decode(
            data, counts, flags, poff, pbytes, orig_len, SEG,
            table, offset,
        )
        if out is not None:
            return out
        # pure-Python fallback (no native runtime)
        res = bytearray()
        for i in range(nseg):
            n_out = min(SEG, orig_len - i * SEG)
            payload = np.frombuffer(
                data, np.uint8, int(pbytes[i]), int(poff[i])
            )
            cnt = int(counts[i])
            if flags[i] & 1:  # huff_raw
                syms = payload[:cnt]
            else:
                syms = table.fast_decode(payload, cnt)
            if flags[i] & 2:  # rle_raw
                res += syms[:n_out].tobytes()
            else:
                from tudocomp_tpu.compressors.rle import rle_decode

                res += rle_decode(syms, offset)[:n_out]
        return bytes(res)

    # -- device decode (TPU lockstep scan; ops/hufdec_jax.py) ----------------

    def _device_decoder(self) -> str:
        """'pallas' (in-kernel step loop; TPU default) or 'scan' (XLA
        lockstep scan; CPU/interpret default). Settable via the
        ``tbc2(dec=...)`` option; TDC_DEC_KERNEL env overrides."""
        import os

        want = os.environ.get("TDC_DEC_KERNEL") or self.dec_kernel
        if want in ("pallas", "scan"):
            return want
        return "pallas" if jax.default_backend() == "tpu" else "scan"

    def decompress_device(self, data: bytes) -> bytes:
        (table, offset, orig_len, counts, flags, poff,
         pbytes) = self._parse(data)
        if orig_len == 0:
            return b""
        if table is not None:
            t = decoder_tables(table)
        else:
            t = {
                "thresh": np.zeros(16, np.int32),
                "offs": np.zeros(16, np.int32),
                "masks": np.zeros((8, 8), np.int32),
            }
        d = t.get("d", DEC_D)
        thresh = jnp.asarray(t["thresh"])
        offs = jnp.asarray(t["offs"])
        masks = jnp.asarray(t["masks"])
        nseg = counts.shape[0]
        flat = np.frombuffer(data, np.uint8)
        # payload-proportional scan lengths: sort segments by needed
        # steps so each batch runs the shortest static bucket that
        # fits it (ops/hufdec_jax.py S_BUCKETS), then reassemble in
        # original order
        from tudocomp_tpu.ops.hufdec_jax import (
            build_feed, needed_steps, snap_steps,
        )

        kernel = self._device_decoder()
        if kernel == "pallas":
            from tudocomp_tpu.ops.hufdec_pallas import (
                BLOCK, decode_segments_pallas, snap_steps_pallas,
                unpack_records,
            )

        need = needed_steps(pbytes, counts, d)
        order = np.argsort(need, kind="stable")
        all_out_lens = np.minimum(
            np.full(nseg, SEG, np.int64),
            np.maximum(
                orig_len - SEG * np.arange(nseg, dtype=np.int64), 0
            ),
        )
        parts: list[bytes | None] = [None] * nseg
        for lo in range(0, nseg, self.batch_lanes):
            idx = order[lo : lo + self.batch_lanes]
            if kernel == "pallas":
                b = -(-_bucket(idx.size) // BLOCK) * BLOCK
                steps = snap_steps_pallas(int(need[idx].max()))
            else:
                b = _bucket(idx.size)
                steps = snap_steps(int(need[idx].max()))
            feed, bc, hrw, rrw = build_feed(
                flat, idx, counts, flags, poff, pbytes, steps, b
            )
            if kernel == "pallas":
                packed = decode_segments_pallas(
                    feed, bc, hrw, rrw, thresh, offs, masks,
                    offset=offset, d=d,
                )
                chars, ends = unpack_records(np.asarray(packed))
            else:
                chars, ends = decode_segments(
                    jnp.asarray(feed), jnp.asarray(bc), jnp.asarray(hrw),
                    jnp.asarray(rrw), thresh, offs, masks, offset=offset,
                    d=d,
                )
            out_lens = np.zeros(b, np.int64)
            out_lens[: idx.size] = all_out_lens[idx]
            blob = expand_records(
                np.asarray(chars), np.asarray(ends), out_lens
            )
            starts = np.concatenate([[0], np.cumsum(out_lens)])
            for j, seg_i in enumerate(idx.tolist()):
                parts[seg_i] = blob[starts[j] : starts[j + 1]]
        return b"".join(parts)[:orig_len]
