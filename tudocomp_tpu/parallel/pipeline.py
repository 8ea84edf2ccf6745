"""Sharded flagship pipeline: shard_map over the (dp, sp) mesh.

Multi-chip formulation of ``models/blockcodec.py`` (SURVEY.md §2.7). The
TBC2 unit of work is a fixed 2 KiB *segment*, so sharding is simply the
segment axis split over the whole mesh (dp x sp — the two axes exist so
callers can later map dp to hosts and sp to chips within a host):

- each shard RLE-encodes and Huffman-packs its local segments with the
  same fused Pallas kernels as the single-device path, so the assembled
  container is **byte-identical** regardless of mesh shape;
- the **histogram** is psum-merged over the mesh (the only cross-chip
  communication on the encode path), and the canonical table broadcasts
  back in as a replicated argument;
- per-segment words/bits/flags come back sharded; the host's ordered
  gather assembles the container — bit streams never need cross-chip
  stitching because every segment is framed independently.

Everything here works identically on a virtual 8-device CPU mesh (tests)
and a real TPU slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _mesh_axes(mesh: Mesh):
    return ("dp", "sp")


def shard_segments(mesh: Mesh, seg_rows, seg_lens):
    """Place a host segment batch sharded over the whole mesh."""
    s = NamedSharding(mesh, P(("dp", "sp")))
    return jax.device_put(seg_rows, s), jax.device_put(seg_lens, s)


def sharded_rle_stage(mesh: Mesh, seg_rows, seg_lens, *, offset: int,
                      sample: bool = False):
    """Stage 1 sharded: local RLE + escapes, mesh-psum'd histogram.

    Returns ``(rows, counts, rle_raw)`` sharded over the mesh and a
    replicated u32[256] histogram. With ``sample``, each shard
    histograms its local rows[::8]; shard chunks are multiples of 8
    segments, so the union equals the single-device global 1-in-8
    sample and the table (hence the container) is identical.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(("dp", "sp")), P(("dp", "sp"))),
        out_specs=(
            P(("dp", "sp")), P(("dp", "sp")), P(("dp", "sp")), P(),
        ),
        check_vma=False,  # pallas_call inside shard_map
    )
    def fn(rows, lens):
        from tudocomp_tpu.models.blockcodec import rle_stage

        r, c, rr, h = rle_stage(
            rows, lens, offset=offset, sample=sample
        )
        return r, c, rr, jax.lax.psum(h, ("dp", "sp"))

    return jax.jit(fn)(seg_rows, seg_lens)


def sharded_huff_stage(mesh: Mesh, rows, counts, sym_code, sym_len):
    """Stage 2 sharded: local fused Huffman pack + raw escape."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(("dp", "sp")), P(("dp", "sp")), P(), P()),
        out_specs=(P(("dp", "sp")), P(("dp", "sp")), P(("dp", "sp"))),
        check_vma=False,
    )
    def fn(rows, counts, code, ln):
        from tudocomp_tpu.models.blockcodec import huff_stage

        return huff_stage(rows, counts, code, ln)

    return jax.jit(fn)(rows, counts, sym_code, sym_len)


def sharded_decode_stage(mesh: Mesh, feed, counts, hraw, rleraw, thresh,
                         offs, masks, *, offset: int, d: int = 11):
    """Lockstep segment decode sharded over the mesh (XLA scan decoder;
    every segment is independently framed, so decode needs **zero**
    cross-chip communication — the tables are replicated arguments)."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(("dp", "sp")), P(("dp", "sp")), P(("dp", "sp")),
            P(("dp", "sp")), P(), P(), P(),
        ),
        out_specs=(P(("dp", "sp")), P(("dp", "sp"))),
        check_vma=False,  # scan carries start as replicated constants
    )
    def fn(feed, counts, hraw, rleraw, thresh, offs, masks):
        from tudocomp_tpu.ops.hufdec_jax import decode_segments

        return decode_segments(
            feed, counts, hraw, rleraw, thresh, offs, masks,
            offset=offset, d=d,
        )

    return jax.jit(fn)(feed, counts, hraw, rleraw, thresh, offs, masks)


def decompress_sharded(codec, mesh: Mesh, data: bytes) -> bytes:
    """Sharded decompression of a TBC2 container (inverse of
    :func:`compress_sharded`): per-segment payload feeds scatter over
    the mesh, each chip decodes its segments in lockstep, and the host
    finish (``np.repeat`` expansion) reassembles in order.

    One static scan length (the largest segment's) serves the whole
    batch here; the single-chip path's payload-proportional bucketing
    (``ops/hufdec_jax.S_BUCKETS``) applies per shard-batch in the same
    way when throughput matters.
    """
    from tudocomp_tpu.ops.hufdec_jax import (
        SEG, build_feed, decoder_tables, expand_records, needed_steps,
        snap_steps,
    )

    (table, offset, orig_len, counts, flags, poff,
     pbytes) = codec._parse(data)
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
    nseg = counts.shape[0]
    pad_to = -(-nseg // mesh.size) * mesh.size
    d = t.get("d", 11)
    steps = snap_steps(int(needed_steps(pbytes, counts, d).max()))
    flat = np.frombuffer(data, np.uint8)
    feed, bc, hrw, rrw = build_feed(
        flat, np.arange(nseg), counts, flags, poff, pbytes, steps,
        pad_to,
    )
    s = NamedSharding(mesh, P(("dp", "sp")))
    chars, ends = sharded_decode_stage(
        mesh,
        jax.device_put(jnp.asarray(feed), s),
        jax.device_put(jnp.asarray(bc), s),
        jax.device_put(jnp.asarray(hrw), s),
        jax.device_put(jnp.asarray(rrw), s),
        jnp.asarray(t["thresh"]), jnp.asarray(t["offs"]),
        jnp.asarray(t["masks"]), offset=offset, d=d,
    )
    out_lens = np.minimum(
        np.full(pad_to, SEG, np.int64),
        np.maximum(orig_len - SEG * np.arange(pad_to, dtype=np.int64), 0),
    )
    return expand_records(
        np.asarray(chars), np.asarray(ends), out_lens
    )[:orig_len]


def compress_sharded(codec, mesh: Mesh, data: bytes) -> bytes:
    """Sharded compression producing the exact single-device container
    at every input size: the histogram-sampling decision uses the same
    global rule (``BlockCodec.sample_rule``) and the per-shard 1-in-8
    sample unions to the single-device one (see sharded_rle_stage).
    """
    if len(data) == 0:
        return codec._assemble_empty()
    seg_rows, seg_lens = codec.split_segments(data)
    nseg = seg_rows.shape[0]
    # each shard's batch must be a multiple of the pack kernels' group
    from tudocomp_tpu.ops.segpack_pallas import G

    n_dev = mesh.size * G
    pad_to = -(-nseg // n_dev) * n_dev
    if pad_to != nseg:
        seg_rows = np.pad(seg_rows, ((0, pad_to - nseg), (0, 0)))
        seg_lens = np.pad(seg_lens, (0, pad_to - nseg))
    seg_rows, seg_lens = shard_segments(mesh, seg_rows, seg_lens)
    sampled = codec.sample_rule(nseg)
    rows, counts, rleraw, hist = sharded_rle_stage(
        mesh, seg_rows, seg_lens, offset=codec.offset, sample=sampled
    )
    table = codec._table_from_hist(np.asarray(hist, np.int64), sampled)
    sym_code, sym_len = codec._device_table(table)
    words, bits, hraw = sharded_huff_stage(
        mesh, rows, counts, sym_code, sym_len
    )
    return codec._assemble(
        len(data), table,
        np.asarray(counts)[:nseg],
        np.asarray(rleraw)[:nseg],
        np.asarray(hraw)[:nseg],
        np.asarray(words)[:nseg],
        np.asarray(bits)[:nseg],
    )


def factorize_blocks_sharded(mesh: Mesh, blocks: np.ndarray,
                             threshold: int, max_len: int = 512):
    """Exact device LZ77 matching for a batch of equal-length blocks,
    data-parallel over the mesh (blocks are independent texts; zero
    cross-chip communication — the dp axis shards the block dimension
    and every collective-free matcher instance runs on its own chip).

    ``blocks`` is u8[B, n] with B a multiple of the mesh size; returns
    the per-block factor triples finished by the host commit walk."""
    from tudocomp_tpu.ops.lzss_jax import _match_exact_device, commit_walk

    b, n = blocks.shape
    axes = _mesh_axes(mesh)
    spec = P(axes, None)
    arr = jax.device_put(
        jnp.asarray(blocks), NamedSharding(mesh, spec)
    )
    ml = min(max_len, max(4, n - 1))

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, spec))
    def matched(x):
        return jax.vmap(
            lambda t: jnp.stack(_match_exact_device(t, max_len=ml))
        )(x)

    got = np.asarray(matched(arr), np.int64)
    return [
        commit_walk(got[i, 0], got[i, 1], threshold) for i in range(b)
    ]
