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


def sharded_rle_stage(mesh: Mesh, seg_rows, seg_lens, *, offset: int):
    """Stage 1 sharded: local RLE + escapes, mesh-psum'd histogram.

    Returns ``(rows, counts, rle_raw)`` sharded over the mesh and a
    replicated u32[256] histogram.
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

        r, c, rr, h = rle_stage(rows, lens, offset=offset, sample=False)
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


def compress_sharded(codec, mesh: Mesh, data: bytes) -> bytes:
    """Sharded compression producing the exact single-device container.

    ``codec`` is a ``models.blockcodec.BlockCodec``. The histogram runs
    unsampled, so equality with the single-device container holds for
    inputs below the sampling threshold (64 segments / 128 KiB) — larger
    inputs still roundtrip, with an equally valid table.
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
    rows, counts, rleraw, hist = sharded_rle_stage(
        mesh, seg_rows, seg_lens, offset=codec.offset
    )
    table = codec._table_from_hist(np.asarray(hist, np.int64), False)
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
