"""Sharded flagship pipeline: shard_map over the (dp, sp) mesh.

Multi-chip formulation of ``models/blockcodec.py`` (SURVEY.md §2.7):

- **blocks** shard over ``dp``; each dp shard RLEs its blocks locally;
- **sub-chunks** shard over ``sp``; each sp shard Huffman-packs its slice
  of every block's RLE byte buffer;
- the **histogram** is psum-merged over BOTH axes (the only cross-chip
  communication on the encode path), and the canonical table broadcasts
  back in as a replicated argument;
- per-(block, sub-chunk) words/bit-lengths come back sharded; the host's
  ordered gather (a jax.device_get of an addressable array) assembles the
  container — bit streams never need cross-chip stitching because the
  container frames sub-chunks independently.

Everything here works identically on a virtual 8-device CPU mesh (tests)
and a real TPU slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tudocomp_tpu.ops.rle_jax import bytes_from_words


def _rle_local(blocks, lengths, offset: int, cap: int):
    """Per-shard fused RLE (same Pallas kernel as the single-device
    pipeline, so sharded containers match byte-for-byte)."""
    from tudocomp_tpu.models.blockcodec import PACK_TILE
    from tudocomp_tpu.ops.bitpack_pallas import rle_pack_chunks

    words, rle_lens = rle_pack_chunks(
        blocks, lengths, tile=PACK_TILE(), offset=offset
    )
    rle_bytes = jax.vmap(lambda w: bytes_from_words(w, cap))(words)
    return rle_bytes, rle_lens


def sharded_histogram(mesh: Mesh, blocks, lengths, *, offset: int, cap: int):
    """Global RLE-byte histogram, psum-merged over the whole mesh.

    ``blocks: u8[B, N]`` sharded over dp; returns a replicated u32[256].
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=P(),
        check_vma=False,  # pallas_call inside shard_map
    )
    def hist_fn(blocks, lengths):
        from tudocomp_tpu.models.blockcodec import PACK_TILE, table_histogram

        rle_bytes, rle_lens = _rle_local(blocks, lengths, offset, cap)
        h = table_histogram(rle_bytes, rle_lens, cap, PACK_TILE())
        # blocks are replicated over sp: count each dp shard once
        h = jnp.where(jax.lax.axis_index("sp") == 0, h, jnp.uint32(0))
        h = jax.lax.psum(h, ("dp", "sp"))
        return h

    return jax.jit(hist_fn)(blocks, lengths)


def sharded_encode_step(
    mesh: Mesh, blocks, lengths, sym_code, sym_len, *,
    offset: int, cap: int, sub_chunks: int,
):
    """Full sharded encode step.

    blocks over dp; sub-chunks over sp (``sub_chunks`` must be divisible
    by the sp axis size). Returns ``(words u32[B,S,Wc], bits i32[B,S],
    rle_lens i32[B], hist u32[256])`` with words/bits sharded
    (dp, sp) and rle_lens sharded dp; hist replicated.
    """
    sp = mesh.shape["sp"]
    if sub_chunks % sp:
        raise ValueError(f"sub_chunks={sub_chunks} not divisible by sp={sp}")
    cs = cap // sub_chunks

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P(), P()),
        out_specs=(P("dp", "sp"), P("dp", "sp"), P("dp"), P()),
        check_vma=False,  # pallas_call inside shard_map
    )
    def encode_fn(blocks, lengths, sym_code, sym_len):
        from tudocomp_tpu.models.blockcodec import PACK_TILE, table_histogram

        rle_bytes, rle_lens = _rle_local(blocks, lengths, offset, cap)
        hist = table_histogram(rle_bytes, rle_lens, cap, PACK_TILE())
        sp_idx = jax.lax.axis_index("sp")
        # blocks are replicated over sp: count each dp shard once
        hist = jnp.where(sp_idx == 0, hist, jnp.uint32(0))
        hist = jax.lax.psum(hist, ("dp", "sp"))
        local_s = sub_chunks // sp
        first = sp_idx * local_s
        b = rle_bytes.shape[0]
        chunks = jax.lax.dynamic_slice_in_dim(
            rle_bytes.reshape(b, sub_chunks, cs), first, local_s, axis=1
        )
        starts = (first + jnp.arange(local_s, dtype=jnp.int32)) * cs
        chunk_lens = jnp.clip(
            rle_lens[:, None] - starts[None, :], 0, cs
        ).reshape(-1)
        from tudocomp_tpu.models.blockcodec import PACK_TILE, _pad_bytes
        from tudocomp_tpu.ops.bitpack_pallas import (
            pack_bytes_huffman_chunks,
        )

        tile = PACK_TILE()
        flat = _pad_bytes(chunks.reshape(b * local_s, cs), tile)
        words, bits = pack_bytes_huffman_chunks(
            flat, chunk_lens, sym_code, sym_len, tile=tile
        )
        wc = words.shape[-1]
        return (
            words.reshape(b, local_s, wc),
            bits.reshape(b, local_s),
            rle_lens, hist,
        )

    fn = jax.jit(encode_fn)
    return fn(blocks, lengths, sym_code, sym_len)


def compress_sharded(codec, mesh: Mesh, data: bytes) -> bytes:
    """Sharded compression producing the exact single-device container.

    ``codec`` is a ``models.blockcodec.BlockCodec``; the mesh's dp axis
    must divide the (padded) block count.
    """
    import numpy as np

    blocks, lengths = codec.split_blocks(data)
    n_blocks = blocks.shape[0]
    dp = mesh.shape["dp"]
    pad_to = -(-n_blocks // dp) * dp
    if pad_to != n_blocks:
        blocks = np.pad(blocks, ((0, pad_to - n_blocks), (0, 0)))
        lengths = np.pad(lengths, (0, pad_to - n_blocks))
    blocks, lengths = shard_blocks(mesh, blocks, lengths)
    hist = np.asarray(
        sharded_histogram(
            mesh, blocks, lengths, offset=codec.offset, cap=codec.cap
        ),
        np.int64,
    )
    table = codec._table_from_hist(hist)
    sym_code, sym_len = codec._device_table(table)
    words, bits, rle_lens, _ = sharded_encode_step(
        mesh, blocks, lengths, sym_code, sym_len,
        offset=codec.offset, cap=codec.cap, sub_chunks=codec.sub_chunks,
    )
    return codec._assemble(
        data,
        np.asarray(rle_lens)[:n_blocks],
        np.asarray(words)[:n_blocks],
        np.asarray(bits)[:n_blocks],
        table,
    )


def shard_blocks(mesh: Mesh, blocks, lengths):
    """Place a host block batch sharded over dp (replicated over sp)."""
    s_blocks = NamedSharding(mesh, P("dp"))
    return (
        jax.device_put(blocks, s_blocks),
        jax.device_put(lengths, s_blocks),
    )
