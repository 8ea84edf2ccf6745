"""Sharded pipeline tests on the virtual 8-device CPU mesh."""

import numpy as np

from tudocomp_tpu.models.blockcodec import BlockCodec
from tudocomp_tpu.parallel.mesh import make_mesh
from tudocomp_tpu.parallel.pipeline import (
    compress_sharded,
    decompress_sharded,
)


def _data():
    rng = np.random.default_rng(7)
    return (
        b"sing, goddess, of the anger of achilles " * 120
        + bytes(rng.integers(0, 16, 4096, dtype=np.uint8))
        + b"\x00" * 1500
    )


def test_sharded_matches_single_device():
    codec = BlockCodec(block_size=1024, sub_chunks=8)
    data = _data()
    single = codec.compress(data)
    for sp in (1, 2, 4):
        mesh = make_mesh(8, sp=sp)
        sharded = compress_sharded(codec, mesh, data)
        assert sharded == single, f"sp={sp}"
    assert codec.decompress(single) == data


def test_sharded_matches_single_device_sampled():
    """>= 64 segments: the histogram runs sampled (1-in-8); byte
    identity must survive because the per-shard sample unions to the
    global one (pipeline.sharded_rle_stage)."""
    codec = BlockCodec()
    data = (_data() * 16)[: 70 * 2048]
    assert codec.sample_rule(-(-len(data) // 2048))
    single = codec.compress(data)
    mesh = make_mesh(8, sp=2)
    assert compress_sharded(codec, mesh, data) == single
    assert codec.decompress(single) == data


def test_sharded_decode_roundtrip():
    codec = BlockCodec()
    data = _data()
    comp = codec.compress(data)
    for sp in (1, 2):
        mesh = make_mesh(8, sp=sp)
        assert decompress_sharded(codec, mesh, comp) == data, f"sp={sp}"


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    import jax

    out = jax.jit(fn)(*args)
    assert len(out) == 3
    ge.dryrun_multichip(8)


def test_factorize_blocks_sharded_matches_single():
    """Block-parallel exact device LZ77 over the mesh equals the
    single-device matcher per block (dp-sharded, zero communication)."""
    import numpy as np

    from tudocomp_tpu.ops.lzss_jax import factorize_device
    from tudocomp_tpu.parallel.mesh import make_mesh
    from tudocomp_tpu.parallel.pipeline import factorize_blocks_sharded

    mesh = make_mesh(8, sp=2)
    blocks = np.stack([
        np.frombuffer(
            ((b"shard %d lorem ipsum " % i) * 32)[:383] + b"\x00",
            np.uint8,
        )
        for i in range(16)
    ])
    got = factorize_blocks_sharded(mesh, blocks, threshold=4)
    for i in range(16):
        want = factorize_device(blocks[i], 4, max_len=383, exact=True)
        assert all(
            np.array_equal(a, b) for a, b in zip(got[i], want)
        ), i
