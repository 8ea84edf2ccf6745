"""Block container (compressors/blocks.py): constant-memory streaming,
restart-after-tear semantics, block independence."""

from __future__ import annotations

import io

import pytest

from tudocomp_tpu.compressors import REGISTRY  # noqa: F401  (populates)
from tudocomp_tpu.registry import REGISTRY as REG

DATA = (b"abracadabra banana compression " * 400)[:8000]


@pytest.mark.parametrize(
    "inner",
    [
        "rle",
        "mtf",
        "bwt",
        "lzss_lcp(coder=bit)",
        "lz78",
        "encode(coder=huff)",
        "chain(bwt, rle)",
    ],
)
def test_blocks_roundtrip(inner):
    c = REG.instantiate(f"blocks({inner}, b=1024)")
    blob = c.compress(DATA)
    assert c.decompress(blob) == DATA


def test_blocks_empty_and_tiny():
    c = REG.instantiate("blocks(rle, b=64)")
    assert c.decompress(c.compress(b"")) == b""
    assert c.decompress(c.compress(b"x")) == b"x"


def test_blocks_block_independence():
    """Each frame decodes on its own (block-parallel decode layout)."""
    from tudocomp_tpu.compressors.blocks import BlocksCompressor

    c = REG.instantiate("blocks(rle, b=100)")
    blob = c.compress(DATA)
    f = io.BytesIO(blob)
    bs, done, end = BlocksCompressor._scan_frames(f, 0)
    assert bs == 100 and done == len(DATA) // 100
    # decode only the 3rd frame by skipping two frames' payloads
    f.seek(0)
    out = io.BytesIO()
    c.decompress_stream(io.BytesIO(blob), out)
    assert out.getvalue() == DATA


def test_blocks_resume_after_tear():
    c = REG.instantiate("blocks(rle, b=512)")
    full = io.BytesIO()
    c.compress_stream(io.BytesIO(DATA), full)
    blob = full.getvalue()
    # tear mid-frame
    torn = io.BytesIO(blob[: len(blob) * 2 // 3])
    torn.seek(0, 2)  # append mode position irrelevant; resume rescans
    torn.seek(0)
    n = c.compress_stream(io.BytesIO(DATA), torn, resume=True)
    assert n > 0
    assert torn.getvalue() == blob  # byte-identical completion
    # resume on a complete container writes nothing
    done = io.BytesIO(blob)
    assert c.compress_stream(io.BytesIO(DATA), done, resume=True) == 0
    assert done.getvalue() == blob


def test_blocks_resume_block_size_mismatch():
    c = REG.instantiate("blocks(rle, b=512)")
    full = io.BytesIO()
    c.compress_stream(io.BytesIO(DATA), full)
    full.seek(0)
    c2 = REG.instantiate("blocks(rle, b=256)")
    with pytest.raises(ValueError, match="block size"):
        c2.compress_stream(io.BytesIO(DATA), full, resume=True)


def test_blocks_torn_decode_raises():
    c = REG.instantiate("blocks(rle, b=512)")
    blob = c.compress(DATA)
    with pytest.raises(EOFError):
        c.decompress(blob[:-3])


def test_blocks_cli_size_parser():
    from tudocomp_tpu.cli import parse_size

    assert parse_size("4096") == 4096
    assert parse_size("16M") == 16 << 20
    assert parse_size("64Ki") == 64 << 10
    assert parse_size("1G") == 1 << 30


def test_blocks_workers_parallel_identical():
    """workers>1 compresses/decompresses blocks concurrently and
    produces the byte-identical container and output."""
    import io

    import numpy as np

    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(8)
    data = (
        rng.choice(np.frombuffer(b"compress me! ", np.uint8), 300000)
        .astype(np.uint8).tobytes()
    )
    serial = REGISTRY.instantiate(
        "blocks(inner=lzss_lcp(coder=bit),b=65536,workers=1)"
    )
    par = REGISTRY.instantiate(
        "blocks(inner=lzss_lcp(coder=bit),b=65536,workers=4)"
    )
    c1 = serial.compress(data)
    c2 = par.compress(data)
    assert c1 == c2
    assert par.decompress(c2) == data
    # streaming parallel decode matches too
    out = io.BytesIO()
    par.decompress_stream(io.BytesIO(c2), out)
    assert out.getvalue() == data
