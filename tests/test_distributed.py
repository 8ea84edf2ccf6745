"""Multi-host pipeline test: a real 2-process ``jax.distributed`` run
on CPU (4 virtual devices per process, 8 global), exercising
``parallel/distributed.py`` end to end — init, ``global_block_batch``
assembly from host-local shards, a cross-process ``psum`` histogram,
and ``gather_frames_host_local`` ordered host-local output.

The sharded *compute* path (real encode kernels under shard_map) is
covered by tests/test_parallel.py on the single-process virtual mesh;
this file covers the cross-process *protocol*. Skips (not fails) if the
coordination service cannot start in the sandbox.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_block_pipeline(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "dist_worker.py"),
             str(i), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed coordination timed out in sandbox")
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            if "DEADLINE_EXCEEDED" in out or "UNAVAILABLE" in out:
                pytest.skip(f"coordination service unavailable: {out[-200:]}")
            raise AssertionError(f"worker failed:\n{out[-2000:]}")
        assert "WORKER_OK" in out

    # both processes must agree on the global (psum'd) histogram, and it
    # must equal the single-process histogram of the full input
    h0 = np.load(tmp_path / "hist0.npy")
    h1 = np.load(tmp_path / "hist1.npy")
    rng = np.random.default_rng(7)
    all_blocks = rng.integers(97, 105, (8, 512), dtype=np.uint8)
    expect = np.bincount(all_blocks.ravel(), minlength=256)
    assert np.array_equal(h0, h1)
    assert np.array_equal(h0, expect.astype(h0.dtype))

    # host-local pieces cover each host's own block range exactly once,
    # in order, and together tile the global block index space
    p0 = np.load(tmp_path / "proc0.npy")
    p1 = np.load(tmp_path / "proc1.npy")
    assert list(p0[:, 0]) == [0, 1, 2, 3]
    assert list(p1[:, 0]) == [4, 5, 6, 7]

    # per-block payloads must match a single-process encode with the
    # same (global-histogram) table: the container a 2-host job writes
    # by ranges is identical to the 1-host container
    from tudocomp_tpu.coders.huffman import HuffmanTable

    table = HuffmanTable.from_counts(expect.astype(np.int64))
    merged = {int(r[0]): (int(r[1]), int(r[2])) for r in np.vstack([p0, p1])}
    for i, row in enumerate(all_blocks):
        code_sum = int(table.sym_code[row].astype(np.uint64).sum() & 0xFFFF)
        bit_len = int(table.sym_len[row].astype(np.int64).sum())
        assert merged[i] == (code_sum, bit_len), i

    # phase 2: the REAL sharded encode kernels ran across the two
    # processes on 1 MiB — gluing the header + every host's pieces in
    # global segment order must reproduce the single-process container
    # byte for byte
    from tudocomp_tpu.models.blockcodec import BlockCodec

    rng2 = np.random.default_rng(11)
    data2 = (
        b"rosebud was his sled all along; " * 22000
        + bytes(rng2.integers(0, 48, 400000, dtype=np.uint8))
    )[: 1 << 20]
    header = (tmp_path / "header.bin").read_bytes()
    pieces = sorted(tmp_path.glob("piece_*.bin"))
    assert len(pieces) >= 2  # both hosts wrote frames
    glued = header + b"".join(p.read_bytes() for p in pieces)
    single = BlockCodec().compress(data2)
    assert glued == single
    assert BlockCodec().decompress(glued) == data2
