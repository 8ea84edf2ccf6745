"""Journaled restart for the sharded pipeline
(parallel/pipeline.compress_sharded_resumable): a compression job
killed mid-stream — after frames hit the container but before the
journal records them, the worst tear — must resume to a byte-identical
container (SURVEY §5 failure detection / restartable jobs)."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(__file__)

SCRIPT = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {root!r})
from tudocomp_tpu.models.blockcodec import BlockCodec
from tudocomp_tpu.parallel.mesh import make_mesh
from tudocomp_tpu.parallel.pipeline import compress_sharded_resumable
codec = BlockCodec()
mesh = make_mesh(8, sp=2)
compress_sharded_resumable(
    codec, mesh, {src!r}, {dst!r},
    batch_segments=64, resume={resume},
)
print("RESUME_DONE")
"""


def _run(src, dst, resume, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    if env_extra:
        env.update(env_extra)
    root = os.path.join(HERE, "..")
    return subprocess.run(
        [sys.executable, "-c",
         SCRIPT.format(root=root, src=str(src), dst=str(dst),
                       resume=resume)],
        capture_output=True, text=True, env=env, timeout=600,
    )


def test_killed_and_resumed_sharded_compression(tmp_path):
    rng = np.random.default_rng(5)
    data = (
        b"call me ishmael. some years ago - never mind how long " * 8000
        + bytes(rng.integers(0, 64, 120000, dtype=np.uint8))
    )[: 360 * 2048 + 777]  # 6 batches of 64 segments, ragged tail
    src = tmp_path / "input.bin"
    src.write_bytes(data)
    dst = tmp_path / "out.tbc2"

    # clean single-shot run = the ground truth bytes
    clean = tmp_path / "clean.tbc2"
    r = _run(src, clean, False)
    assert r.returncode == 0, r.stdout + r.stderr
    want = clean.read_bytes()

    # crash after batch 2's frames were appended but NOT journaled
    r = _run(src, dst, False, {"TDC_CRASH_AFTER_BATCH": "2"})
    assert r.returncode == 17, r.stdout + r.stderr
    assert os.path.exists(str(dst) + ".journal")
    torn = dst.read_bytes()
    assert want.startswith(torn[: len(torn) - 1])  # prefix w/ tear
    assert torn != want

    # resume: truncates the unjournaled batch and finishes
    r = _run(src, dst, True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert dst.read_bytes() == want
    assert not os.path.exists(str(dst) + ".journal")

    from tudocomp_tpu.models.blockcodec import BlockCodec

    assert BlockCodec().decompress(want) == data
