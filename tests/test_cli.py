"""CLI driver tests (reference ``tudocomp_driver_tests.cpp``)."""

import json
import pathlib

import pytest

from tudocomp_tpu import cli
from tudocomp_tpu.stats import StatPhase

from tests.helpers import roundtrip_corpus


@pytest.mark.parametrize(
    "algo",
    [
        "rle",
        "encode(coder=huff)",
        "bwt:rle:mtf:encode(coder=huff)",
        "lzss_lcp(coder=huff)",
        "lz78",
    ],
)
def test_cli_roundtrip_with_header(algo):
    for data in roundtrip_corpus()[:8]:
        c = cli.compress(algo, data)
        assert c.split(b"%")[0].decode().startswith(algo.split("(")[0].split(":")[0]) or b"%" in c
        assert cli.decompress(c) == data


def test_cli_raw_mode():
    data = b"banana band " * 40
    c = cli.compress("rle", data, raw=True)
    assert not c.startswith(b"rle")
    assert cli.decompress(c, raw_algo="rle") == data


def test_cli_header_selfdescribing():
    # options that affect decoding must round through the header
    data = b"x" * 500
    c = cli.compress("rle(offset=1)", data)
    assert c.startswith(b"rle(offset=1)%")
    assert cli.decompress(c) == data


def test_cli_generators():
    assert cli.generate("fib(5)") == b"abaab"
    assert len(cli.generate("thue_morse(4)")) == 8
    assert len(cli.generate("random(100, 7)")) == 100
    assert cli.generate("run_rich(3)")


def test_cli_files(tmp_path):
    p = tmp_path / "in.bin"
    data = bytes(range(256)) * 4
    p.write_bytes(data)
    assert cli.main([str(p), "-a", "encode(coder=huff)"]) == 0
    assert cli.main([str(p), "-a", "encode(coder=huff)"]) == 1  # exists
    assert cli.main([str(p) + ".tdc", "-d", "-o", str(p) + ".out"]) == 0
    assert (tmp_path / "in.bin.out").read_bytes() == data


def test_cli_list(capsys):
    assert cli.main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in ("lzss_lcp", "huff", "ternary", "chain"):
        assert name in out


def test_statphase_tree():
    with StatPhase("root") as root:
        with StatPhase("a"):
            with StatPhase("a1"):
                pass
        with StatPhase("b") as b:
            b.log_stat("factors", 42)
    j = root.to_json()
    assert j["title"] == "root"
    assert [c["title"] for c in j["sub"]] == ["a", "b"]
    assert j["sub"][0]["sub"][0]["title"] == "a1"
    assert j["sub"][1]["stats"] == [{"key": "factors", "value": 42}]
    json.dumps(j)  # serializable
    assert j["timeDelta"] >= 0


def test_cli_blocks_streaming(tmp_path):
    """--blocks streams file->file; decode self-describes; --resume
    completes a torn output byte-identically."""
    src = tmp_path / "in.bin"
    src.write_bytes((b"squeeze me gently " * 600)[:10000])
    out = tmp_path / "out.tdc"
    rc = cli.main(
        [str(src), "-a", "rle:encode(coder=huff)", "--blocks", "2Ki",
         "-f", "-o", str(out)]
    )
    assert rc == 0
    dec = tmp_path / "out.bin"
    assert cli.main([str(out), "-d", "-f", "-o", str(dec)]) == 0
    assert dec.read_bytes() == src.read_bytes()

    full = out.read_bytes()
    out.write_bytes(full[: len(full) // 2])  # tear mid-frame
    rc = cli.main(
        [str(src), "-a", "rle:encode(coder=huff)", "--blocks", "2Ki",
         "--resume", "-o", str(out)]
    )
    assert rc == 0
    assert out.read_bytes() == full


def test_logging_flags(tmp_path):
    """--loglevel/--logdir/--logverbosity configure the logging layer
    (reference glog passthrough, Options.hpp:15-32)."""
    import logging

    from tudocomp_tpu.utils import log as tlog

    tlog.configure("debug", str(tmp_path / "logs"), 2)
    assert tlog.vlog(2) and not tlog.vlog(3)
    lg = tlog.get_logger("test")
    lg.info("hello from the test")
    for h in logging.getLogger("tudocomp_tpu").handlers:
        h.flush()
    files = list((tmp_path / "logs").iterdir())
    assert files and "hello from the test" in files[0].read_text()


def test_cli_subprocess_roundtrip(tmp_path):
    """True binary-level driver test (reference
    ``tudocomp_driver_tests.cpp`` runs the tdc binary): compress and
    decompress through actual subprocesses, plus --list and --stats."""
    import json
    import subprocess
    import sys

    import os

    src = tmp_path / "in.txt"
    data = b"the quick brown fox " * 500 + b"\xff\x00binary\x01"
    src.write_bytes(data)
    comp = tmp_path / "out.tdc"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-m", "tudocomp_tpu.cli", str(src),
         "-a", "bwt:rle:mtf:encode(coder=huff)", "-o", str(comp),
         "-f", "--stats", "roundtrip"],
        capture_output=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()
    # --stats prints the phase-tree JSON (with real memPeak) to stderr
    stderr = r.stderr.decode()
    tree = json.loads(stderr[stderr.index("{") : stderr.rindex("}") + 1])
    assert tree["title"] == "roundtrip" and tree["memPeak"] > 0
    out = tmp_path / "out.txt"
    r = subprocess.run(
        [sys.executable, "-m", "tudocomp_tpu.cli", str(comp), "-d",
         "-o", str(out), "-f"],
        capture_output=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr.decode()
    assert out.read_bytes() == data
    r = subprocess.run(
        [sys.executable, "-m", "tudocomp_tpu.cli", "--list"],
        capture_output=True, env=env, timeout=300,
    )
    assert r.returncode == 0 and b"lcpcomp" in r.stdout
