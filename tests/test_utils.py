import numpy as np

from tudocomp_tpu.generators import fibonacci, run_rich, thue_morse, random_uniform
from tudocomp_tpu.utils.vbyte import (
    decode_vbyte_array,
    encode_vbyte_array,
    read_vbyte,
    write_vbyte,
)


def test_vbyte_scalar():
    for v in [0, 1, 127, 128, 300, 2**14, 2**21 - 1, 2**32, 2**63]:
        out = bytearray()
        write_vbyte(out, v)
        got, pos = read_vbyte(out, 0)
        assert got == v and pos == len(out)


def test_vbyte_known_bytes():
    out = bytearray()
    write_vbyte(out, 0)
    assert bytes(out) == b"\x00"
    out = bytearray()
    write_vbyte(out, 127)
    assert bytes(out) == b"\x7f"
    out = bytearray()
    write_vbyte(out, 128)
    assert bytes(out) == b"\x80\x01"  # low 7 bits first, MSB continuation


def test_vbyte_array_matches_scalar():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            rng.integers(0, 2**28, size=500, dtype=np.uint64),
            np.array([0, 127, 128, 2**63], dtype=np.uint64),
        ]
    )
    enc = encode_vbyte_array(vals)
    ref = bytearray()
    for v in vals:
        write_vbyte(ref, int(v))
    assert enc.tobytes() == bytes(ref)
    dec, consumed = decode_vbyte_array(enc, vals.size)
    assert consumed == enc.size
    assert dec.tolist() == vals.tolist()


def test_fibonacci():
    assert fibonacci(1) == b"b"
    assert fibonacci(2) == b"a"
    assert fibonacci(3) == b"ab"
    assert fibonacci(4) == b"aba"
    assert fibonacci(5) == b"abaab"
    assert fibonacci(6) == b"abaababa"
    assert len(fibonacci(20)) == 6765


def test_thue_morse():
    assert thue_morse(0) == b"0"
    assert thue_morse(1) == b"0"
    assert thue_morse(2) == b"01"
    assert thue_morse(3) == b"0110"
    assert thue_morse(4) == b"01101001"
    assert len(thue_morse(12)) == 2**11


def test_run_rich():
    assert run_rich(0) == b"0110101101001011010"
    assert run_rich(1) == b"0110101101001"
    assert run_rich(3) == b"011010110100101101011010110101101001"
    assert len(run_rich(10)) > len(run_rich(5))


def test_random_uniform_deterministic():
    a = random_uniform(100, seed=5)
    b = random_uniform(100, seed=5)
    assert a == b
    assert all(ord("0") <= c <= ord("9") for c in a)


def test_native_runtime_builds():
    """The C runtime must compile on this machine — fallbacks exist for
    portability, but a silent build failure would mask a 100x slowdown
    (and did, round 2: a -Wvexing-parse error)."""
    from tudocomp_tpu import native

    assert native.available(), "native/tdc_native.cpp failed to build"


def test_charter_svg_export():
    """etc/charter.py renders a StatPhase JSON tree to in-bounds SVG
    with one span per phase (parity artifact for www/charter)."""
    import json
    import re
    import subprocess
    import sys
    import tempfile

    tree = {
        "title": "root", "timeDelta": 100.0, "memPeak": 4096,
        "stats": [], "sub": [
            {"title": "a", "timeDelta": 60.0, "memPeak": 2048,
             "stats": [{"key": "k", "value": 1}], "sub": [
                 {"title": "a1", "timeDelta": 20.0, "memPeak": 0,
                  "stats": [], "sub": []}]},
            {"title": "b", "timeDelta": 40.0, "memPeak": 1024,
             "stats": [], "sub": []},
        ],
    }
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(tree, f)
        path = f.name
    out = path + ".svg"
    subprocess.run(
        [sys.executable, "etc/charter.py", path, "-o", out],
        check=True, capture_output=True,
    )
    svg = open(out).read()
    assert svg.startswith("<svg")
    # 4 phase spans + 3 memory bars (a1 has memPeak 0) + surface rect
    rects = re.findall(r'<rect x="([\d.]+)"[^>]*width="([\d.]+)"', svg)
    assert len(rects) == 7
    for x, w in rects:
        assert 0 <= float(x) and float(x) + float(w) <= 862
    assert "a1" in svg and "Phase timeline" in svg
