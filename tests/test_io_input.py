"""Input/Output abstraction tests (reference io tests in
tudocomp_tests.cpp: Input/Output over vector/string/file/stream)."""

import io

from tudocomp_tpu.io.input import Input, Output


def test_input_bytes_view_stream_slice():
    src = b"hello world"
    inp = Input(src)
    assert inp.as_bytes() == src
    assert bytes(inp.as_view()[0:5]) == b"hello"
    assert inp.as_stream().read() == src
    sliced = Input(inp, 6, 11)
    assert sliced.as_bytes() == b"world"


def test_input_file_mmap(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"x" * 10000)
    inp = Input(p)
    assert len(inp) == 10000
    assert bytes(inp.as_view()[:3]) == b"xxx"
    inp.close()
    empty = tmp_path / "e.bin"
    empty.write_bytes(b"")
    assert Input(empty).as_bytes() == b""


def test_input_stream():
    assert Input(io.BytesIO(b"abc")).as_bytes() == b"abc"


def test_output_targets(tmp_path):
    o = Output()
    o.write(b"ab")
    o.write(b"cd")
    assert o.getvalue() == b"abcd"
    p = tmp_path / "out.bin"
    o2 = Output(p)
    o2.write(b"zz")
    o2.close()
    assert p.read_bytes() == b"zz"
    buf = io.BytesIO()
    o3 = Output(buf)
    o3.write(b"s")
    o3.close()
    assert buf.getvalue() == b"s"
