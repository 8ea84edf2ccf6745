"""Algorithm-string parser + Meta/registry/Env tests.

Coverage modeled on the reference's parser unit tests in
``tudocomp_driver_tests.cpp`` and ``create_algo``/Meta tests.
"""

import pytest

from tudocomp_tpu.algostr import Node, ParseError, parse, parse_chain
from tudocomp_tpu.meta import Algorithm, Meta
from tudocomp_tpu.registry import Registry, create_algo


def test_parse_simple():
    n = parse("lzss")
    assert n.name == "lzss" and n.args == []


def test_parse_args():
    n = parse('lzss_lcp(coder=huff, threshold=5)')
    assert n.name == "lzss_lcp"
    assert n.args[0] == ("coder", Node("huff"))
    assert n.args[1] == ("threshold", 5)


def test_parse_nested():
    n = parse("lcpcomp(coder=sle, comp=arrays, dec=scan(25))")
    dec = dict((k, v) for k, v in n.args)["dec"]
    assert isinstance(dec, Node) and dec.name == "scan"
    assert dec.args == [(None, 25)]


def test_parse_strings_and_bools():
    n = parse('x(mode="stream", debug=true, t=-3, s=\'a\\"b\')')
    args = dict(n.args)
    assert args["mode"] == "stream"
    assert args["debug"] is True
    assert args["t"] == -3
    assert args["s"] == 'a"b'


def test_parse_chain():
    nodes = parse_chain("bwt:rle:mtf:encode(huff)")
    assert [n.name for n in nodes] == ["bwt", "rle", "mtf", "encode"]
    assert nodes[3].args == [(None, Node("huff"))]


def test_parse_errors():
    with pytest.raises(ParseError):
        parse("lzss(")
    with pytest.raises(ParseError):
        parse("lzss)x")
    with pytest.raises(ParseError):
        parse("3")


# --- registry / Env -----------------------------------------------------------


class DummyCoder(Algorithm):
    @classmethod
    def meta(cls):
        return Meta("coder", "dummy", "A dummy coder")


class OtherCoder(Algorithm):
    @classmethod
    def meta(cls):
        return Meta("coder", "other").option_dynamic("width", 8)


class DummyComp(Algorithm):
    @classmethod
    def meta(cls):
        m = Meta("compressor", "dc", "dummy compressor")
        m.option_submeta("coder", "coder", default="dummy")
        m.option_dynamic("threshold", 3)
        m.option_dynamic("mode", "stream")
        return m


@pytest.fixture
def reg():
    r = Registry()
    r.register(DummyCoder)
    r.register(OtherCoder)
    r.register(DummyComp)
    return r


def test_defaults(reg):
    env = reg.evaluate("dc")
    assert env.option("threshold").as_int() == 3
    assert env.option("mode").as_string() == "stream"
    assert env.option("coder").algo_cls is DummyCoder


def test_positional_and_keyword(reg):
    env = reg.evaluate("dc(other, threshold=9)")
    assert env.option("coder").algo_cls is OtherCoder
    assert env.env_for_option("coder").option("width").as_int() == 8
    assert env.option("threshold").as_int() == 9


def test_sub_options(reg):
    env = reg.evaluate("dc(coder=other(width=16))")
    assert env.env_for_option("coder").option("width").as_int() == 16


def test_instantiate(reg):
    comp = reg.instantiate("dc(other)")
    assert isinstance(comp, DummyComp)
    sub = comp.env.instantiate("coder")
    assert isinstance(sub, OtherCoder)


def test_id_string_roundtrip(reg):
    env = reg.evaluate("dc(coder=other(width=16), threshold=7)")
    ids = env.id_string()
    env2 = reg.evaluate(ids)
    assert env2.id_string() == ids
    assert env2.option("threshold").as_int() == 7


def test_errors(reg):
    with pytest.raises(KeyError):
        reg.evaluate("nope")
    with pytest.raises(ValueError):
        reg.evaluate("dc(bogus=1)")
    with pytest.raises(ValueError):
        reg.evaluate("dc(other, coder=other)")  # bound twice


def test_all_configurations(reg):
    configs = list(reg.all_configurations("compressor"))
    assert set(configs) == {"dc(coder=dummy)", "dc(coder=other)"}


def test_create_algo(reg):
    algo = create_algo(DummyComp, "threshold=11", registry=reg)
    assert algo.env.option("threshold").as_int() == 11


def test_doc_listing(reg):
    listing = reg.doc_listing()
    assert "dc" in listing and "coder: coder" in listing


def test_accepts_enforced_at_instantiation():
    """Combinations outside a submeta's ``accepts`` list do not exist in
    the reference's static registry (e.g. the consuming arithmetic coder
    inside lcpcomp, registry_config.py:138-142) and must be rejected up
    front, not fail later with a misaligned stream."""
    from tudocomp_tpu.compressors import REGISTRY

    for spec in (
        "lcpcomp(coder=arithmetic)",
        "lz78(coder=huff)",
        "lzw(coder=arithmetic)",
        "lzss(coder=sle)",
        "lzss_lcp(coder=arithmetic)",
        "repair(coder=sle)",
    ):
        with pytest.raises(ValueError, match="not accepted"):
            REGISTRY.instantiate(spec)
    # the legal neighbours still instantiate
    REGISTRY.instantiate("lcpcomp(coder=sle)")
    REGISTRY.instantiate("lzss_lcp(coder=huff)")
