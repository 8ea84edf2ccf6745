"""The matrix test: every registered compressor configuration x the
adversarial corpus, roundtripped through the CLI path with headers.

Reference counterpart: ``test/matrix_tests.cpp:27-180`` (enumerates
``Registry::all_algorithms_with_static``, applies MATRIX_PATTERN-style
filters, roundtrips through the driver). Filters via env vars
``MATRIX_PATTERN`` (substring) and ``FAST_MATRIX`` (first corpus entries
only) mirror the reference's knobs.
"""

import os

import pytest

from tudocomp_tpu import cli
from tudocomp_tpu.compressors import REGISTRY

from tests.helpers import roundtrip_corpus

def _grid():
    # chain is a driver-level combinator: its cross-product explodes the
    # enumeration (the reference likewise registers it outside the
    # compressor matrix) — it is exercised by test_cli instead
    for c in REGISTRY.all_configurations("compressor"):
        if not c.startswith("chain"):
            yield c


ALL_CONFIGS = sorted(_grid())
PATTERN = os.environ.get("MATRIX_PATTERN", "")
if PATTERN:
    CONFIGS = [c for c in ALL_CONFIGS if PATTERN in c]
elif os.environ.get("FULL_MATRIX"):
    CONFIGS = ALL_CONFIGS
else:
    # default: spread a budget across families so every compressor and
    # every sub-strategy family member appears
    budget_per_family = 16
    by_family: dict[str, list[str]] = {}
    for c in ALL_CONFIGS:
        by_family.setdefault(c.split("(")[0], []).append(c)
    CONFIGS = []
    for fam, items in sorted(by_family.items()):
        step = max(1, len(items) // budget_per_family)
        CONFIGS.extend(items[::step][:budget_per_family])

_FAST = os.environ.get("FAST_MATRIX")
_CORPUS = roundtrip_corpus()
if _FAST:
    _CORPUS = _CORPUS[: int(_FAST)]
else:
    # default: a representative slice (full corpus x full grid is the
    # nightly setting; set FAST_MATRIX=0 elsewhere to disable slicing)
    _CORPUS = [c for c in _CORPUS if len(c) < 4096][:18]


def test_matrix_has_coverage():
    names = {c.split("(")[0] for c in ALL_CONFIGS} | {"chain"}
    expected = {
        "noop", "encode", "rle", "mtf", "bwt", "lzss", "lzss_lcp",
        "lz78", "lzw", "lcpcomp", "esp", "repair", "lz78u", "lfs_comp",
        "lfs2", "lfs2bst", "chain",
    }
    missing = expected - names
    assert not missing, f"configurations missing for: {missing}"


@pytest.mark.parametrize("config", CONFIGS, ids=lambda c: c[:80])
def test_matrix_roundtrip(config):
    for data in _CORPUS:
        compressed = cli.compress(config, data)
        assert cli.decompress(compressed) == data, (
            f"{config} failed on {data[:40]!r}"
        )
