#!/usr/bin/env python3
"""Suite-vs-suite benchmark harness (reference ``etc/compare.py``).

Runs every entry of a suite file over the given inputs, measuring wall
time (median of -n runs), peak host memory (tracemalloc / resource), the
compression ratio and a SHA-256 roundtrip check, and prints a comparison
table. Suite files are Python lists of ``Tudocomp``/``StdCompressor``
entries, same shape as the reference's
(``docs/Documentation.md:1733-1860``).

Usage: etc/compare.py [-s SUITE] [-n ITERATIONS] FILE [FILE...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import resource
import statistics
import subprocess
import sys
import tempfile
import time
from dataclasses import dataclass, field

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@dataclass
class Tudocomp:
    name: str
    algorithm: str


@dataclass
class StdCompressor:
    name: str
    binary: str
    cflags: list = field(default_factory=list)
    dflags: list = field(default_factory=list)


DEFAULT_SUITE = [
    Tudocomp(name="bwtzip", algorithm="bwt:rle:mtf:encode(coder=huff)"),
    Tudocomp(
        name="lcpcomp(t=5,arrays,scan)",
        algorithm="lcpcomp(coder=sle,threshold=5,comp=arrays,dec=scan)",
    ),
    Tudocomp(
        name="lzss_lcp(t=5,bit)",
        algorithm="lzss_lcp(coder=bit,threshold=5)",
    ),
    Tudocomp(
        name="lz78u(t=5,huff)",
        algorithm="lz78u(coder=bit,threshold=5,"
        "comp=buffering(string_coder=huff))",
    ),
    Tudocomp(
        name="lcpcomp(t=5,heap,compact)",
        algorithm="lcpcomp(coder=sle,threshold=5,comp=heap,dec=compact)",
    ),
    Tudocomp(name="sle", algorithm="encode(coder=sle)"),
    Tudocomp(name="huff", algorithm="encode(coder=huff)"),
    Tudocomp(name="arith", algorithm="encode(coder=arithmetic)"),
    Tudocomp(name="lzw(ternary)", algorithm="lzw(coder=bit,lz78trie=ternary)"),
    Tudocomp(name="lz78(ternary)", algorithm="lz78(coder=bit,lz78trie=ternary)"),
    Tudocomp(name="esp", algorithm="esp"),
    Tudocomp(name="repair(huff)", algorithm="repair(coder=huff)"),
]


def _run_tudocomp(entry, data: bytes, n: int):
    from tudocomp_tpu import cli

    ctimes, dtimes = [], []
    comp = out = None
    for _ in range(n):
        t0 = time.perf_counter()
        comp = cli.compress(entry.algorithm, data)
        ctimes.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = cli.decompress(comp)
        dtimes.append(time.perf_counter() - t0)
    ok = hashlib.sha256(out).digest() == hashlib.sha256(data).digest()
    return (
        statistics.median(ctimes), statistics.median(dtimes),
        len(comp), ok,
    )


def _run_std(entry, data: bytes, n: int):
    ctimes, dtimes = [], []
    comp = out = None
    for _ in range(n):
        t0 = time.perf_counter()
        comp = subprocess.run(
            [entry.binary, *entry.cflags, "-c"], input=data,
            capture_output=True, check=True,
        ).stdout
        ctimes.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = subprocess.run(
            [entry.binary, *entry.dflags, "-c"], input=comp,
            capture_output=True, check=True,
        ).stdout
        dtimes.append(time.perf_counter() - t0)
    ok = out == data
    return (
        statistics.median(ctimes), statistics.median(dtimes),
        len(comp), ok,
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("-s", "--suite", default=None)
    ap.add_argument("-n", "--iterations", type=int, default=1)
    args = ap.parse_args(argv)

    if args.suite:
        scope = {"Tudocomp": Tudocomp, "StdCompressor": StdCompressor}
        suite = eval(open(args.suite).read(), scope)  # same as reference
    else:
        suite = DEFAULT_SUITE

    for path in args.files:
        data = open(path, "rb").read()
        print(f"\n=== {path} ({len(data)} bytes) ===")
        print(
            f"{'name':<28} {'C time':>9} {'D time':>9} "
            f"{'ratio':>8} {'mem':>9}  ok"
        )
        for entry in suite:
            try:
                if isinstance(entry, Tudocomp):
                    ct, dt, size, ok = _run_tudocomp(
                        entry, data, args.iterations
                    )
                else:
                    ct, dt, size, ok = _run_std(
                        entry, data, args.iterations
                    )
                mem = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                print(
                    f"{entry.name:<28} {ct*1000:8.1f}ms {dt*1000:8.1f}ms "
                    f"{100.0*size/max(1,len(data)):7.2f}% "
                    f"{mem//1024:8d}M  {'OK' if ok else 'FAIL'}"
                )
            except Exception as e:  # keep the table going
                print(f"{entry.name:<28} ERROR: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
