"""``tdc``-equivalent CLI driver.

Reference counterpart: ``src/tudocomp_driver/tudocomp_driver.cpp`` +
``tudocomp_driver/Options.hpp``. Flags (same names where they exist):

  -a/--algorithm ALGO   algorithm string, e.g. "lzss_lcp(coder=huff)";
                        chain sugar "bwt:rle:mtf:encode(huff)" works
  -d/--decompress       decompress (reads the self-describing header)
  --raw                 omit/skip the header
  -o/--output FILE      output path (default: INPUT.tdc / INPUT.decomp)
  -f/--force            overwrite output
  -g/--generator G      generate input, e.g. "fib(10)" | "thue_morse(5)"
                        | "random(100, 42)" | "run_rich(8)"
  -l/--list             list registered algorithms
  --stats[=TITLE]       print a StatPhase JSON tree to stderr
  --usestdin/--usestdout  stream via stdio

Compressed container: ``<algorithm-id-string>%<payload>`` exactly like
the reference (``tudocomp_driver.cpp:30,262-266``); the driver applies
declared input restrictions (escaping + null sentinel) outside the
compressor, mirroring ``tudocomp_driver.cpp:268-270``.
"""

from __future__ import annotations

import argparse
import sys

from tudocomp_tpu import compressors as _register  # noqa: F401
from tudocomp_tpu.generators import fibonacci, random_uniform, run_rich, thue_morse
from tudocomp_tpu.io.restrictions import escape, unescape
from tudocomp_tpu.registry import REGISTRY
from tudocomp_tpu.stats import StatPhase

MAX_HEADER = 1024  # sanity cap while scanning for '%' (ref :293-307)


def _instantiate(algostring: str):
    """Instantiate, folding ``a:b:c`` chain sugar into nested chain()
    (reference ``tudocomp_driver_tests.cpp:211-233``)."""
    from tudocomp_tpu.algostr import Node, parse_chain

    nodes = parse_chain(algostring)
    node = nodes[0]
    for nxt in nodes[1:]:
        node = Node("chain", [("first", node), ("second", nxt)])
    return REGISTRY.instantiate(node)


def compress(algostring: str, data: bytes, raw: bool = False) -> bytes:
    comp = _instantiate(algostring)
    restr = REGISTRY.restrictions_of(comp.env)
    prepared = escape(data, restr)
    with StatPhase("compress"):
        payload = comp.compress(prepared)
    if raw:
        return payload
    return comp.env.id_string().encode() + b"%" + payload


def decompress(
    data: bytes, raw_algo: str | None = None
) -> bytes:
    if raw_algo is not None:
        algostring = raw_algo
        payload = data
    else:
        sep = data.find(b"%", 0, MAX_HEADER)
        if sep < 0:
            raise ValueError(
                "no algorithm header found (use --raw -a ALGO?)"
            )
        algostring = data[:sep].decode()
        payload = data[sep + 1 :]
    comp = _instantiate(algostring)
    restr = REGISTRY.restrictions_of(comp.env)
    with StatPhase("decompress"):
        out = comp.decompress(bytes(payload))
    return unescape(out, restr)


def generate(genstring: str) -> bytes:
    from tudocomp_tpu.algostr import parse

    node = parse(genstring)
    args = [v for k, v in node.args if k is None]
    gens = {
        "fib": lambda n: fibonacci(int(n)),
        "thue_morse": lambda n: thue_morse(int(n)),
        "run_rich": lambda n: run_rich(int(n)),
        "random": lambda n, seed=0: random_uniform(int(n), int(seed)),
    }
    if node.name not in gens:
        raise ValueError(f"unknown generator: {node.name}")
    return gens[node.name](*args)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tdc", description=__doc__)
    p.add_argument("input", nargs="?", help="input file")
    p.add_argument("-a", "--algorithm")
    p.add_argument("-d", "--decompress", action="store_true")
    p.add_argument("--raw", action="store_true")
    p.add_argument("-o", "--output")
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("-g", "--generator")
    p.add_argument("-l", "--list", action="store_true")
    p.add_argument("--stats", nargs="?", const="STATS", default=None)
    p.add_argument("--usestdin", action="store_true")
    p.add_argument("--usestdout", action="store_true")
    args = p.parse_args(argv)

    if args.list:
        print(REGISTRY.doc_listing())
        return 0

    # -- input ---------------------------------------------------------------
    if args.generator:
        data = generate(args.generator)
    elif args.usestdin:
        data = sys.stdin.buffer.read()
    elif args.input:
        from tudocomp_tpu.io.input import Input

        data = Input(args.input).as_bytes()  # mmap-backed read
    else:
        p.error("no input (file, --usestdin, or -g)")

    # --stats enables memory tracking like the reference's malloc
    # override (tracemalloc costs ~2x time, so it's opt-in via the flag)
    root = StatPhase(
        args.stats or "root", track_memory=args.stats is not None
    )
    with root:
        if args.decompress:
            out = decompress(
                data, args.algorithm if args.raw else None
            )
            default_suffix = ".decomp"
        else:
            if not args.algorithm:
                p.error("-a ALGORITHM required for compression")
            out = compress(args.algorithm, data, raw=args.raw)
            default_suffix = ".tdc"

    # -- output --------------------------------------------------------------
    if args.usestdout:
        sys.stdout.buffer.write(out)
    else:
        path = args.output
        if not path:
            if not args.input:
                p.error("-o required with --usestdin")
            path = args.input + default_suffix
        import os

        if os.path.exists(path) and not args.force:
            print(
                f"output {path} exists (use -f to overwrite)",
                file=sys.stderr,
            )
            return 1
        with open(path, "wb") as f:
            f.write(out)

    if args.stats is not None:
        print(root.to_json_str(), file=sys.stderr)
    if not args.usestdout:
        ratio = 100.0 * len(out) / max(1, len(data))
        print(
            f"{len(data)} -> {len(out)} bytes ({ratio:.2f}%)",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
