#!/usr/bin/env python3
"""Benchmark corpus tooling (reference ``etc/get_datasets.py`` /
``etc/datasets_config.py``).

This environment has no network egress, so alongside the download
manifest (for use elsewhere) this script can *generate* deterministic
stand-in corpora with the same size ladder (1/10/50/100/200 MB) and
statistical character: plain English-like text, DNA, highly repetitive
text, and wiki-markup-like enwik stand-ins.

Usage: etc/datasets.py OUTDIR [--size MB] [--sets name,...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

#: the reference corpus manifest (Pizza&Chili et al.) for reference
DOWNLOAD_MANIFEST = {
    "pc_dna": "http://pizzachili.dcc.uchile.cl/texts/dna/dna.gz",
    "pc_english": "http://pizzachili.dcc.uchile.cl/texts/nlang/english.gz",
    "pc_sources": "http://pizzachili.dcc.uchile.cl/texts/code/sources.gz",
    "pc_dblp_xml": "http://pizzachili.dcc.uchile.cl/texts/xml/dblp.xml.gz",
    "pcr_cere": "http://pizzachili.dcc.uchile.cl/repcorpus/real/cere.gz",
    "pcr_einstein_en":
        "http://pizzachili.dcc.uchile.cl/repcorpus/real/einstein.en.txt.gz",
    "enwik8": "http://mattmahoney.net/dc/enwik8.zip",
}

_WORDS = (
    b"the of and a to in is was he for it with as his on be at by i "
    b"this had not are but from or have an they which one you were "
    b"all her she there would their we him been has when who will no "
    b"more if out so up said what its about than into them can only "
).split()


def gen_english(size: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    # zipf-ish word choice
    p = 1.0 / np.arange(1, len(_WORDS) + 1)
    p /= p.sum()
    idx = rng.choice(len(_WORDS), size // 4, p=p)
    out = b" ".join(_WORDS[i] for i in idx)
    return out[:size]


def gen_dna(size: int, seed: int = 1) -> bytes:
    rng = np.random.default_rng(seed)
    return (
        np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, size)
        ].tobytes()
    )


def gen_repetitive(size: int, seed: int = 2) -> bytes:
    rng = np.random.default_rng(seed)
    base = gen_english(1 << 16, seed + 10)
    out = bytearray()
    while len(out) < size:
        out += base
        # sprinkle point mutations like pcr_* corpora
        if len(out) < size:
            pos = int(rng.integers(0, len(base)))
            out += base[:pos] + bytes([int(rng.integers(32, 127))])
    return bytes(out[:size])


def gen_wiki(size: int, seed: int = 3) -> bytes:
    rng = np.random.default_rng(seed)
    out = bytearray()
    while len(out) < size:
        title = gen_english(int(rng.integers(8, 32)), int(rng.integers(0, 1 << 30)))
        body = gen_english(int(rng.integers(256, 2048)), int(rng.integers(0, 1 << 30)))
        out += b"<page><title>" + title + b"</title><text>" + body
        out += b"[[Category:" + title[:12] + b"]]</text></page>\n"
    return bytes(out[:size])


GENERATORS = {
    "english": gen_english,
    "dna": gen_dna,
    "repetitive": gen_repetitive,
    "wiki": gen_wiki,
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--size", type=int, default=1, help="MB per file")
    ap.add_argument("--sets", default="english,dna,repetitive,wiki")
    args = ap.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.sets.split(","):
        path = os.path.join(args.outdir, f"{name}.{args.size}MB")
        data = GENERATORS[name](args.size << 20)
        with open(path, "wb") as f:
            f.write(data)
        print(path, len(data))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
