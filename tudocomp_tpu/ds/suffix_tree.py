"""Suffix tree built from SA + LCP (lcp-interval stack construction).

Replaces the reference's pointer-based Ukkonen trees and SDSL ``cst_sada``
(``ds/SuffixTree.hpp``, ``compressors/lz78u/SuffixTree.hpp:18-40``) with
the enhanced-suffix-array formulation: internal nodes are lcp intervals,
built in one left-to-right stack pass over the LCP array — the same
SA/LCP arrays the device kernels produce.

Node attributes: ``parent``, ``sdepth`` (string depth), ``is_leaf``,
``suffix`` (leaf start position). ``leaf_of_rank[r]`` maps SA rank -> leaf
node id. Root is node 0.
"""

from __future__ import annotations

import numpy as np

from tudocomp_tpu.ds.suffix import TextDS


class SuffixTree:
    def __init__(self, text: bytes):
        """``text`` must end with a unique sentinel (e.g. b"\\0")."""
        ds = TextDS(text)
        sa = ds.require_sa()
        lcp = ds.require_lcp()
        n = sa.size
        self.n = n
        from tudocomp_tpu import native

        got = native.suffix_tree(sa, lcp)
        if got is not None:
            (self.parent, self.sdepth, self.is_leaf, self.suffix,
             self.leaf_of_rank, _m) = got
            self.isa = ds.require_isa()
            self.root = 0
            self.internal_nodes = int((~self.is_leaf).sum())
            return
        parent = [-1]
        sdepth = [0]
        is_leaf = [False]
        suffix = [-1]
        self.leaf_of_rank = np.zeros(n, np.int64)

        def add(d, leaf=False, suf=-1):
            parent.append(-1)
            sdepth.append(d)
            is_leaf.append(leaf)
            suffix.append(suf)
            return len(parent) - 1

        stack = [0]
        for i in range(n):
            l = int(lcp[i]) if i else 0
            last = -1
            while sdepth[stack[-1]] > l:
                v = stack.pop()
                if last != -1:
                    parent[last] = v
                last = v
            if last != -1:
                if sdepth[stack[-1]] == l:
                    parent[last] = stack[-1]
                else:
                    u = add(l)
                    parent[last] = u
                    stack.append(u)
            leaf = add(n - int(sa[i]), leaf=True, suf=int(sa[i]))
            self.leaf_of_rank[i] = leaf
            stack.append(leaf)
        last = -1
        while stack:
            v = stack.pop()
            if last != -1:
                parent[last] = v
            last = v

        self.parent = np.asarray(parent, np.int64)
        self.sdepth = np.asarray(sdepth, np.int64)
        self.is_leaf = np.asarray(is_leaf, bool)
        self.suffix = np.asarray(suffix, np.int64)
        self.isa = ds.require_isa()
        self.root = 0
        self.internal_nodes = int((~self.is_leaf).sum())

    def select_leaf(self, rank: int) -> int:
        return int(self.leaf_of_rank[rank])

    def root_path(self, node: int) -> list[int]:
        """Nodes on the root -> node path, root first."""
        path = []
        v = node
        while v != -1:
            path.append(v)
            v = int(self.parent[v])
        path.reverse()
        return path

    def level_anc(self, leaf: int, d: int) -> int:
        """d-th node on the root->leaf path (d=0 is the root)."""
        return self.root_path(leaf)[d]

    def str_depth(self, node: int) -> int:
        return int(self.sdepth[node])
