"""Text data structures: SA / ISA / Phi / PLCP / LCP (host specification).

Re-design of the reference's provider stack (``ds/SADivSufSort.hpp``,
``ds/ISAFromSA.hpp``, ``ds/PhiFromSA.hpp``, ``ds/PLCPFromPhi.hpp``,
``ds/LCPFromPLCP.hpp``). Construction here is *prefix doubling* over numpy
lexsort — the same O(n log n) array formulation the device kernels in
``ops/suffix_jax.py`` use (SURVEY.md §7 step 5) — rather than a port of
divsufsort's induced copying.

All providers operate on a text that ends with a unique 0 sentinel when
used by compressors that declare it (BWT, lzss_lcp, lcpcomp).
"""

from __future__ import annotations

import numpy as np


def suffix_array(text) -> np.ndarray:
    """Suffix array by prefix doubling (native radix doubling when
    available, numpy lexsort otherwise — identical output)."""
    t = np.frombuffer(bytes(text), np.uint8) if isinstance(
        text, (bytes, bytearray)
    ) else np.asarray(text, dtype=np.uint8)
    n = t.size
    if n == 0:
        return np.zeros(0, np.int64)
    from tudocomp_tpu import native
    from tudocomp_tpu.debug import assert_permutation

    got = native.suffix_array(t)
    if got is not None:
        assert_permutation(got, n)  # paranoid (util.hpp:449-473)
        return got
    # int32 index stack for any n < 2^31: the reference keeps these
    # arrays at bits_for(n) width (IntVector + CompressMode,
    # ds/TextDS.hpp:140-147); int32 is the numpy-vectorizable analog
    dt = np.int32 if n < (1 << 31) else np.int64
    rank = t.astype(dt)
    k = 1
    while True:
        key2 = np.full(n, -1, dt)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1 = rank[order]
        r2 = key2[order]
        changed = np.empty(n, dt)
        changed[0] = 0
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank_sorted = np.cumsum(changed, dtype=dt)
        rank = np.empty(n, dt)
        rank[order] = new_rank_sorted
        if new_rank_sorted[-1] == n - 1:
            return order.astype(dt)
        k *= 2
        if k >= n:
            return order.astype(dt)


def inverse_suffix_array(sa: np.ndarray) -> np.ndarray:
    """ISA: inverse permutation (reference ``ISAFromSA.hpp:30-39``)."""
    isa = np.empty_like(sa)
    isa[sa] = np.arange(sa.size, dtype=sa.dtype)
    return isa


def phi_array(sa: np.ndarray) -> np.ndarray:
    """Phi[sa[i]] = sa[i-1]; Phi[sa[0]] = sa[n-1].

    (Reference ``PhiFromSA.hpp:33-45``.)
    """
    phi = np.empty_like(sa)
    phi[sa[1:]] = sa[:-1]
    if sa.size:
        phi[sa[0]] = sa[-1]
    return phi


def plcp_array(text, phi: np.ndarray) -> np.ndarray:
    """PLCP via Kärkkäinen's Phi-algorithm (amortized O(n)).

    (Reference ``PLCPFromPhi.hpp`` / ``LCPSada.hpp:38-58``.)
    """
    t = np.frombuffer(bytes(text), np.uint8) if isinstance(
        text, (bytes, bytearray)
    ) else np.asarray(text, dtype=np.uint8)
    n = t.size
    from tudocomp_tpu import native

    got = native.plcp(t, phi)
    if got is not None:
        return got
    plcp = np.zeros(n, phi.dtype)
    tl = t.tolist()
    ph = phi.tolist()
    l = 0
    for i in range(n):
        j = ph[i]
        while i + l < n and j + l < n and tl[i + l] == tl[j + l]:
            l += 1
        plcp[i] = l
        if l:
            l -= 1
    return plcp


def lcp_array(sa: np.ndarray, plcp: np.ndarray) -> np.ndarray:
    """LCP[i] = PLCP[SA[i]] (reference ``LCPFromPLCP.hpp:36-52``); LCP[0]=0."""
    lcp = plcp[sa]
    if lcp.size:
        lcp[0] = 0
    return lcp


class TextDS:
    """On-demand SA/ISA/Phi/PLCP/LCP facade (reference ``ds/TextDS.hpp``).

    Construction is lazy: each structure is built on first access, reusing
    previously built ones.
    """

    def __init__(self, text: bytes):
        self.text = np.frombuffer(bytes(text), np.uint8)
        self._sa = None
        self._isa = None
        self._phi = None
        self._plcp = None
        self._lcp = None
        self._isa_sparse = None
        self._lcp_compressed = None

    @property
    def size(self) -> int:
        return self.text.size

    def require_sa(self) -> np.ndarray:
        if self._sa is None:
            self._sa = suffix_array(self.text)
        return self._sa

    def require_isa(self) -> np.ndarray:
        if self._isa is None:
            self._isa = inverse_suffix_array(self.require_sa())
        return self._isa

    def require_phi(self) -> np.ndarray:
        if self._phi is None:
            self._phi = phi_array(self.require_sa())
        return self._phi

    def require_plcp(self) -> np.ndarray:
        if self._plcp is None:
            self._plcp = plcp_array(self.text, self.require_phi())
            # Phi is a pure construction helper for PLCP — drop it
            # immediately (reference release lifecycle); a later
            # require_phi rebuilds in one scan if ever needed
            self._phi = None
        return self._plcp

    def require_lcp(self) -> np.ndarray:
        if self._lcp is None:
            self._lcp = lcp_array(self.require_sa(), self.require_plcp())
        return self._lcp

    def discard(self, *names: str) -> None:
        """Drop cached structures (reference ``TextDS`` release/discard
        lifecycle, ``ds/TextDS.hpp:247-292``): construction helpers like
        Phi/PLCP can be freed once LCP exists, halving resident index
        memory on the factorization paths."""
        for name in names:
            setattr(self, f"_{name}", None)

    # -- compressed-space degree (reference TextDS.hpp compressed_space:
    # structures answer point queries from o(n)-extra-bit storage) ------

    def require_isa_sparse(self, t: int = 3):
        """ISA as a SparseISA (every t-th entry + cycle walking,
        reference ``ds/SparseISA.hpp``)."""
        if self._isa_sparse is None:
            from tudocomp_tpu.ds.rank_select import SparseISA

            self._isa_sparse = SparseISA(self.require_sa(), t)
        return self._isa_sparse

    def require_lcp_compressed(self):
        """LCP answered from the bit-compressed PLCP encoding
        (reference ``ds/CompressedLCP.hpp`` / LCPForwardIterator)."""
        if self._lcp_compressed is None:
            from tudocomp_tpu.ds.rank_select import CompressedLCP

            self._lcp_compressed = CompressedLCP(
                self.require_sa(), self.require_plcp()
            )
        return self._lcp_compressed
