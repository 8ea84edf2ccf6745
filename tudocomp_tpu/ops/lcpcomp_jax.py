"""Device lcpcomp factorization: parallel greedy rounds, no scatters.

Puts the reference flagship's factorization (greedy longest-first over
the LCP array, ``compressors/lcpcomp/compress/ArraysComp.hpp:22-117``)
on the device as an array program.  Two reformulations make the
sequential algorithm data-parallel:

1. **Truncation as a pure function of the covered set.**  The
   reference erases LCP entries starting inside a replaced interval and
   caps entries before it at their distance (``ArraysComp.hpp:92-112``,
   here ``lcpcomp.py::_emit_factor``).  Both rules collapse to::

       el[p] = min(LCP[isa[p]], next_covered(p) - p)

   where ``next_covered(p)`` is the first covered position ``>= p`` —
   one reversed cumulative min per round instead of per-factor scatter
   updates.

2. **Max-class rounds are a legal sequential schedule.**  Each round
   selects, among candidates of the *current maximum* effective length
   ``L``, a pairwise-disjoint set (window-dominant: a candidate wins if
   it is the leftmost of its class within any overlapping window).
   Equal-length disjoint targets never truncate each other (a target
   wholly before another caps it at a distance >= L, a target after is
   untouched), so emitting a round's set simultaneously equals *some*
   order of the reference's per-bucket pops — the device output is a
   factorization the reference's arrays strategy could emit, inheriting
   its invariants (disjoint targets, resolvable chains).

Selection and covering use log-depth sliding-window maxima over
doubling tables (static levels, traced window width) — zero scatters,
zero per-element loops.  Factor lengths are capped at ``max_len``
(4096): one prefix-doubling rank level per doubling, same trade as the
exact device LZ77.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_I32 = jnp.int32


def _win_max(table, start, width, t):
    """Max over [start, start+width) per element; ``width``/``t`` are
    traced scalars with ``2**t <= width < 2**(t+1)``; ``table`` is the
    stacked doubling table [LOG+1, m] (suffix-aligned windows)."""
    row = lax.dynamic_index_in_dim(table, t, axis=0, keepdims=False)
    p2 = jnp.left_shift(jnp.asarray(1, _I32), t)
    a = row[start]
    b = row[start + width - p2]
    return jnp.maximum(a, b)


def _doubling_table(x, levels):
    rows = [x]
    shift = 1
    zero = jnp.zeros(1 << levels, x.dtype)
    for _ in range(levels):
        cur = rows[-1]
        shifted = jnp.concatenate([cur[shift:], zero[:shift]])
        rows.append(jnp.maximum(cur, shifted))
        shift *= 2
    return jnp.stack(rows)


def _ilog2(x):
    # exact for x < 2**24
    return jnp.floor(jnp.log2(jnp.maximum(x, 1).astype(jnp.float32))) \
        .astype(_I32)


@functools.partial(
    jax.jit, static_argnames=("max_len", "rounds_per_dispatch")
)
def _rounds(covered, chosen, lcp0_p, threshold, *, max_len: int,
            rounds_per_dispatch: int):
    """Run a fixed number of max-class selection rounds.

    covered  bool[n]   — union of emitted target intervals
    chosen   i32[n]    — emitted factor length at its start (0 = none)
    lcp0_p   i32[n]    — LCP with the SA-predecessor, by text position
    Returns (covered, chosen, cur_max) after the dispatch.
    """
    n = covered.shape[0]
    pos = jnp.arange(n, dtype=_I32)
    pad = max_len + 1
    levels = 1
    while (1 << levels) < 2 * max_len:
        levels += 1

    def one_round(state):
        covered, chosen = state
        ncov = lax.cummin(
            jnp.where(covered, pos, n), reverse=True
        )
        el = jnp.minimum(lcp0_p, ncov - pos)
        active = el >= threshold
        cur_max = jnp.max(jnp.where(active, el, 0))
        cls = active & (el == cur_max)

        # leftmost-dominant selection within the class: key is unique
        key = jnp.where(cls, n - pos, 0)
        kpad = jnp.concatenate([
            jnp.zeros(pad, _I32), key, jnp.zeros(pad + 2 * max_len, _I32),
        ])
        ktab = _doubling_table(kpad, levels)
        width = 2 * cur_max - 1
        t = _ilog2(width)
        start = pos + pad - (cur_max - 1)
        win = _win_max(ktab, start, width, t)
        selected = cls & (key == win)

        # covered |= union of [p, p+cur_max) for selected p: a position
        # x is newly covered iff some selected p lies in
        # (x - cur_max, x] — another window max, zero scatters
        spad = jnp.concatenate([
            jnp.zeros(pad, _I32), selected.astype(_I32),
            jnp.zeros(pad + 2 * max_len, _I32),
        ])
        stab = _doubling_table(spad, levels)
        t2 = _ilog2(cur_max)
        cov_add = _win_max(stab, pos + pad - (cur_max - 1), cur_max, t2)
        any_sel = cur_max >= threshold
        covered = jnp.where(any_sel, covered | (cov_add > 0), covered)
        chosen = jnp.where(selected & any_sel, cur_max, chosen)
        return covered, chosen

    def body(state, _):
        return one_round(state), None

    (covered, chosen), _ = lax.scan(
        body, (covered, chosen), None, length=rounds_per_dispatch
    )
    # recompute the residual max for the host loop condition
    ncov = lax.cummin(jnp.where(covered, pos, n), reverse=True)
    el = jnp.minimum(lcp0_p, ncov - pos)
    cur_max = jnp.max(jnp.where(el >= threshold, el, 0))
    return covered, chosen, cur_max


@functools.partial(jax.jit, static_argnames=("max_len",))
def _lcp_by_position(text, *, max_len: int):
    """(lcp0_p, src_p): for every text position p, the LCP with its
    suffix-array predecessor (capped at max_len) and that predecessor's
    position — the reference's candidate set (pos=sa[i], src=sa[i-1],
    len=lcp[i]) indexed by text position."""
    from tudocomp_tpu.ops.lzss_jax import lifted_lcp, rank_tables
    from tudocomp_tpu.ops.suffix_jax import isa_device, suffix_array_device

    n = text.shape[0]
    pos = jnp.arange(n, dtype=_I32)
    sa = suffix_array_device(text)
    isa = isa_device(sa)
    src = jnp.where(isa >= 1, sa[jnp.clip(isa - 1, 0, n - 1)], -1)

    L = 4
    while L < max_len:
        L *= 2
    ranks = rank_tables(text, L)
    limit = jnp.minimum(n - 1 - pos, max_len)
    return lifted_lcp(ranks, L, text, src, limit), src


def factorize_device(text: np.ndarray, threshold: int,
                     max_len: int = 4096):
    """Device lcpcomp factorization (see module docstring).  Returns
    (pos, src, len) int64 arrays; factors may point forward, exactly
    like the host strategies."""
    n = int(text.size)
    if n < 2 or threshold < 1:
        return (np.zeros(0, np.int64),) * 3
    max_len = min(max_len, max(4, n - 1))
    tj = jnp.asarray(text)
    lcp0_p, src_p = _lcp_by_position(tj, max_len=max_len)
    covered = jnp.zeros(n, bool)
    chosen = jnp.zeros(n, _I32)
    thr = jnp.asarray(threshold, _I32)
    dispatches = 0
    while True:
        covered, chosen, cur_max = _rounds(
            covered, chosen, lcp0_p, thr,
            max_len=max_len, rounds_per_dispatch=16,
        )
        dispatches += 1
        if int(cur_max) < threshold:
            break
    from tudocomp_tpu.stats import StatPhase

    StatPhase.log("device_round_dispatches", dispatches)
    chosen = np.asarray(chosen, np.int64)
    src = np.asarray(src_p, np.int64)
    starts = np.flatnonzero(chosen > 0)
    return starts, src[starts], chosen[starts]
