"""Device ESP rounds (JAX): the whole round as fixed-shape array passes.

Op-for-op mirror of the numpy specification in ``ops/esp_vec.py``
(itself pinned grammar-identical to the host ``esp_rounds``, reference
``esp/EspContextImpl.hpp:14-165``), reformulated for XLA:

- everything runs at a static padded length ``N`` with a validity
  scalar ``n`` — no data-dependent shapes inside ``jit``;
- run/segment/region bookkeeping is per-position (start-position
  cummax, next-boundary suffix cummin) instead of compacted run lists;
- the per-region suffix-min (next-landmark lookup) is a segmented
  associative scan instead of the numpy band trick;
- rule dedup + first-encounter ranking uses two lexicographic
  ``lax.sort`` passes (key columns + sequence position) instead of
  ``np.unique``: within a sorted group the head row carries the
  minimal sequence position, and global rule ids fall out of one
  exclusive cumsum over interleaved "new inner / new outer" flags —
  no 64-bit packed keys needed;
- compactions (block starts, merged block lengths) are cumsum +
  scatter with OOB-drop dump slots.

``esp_rounds_jax(data)`` runs the big early rounds on the device and
finishes the short tail (below ``tail_cutoff`` symbols) with the host
``esp_round_vec``, producing a grammar bit-identical to ``esp_rounds``.
Symbols are int32 (requires ``len(data) < 2**30``, same class as the
rest of the device paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tudocomp_tpu.compressors.esp import iter_log
from tudocomp_tpu.ops import esp_vec

I32 = jnp.int32
INF = jnp.int32(2**31 - 1)


def _eager13_starts(k, L):
    """Block-start predicate of ``_split_eager13`` (esp_vec closed form)."""
    m3 = L % 3
    base = k % 3 == 0
    special = (m3 == 1) & (L > 1)
    return jnp.where(
        special, (base & (k <= L - 4)) | (k == L - 2), base
    ) | ((L == 1) & (k == 0))


def _label_pass(buf):
    """One alphabet-reduction pass on the full layer (left-aligned):
    out[i] = 2*ctz(buf[i]^buf[i+1]) + bit (esp_vec._label_pass)."""
    left = buf
    right = jnp.concatenate([buf[1:], buf[-1:]])
    diff = left ^ right
    ctz = jnp.zeros(diff.shape, I32)
    d = diff
    for shift in (16, 8, 4, 2, 1):
        mask = (d & ((1 << shift) - 1)) == 0
        ctz = ctz + jnp.where(mask, shift, 0)
        d = jnp.where(mask, d >> shift, d)
    # diff == 0 only at positions never read (segment ends / padding);
    # clamp the shift so XLA semantics stay defined there.
    bit = (right >> jnp.minimum(ctz, 30)) & 1
    return 2 * ctz + bit


def _suffix_min(x):
    return lax.cummin(x, axis=0, reverse=True)


def _seg_suffix_min(v, reset):
    """out[i] = reset[i] ? v[i] : min(v[i], out[i+1]) — segmented
    suffix min (reset = last-of-region). Implemented as a forward
    segmented scan on the flipped arrays: the operator's reset flag
    must sit on the element nearer the output position, so the flip is
    explicit rather than relying on ``reverse=True`` orientation."""

    def comb(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    outv, _ = lax.associative_scan(comb, (v[::-1], reset[::-1]))
    return outv[::-1]


def _round_block_starts(s, n, ilog):
    """Boolean block-start flags (padded length N; False past n)."""
    N = s.shape[0]
    pos = jnp.arange(N, dtype=I32)
    valid = pos < n
    # padded tail: unique values so every padded position is its own
    # run; run_is1 is masked by validity so they never join segments
    s_eff = jnp.where(valid, s, -1 - pos)
    prev = jnp.concatenate([s_eff[:1] - 1, s_eff[:-1]])
    boundary = (pos == 0) | (s_eff != prev)
    run_start = lax.cummax(jnp.where(boundary, pos, -1), axis=0)
    nxt_b = _suffix_min(
        jnp.concatenate([jnp.where(boundary, pos, INF)[1:], INF[None]])
    )
    run_len = jnp.minimum(nxt_b, n) - run_start
    run_is1 = (run_len == 1) & valid
    k_run = pos - run_start

    starts = valid & (run_len > 1) & _eager13_starts(k_run, run_len)

    # segments = maximal groups of consecutive 1-runs (positions are
    # contiguous since each such run has length 1)
    prev_is1 = jnp.concatenate([jnp.zeros(1, bool), run_is1[:-1]])
    new_seg = run_is1 & ~prev_is1
    seg_start = lax.cummax(jnp.where(new_seg, pos, -1), axis=0)
    nonseg = jnp.where(run_is1, INF, pos)
    # first non-1-run position - 1; clamp for a segment running to the
    # end of an exactly-filled buffer (suffix min = INF there)
    seg_end = jnp.minimum(_suffix_min(nonseg) - 1, n - 1)
    seg_len = seg_end - seg_start + 1
    k_seg = pos - seg_start
    p_seg = jnp.minimum(ilog, seg_len)
    in_seg = run_is1

    # type-3 prefix
    starts = starts | (in_seg & (k_seg < p_seg)
                       & _eager13_starts(k_seg, p_seg))

    # type-2 remainder: reduced labels live left-aligned; for every
    # segment with a remainder p_seg == ilog, so red0[p] = buf[p-ilog]
    buf = s_eff
    for _ in range(ilog):
        buf = _label_pass(buf)
    rem = in_seg & (k_seg >= p_seg)
    k2 = k_seg - p_seg
    rem_len = seg_len - p_seg
    red = jnp.where(
        rem, buf[jnp.clip(pos - ilog, 0, N - 1)], INF
    )
    first = rem & (k2 == 0)
    last = rem & (pos == seg_end)
    # 6 -> 3 remap (neighbors within the region; sentinels at borders)
    for v in (3, 4, 5):
        left = jnp.where(
            first, -1, jnp.concatenate([jnp.full(1, -1, I32), red[:-1]])
        )
        right = jnp.where(
            last, -1, jnp.concatenate([red[1:], jnp.full(1, -1, I32)])
        )
        e = jnp.zeros(N, I32)
        for _ in range(2):
            e = jnp.where(left == e, e + 1, e)
            e = jnp.where(right == e, e + 1, e)
        red = jnp.where(rem & (red == v), e, red)

    # landmarks
    m = rem_len
    left = jnp.where(
        first, -1, jnp.concatenate([jnp.full(1, -1, I32), red[:-1]])
    )
    right = jnp.where(
        last, -1, jnp.concatenate([red[1:], jnp.full(1, -1, I32)])
    )
    high = rem & (red > left) & (red > right)
    lowl = jnp.where(
        first, 4, jnp.concatenate([jnp.full(1, 4, I32), red[:-1]])
    )
    lowr = jnp.where(
        last, 4, jnp.concatenate([red[1:], jnp.full(1, 4, I32)])
    )
    low = rem & (red < lowl) & (red < lowr)
    lm = high
    lm_l = jnp.where(
        first, False, jnp.concatenate([jnp.zeros(1, bool), lm[:-1]])
    )
    lm_r = jnp.where(
        last, False, jnp.concatenate([lm[1:], jnp.zeros(1, bool)])
    )
    lm = lm | (low & ~lm_l & ~lm_r)
    lm = lm & (m > 1)

    # next landmark strictly after k within the region (segmented)
    w = jnp.where(lm, k2, INF)
    shifted = jnp.where(
        last | ~rem, INF, jnp.concatenate([w[1:], INF[None]])
    )
    nxt2 = _seg_suffix_min(shifted, last | ~rem)
    is_last_lm = lm & (nxt2 == INF)
    e_local = k2 + 1 - (nxt2 == k2 + 2).astype(I32)
    cut_after = lm & ~is_last_lm
    # span starts: region firsts + position (region_start + e_local + 1)
    tgt = jnp.where(cut_after, pos - k2 + e_local + 1, N)
    span_flag = jnp.zeros(N, bool).at[tgt].set(True, mode="drop")
    span_flag = span_flag | first
    span_first = lax.cummax(jnp.where(span_flag & rem, pos, -1), axis=0)
    nxt_span = _suffix_min(
        jnp.concatenate(
            [jnp.where(span_flag & rem, pos, INF)[1:], INF[None]]
        )
    )
    span_end = jnp.minimum(nxt_span - 1, seg_end)
    sk = pos - span_first
    sL = span_end - span_first + 1
    starts = starts | (rem & _eager13_starts(sk, sL))
    return starts


def _merge_one_blocks(lens, nb):
    """esp_vec.merge_one_blocks_vec at fixed shape; returns
    (new lens padded with 0, new block count)."""
    N = lens.shape[0]
    i = jnp.arange(N, dtype=I32)
    bvalid = i < nb
    is1 = bvalid & (lens == 1)
    pre1 = jnp.concatenate([jnp.zeros(1, bool), is1[:-1]]) & (i == 1)
    post1 = jnp.concatenate([is1[1:], jnp.zeros(1, bool)])
    keep = bvalid & ~is1
    v = lens + pre1.astype(I32)
    fst = jnp.where(v == 4, 2, v)
    snd = jnp.where(v == 4, 2, 0)
    t = jnp.where(snd > 0, snd, fst) + 1
    fst2 = jnp.where(snd > 0, fst, jnp.where(t == 4, 2, t))
    snd2 = jnp.where(snd > 0, t, jnp.where(t == 4, 2, 0))
    out_fst = jnp.where(post1, fst2, fst)
    out_snd = jnp.where(post1, snd2, snd)
    counts = keep.astype(I32) * (1 + (out_snd > 0).astype(I32))
    off = jnp.cumsum(counts) - counts
    total = off[-1] + counts[-1]
    res = jnp.zeros(N, I32)
    res = res.at[jnp.where(keep, off, N)].set(out_fst, mode="drop")
    res = res.at[jnp.where(keep & (out_snd > 0), off + 1, N)].set(
        out_snd, mode="drop"
    )
    return res, total


def _group_dedup(keys, seqpos, blk_valid):
    """Lexicographic-sort dedup with first-encounter bookkeeping.

    keys: tuple of int32[N] columns; seqpos: int32[N] distinct sequence
    positions; blk_valid: which rows participate. Returns
    (is_new, first_idx): per original row, whether it is the first
    encounter of its key, and the row index of that first encounter.
    """
    N = seqpos.shape[0]
    idx = jnp.arange(N, dtype=I32)
    cols = [jnp.where(blk_valid, k, INF) for k in keys]
    sorted_ops = lax.sort(
        tuple(cols) + (seqpos, idx), num_keys=len(cols) + 1
    )
    s_keys = sorted_ops[: len(cols)]
    s_idx = sorted_ops[-1]
    head = jnp.concatenate(
        [
            jnp.ones(1, bool),
            functools.reduce(
                jnp.logical_or,
                [k[1:] != k[:-1] for k in s_keys],
            ),
        ]
    )
    head_at = lax.cummax(jnp.where(head, idx, -1), axis=0)
    first_sorted = s_idx[head_at]  # original row of the group head
    # back to original row order by ONE co-sort on the permutation
    # s_idx (permute-via-sort; scatters serialize on TPU)
    _, is_new_i, first_idx = lax.sort(
        (s_idx, head.astype(I32), first_sorted), num_keys=1
    )
    return (is_new_i == 1) & blk_valid, first_idx


@functools.partial(jax.jit, static_argnames=("ilog",))
def _esp_round(s, n, base, ilog):
    """One ESP round at padded length N. Returns
    (s_next[N], nb, rules[N,2], R) — s_next holds the next layer's
    symbols (base-offset applied) in its first nb slots; rules holds
    this round's R new rules in id order (symbols final, incl. base
    offsets on inner refs)."""
    N = s.shape[0]
    starts = _round_block_starts(s, n, ilog)
    pos = jnp.arange(N, dtype=I32)
    starts = starts & (pos < n)
    starts = starts | (pos == 0)

    bid = jnp.cumsum(starts.astype(I32)) - 1
    nb0 = jnp.where(n > 0, jnp.max(jnp.where(starts, bid, -1)) + 1, 0)
    bstart0 = jnp.zeros(N, I32).at[
        jnp.where(starts, bid, N)
    ].set(pos, mode="drop")
    i = jnp.arange(N, dtype=I32)
    bnext0 = jnp.concatenate([bstart0[1:], jnp.zeros(1, I32)])
    lens0 = jnp.where(
        i + 1 < nb0, bnext0 - bstart0, n - bstart0
    )
    lens0 = jnp.where(i < nb0, lens0, 0)

    lens, nb = _merge_one_blocks(lens0, nb0)
    bstart = jnp.cumsum(lens) - lens
    bvalid = i < nb
    clamp = lambda x: jnp.clip(x, 0, N - 1)  # noqa: E731
    a = s[clamp(bstart)]
    b = s[clamp(jnp.minimum(bstart + 1, n - 1))]
    c = s[clamp(jnp.minimum(bstart + 2, n - 1))]
    is3 = bvalid & (lens == 3)

    # phase A: inner keys (a, b) at sequence positions 2*i
    posA = 2 * i
    newA, firstA = _group_dedup((a, b), posA, bvalid)
    # phase B: outer keys (A-group identity, c) at positions 2*i + 1;
    # the A-group identity is its first-encounter row (bijective)
    posB = 2 * i + 1
    newB, firstB = _group_dedup((firstA, c), posB, is3)

    # global first-encounter ranking: exclusive cumsum over the
    # interleaved event sequence (A event at 2*i, B event at 2*i+1)
    new_cnt = newA.astype(I32) + newB.astype(I32)
    pre = jnp.cumsum(new_cnt) - new_cnt
    idA_head = pre  # id of an A-group, valid at its head row
    idB_head = pre + newA.astype(I32)
    R = pre[-1] + new_cnt[-1]
    idA = idA_head[clamp(firstA)]
    idB = idB_head[clamp(firstB)]

    rules = jnp.zeros((N, 2), I32)
    rules = rules.at[jnp.where(newA, idA_head, N)].set(
        jnp.stack([a, b], axis=1), mode="drop"
    )
    rules = rules.at[jnp.where(newB, idB_head, N)].set(
        jnp.stack([base + idA, c], axis=1), mode="drop"
    )

    top = jnp.where(is3, idB, idA)
    s_next = jnp.where(bvalid, base + top, 0)
    return s_next, nb, rules, R


def _pad_pow2(n, lo=256):
    p = lo
    while p < n:
        p *= 2
    return p


def esp_rounds_jax(data: bytes, tail_cutoff: int = 4096):
    """Full ESP on the device: grammar bit-identical to ``esp_rounds``.

    Big rounds run on the accelerator at pow2-padded shapes (one
    compilation per (bucket, ilog)), and the layer stays **device
    resident** between rounds: each round's ``s_next`` feeds the next
    round through a static slice to the next pow2 bucket (block merge
    guarantees nb <= n/2, so buckets shrink monotonically and the
    slice is always in range). Per round the host pulls only the
    ``(nb, R)`` scalar pair — needed anyway for the loop condition and
    the exact ``iter_log(base)`` round structure — plus the R new rule
    pairs (KBs); the round-3 version round-tripped the whole layer
    through the host (~4 MB of d2h at tunnel speed per round). Once
    the layer shrinks below ``tail_cutoff`` the remaining rounds use
    the host array program (``esp_vec.esp_round_vec``) — the tail is
    microseconds of work and not worth a device dispatch. Returns
    (rules int64[R,2], root, empty).
    """
    s_host = np.frombuffer(data, np.uint8).astype(np.int64)
    if s_host.size == 0:
        return np.zeros((0, 2), np.int64), 0, True
    if len(data) >= 1 << 30:
        raise ValueError("device ESP requires len(data) < 2**30")
    chunks = []
    base = 256
    if s_host.size > tail_cutoff:
        N = _pad_pow2(s_host.size)
        pad = np.zeros(N, np.int32)
        pad[: s_host.size] = s_host
        s_dev = jnp.asarray(pad)
        n_cur = jnp.int32(s_host.size)
        while True:
            s_next, nb, rules, R = _esp_round(
                s_dev, n_cur, jnp.int32(base), ilog=iter_log(base)
            )
            nb_i, r_i = (
                int(v) for v in np.asarray(jnp.stack([nb, R]))
            )
            chunks.append(np.asarray(rules[:r_i], np.int64))
            base += r_i
            if nb_i <= tail_cutoff:
                s_host = np.asarray(
                    s_next[: max(nb_i, 1)], np.int64
                )[:nb_i]
                break
            N = _pad_pow2(nb_i)
            s_dev = s_next[:N]  # static in-range slice, zero-padded
            n_cur = nb
    while s_host.size > 1:
        top, rules_rel = esp_vec.esp_round_vec(s_host, base)
        a = rules_rel[:, 0]
        rules_rel[:, 0] = np.where(a < 0, base + (-a - 1), a)
        chunks.append(rules_rel)
        s_host = base + top
        base += rules_rel.shape[0]
    all_rules = (
        np.concatenate(chunks) if chunks else np.zeros((0, 2), np.int64)
    )
    return all_rules, int(s_host[0]), False
