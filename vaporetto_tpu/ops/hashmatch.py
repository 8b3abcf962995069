"""Exact-hash longest matching: the windowed trie walk in TWO gathers.

The fused windowed walk (ops/match.py) costs one table-gather kernel per
step, i.e. ``max_len`` sequential gather kernels — the measured cost
driver of big-dictionary models on TPU (PERF.md round-4 finding: the
device charges per fused kernel containing a large-table gather). This
module reformulates longest-match as *direct per-length window lookup*:

* Every pattern ending at position ``t`` is exactly the window
  ``syms[t-k+1..t]`` for some length ``k`` — and the walk's answer (the
  Aho-Corasick ``no_suffix`` output, reference
  char_scorer/boundary_scorer.rs:91-113 via the suffix-merged weights)
  is simply the id of the LONGEST window that is exactly a pattern.
* Per pattern length ``k``, windows are located by CHD-style
  hash-and-displace perfect hashing over the rolling window hash
  ``h_k``: slot = (mix2(h) + d[mix1(h)]) & mask, with ``d`` a small
  per-bucket displacement array built greedily host-side. All lengths
  share ONE displacement table and ONE entry table, so the whole match
  is two gathers — a small-table (B, L, nk) int16 displacement gather
  and the (B, L, nk, R) entry-row gather — and everything else
  (rolling hashes, slot arithmetic, verification, longest-k selection)
  is elementwise and fuses. A single-level multiplicative perfect hash
  was measured infeasible at dictionary scale (the birthday bound
  forces ~n^2 slots), and an FKS level-1 ROW gather was measured to
  cost a second big-gather kernel plus layout copies; CHD keeps the
  first probe in the cheap small-table tier (PERF.md round-4 cost
  model) at ~2n entry slots total.
* Exactness is not probabilistic: each level-2 row carries the
  pattern's symbols packed two-per-int32 (end-aligned pairs), and a
  candidate only matches when every window symbol compares equal.
  Same-length rolling-hash duplicates are eliminated at build time by
  retrying the hash base; text-window collisions are rejected by the
  symbol comparison. OOV/padding/separator symbols are 0 and pattern
  symbols are >= 1, so out-of-line windows can never match.

Equivalence with :func:`ops.match.match_longest_fused` is pinned by
tests/test_hashmatch.py on golden, bundled, and randomized models.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["HashMatchTables", "build_hash_match_tables",
           "hash_match_for", "hash_match_longest"]

#: applicability bounds: longer patterns fall back to the windowed walk
#: (dictionary words may be up to 32 767 chars in the reference,
#: char_scorer/boundary_scorer.rs:67-74 — those keep the lax.scan walk)
HASH_MATCH_MAX_LEN = 16
#: ... and SHORT-pattern models keep the walk too: for max_len k the
#: walk costs k table-gather kernels while the hash path costs its two
#: gathers PLUS the rolling-hash/verification elementwise chains —
#: measured on the bundled model (max_len 2): walk ~7.6 ms vs hash
#: ~21 ms; on the 50k-dict model (max_len 7): walk ~105 ms vs hash
#: ~45 ms. Crossover is around 4-5 steps.
#: VAPORETTO_TPU_HASHMATCH_MIN overrides (testing).
HASH_MATCH_MIN_LEN = 5
#: symbol ids must fit 15 bits for the two-per-int32 pair packing
HASH_MATCH_MAX_SYM = 32767
#: rolling-hash base candidates (odd constants; retried in order until
#: every per-length pattern-hash set is duplicate-free)
_BASES = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)
#: bucket multiplier (any odd mixer; buckets need not be collision-free,
#: only reasonably balanced)
_C1 = 0x9E3779B1
#: slot-mix multiplier candidates (retried until every bucket's members
#: have distinct base slots)
_C2S = (0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1,
        0x9E3779B1, 0xD6E8FEB9, 0xA3B19525, 0x5851F42D)


@dataclasses.dataclass
class HashMatchTables:
    """Host-built tables for :func:`hash_match_longest`.

    ``d``: (D_total, 2) int32 — concatenated per-length CHD
    displacement rows; bucket = d_offset + ((h_k * C1) >>_u d_shift).
    Column 0 holds the displacement, column 1 is padding: gathers
    returning (N, R>=2) rows take the fast vectorized TPU path while
    1-D gathers run per-element (measured 26.5 vs 126 ms here), and
    int32 avoids the sub-word unpack path int16 tables hit.
    ``l2``: (P2_total, R) int32 — entry rows [pattern_id, pair_0, ..,
    pair_{n_pairs-1}] with pair_j = (sigma_{2j+1} << 16) | sigma_{2j}
    over symbols indexed by distance from the pattern END (partial
    trailing pair for odd lengths holds the single symbol); empty
    entries are all -1. Entry slot = l2_offset +
    ((((h_k * C2) >>_u slot_shift) + d[bucket]) & mask).
    ``metas``: per present length (ascending):
    (k, d_offset, d_shift, l2_offset, slot_shift, mask, c2_signed).
    ``base``: rolling-hash base (signed-int32 form).
    """

    d: np.ndarray
    l2: np.ndarray
    metas: List[Tuple[int, int, int, int, int, int, int]]
    base: int
    kmax: int
    n_pairs: int


def _signed32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x >= 1 << 31 else x


def extract_patterns(matcher) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Recover (pattern symbols, ids) from a packed double-array trie.

    Returns (syms_end (n_pat, max_len) int32 — symbol at distance e from
    the pattern's END in column e, zero beyond the length —, lengths
    (n_pat,), pids (n_pat,)). Vectorized parent chasing: check[slot] is
    the parent and ``slot - base[parent]`` the edge symbol
    (compile/trie.py conventions; root = slot 0 with check[0] == 0).
    """
    base = np.asarray(matcher.base, dtype=np.int64)
    check = np.asarray(matcher.check, dtype=np.int64)
    value = np.asarray(matcher.value, dtype=np.int64)
    terms = np.flatnonzero(value >= 0)
    terms = terms[terms != 0]  # root cannot terminate a pattern
    pids = value[terms].astype(np.int32)
    n = len(terms)
    syms = np.zeros((n, max(matcher.max_len, 1)), dtype=np.int32)
    lengths = np.zeros(n, dtype=np.int32)
    cur = terms.copy()
    alive = cur > 0
    e = 0
    while alive.any():
        if e >= matcher.max_len:
            raise ValueError("trie deeper than max_len")
        p = check[cur]
        s = cur - base[p]
        syms[alive, e] = s[alive]
        lengths[alive] = e + 1
        cur = np.where(alive, p, 0)
        alive = cur > 0
        e += 1
    return syms, lengths, pids


def _rolling_hashes(syms_end: np.ndarray, base: int) -> np.ndarray:
    """h(pattern) = sum_e sigma_e * base^e mod 2^32 (e = distance from
    the end) — matching the device's incremental form exactly. Columns
    beyond each pattern's length are zero, so the full-width sum equals
    the per-length prefix sum."""
    h = np.zeros(len(syms_end), dtype=np.uint64)
    powv = np.uint64(1)
    M = np.uint64(0xFFFFFFFF)
    for e in range(syms_end.shape[1]):
        h = (h + syms_end[:, e].astype(np.uint64) * powv) & M
        powv = (powv * np.uint64(base)) & M
    return h.astype(np.uint32)


def _chd_region(hk: np.ndarray, max_disp: int = 32767):
    """CHD hash-and-displace for one length region.

    Returns (d int16 (D,), slot_of (n,) int64, d_shift, slot_shift,
    mask, c2) or None. Greedy: buckets in decreasing size pick the
    smallest displacement placing all members in free slots."""
    M = np.uint64(0xFFFFFFFF)
    n = len(hk)
    h64 = hk.astype(np.uint64)
    d_bits = max(1, int(np.ceil(np.log2(max(n / 4, 1)))) if n > 4 else 1)
    D = 1 << d_bits
    d_shift = 32 - d_bits
    bucket = ((h64 * np.uint64(_C1)) & M) >> np.uint64(d_shift)
    p_bits = max(1, int(np.ceil(np.log2(n * 2))))
    while p_bits <= 27:
        P = 1 << p_bits
        slot_shift = 32 - p_bits
        for c2 in _C2S:
            bslot = ((h64 * np.uint64(c2)) & M) >> np.uint64(slot_shift)
            # within-bucket base slots must be distinct or no
            # displacement can separate them
            order = np.lexsort((bslot, bucket))
            bs, ss = bucket[order], bslot[order]
            same = (bs[1:] == bs[:-1]) & (ss[1:] == ss[:-1])
            if same.any():
                continue
            # group members per bucket, largest first
            edges = np.flatnonzero(np.diff(bs)) + 1
            starts = np.concatenate(([0], edges))
            ends = np.concatenate((edges, [len(bs)]))
            sizes = ends - starts
            big_first = np.argsort(-sizes, kind="stable")
            free = np.ones(P, dtype=bool)
            d = np.zeros(D, dtype=np.int32)
            slot_of = np.zeros(n, dtype=np.int64)
            ok = True
            mask = P - 1
            for gi in big_first:
                mem = order[starts[gi]:ends[gi]]
                basev = bslot[mem].astype(np.int64)
                delta = 0
                while delta <= max_disp:
                    tgt = (basev + delta) & mask
                    if free[tgt].all():
                        break
                    delta += 1
                else:
                    ok = False
                    break
                if delta > max_disp:
                    ok = False
                    break
                free[tgt] = False
                slot_of[mem] = tgt
                d[int(bucket[mem[0]])] = delta
            if ok:
                # int32, not int16: sub-word gathers lower to a
                # per-element unpack path on TPU (measured 117 ms vs
                # 15 ms for the same gather at s16 vs s32)
                return (d.astype(np.int32), slot_of, d_shift,
                        slot_shift, mask, c2)
        p_bits += 1
    return None


def build_hash_match_tables(matcher) -> Optional[HashMatchTables]:
    """Build :class:`HashMatchTables` for a compiled matcher, or None
    when not applicable (patterns too long, symbols too wide, or no
    collision-free build found)."""
    if matcher.max_len > HASH_MATCH_MAX_LEN:
        return None
    syms, lengths, pids = extract_patterns(matcher)
    if len(pids) == 0 or int(syms.max(initial=0)) > HASH_MATCH_MAX_SYM:
        return None
    kmax = int(lengths.max())
    n_pairs = (kmax + 1) // 2
    R = 1 + n_pairs
    for base in _BASES:
        hs = _rolling_hashes(syms, base)
        dup_free = True
        for k in range(1, kmax + 1):
            hk = hs[lengths == k]
            if len(np.unique(hk)) != len(hk):
                dup_free = False  # rolling-hash duplicate: retry base
                break
        if not dup_free:
            continue
        metas: List[Tuple[int, int, int, int, int, int, int]] = []
        d_parts: List[np.ndarray] = []
        slot_parts: List[Tuple[np.ndarray, np.ndarray]] = []
        d_off = 0
        l2_off = 0
        ok = True
        for k in range(1, kmax + 1):
            rows = np.flatnonzero(lengths == k)
            if len(rows) == 0:
                continue
            res = _chd_region(hs[rows])
            if res is None:
                ok = False
                break
            d, slot_of, d_shift, slot_shift, mask, c2 = res
            metas.append((k, d_off, d_shift, l2_off, slot_shift, mask,
                          _signed32(c2)))
            d_parts.append(d)
            slot_parts.append((rows, l2_off + slot_of))
            d_off += len(d)
            l2_off += mask + 1
        if not ok:
            continue
        d_flat = (np.concatenate(d_parts) if d_parts
                  else np.zeros(1, dtype=np.int32))
        # (D, 2) row form for the fast TPU row-gather path (column 1 is
        # padding; see hash_match_longest)
        d_table = np.stack([d_flat, np.zeros_like(d_flat)], axis=1)
        l2 = np.full((max(l2_off, 1), R), -1, dtype=np.int32)
        for rows, slots in slot_parts:
            l2[slots, 0] = pids[rows]
            for j in range(n_pairs):
                lo = syms[rows, 2 * j]
                hi = (syms[rows, 2 * j + 1]
                      if 2 * j + 1 < syms.shape[1]
                      else np.zeros(len(rows), dtype=np.int32))
                pair = (hi << 16) | lo
                # only meaningful for patterns long enough to own pair
                # j; shorter ones keep -1 (their k-comparison never
                # reads it, and -1 can never equal a window pair)
                has = lengths[rows] > 2 * j
                l2[slots[has], 1 + j] = pair[has]
        return HashMatchTables(
            d=d_table, l2=l2, metas=metas, base=_signed32(base),
            kmax=kmax, n_pairs=n_pairs,
        )
    return None


def hash_match_for(matcher) -> Optional[HashMatchTables]:
    """Cached per-matcher build; ``VAPORETTO_TPU_NO_HASHMATCH=1``
    disables (falls back to the windowed walk), and models below the
    measured crossover length keep the walk (see HASH_MATCH_MIN_LEN)."""
    if matcher is None:
        return None
    if os.environ.get("VAPORETTO_TPU_NO_HASHMATCH") == "1":
        return None
    min_len = int(
        os.environ.get("VAPORETTO_TPU_HASHMATCH_MIN", HASH_MATCH_MIN_LEN)
    )
    if matcher.max_len < min_len:
        return None
    obj = getattr(matcher, "_hash_match_cache", False)
    if obj is False:
        obj = build_hash_match_tables(matcher)
        matcher._hash_match_cache = obj
    return obj


def hash_match_longest(syms, d_table, l2, hm: HashMatchTables):
    """Device-side longest match via the CHD tables: returns (B, L)
    int32 pattern ids (-1 = no match), identical to
    :func:`ops.match.match_longest_fused` over the same model.

    One SMALL-table displacement gather + one entry-row gather; rolling
    hashes, slot arithmetic, verification compares, and the longest-k
    selection are elementwise and fuse.
    """
    import jax.numpy as jnp
    from jax import lax

    kmax, n_pairs = hm.kmax, hm.n_pairs
    # sigma_e[t] = syms[t - e] (0 beyond the row start)
    sh = [syms]
    for e in range(1, kmax):
        sh.append(jnp.pad(sh[-1][:, :-1], ((0, 0), (1, 0))))
    pairs = [
        ((sh[2 * j + 1] if 2 * j + 1 < kmax else jnp.zeros_like(syms))
         << 16) | sh[2 * j]
        for j in range(n_pairs)
    ]
    # rolling hashes h_k = sum_{e<k} sigma_e * base^e (wrapping int32)
    hks = {}
    h = jnp.zeros_like(syms)
    powv = 1
    for e in range(kmax):
        h = h + sh[e] * jnp.int32(_signed32(powv))
        hks[e + 1] = h
        powv = (powv * (hm.base & 0xFFFFFFFF)) & 0xFFFFFFFF
    c1 = jnp.int32(_signed32(_C1))
    # stack the per-length lookups on the LEADING axis: minor-dim
    # stacks/slices of the (.., nk) tensors each compiled to their own
    # layout-copy kernels (~10 ms apiece); leading-axis slices are free
    b_idx = jnp.stack(
        [
            jnp.int32(d_off) + lax.shift_right_logical(
                hks[k] * c1, jnp.int32(d_shift)
            )
            for (k, d_off, d_shift, _, _, _, _) in hm.metas
        ],
        axis=0,
    )  # (nk, B, L)
    # 2-D row-form table: on TPU a gather returning (N, R>=2) rows runs
    # the fast vectorized path (~2 ns/row measured) while the same
    # indices into a 1-D table take a per-element path (~8.6 ns,
    # measured 126 ms for this tensor; a (D, 1) reshape gets
    # canonicalized back). build_hash_match_tables emits the (D, 2)
    # row form (column 1 is padding).
    disp = d_table[b_idx][..., 0]  # (nk, B, L)
    # one vectorized expression over the stacked k axis — per-k slices
    # of `disp` compiled to their own multi-output slice kernel
    # (measured 23.5 ms), broadcasting tiny per-k constant vectors does
    # not
    mix = jnp.stack(
        [
            lax.shift_right_logical(
                hks[k] * jnp.int32(c2), jnp.int32(slot_shift)
            )
            for (k, _, _, _, slot_shift, _, c2) in hm.metas
        ],
        axis=0,
    )
    off_vec = jnp.asarray(
        np.asarray([m[3] for m in hm.metas], dtype=np.int32)
    )[:, None, None]
    mask_vec = jnp.asarray(
        np.asarray([m[5] for m in hm.metas], dtype=np.int32)
    )[:, None, None]
    slot2 = off_vec + ((mix + disp) & mask_vec)
    rows = l2[slot2]  # (nk, B, L, R) — the big gather
    answer = jnp.full(syms.shape, -1, dtype=jnp.int32)
    low = jnp.int32(0xFFFF)
    for i, (k, *_rest) in enumerate(hm.metas):  # ascending k
        r = rows[i]  # leading-axis slice: no copy
        ok = r[..., 0] >= 0
        for j in range(k // 2):
            ok = ok & (pairs[j] == r[..., 1 + j])
        if k % 2:
            j = k // 2
            ok = ok & ((pairs[j] & low) == r[..., 1 + j])
        answer = jnp.where(ok, r[..., 0], answer)
    return answer
