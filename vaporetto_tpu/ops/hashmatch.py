"""Exact-hash longest matching: the windowed trie walk in ONE gather.

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
* For each pattern length ``k`` present in the model, a collision-free
  multiplicative hash over the rolling window hash ``h_k`` maps the
  window to a slot in a shared table. All per-length regions live in
  ONE concatenated table, so the whole match is ONE row gather of shape
  (B, L, n_lengths, R); everything else (rolling hashes, slot
  arithmetic, symbol verification, longest-k selection) is elementwise
  and fuses.
* Exactness is not probabilistic: each gathered row carries the
  pattern's symbols packed two-per-int32 (end-aligned pairs), and a
  candidate only matches when every window symbol compares equal. Hash
  collisions between *patterns* of one length are eliminated at build
  time (per-length injective (mul, shift), with a fallback rolling-hash
  base); collisions between text windows and patterns are rejected by
  the symbol comparison. OOV/padding/separator symbols are 0 and
  pattern symbols are >= 1, so out-of-line windows can never match.

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
#: symbol ids must fit 15 bits for the two-per-int32 pair packing
HASH_MATCH_MAX_SYM = 32767
#: rolling-hash base candidates (odd constants; retried in order until
#: every per-length pattern-hash set is duplicate-free)
_BASES = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F)


@dataclasses.dataclass
class HashMatchTables:
    """Host-built tables for :func:`hash_match_longest`.

    ``table``: (P_total, R) int32 — concatenated per-length regions;
    row = [pattern_id, pair_0, .., pair_{n_pairs-1}] with pair_j =
    (sigma_{2j+1} << 16) | sigma_{2j} over symbols indexed by distance
    from the pattern END (partial trailing pair for odd lengths holds
    the single symbol; unused pairs are -1). Empty slots have id -1.
    ``metas``: per length (ascending): (k, offset, mul_signed, shift).
    ``base``: rolling-hash base (signed-int32 form).
    ``kmax``: largest pattern length covered.
    """

    table: np.ndarray
    metas: List[Tuple[int, int, int, int]]
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
    syms = np.zeros((n, matcher.max_len), dtype=np.int32)
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


def _rolling_hashes(syms_end: np.ndarray, lengths: np.ndarray,
                    base: int) -> np.ndarray:
    """h(pattern) = sum_e sigma_e * base^e mod 2^32 (e = distance from
    the end) — matching the device's incremental form exactly."""
    h = np.zeros(len(syms_end), dtype=np.uint64)
    powv = np.uint64(1)
    M = np.uint64(0xFFFFFFFF)
    for e in range(syms_end.shape[1]):
        h = (h + syms_end[:, e].astype(np.uint64) * powv) & M
        powv = (powv * np.uint64(base)) & M
    # columns beyond each pattern's length are zero, so the full-width
    # sum equals the per-length prefix sum
    return h.astype(np.uint32)


def _find_injection(hs: np.ndarray, rng) -> Optional[Tuple[int, int, int]]:
    """Smallest power-of-two table + (mul, shift) injective over hs."""
    n = max(len(hs), 1)
    m_bits = max(2, int(np.ceil(np.log2(n * 2))))
    h64 = hs.astype(np.uint64)
    while m_bits <= 26:
        shift = 32 - m_bits
        for _ in range(64):
            mul = int(rng.integers(0, 2**31)) * 2 + 1
            slots = ((h64 * np.uint64(mul)) & np.uint64(0xFFFFFFFF)) \
                >> np.uint64(shift)
            if len(np.unique(slots)) == len(hs):
                return mul, shift, 1 << m_bits
        m_bits += 1
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
    rng = np.random.default_rng(0x5EED5)
    for base in _BASES:
        hs = _rolling_hashes(syms, lengths, base)
        metas: List[Tuple[int, int, int, int]] = []
        regions = []
        offset = 0
        ok = True
        for k in range(1, kmax + 1):
            sel = lengths == k
            if not sel.any():
                continue
            hk = hs[sel]
            if len(np.unique(hk)) != len(hk):
                ok = False  # same-length rolling-hash duplicate: new base
                break
            inj = _find_injection(hk, rng)
            if inj is None:
                ok = False
                break
            mul, shift, P = inj
            region = np.full((P, R), -1, dtype=np.int32)
            slots = ((hk.astype(np.uint64) * np.uint64(mul))
                     & np.uint64(0xFFFFFFFF)) >> np.uint64(shift)
            rows = np.flatnonzero(sel)
            region[slots, 0] = pids[rows]
            for j in range(n_pairs):
                lo = syms[rows, 2 * j] if 2 * j < k else None
                if lo is None:
                    break
                hi = syms[rows, 2 * j + 1] if 2 * j + 1 < k else 0
                region[slots, 1 + j] = (hi << 16) | lo
            metas.append((k, offset, _signed32(mul), shift))
            regions.append(region)
            offset += P
        if ok:
            table = (np.concatenate(regions, axis=0) if regions
                     else np.full((1, R), -1, dtype=np.int32))
            return HashMatchTables(
                table=table, metas=metas, base=_signed32(base),
                kmax=kmax, n_pairs=n_pairs,
            )
    return None


def hash_match_for(matcher) -> Optional[HashMatchTables]:
    """Cached per-matcher build; ``VAPORETTO_TPU_NO_HASHMATCH=1``
    disables (falls back to the windowed walk)."""
    if os.environ.get("VAPORETTO_TPU_NO_HASHMATCH") == "1":
        return None
    obj = getattr(matcher, "_hash_match_cache", False)
    if obj is False:
        obj = build_hash_match_tables(matcher)
        matcher._hash_match_cache = obj
    return obj


def hash_match_longest(syms, table, hm: HashMatchTables):
    """Device-side longest match via the hash tables: returns (B, L)
    int32 pattern ids (-1 = no match), identical to
    :func:`ops.match.match_longest_fused` over the same model.

    ONE big-table gather; rolling hashes, slot arithmetic, verification
    compares, and the longest-k selection are elementwise and fuse.
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
    slots = [
        jnp.int32(off) + lax.shift_right_logical(
            hks[k] * jnp.int32(mul), jnp.int32(shift)
        )
        for (k, off, mul, shift) in hm.metas
    ]
    idx = jnp.stack(slots, axis=-1)  # (B, L, nk)
    rows = table[idx]  # (B, L, nk, R) — the one gather
    answer = jnp.full(syms.shape, -1, dtype=jnp.int32)
    low = jnp.int32(0xFFFF)
    for i, (k, _, _, _) in enumerate(hm.metas):  # ascending k
        r = rows[..., i, :]
        ok = r[..., 0] >= 0
        for j in range(k // 2):
            ok = ok & (pairs[j] == r[..., 1 + j])
        if k % 2:
            j = k // 2
            ok = ok & ((pairs[j] & low) == r[..., 1 + j])
        answer = jnp.where(ok, r[..., 0], answer)
    return answer
