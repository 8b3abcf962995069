"""Device-side longest-match pattern matching.

Replaces the reference's sequential Aho-Corasick scan
(char_scorer/boundary_scorer.rs:91-113) with a parallel windowed trie walk:
for window length k = 1..max_len, every text position advances its
double-array trie node by one symbol, vectorized over (batch, position).
No recurrence over positions — the loop bound is the (static) maximum
pattern length, so XLA sees a short unrolled chain of gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["match_longest", "hash_project"]

#: unroll the windowed trie walk up to this many steps (full fusion for
#: realistic n-gram/dict lengths); longer walks run under lax.scan
MATCH_UNROLL_MAX = 63


def hash_project(
    cps: jax.Array,  # (B, L) int32 codepoints (0 = padding)
    mul: int,
    shift: int,
    keys: jax.Array,  # (P,) int32 codepoint per slot, -1 = empty
    syms: jax.Array,  # (P,) int32 symbol id per slot
) -> jax.Array:
    """Codepoint -> symbol projection via a collision-free multiplicative
    hash into small tables.

    Numerically identical to the dense ``char_sym_table[cps]`` gather, but
    the tables are a few KB instead of 4 MB — large-table gathers are the
    dominant cost of the XLA pipeline on TPU.
    """
    h = cps * jnp.int32(mul)  # wrapping int32 mul == low 32 bits of u32 mul
    slot = jax.lax.shift_right_logical(h, jnp.int32(shift))
    hit = keys[slot] == cps
    return jnp.where(hit, syms[slot], 0)


def match_longest(
    syms: jax.Array,  # (B, L) int32 projected symbols; 0 = OOV / padding
    base: jax.Array,  # (n_slots,) int32
    check: jax.Array,  # (n_slots,) int32
    inherit: jax.Array,  # (n_slots,) int32 AC output link -> pattern id / -1
    max_len: int,
    dead: int = -1,
) -> jax.Array:
    """Return (B, L) int32: longest pattern id ending at each position, -1 if none.

    Equivalent to the reference's ``find_overlapping_no_suffix_iter`` match
    stream: at most one (the longest) pattern per end position.

    Only the *deepest alive* trie node per position is tracked; the final
    answer is one ``inherit`` gather: every pattern ending at position t is
    a suffix of the deepest alive window, so the longest one is exactly
    that node's resolved Aho-Corasick output.

    ``dead``: slot id of a DEAD sink node appended to the tables (see
    :func:`extend_tables_with_dead`). With it, each walk step is the
    minimal double-array transition — 2 gathers + add + compare + 2
    selects — because deadness propagates through the table itself
    (``check[base[dead] + s] != dead`` for every s) instead of per-step
    alive masks, clips, and OOV checks. ``dead=-1`` selects the legacy
    masked walk over unextended tables (reference path for equivalence
    tests).
    """
    B, L = syms.shape
    node = jnp.zeros((B, L), dtype=jnp.int32)  # window length 0 -> root
    deepest = jnp.zeros((B, L), dtype=jnp.int32)
    n_slots = base.shape[0]

    if dead >= 0:
        # Lean walk. Invariants provided by both packers (trie_builder.cc,
        # compile/trie.py _build_trie_python) and the dead extension:
        # * base[v] >= 1 for internal nodes, 0 for leaves; children sit at
        #   base[v] + s with s >= 1, so check[base[v] + 0] == v is
        #   impossible — OOV/padding symbol 0 fails naturally, no mask.
        # * base[v] + n_symbols < n_slots (guard region) and
        #   base[dead] = 0, so cand is always in bounds — no clip.
        # * check[s] (s <= n_symbols) holds parents < dead, so a DEAD
        #   node can never transition back alive.
        dead_c = jnp.int32(dead)

        def step(node, deepest, prev):
            cand = base[prev] + syms
            ok = check[cand] == prev
            node = jnp.where(ok, cand, dead_c)
            deepest = jnp.where(ok, cand, deepest)
            return node, deepest

        pad_const = dead
    else:

        def step(node, deepest, prev):
            alive = prev >= 0
            safe_prev = jnp.where(alive, prev, 0)
            cand = base[safe_prev] + syms
            # guard region in the tables makes cand in-bounds for valid
            # nodes; clip for dead lanes
            cand = jnp.clip(cand, 0, n_slots - 1)
            ok = alive & (syms > 0) & (check[cand] == safe_prev)
            node = jnp.where(ok, cand, -1)
            deepest = jnp.where(ok, cand, deepest)
            return node, deepest

        pad_const = -1

    # k = 1: the empty window ends everywhere, incl. position 0
    node, deepest = step(node, deepest, node)
    remaining = max_len - 1
    if remaining > 0 and remaining <= MATCH_UNROLL_MAX:
        for _ in range(remaining):
            prev = jnp.pad(node[:, :-1], ((0, 0), (1, 0)),
                           constant_values=pad_const)
            node, deepest = step(node, deepest, prev)
    elif remaining > 0:
        # very long patterns (dictionary words up to 32 767 chars,
        # char_scorer/boundary_scorer.rs:67-74): run the window walk under
        # lax.scan so the trace stays O(1) in max_len
        def body(carry, _):
            node, deepest = carry
            prev = jnp.pad(node[:, :-1], ((0, 0), (1, 0)),
                           constant_values=pad_const)
            return step(node, deepest, prev), None

        (node, deepest), _ = jax.lax.scan(
            body, (node, deepest), None, length=remaining
        )
    return inherit[deepest]  # inherit[root] == -1


def hash_project_fused(
    cps: jax.Array,  # (B, L) int32 codepoints (0 = padding)
    mul: int,
    shift: int,
    tab2: jax.Array,  # (P, 2) int32 rows (key codepoint or -1, symbol)
) -> jax.Array:
    """Codepoint -> symbol projection via ONE small-table gather.

    Same hash as :func:`hash_project` with the (key, symbol) columns
    fetched together: on the TPU profile each gather is its own fused
    kernel with cost set by table size, so one row gather from a few-KB
    table replaces either two small gathers or one 64 Ki-entry dense
    gather.
    """
    h = cps * jnp.int32(mul)
    slot = jax.lax.shift_right_logical(h, jnp.int32(shift))
    g = tab2[slot]  # (B, L, 2)
    return jnp.where(g[..., 0] == cps, g[..., 1], 0)


def classify_types_bmp_arith(cps: jax.Array) -> jax.Array:
    """Char-type classification for BMP codepoints by range compares —
    a pure elementwise chain that fuses into neighboring kernels for
    free (no 64 KiB table gather on the serve hot path).

    Exact parity with the reference Unicode ranges (sentence.rs:50-67 /
    native common.h vt::char_type), pinned for every BMP codepoint by
    tests/test_serving.py. Input int32 in [0, 0xFFFF].
    """
    c = cps

    def rng(lo, hi):
        return (c >= lo) & (c <= hi)

    digit = rng(0x30, 0x39) | rng(0xFF10, 0xFF19)
    roman = (
        rng(0x41, 0x5A) | rng(0x61, 0x7A)
        | rng(0xFF21, 0xFF3A) | rng(0xFF41, 0xFF5A)
    )
    hira = rng(0x3040, 0x3096)
    kata = rng(0x30A0, 0x30FA) | rng(0x30FC, 0x30FF) | rng(0xFF66, 0xFF9F)
    kanji = rng(0x3400, 0x4DBF) | rng(0x4E00, 0x9FFF) | rng(0xF900, 0xFAFF)
    out = jnp.full(c.shape, 6, dtype=jnp.int32)  # OTHER
    out = jnp.where(kanji, 5, out)
    out = jnp.where(kata, 4, out)
    out = jnp.where(hira, 3, out)
    out = jnp.where(roman, 2, out)
    out = jnp.where(digit, 1, out)
    return out


def match_longest_fused(
    syms: jax.Array,  # (B, L) int32 projected symbols; 0 = OOV / padding
    walk_tab: jax.Array,  # (n_slots, 3) int32 rows (check, base, inherit)
    max_len: int,
    dead: int,
    root_base: int,  # base[root], a host-known static int
) -> jax.Array:
    """Single-gather-per-step windowed walk.

    Identical semantics to :func:`match_longest` with ``dead`` set, but
    each step costs ONE table gather instead of two: the row fetched at
    the candidate slot carries (check, base, inherit) together, so the
    validity test uses column 0, the NEXT step's transition base comes
    from column 1 (no base gather), and the running answer accumulates
    column 2 (no final inherit gather). On the TPU profile the walk cost
    is one fused gather kernel per step — this halves it.

    Table invariants as in :func:`extend_tables_with_dead`; additionally
    ``base[dead] == 0`` so the dead carry's base is the constant 0.
    """
    B, L = syms.shape
    node = jnp.zeros((B, L), dtype=jnp.int32)  # root
    node_base = jnp.full((B, L), root_base, dtype=jnp.int32)
    answer = jnp.full((B, L), -1, dtype=jnp.int32)  # inherit[root] == -1
    dead_c = jnp.int32(dead)

    def step(node, node_base, answer, prev, prev_base):
        cand = prev_base + syms
        trip = walk_tab[cand]  # (B, L, 3)
        ok = trip[..., 0] == prev
        node = jnp.where(ok, cand, dead_c)
        node_base = jnp.where(ok, trip[..., 1], 0)  # base[dead] == 0
        answer = jnp.where(ok, trip[..., 2], answer)
        return node, node_base, answer

    # k = 1: every position transitions from the root
    node, node_base, answer = step(node, node_base, answer, node, node_base)
    remaining = max_len - 1

    def advance(node, node_base, answer):
        prev = jnp.pad(node[:, :-1], ((0, 0), (1, 0)),
                       constant_values=dead)
        prev_base = jnp.pad(node_base[:, :-1], ((0, 0), (1, 0)),
                            constant_values=0)
        return step(node, node_base, answer, prev, prev_base)

    if remaining > 0 and remaining <= MATCH_UNROLL_MAX:
        for _ in range(remaining):
            node, node_base, answer = advance(node, node_base, answer)
    elif remaining > 0:
        def body(carry, _):
            return advance(*carry), None

        (node, node_base, answer), _ = jax.lax.scan(
            body, (node, node_base, answer), None, length=remaining
        )
    return answer


def build_walk_tab(base, check, inherit):
    """Stack dead-extended (check, base, inherit) into the (n_slots, 3)
    row table :func:`match_longest_fused` gathers; returns
    (walk_tab, dead_id, root_base)."""
    import numpy as np

    base, check, inherit, dead = extend_tables_with_dead(
        base, check, inherit
    )
    walk_tab = np.stack(
        [check.astype(np.int32), base.astype(np.int32),
         inherit.astype(np.int32)], axis=1,
    )
    return walk_tab, dead, int(base[0])


def extend_tables_with_dead(base, check, inherit):
    """Append the DEAD sink slot to packed double-array tables (numpy,
    host side). Returns (base, check, inherit, dead_id).

    The dead slot's base is 0, so its candidate transitions land on slots
    1..n_symbols whose check values are real parents (< dead_id) or -1 —
    never dead_id — making deadness self-propagating in table space.
    """
    import numpy as np

    dead = len(base)
    base = np.concatenate([base, np.zeros(1, dtype=base.dtype)])
    check = np.concatenate([check, np.full(1, -3, dtype=check.dtype)])
    inherit = np.concatenate([inherit, np.full(1, -1, dtype=inherit.dtype)])
    return base, check, inherit, dead
