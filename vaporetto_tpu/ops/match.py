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
) -> jax.Array:
    """Return (B, L) int32: longest pattern id ending at each position, -1 if none.

    Equivalent to the reference's ``find_overlapping_no_suffix_iter`` match
    stream: at most one (the longest) pattern per end position.

    Only the *deepest alive* trie node per position is tracked (2 gathers
    per window length); the final answer is one ``inherit`` gather: every
    pattern ending at position t is a suffix of the deepest alive window, so
    the longest one is exactly that node's resolved Aho-Corasick output.
    """
    B, L = syms.shape
    node = jnp.zeros((B, L), dtype=jnp.int32)  # window length 0 -> root
    deepest = jnp.zeros((B, L), dtype=jnp.int32)
    n_slots = base.shape[0]
    sym_ok = syms > 0

    def step(node, deepest, prev):
        alive = prev >= 0
        safe_prev = jnp.where(alive, prev, 0)
        cand = base[safe_prev] + syms
        # guard region in the tables makes cand in-bounds for valid nodes;
        # clip for dead lanes
        cand = jnp.clip(cand, 0, n_slots - 1)
        ok = alive & sym_ok & (check[cand] == safe_prev)
        node = jnp.where(ok, cand, -1)
        deepest = jnp.where(ok, cand, deepest)
        return node, deepest

    # k = 1: the empty window ends everywhere, incl. position 0
    node, deepest = step(node, deepest, node)
    remaining = max_len - 1
    if remaining > 0 and remaining <= MATCH_UNROLL_MAX:
        for _ in range(remaining):
            prev = jnp.pad(node[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
            node, deepest = step(node, deepest, prev)
    elif remaining > 0:
        # very long patterns (dictionary words up to 32 767 chars,
        # char_scorer/boundary_scorer.rs:67-74): run the window walk under
        # lax.scan so the trace stays O(1) in max_len
        def body(carry, _):
            node, deepest = carry
            prev = jnp.pad(node[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
            return step(node, deepest, prev), None

        (node, deepest), _ = jax.lax.scan(
            body, (node, deepest), None, length=remaining
        )
    return inherit[deepest]  # inherit[root] == -1
