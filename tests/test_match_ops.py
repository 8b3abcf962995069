"""Device matcher op equivalence: the production single-gather fused
walk (match_longest_fused) against the reference masked walk
(match_longest) on randomized tries — the masked variant mirrors the
textbook double-array transition with explicit alive/OOV guards, so
agreement pins the fused walk's dead-sink/guard invariants
(ops/match.py; reference semantics char_scorer/boundary_scorer.rs:91-113).
"""

import numpy as np
import pytest

import jax

from vaporetto_tpu.compile.trie import build_trie
from vaporetto_tpu.ops.match import (
    build_walk_tab,
    hash_project,
    hash_project_fused,
    match_longest,
    match_longest_fused,
)


def _random_patterns(rng, n_pat, n_sym, max_len):
    pats = set()
    while len(pats) < n_pat:
        k = int(rng.integers(1, max_len + 1))
        pats.add(tuple(int(x) for x in rng.integers(1, n_sym + 1, k)))
    return sorted(pats)


@pytest.mark.parametrize("seed,n_pat,n_sym,max_len", [
    (0, 20, 5, 4),
    (1, 200, 12, 7),
    (2, 1000, 30, 9),
    (3, 3, 3, 1),
])
def test_fused_walk_matches_masked_walk(seed, n_pat, n_sym, max_len):
    rng = np.random.default_rng(seed)
    pats = _random_patterns(rng, n_pat, n_sym, max_len)
    trie = build_trie(pats, n_sym)
    B, L = 4, 64
    # symbols incl. OOV (0) and out-of-range-but-valid ids
    syms = rng.integers(0, n_sym + 1, (B, L)).astype(np.int32)
    ref = np.asarray(
        jax.jit(match_longest, static_argnames=("max_len", "dead"))(
            syms, trie.base, trie.check, trie.inherit, trie.max_len
        )
    )
    walk_tab, dead, root_base = build_walk_tab(
        trie.base, trie.check, trie.inherit
    )
    got = np.asarray(
        jax.jit(
            match_longest_fused,
            static_argnames=("max_len", "dead", "root_base"),
        )(syms, walk_tab, trie.max_len, dead, root_base)
    )
    assert (got == ref).all()


def test_hash_project_fused_matches_two_gather():
    from vaporetto_tpu.compile.compiler import _build_char_hash

    rng = np.random.default_rng(7)
    cps_model = np.unique(rng.integers(1, 70000, 500))
    ids = np.arange(1, len(cps_model) + 1, dtype=np.int32)
    mul, shift, keys, hsyms = _build_char_hash(
        cps_model.astype(np.int64), ids
    )
    cps = rng.integers(0, 70000, (3, 128)).astype(np.int32)
    ref = np.asarray(hash_project(cps, mul, shift, keys, hsyms))
    tab2 = np.stack([keys, hsyms], axis=1).astype(np.int32)
    got = np.asarray(hash_project_fused(cps, mul, shift, tab2))
    assert (got == ref).all()
