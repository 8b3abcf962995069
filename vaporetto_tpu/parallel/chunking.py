"""Halo-overlap chunking for long sequences.

The reference streams arbitrarily long lines in O(n) on CPU
(char_scorer/boundary_scorer.rs:91-113). On TPU, fixed shapes matter, and
boundary scoring is strictly *local*: a gap's score depends only on
characters within the influence radius

    R = max(longest pattern, |min offset|, max offset + 8 * max chunks)

(SURVEY.md §5 "long-context" row). So a long line can be split into
fixed-size chunks with R-char halos on both sides; each chunk's central gap
scores are then exactly equal to the whole-line computation — no ring
attention or sequential dependency, just overlap. The chunks batch over the
existing (B, L) pipeline (and therefore also shard over the device mesh).
"""

from __future__ import annotations

from typing import List

import numpy as np

__all__ = ["influence_radius", "predict_long"]


def influence_radius(compiled) -> int:
    """Character radius beyond which a position cannot affect a gap score."""
    r = 1
    for m in (compiled.char_matcher, compiled.type_matcher):
        if m is None:
            continue
        r = max(r, m.max_len)
        if len(m.off):
            r = max(r, int(-m.off.min()), int(m.off.max()) + 8)
    if compiled.type_cache_table is not None:
        r = max(r, compiled.type_window_size + 1)
    return r


def predict_long(predictor, sentence, chunk_size: int = 4096,
                 predict_fn=None) -> None:
    """Predict a long sentence via halo-overlap chunks, exactly.

    Produces identical boundary scores / boundaries / match states to a
    whole-line prediction (verified by tests), while keeping device shapes
    fixed at ``chunk_size + 2R``.

    ``predict_fn``: optional ``(B, L) -> fn`` factory overriding the
    predictor's jit cache — the sharded data-parallel path passes
    ``lambda B, L: sharded_fn`` so the chunk batch itself shards over the
    device mesh (chunk count must then divide by the mesh size).
    """
    from ..sentence import Sentence
    from ..utils.batch import tensorize

    n = len(sentence)
    compiled = predictor.compiled
    R = influence_radius(compiled)
    C = chunk_size
    if n <= C + 2 * R:
        predictor.predict_batch([sentence])
        return

    starts = list(range(0, n, C))
    # build overlapping windows [s - R, s + C + R)
    rows = []
    spans = []  # (local_offset, global_start, n_central)
    for s in starts:
        lo = max(0, s - R)
        hi = min(n, s + C + R)
        rows.append((lo, hi))
        spans.append((s - lo, s, min(C, n - s)))
    L = max(hi - lo for lo, hi in rows)

    cps = np.zeros((len(rows), L), dtype=np.int32)
    cts = np.zeros((len(rows), L), dtype=np.int32)
    lengths = np.zeros(len(rows), dtype=np.int32)
    for i, (lo, hi) in enumerate(rows):
        cps[i, : hi - lo] = sentence.codepoints[lo:hi]
        cts[i, : hi - lo] = sentence.char_types[lo:hi]
        lengths[i] = hi - lo

    fn = (
        predict_fn(len(rows), L)
        if predict_fn is not None
        else predictor._predict_fn(len(rows), L)
    )
    scores, char_match, type_match = fn(cps, cts, lengths)
    scores = np.asarray(scores)
    char_match = np.asarray(char_match) if char_match is not None else None
    type_match = np.asarray(type_match) if type_match is not None else None

    pad = compiled.pad_left
    full_scores = np.full(pad + max(n - 1, 0) + 1, compiled.bias, dtype=np.int32)
    if char_match is not None:
        full_char = np.full(n, -1, dtype=np.int32)
    if type_match is not None:
        full_type = np.full(n, -1, dtype=np.int32)
    for i, (local_off, g_start, n_central) in enumerate(spans):
        # central gaps of this chunk: global gaps g_start .. g_start+n_central-1
        # (gap g sits between chars g and g+1); the last chunk also owns the
        # final gap region up to n-1
        g_lo = g_start
        g_hi = min(g_start + n_central, n - 1)
        local_g_lo = local_off + (g_lo - g_start)
        count = g_hi - g_lo
        if count > 0:
            full_scores[pad + g_lo : pad + g_hi] = scores[
                i, pad + local_g_lo : pad + local_g_lo + count
            ]
        if char_match is not None:
            full_char[g_start : g_start + n_central] = char_match[
                i, local_off : local_off + n_central
            ]
        if type_match is not None:
            full_type[g_start : g_start + n_central] = type_match[
                i, local_off : local_off + n_central
            ]

    sentence.score_padding = pad
    sentence.boundary_scores = full_scores
    exposed = full_scores[pad : pad + n - 1]
    sentence.boundaries = (exposed > 0).astype(np.uint8)
    if char_match is not None:
        sentence.char_pma_states = full_char
    if type_match is not None:
        sentence.type_pma_states = full_type
    sentence.set_predictor(predictor)
