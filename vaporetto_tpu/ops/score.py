"""Device-side boundary scoring.

The reference's per-match scatter loops (predictor.rs:176-213, fixed 8-lane
adds) become one batched gather + scatter-add: every text position gathers
its matched pattern's (offset, weights[8*MAXC]) rows and accumulates them
into the padded per-gap score buffer. All arithmetic is int32, matching the
reference exactly (wrapping add semantics included).

Padding scheme: the reference pads scores by ``WEIGHT_FIXED_LEN-1 = 7`` on
both sides so fixed-8 adds never go out of bounds (predictor.rs:519-524),
and clips variable-length adds at the left edge (predictor.rs:181-190). We
instead size the padding from the model (max |offset| and max row reach) so
*every* add is in bounds; out-of-sentence contributions land in the padding
and are discarded — numerically identical to the reference's clipping.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["scatter_add_scores", "shift_add_scores", "type_cache_scores",
           "wide_add_scores", "build_wide_rows", "wide_offset_span"]

#: widened-row scoring is used when every pattern's weight span (all its
#: 8-lane chunks, anchored at the matcher's minimum offset) fits within
#: this many slots ...
WIDE_MAX_W = 32
#: ... and the widened table stays under this many bytes
WIDE_MAX_BYTES = 128 * 1024 * 1024


def wide_offset_span(matcher_np):
    """(base_offset, row_width) of the widened scoring table for this
    matcher, or None when the widened path does not apply (offset spread
    or chunk counts produce rows wider than WIDE_MAX_W, or the table
    would be oversized)."""
    rc = matcher_np.rows_cnt
    sel = rc > 0
    if not sel.any():
        return None
    d0 = int(matcher_np.off[matcher_np.rows_first[sel]].min())
    W = int(matcher_np.off.max()) + 8 - d0  # every chunk c sits at b + 8c
    if W > WIDE_MAX_W:
        return None
    if (len(rc) + 1) * W * 4 > WIDE_MAX_BYTES:
        return None
    return d0, W


def build_wide_rows(matcher_np):
    """Pre-shift every pattern's weight chunks into one (n_ids + 1, W)
    row anchored at the matcher's minimum offset.

    Scoring then needs NO per-offset masking and NO chunk loop: one
    gather + W shifted adds, with the trailing all-zero row serving as
    the no-match target (index n_ids). Returns (w_wide, d0) or None
    (see :func:`wide_offset_span`). Identical arithmetic to the
    per-offset formulation — int32 adds merely reassociated.
    """
    meta = wide_offset_span(matcher_np)
    if meta is None:
        return None
    d0, W = meta
    n_ids = len(matcher_np.rows_cnt)
    w_wide = np.zeros((n_ids + 1, W), dtype=np.int32)
    # id owning each weight row; chunks of one id land in disjoint
    # columns (offsets step by 8), so plain fancy assignment suffices
    id_of_row = np.repeat(
        np.arange(n_ids, dtype=np.int64), matcher_np.rows_cnt
    )
    n_rows = len(id_of_row)
    cols = (matcher_np.off[:n_rows] - d0)[:, None] + np.arange(8)[None, :]
    w_wide[id_of_row[:, None], cols] = matcher_np.w8[:n_rows]
    return w_wide, d0


def wide_add_scores(
    match: jax.Array,  # (B, L) int32 pattern id or -1
    w_wide: jax.Array,  # (n_ids + 1, W) int32 pre-shifted weight rows
    d0: int,  # common base offset of every row
    scores: jax.Array,  # (B, S) int32 padded score buffer
    pad_left: int,
) -> jax.Array:
    """Widened-row scoring: ``scores[b, t + pad_left + d0 + j] +=
    w_wide[match, j]``; the -1 no-match id maps to the all-zero row.

    Formulated as ONE pad-and-sum expression instead of W in-place
    ``.at[slice].add`` updates: each dynamic-update-slice compiled to
    its own TPU kernel plus a bounds-check scalar (~2 kernels x W ==
    most of the bundled model's pipeline time under the per-kernel cost
    model, PERF.md round-4/5 findings), while the padded adds fuse into
    a single elementwise kernel. Same int32 arithmetic, reassociated.
    """
    B, L = match.shape
    S = scores.shape[1]
    n_zero = w_wide.shape[0] - 1
    W = w_wide.shape[1]
    row = jnp.where(match >= 0, match, n_zero)
    w = w_wide[row]  # (B, L, W)
    total = None
    for j in range(W):
        start = pad_left + d0 + j
        term = jnp.pad(w[:, :, j], ((0, 0), (start, S - start - L)))
        total = term if total is None else total + term
    return scores + total

#: above this many unrolled slice-add terms, the scatter formulation wins:
#: its trace is max_chunks scatter ops instead of a long slice-add unroll
#: (XLA compile time is roughly linear in trace size — ~35 eqns/s on the
#: CPU backend — while each scatter compiles in well under a second). Long
#: dictionary words (the reference allows up to 32 767 chars,
#: char_scorer/boundary_scorer.rs:67-74) hit this: a single 1000-char word
#: contributes 126 chunk terms on its own.
SHIFT_ADD_MAX_TERMS = 512


def plan_chunk_offsets(
    off_np: np.ndarray,
    rows_first_np: np.ndarray,
    rows_cnt_np: np.ndarray,
    max_chunks: int,
):
    """Per chunk index c, the distinct offsets occurring among rows that are
    the c-th chunk of some pattern. Chunk c of a pattern with base offset b
    always sits at ``b + 8c``, so ``sum_c len(plan[c])`` is bounded by the
    total chunk count over distinct base offsets — linear in the model's
    weight footprint, unlike the naive chunks x all-offsets cross product.
    """
    plan = []
    for c in range(max_chunks):
        sel = rows_first_np[rows_cnt_np > c] + c
        plan.append(sorted(int(d) for d in np.unique(off_np[sel]))
                    if len(sel) else [])
    return plan


def shift_add_scores(
    match: jax.Array,  # (B, L) int32 pattern id or -1
    rows_first: jax.Array,  # (n_ids,) int32 first weight-row of each id
    rows_cnt: jax.Array,  # (n_ids,) int32 number of 8-wide rows
    w8: jax.Array,  # (n_rows, 8) int32 weight chunks
    off: jax.Array,  # (n_rows,) int32 chunk offsets (device copy)
    matcher_np,  # host CompiledMatcher (static row metadata for tracing)
    scores: jax.Array,  # (B, S) int32 padded score buffer (bias-initialized)
    pad_left: int,
    max_chunks: int,
) -> jax.Array:
    """Scatter-free scoring: per distinct offset, a masked shifted add.

    TPU scatters are slow to compile and run; but a model has only a handful
    of distinct weight offsets (one per n-gram window plus one per dictionary
    word length). For each static offset ``d`` the contribution of every
    position ``t`` lands at ``t + pad_left + d + j`` — a *static* slice of
    the score buffer — so the whole scoring pass becomes masked vector adds
    that XLA fuses into a few elementwise kernels. Numerically identical to
    :func:`scatter_add_scores`, which very-long-word models (large unroll)
    automatically fall back to.
    """
    B, L = match.shape
    plan = plan_chunk_offsets(
        matcher_np.off, matcher_np.rows_first, matcher_np.rows_cnt,
        max_chunks,
    )
    n_terms = 8 * sum(len(p) for p in plan)
    if n_terms > SHIFT_ADD_MAX_TERMS:
        return scatter_add_scores(
            match, rows_first, rows_cnt, w8, off, scores, pad_left,
            max_chunks,
        )
    valid_m = match >= 0
    safe_m = jnp.where(valid_m, match, 0)
    first = rows_first[safe_m]
    cnt = rows_cnt[safe_m]
    for c in range(max_chunks):
        distinct = plan[c]
        if not distinct:
            continue
        valid = valid_m & (c < cnt)
        row = jnp.where(valid, first + c, 0)
        w = jnp.where(valid[..., None], w8[row], 0)  # (B, L, 8)
        off_row = off[row]  # (B, L)
        for d in distinct:
            if len(distinct) == 1:
                wd = w  # all rows at this chunk share the offset
            else:
                wd = jnp.where((off_row == d)[..., None], w, 0)
            for j in range(8):
                start = pad_left + d + j
                scores = scores.at[:, start : start + L].add(wd[:, :, j])
    return scores


def scatter_add_scores(
    match: jax.Array,  # (B, L) int32 pattern id or -1
    rows_first: jax.Array,  # (n_ids,) int32 first weight-row of each id
    rows_cnt: jax.Array,  # (n_ids,) int32 number of 8-wide rows
    w8: jax.Array,  # (n_rows, 8) int32 weight chunks
    off: jax.Array,  # (n_rows,) int32 chunk offset relative to match end gap
    scores: jax.Array,  # (B, S) int32 padded score buffer (bias-initialized)
    pad_left: int,
    max_chunks: int,
) -> jax.Array:
    """Accumulate matched weights: scores[b, t + pad_left + off + j] += w8[.., j].

    ``t + pad_left + off`` derives from the reference's
    ``end + score_padding - 1 + offset`` with ``end = t+1``
    (char_scorer/boundary_scorer.rs:108-111).

    The chunk loop runs under ``lax.scan`` so the trace holds exactly ONE
    scatter op regardless of ``max_chunks`` — a 1000-char dictionary word
    has 126 chunks, and an unrolled chain of 126 scatters takes XLA many
    minutes to compile.
    """
    B, L = match.shape
    valid_m = match >= 0
    safe_m = jnp.where(valid_m, match, 0)
    first = rows_first[safe_m]
    cnt = rows_cnt[safe_m]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    iota8 = jnp.arange(8, dtype=jnp.int32)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L, 8), 0)

    def body(acc, c):
        valid = valid_m & (c < cnt)
        row = jnp.where(valid, first + c, 0)
        w = jnp.where(valid[..., None], w8[row], 0)
        pos = jnp.where(valid, t_idx + pad_left + off[row], 0)  # (B, L)
        idx = pos[..., None] + iota8  # (B, L, 8); in-bounds by construction
        return acc.at[b_idx, idx].add(w), None

    scores, _ = jax.lax.scan(
        body, scores, jnp.arange(max_chunks, dtype=jnp.int32)
    )
    return scores


def type_pos_scores(
    char_types: jax.Array,  # (B, L) int32 type codes 1..6, 0 = padding
    lengths: jax.Array,  # (B,) int32 true sentence lengths
    tables: jax.Array,  # (2w, 8**M) int32 per-start-offset tables
    window_size: int,
    m_sym: int,  # symbols per code (M)
    scores: jax.Array,  # (B, S) int32 padded score buffer
    pad_left: int,
) -> jax.Array:
    """Type scoring via per-start-offset small tables.

    Same scores as :func:`type_cache_scores` (see the compiler's
    decomposition _build_type_pos_tables) but every gather hits a table of
    8^M entries (2-16 KB) instead of one 8^(2w) monster — the large-table
    gather is the TPU bottleneck.
    """
    B, L = char_types.shape
    w = window_size
    seq = 2 * w
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    ct = jnp.where(t_idx < lengths[:, None], char_types.astype(jnp.int32), 0)

    def shifted(shift):
        if shift <= 0:
            return jnp.pad(
                ct[:, : L + shift] if shift < 0 else ct,
                ((0, 0), (-shift, 0)),
                constant_values=0,
            )
        return jnp.pad(ct[:, shift:], ((0, 0), (0, shift)), constant_values=0)

    # window position x corresponds to char index gap_i + (x - (w - 1))
    shifts = {x: shifted(x - (w - 1)) for x in range(seq + m_sym - 1)}
    gap_scores = jnp.zeros((B, L), dtype=jnp.int32)
    for j in range(seq):
        code = jnp.zeros((B, L), dtype=jnp.int32)
        for m in range(m_sym):
            code = (code << 3) | shifts[j + m]
        gap_scores = gap_scores + tables[j][code]
    gap_ok = t_idx < (lengths[:, None] - 1)
    gap_scores = jnp.where(gap_ok, gap_scores, 0)
    S = scores.shape[1]
    return scores + jnp.pad(
        gap_scores, ((0, 0), (pad_left, S - pad_left - L))
    )


def type_cache_scores(
    char_types: jax.Array,  # (B, L) int32 type codes 1..6, 0 = padding
    lengths: jax.Array,  # (B,) int32 true sentence lengths
    table: jax.Array,  # (8**(2w),) int32 precomputed window scores
    window_size: int,
    scores: jax.Array,  # (B, S) int32 padded score buffer
    pad_left: int,
) -> jax.Array:
    """Type scoring via the precomputed window table.

    Mirrors the rolling 3-bit sequence-id scan of the reference
    (type_scorer/boundary_scorer_cache.rs:58-110) but computes every gap's
    sequence id directly (it only depends on the 2w surrounding chars), so
    the whole pass is a shift/or reduction plus one gather — no recurrence.

    Gap i (between chars i and i+1) sees chars ``i-w+1 .. i+w``; positions
    outside the sentence contribute symbol 0, exactly like
    ``increment_seqid_without_char``.
    """
    B, L = char_types.shape
    w = window_size
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    ct = jnp.where(t_idx < lengths[:, None], char_types.astype(jnp.int32), 0)
    seqid = jnp.zeros((B, L), dtype=jnp.int32)
    for k in range(2 * w):
        shift = k - (w - 1)  # char index j = gap index i + shift
        if shift <= 0:
            sl = jnp.pad(
                ct[:, : L + shift] if shift < 0 else ct,
                ((0, 0), (-shift, 0)),
                constant_values=0,
            )
        else:
            sl = jnp.pad(ct[:, shift:], ((0, 0), (0, shift)), constant_values=0)
        seqid = (seqid << 3) | sl
    if table.ndim == 2:
        # (P, 2) row form accepted for compatibility; measured SLOWER
        # than the 1-D gather for this 8^6-entry table (unlike the
        # small hash-matcher tables, ops/hashmatch.py), so the shipped
        # table stays 1-D
        gap_scores = table[seqid][..., 0]
    else:
        gap_scores = table[seqid]  # (B, L)
    gap_ok = t_idx < (lengths[:, None] - 1)
    gap_scores = jnp.where(gap_ok, gap_scores, 0)
    # pad_right >= 1 is guaranteed by the compiler, so this is in bounds;
    # pad-and-add fuses where .at[slice].add compiled to its own
    # dynamic-update-slice kernel (see wide_add_scores)
    S = scores.shape[1]
    return scores + jnp.pad(
        gap_scores, ((0, 0), (pad_left, S - pad_left - L))
    )


def type_split_scores(
    char_types: jax.Array,  # (B, L) int32 type codes 1..6, 0 = padding
    lengths: jax.Array,  # (B,) int32 true sentence lengths
    tl: jax.Array,  # (8**w,) int32 left-half table
    tm: jax.Array,  # (8**(2*maxn-2),) int32 crossing table
    tr: jax.Array,  # (8**w,) int32 right-half table
    window_size: int,
    maxn: int,
    scores: jax.Array,  # (B, S) int32 padded score buffer
    pad_left: int,
) -> jax.Array:
    """Type scoring via the left/mid/right split of the cache table
    (compiler._build_type_split_tables): three SMALL-table gathers
    instead of one 8^(2w) gather — numerically identical to
    :func:`type_cache_scores`."""
    B, L = char_types.shape
    w = window_size
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    ct = jnp.where(t_idx < lengths[:, None], char_types.astype(jnp.int32), 0)

    def shifted(shift):
        if shift <= 0:
            return jnp.pad(
                ct[:, : L + shift] if shift < 0 else ct,
                ((0, 0), (-shift, 0)),
                constant_values=0,
            )
        return jnp.pad(ct[:, shift:], ((0, 0), (0, shift)),
                       constant_values=0)

    # window position x holds char index gap_i + (x - (w - 1))
    def code(positions):
        c = jnp.zeros((B, L), dtype=jnp.int32)
        for x in positions:
            c = (c << 3) | shifted(x - (w - 1))
        return c

    gap_scores = (
        tl[code(range(0, w))]
        + tm[code(range(w - maxn + 1, w + maxn - 1))]
        + tr[code(range(w, 2 * w))]
    )
    gap_ok = t_idx < (lengths[:, None] - 1)
    gap_scores = jnp.where(gap_ok, gap_scores, 0)
    S = scores.shape[1]
    return scores + jnp.pad(
        gap_scores, ((0, 0), (pad_left, S - pad_left - L))
    )
