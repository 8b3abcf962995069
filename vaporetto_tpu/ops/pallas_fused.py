"""Fused Pallas boundary-scoring kernel.

One kernel performs the whole per-chip hot path — projection, windowed trie
matching, weight gather + shifted accumulation, type-window scoring — with
every model table pinned in VMEM and the text streamed through in batch
tiles. This removes the HBM round-trips between the XLA ops and keeps the
gather tables on-chip (the XLA path re-fetches them per op).

Applicability: models whose tables fit the VMEM budget (symbol table +
trie + weights + type cache ~< 8 MB). The predictor falls back to the
unfused XLA path otherwise. Semantics are identical (int32, same padding
scheme); tests compare against both the XLA path and the numpy oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_available", "build_fused_fn", "VMEM_TABLE_BUDGET"]

VMEM_TABLE_BUDGET = 8 * 1024 * 1024  # bytes for all tables combined
DEFAULT_TILE_B = 8


def _table_bytes(compiled) -> int:
    total = 0
    if compiled.char_sym_table is not None:
        total += compiled.char_sym_table.nbytes
    for m in (compiled.char_matcher, compiled.type_matcher):
        if m is not None:
            total += m.base.nbytes + m.check.nbytes + m.inherit.nbytes
            total += m.rows_first.nbytes + m.rows_cnt.nbytes
            total += m.w8.nbytes + m.off.nbytes
    if compiled.type_cache_table is not None:
        total += compiled.type_cache_table.nbytes
    return total


def fused_available(compiled) -> bool:
    return _table_bytes(compiled) <= VMEM_TABLE_BUDGET


def _match_longest_val(syms, base, check, inherit, max_len, n_slots):
    """Same recurrence as ops.match.match_longest, on in-kernel values."""
    B, L = syms.shape
    node = jnp.zeros((B, L), dtype=jnp.int32)
    deepest = jnp.zeros((B, L), dtype=jnp.int32)
    sym_ok = syms > 0
    for k in range(1, max_len + 1):
        if k == 1:
            prev = node
        else:
            prev = jnp.pad(node[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
        alive = prev >= 0
        safe_prev = jnp.where(alive, prev, 0)
        cand = jnp.clip(base[safe_prev] + syms, 0, n_slots - 1)
        ok = alive & sym_ok & (check[cand] == safe_prev)
        node = jnp.where(ok, cand, -1)
        deepest = jnp.where(ok, cand, deepest)
    return inherit[deepest]


def _shift_add_val(match, rf, rc, w8, off, chunk_plan, scores, pad_left,
                   max_chunks, L):
    valid_m = match >= 0
    safe_m = jnp.where(valid_m, match, 0)
    first = rf[safe_m]
    cnt = rc[safe_m]
    for c in range(max_chunks):
        if not chunk_plan[c]:
            continue
        valid = valid_m & (c < cnt)
        row = jnp.where(valid, first + c, 0)
        w = jnp.where(valid[..., None], w8[row], 0)
        off_row = off[row]
        for d in chunk_plan[c]:
            wd = jnp.where((off_row == d)[..., None], w, 0)
            for j in range(8):
                start = pad_left + d + j
                scores = jax.lax.dynamic_update_slice(
                    scores,
                    jax.lax.dynamic_slice(
                        scores, (0, start), (scores.shape[0], L)
                    )
                    + wd[:, :, j],
                    (0, start),
                )
    return scores


def _type_cache_val(cts, lengths_col, table, window, scores, pad_left, L):
    B = cts.shape[0]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    ct = jnp.where(t_idx < lengths_col, cts, 0)
    seqid = jnp.zeros((B, L), dtype=jnp.int32)
    for k in range(2 * window):
        shift = k - (window - 1)
        if shift <= 0:
            sl = jnp.pad(
                ct[:, : L + shift] if shift < 0 else ct,
                ((0, 0), (-shift, 0)),
            )
        else:
            sl = jnp.pad(ct[:, shift:], ((0, 0), (0, shift)))
        seqid = (seqid << 3) | sl
    gap_scores = jnp.where(
        t_idx < lengths_col - 1, table[seqid], 0
    )
    return jax.lax.dynamic_update_slice(
        scores,
        jax.lax.dynamic_slice(scores, (0, pad_left), (B, L)) + gap_scores,
        (0, pad_left),
    )


def build_fused_fn(compiled, B: int, L: int, *, interpret: bool = False,
                   tile_b: int = DEFAULT_TILE_B):
    """Build a fused (cps, cts, lengths) -> (scores, char_match, type_match)
    function for static (B, L), or None if the configuration is unsupported.
    """
    c = compiled
    if not fused_available(c):
        return None
    if B % tile_b != 0:
        tile_b = 1
    pad_left, pad_right = c.pad_left, c.pad_right
    S = pad_left + (L - 1) + pad_right
    has_char = c.char_matcher is not None
    has_tcache = c.type_cache_table is not None
    has_ttrie = c.type_matcher is not None
    from .score import plan_chunk_offsets

    char_off = (
        plan_chunk_offsets(c.char_matcher.off, c.char_matcher.rows_first,
                           c.char_matcher.rows_cnt, c.char_matcher.max_chunks)
        if has_char else []
    )
    type_off = (
        plan_chunk_offsets(c.type_matcher.off, c.type_matcher.rows_first,
                           c.type_matcher.rows_cnt, c.type_matcher.max_chunks)
        if has_ttrie else []
    )

    tables = []
    if has_char:
        m = c.char_matcher
        tables += [c.char_sym_table, m.base, m.check, m.inherit,
                   m.rows_first, m.rows_cnt, m.w8, m.off]
    if has_tcache:
        tables.append(c.type_cache_table)
    if has_ttrie:
        m = c.type_matcher
        tables += [m.base, m.check, m.inherit, m.rows_first, m.rows_cnt,
                   m.w8, m.off]
    tables = [np.asarray(t, dtype=np.int32) for t in tables]

    def kernel(cps_ref, cts_ref, len_ref, *refs):
        table_refs = refs[:-3]
        scores_ref, char_match_ref, type_match_ref = refs[-3:]
        it = iter(table_refs)
        cps = cps_ref[:]
        cts = cts_ref[:]
        lengths_col = len_ref[:].reshape(-1, 1)
        scores = jnp.full((tile_b, S), c.bias, dtype=jnp.int32)
        if has_char:
            sym_tab = next(it)[:]
            base = next(it)[:]
            check = next(it)[:]
            value = next(it)[:]
            rf = next(it)[:]
            rc = next(it)[:]
            w8 = next(it)[:]
            off = next(it)[:]
            syms = sym_tab[cps]
            cm = _match_longest_val(
                syms, base, check, value, c.char_matcher.max_len,
                base.shape[0],
            )
            scores = _shift_add_val(
                cm, rf, rc, w8, off, char_off, scores, pad_left,
                c.char_matcher.max_chunks, L,
            )
            char_match_ref[:] = cm
        if has_tcache:
            tcache = next(it)[:]
            scores = _type_cache_val(
                cts, lengths_col, tcache, c.type_window_size, scores,
                pad_left, L,
            )
        if has_ttrie:
            base = next(it)[:]
            check = next(it)[:]
            value = next(it)[:]
            rf = next(it)[:]
            rc = next(it)[:]
            w8 = next(it)[:]
            off = next(it)[:]
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (tile_b, L), 1)
            syms = jnp.where(t_idx < lengths_col, cts, 0)
            tm = _match_longest_val(
                syms, base, check, value, c.type_matcher.max_len,
                base.shape[0],
            )
            scores = _shift_add_val(
                tm, rf, rc, w8, off, type_off, scores, pad_left,
                c.type_matcher.max_chunks, L,
            )
            type_match_ref[:] = tm
        scores_ref[:] = scores

    grid = (B // tile_b,)
    tile_spec = pl.BlockSpec((tile_b, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((tile_b,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    table_specs = [
        pl.BlockSpec(
            t.shape,
            (lambda i, _n=t.ndim: (0,) * _n),
            memory_space=pltpu.VMEM,
        )
        for t in tables
    ]
    out_shapes = (
        jax.ShapeDtypeStruct((B, S), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec((tile_b, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec, tile_spec, vec_spec] + table_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )
    dev_tables = [jnp.asarray(t) for t in tables]

    def fn(cps, cts, lengths):
        scores, cm, tm = call(
            cps.astype(jnp.int32), cts.astype(jnp.int32),
            lengths.astype(jnp.int32), *dev_tables,
        )
        return (
            scores,
            cm if has_char else None,
            tm if has_ttrie else None,
        )

    return fn
