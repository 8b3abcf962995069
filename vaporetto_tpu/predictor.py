"""Predictor — the inference runtime.

TPU-native counterpart of the reference predictor (predictor.rs:433-664).
The hot path is a single jitted function over padded ``(B, L)`` batches:

    project codepoints -> symbols        (gather)
    char trie windowed match             (max_len x 3 gathers)
    char weight gather + scatter-add     (int32)
    type cache gather OR type trie match (+ scatter-add)
    threshold > 0 -> boundaries

Integer semantics (i32, wrapping) match the reference exactly; the
conformance tests assert identical ``--scores`` output.

Tag prediction (predictor.rs:546-637) consumes the cached per-position
match-id tensors (the analogue of ``char_pma_states``/``type_pma_states``)
host-side per recognized token.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .compile.compiler import CompiledModel, compile_model
from .models.model import Model
from .sentence import Sentence
from .utils.batch import tensorize

__all__ = ["Predictor"]


class Predictor:
    """Compiles a model at load time and runs boundary + tag inference."""

    # class-level defaults keep instances built via ``__new__`` (tests,
    # deserializers) on the device path
    backend = "device"
    _host_predictor = False

    def __init__(self, model: Model, predict_tags: bool = False,
                 compiled: Optional[CompiledModel] = None,
                 backend: str = "device"):
        """``backend``: ``"device"`` (default) runs the jitted TPU pipeline;
        ``"host"`` runs the native C++ evaluator over the same compiled
        tables (native/host_predictor.cc) — bit-identical results with
        microsecond per-sentence latency, for small-batch/interactive
        serving where device dispatch latency dominates. Falls back to the
        device path when the native library is unavailable.
        """
        self.compiled = compiled if compiled is not None else compile_model(
            model, predict_tags
        )
        if backend not in ("device", "host"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self.predict_tags_enabled = predict_tags
        self._store_tag_scores = False
        self._device_tables = None
        self._host_predictor = False  # False = not built yet; None = no lib
        self._jit_cache: Dict[Tuple[int, int], object] = {}

    # ------------------------------------------------------------------
    # device plumbing
    # ------------------------------------------------------------------

    def _tables(self):
        if self._device_tables is None:
            from .utils.jaxcfg import ensure_compilation_cache

            ensure_compilation_cache()
            import jax.numpy as jnp

            c = self.compiled
            t = {}
            import os

            # Profiling on the TPU (round 4) showed each gather runs as
            # its own fused kernel with cost tiered by table size: small
            # tables are ~4x cheaper per gather than 64 Ki+ tables. The
            # projection therefore always rides the collision-free hash
            # (a few-KB (P, 2) table, one gather) rather than a dense
            # 64 Ki/1 Mi-entry table.
            use_small_tables = (
                os.environ.get("VAPORETTO_TPU_SMALL_TABLES") == "1"
            )
            from .ops.hashmatch import hash_match_for
            from .ops.match import build_walk_tab
            from .ops.score import build_wide_rows

            # exact-hash matcher (round 5): the whole windowed walk in
            # ONE gather; the walk tables stay as the fallback for
            # models the hash build cannot cover (ops/hashmatch.py)
            for side, m_side in (("char", c.char_matcher),
                                 ("type", c.type_matcher)):
                hm = hash_match_for(m_side)
                if hm is not None:
                    t[side + "_hm"] = (jnp.asarray(hm.d),
                                       jnp.asarray(hm.l2))
            if c.char_matcher is not None:
                m = c.char_matcher
                if c.char_hash_keys is not None:
                    t["char_hash2"] = jnp.asarray(
                        np.stack(
                            [c.char_hash_keys, c.char_hash_syms], axis=1
                        ).astype(np.int32)
                    )
                else:
                    # hashless artifact (older compile): dense fallback,
                    # shrunk to the BMP when possible
                    sym_tab = c.char_sym_table
                    bmp_only = not sym_tab[0x10000:].any()
                    n_syms = int(sym_tab.max())
                    if bmp_only:
                        small = sym_tab[:0x10000]
                        if n_syms <= 255:
                            small = small.astype(np.uint8)
                        elif n_syms <= 32767:
                            small = small.astype(np.int16)
                        t["char_sym_bmp"] = jnp.asarray(small)
                    else:
                        t["char_sym"] = jnp.asarray(c.char_sym_table)
                walk_tab, _, _ = build_walk_tab(m.base, m.check, m.inherit)
                t["char"] = tuple(
                    jnp.asarray(x)
                    for x in (walk_tab, m.rows_first,
                              m.rows_cnt, m.w8, m.off)
                )
                wide = build_wide_rows(m)
                if wide is not None:
                    t["char_wide"] = jnp.asarray(wide[0])
            if c.type_matcher is not None:
                m = c.type_matcher
                walk_tab, _, _ = build_walk_tab(m.base, m.check, m.inherit)
                t["type"] = tuple(
                    jnp.asarray(x)
                    for x in (walk_tab, m.rows_first,
                              m.rows_cnt, m.w8, m.off)
                )
                wide = build_wide_rows(m)
                if wide is not None:
                    t["type_wide"] = jnp.asarray(wide[0])
            use_split = (
                os.environ.get("VAPORETTO_TPU_TYPE_SPLIT") == "1"
                and getattr(c, "type_split_tables", None) is not None
            )
            if use_split:
                t["type_split"] = tuple(
                    jnp.asarray(x) for x in c.type_split_tables
                )
            elif use_small_tables and c.type_pos_tables is not None:
                t["type_pos"] = jnp.asarray(c.type_pos_tables)
            elif c.type_cache_table is not None:
                # measured: the (P, 2) row-form trick that speeds the
                # hash-matcher tables REGRESSES this 8^6-entry gather
                # (14.95 -> 21.3 ms) — the 1-D form stays
                t["type_cache"] = jnp.asarray(c.type_cache_table)
            self._device_tables = t
        return self._device_tables

    def _predict_fn(self, B: int, L: int):
        key = (B, L)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = _build_predict_fn(self.compiled, self._tables())
            self._jit_cache[key] = fn
        return fn

    def serve_boundaries_fn(self, wsconst_types: Tuple[int, ...] = (),
                            mesh=None, mesh_axis: str = "dp",
                            host_types: bool = False):
        """HBM-lean serving path: ``fn(codepoints, lengths) ->
        uint8 (B, ceil((L-1)/8))`` — the boundary mask bit-packed 8 gaps
        per byte (see :meth:`serve_traced_fn`).

        ``wsconst_types``: character-type codes whose equal-type neighbor
        gaps are forced to NotWordBoundary ON DEVICE — the KyteaWsConst
        post filter (kytea_wsconst.rs:27-45) fused into the serving kernel
        at zero host cost.

        ``mesh``: a 1-D ``jax.sharding.Mesh`` for data-parallel scale-out —
        the batch dimension is sharded over ``mesh_axis``, tables are
        replicated, and (the pipeline being embarrassingly data-parallel)
        the compiled program contains NO collectives: scaling is linear by
        construction. Batch size must divide by the mesh size.

        For throughput serving where only the segmentation is needed (no
        ``--scores``, no tags). Compared to the full predict function it
        * classifies character types ON DEVICE (a VMEM-resident 64 KiB
          uint8 BMP table + astral kanji-extension range checks — exact
          parity with :func:`sentence.char_types_of_codepoints`),
        * returns only the thresholded per-gap boundary mask, BIT-PACKED
          (1 bit/gap), instead of the padded int32 score buffer and the
          match tensor.

        The codepoint input may be **uint16** for pure-BMP batches (callers
        route the rare astral-plane-containing lines to the int32 path —
        dtype dispatch retraces automatically): on this HBM-bandwidth-bound
        pipeline the bytes/char ARE the throughput, and uint16 in /
        1 bit per gap out is ~2.1 B/char vs the full path's ~16 B/char.
        """
        import jax

        fn, tables = self.serve_traced_fn(wsconst_types, host_types)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(mesh, P(mesh_axis, None))
            vec_sh = NamedSharding(mesh, P(mesh_axis))
            rep = NamedSharding(mesh, P())
            table_sh = jax.tree.map(lambda _: rep, tables)
            in_sh = ((batch_sh, batch_sh, vec_sh, table_sh)
                     if host_types else (batch_sh, vec_sh, table_sh))
            jitted = jax.jit(
                fn, in_shardings=in_sh, out_shardings=batch_sh,
            )
            tables = jax.device_put(tables, table_sh)
        else:
            jitted = jax.jit(fn)

        if host_types:
            def wrapper(cps, cts, lengths):
                return jitted(cps, cts, lengths, tables)
        else:
            def wrapper(cps, lengths):
                return jitted(cps, lengths, tables)

        return wrapper

    def _serve_tables(self, wsconst_types: Tuple[int, ...]):
        import jax.numpy as jnp

        from .sentence import _CHAR_TYPE_TABLE_SMALL

        tables = dict(self._tables())
        tables["ctype_bmp"] = jnp.asarray(_CHAR_TYPE_TABLE_SMALL)
        return tables

    def _make_serve_core(self, wsconst_types: Tuple[int, ...],
                         host_types: bool = False):
        """Shared serve prologue: ``fn(cps, lengths, tables) ->
        (gaps bool (B, L-1), cps32, cts, gap_scores, char_match,
        type_match)`` with char typing, wsconst suppression, and the
        out-of-line gap mask applied.

        uint16 batches classify char types ARITHMETICALLY (range
        compares — pure elementwise, fuses for free) instead of gathering
        the 64 KiB type table; int32 (astral-bearing) batches take the
        table-classify fallback — identical results
        (tests/test_serving.py).

        ``host_types``: the returned fn takes ``(cps, cts, lengths,
        tables)`` with the uint8 char types supplied by the native
        tensorizer (padding/separators 0) — the reference engine
        computes types inline during decode too (sentence.rs:264-283),
        and dropping the classify chain makes the serve kernel's device
        arithmetic a strict subset of the full kernel's."""
        import jax
        import jax.numpy as jnp

        from .ops.match import classify_types_bmp_arith
        from .sentence import CharacterType

        c = self.compiled
        core = _make_score_core(c)
        pad_left = c.pad_left
        # plain Python ints: eager jnp scalars would be closed over as
        # device-buffer constants, which the axon tunnel re-ships on every
        # call (~16 ms each; see PERF.md)
        kanji = int(CharacterType.KANJI)
        other = int(CharacterType.OTHER)
        has_char = c.char_matcher is not None

        def tail(cps32, cts, lengths, tables):
            B, L = cps32.shape
            syms = (
                _project_char_syms(c, cps32, tables) if has_char else None
            )
            scores, cm, tm = core(syms, cts, lengths, tables)
            gap_scores = scores[:, pad_left : pad_left + L - 1]
            gaps = gap_scores > 0
            if wsconst_types:
                ct0, ct1 = cts[:, :-1], cts[:, 1:]
                ws = ct0 == jnp.int32(wsconst_types[0])
                for wt in wsconst_types[1:]:
                    ws = ws | (ct0 == jnp.int32(wt))
                gaps = gaps & ~(ws & (ct0 == ct1))
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L - 1), 1)
            gaps = gaps & (t_idx < (lengths[:, None] - 1))
            return gaps, cps32, cts, gap_scores, cm, tm

        if host_types:
            def fn(cps, cts, lengths, tables):
                return tail(
                    cps.astype(jnp.int32), cts.astype(jnp.int32),
                    lengths, tables,
                )

            return fn

        def fn(cps, lengths, tables):
            cps32 = cps.astype(jnp.int32)
            if cps.dtype == jnp.uint16:
                cts = classify_types_bmp_arith(cps32)
            else:
                cps32, cts = _classify_types(cps, tables, kanji, other)
            # codepoint 0 = padding / packed-line separator: its type
            # symbol must read as 0 ("no char", the reference's
            # out-of-sentence behavior), never OTHER. Real NUL input
            # never reaches the lean kernels (the tensorizer rejects it,
            # matching the general path's from_raw error).
            cts = jnp.where(cps32 == 0, 0, cts)
            return tail(cps32, cts, lengths, tables)

        return fn

    def serve_traced_fn(self, wsconst_types: Tuple[int, ...] = (),
                        host_types: bool = False):
        """The unjitted serving function and its table pytree:
        ``fn(cps, lengths, tables) -> uint8 (B, ceil((L-1)/8))`` — the
        per-gap boundary mask BIT-PACKED column-major, 8 gaps per byte
        (see :meth:`serve_boundaries_fn` and :func:`_pack_gap_bits`).
        The device->host boundary readback dominates lean-serving wall
        time on slow links, and packing shrinks it 8x; the native
        detokenizer consumes the bits directly (vt_detok_bits).
        :func:`unpack_gap_bits` recovers the byte mask on the host.

        Tables are passed as arguments so callers control
        jit/sharding/loop composition (the benchmark harness scans this
        inside one program). ``host_types``: take the tensorizer's
        uint8 char types as an extra argument (see
        :meth:`_make_serve_core`) — fn(cps, cts, lengths, tables)."""
        serve = self._make_serve_core(wsconst_types, host_types)
        tables = self._serve_tables(wsconst_types)

        if host_types:
            def fn(cps, cts, lengths, tables):
                gaps, _, _, _, _, _ = serve(cps, cts, lengths, tables)
                return _pack_gap_bits(gaps)
        else:
            def fn(cps, lengths, tables):
                gaps, _, _, _, _, _ = serve(cps, lengths, tables)
                return _pack_gap_bits(gaps)

        return fn, tables

    def _serve_host_core(self, wsconst_types: Tuple[int, ...],
                         want_scores: bool):
        """Shared implementation of the lean HOST serving functions: the
        native C++ engine (host_predictor.cc) evaluated over the padded
        uint16 batches the lean pipeline produces — same inputs/outputs
        as the device kernels, no device involved. This makes
        ``--backend host`` a full bytes->bytes native pipeline (the
        fastest engine on hosts without accelerators; reference
        whole-pipeline contract predict/src/main.rs:124,183-185)."""
        host = self._host()
        if host is None:
            raise RuntimeError("native host engine unavailable")
        from .sentence import _CHAR_TYPE_TABLE_SMALL

        table = _CHAR_TYPE_TABLE_SMALL
        pad = self.compiled.pad_left
        ws = tuple(sorted(wsconst_types))

        def fn(cps, lengths):
            # fast lane: the whole serve (widen + classify + predict +
            # threshold + wsconst) as ONE native call
            res = host.serve_padded(cps, lengths, ws, want_scores)
            if res is not None:
                return res
            return _numpy_fn(cps, lengths)

        def _numpy_fn(cps, lengths):
            cps = np.asarray(cps)  # (B, L) uint16 (lean tensorizer)
            lengths = np.asarray(lengths, dtype=np.int64)
            B, L = cps.shape
            iota = np.arange(L)
            mask = iota[None, :] < lengths[:, None]
            cps_flat = cps[mask]  # uint16; widened once, flat, below
            cts_flat = table[cps_flat]
            offsets = np.zeros(B + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            scores_flat, s_offs, _, _, _ = host.predict_flat(
                cps_flat, cts_flat, offsets
            )
            # ragged gap extraction as ONE dense 2D gather: row i's gap
            # j lives at s_offs[i] + pad + j; out-of-line columns read
            # neighboring (garbage) slots that the validity mask zeroes,
            # with a global clip guarding the flat array's end
            iota_g = np.arange(L - 1, dtype=np.int64)
            src = (s_offs[:-1] + pad)[:, None] + iota_g[None, :]
            np.minimum(src, len(scores_flat) - 1, out=src)
            vals2d = scores_flat[src]
            valid = iota_g[None, :] < (lengths[:, None] - 1)
            bnd = ((vals2d > 0) & valid).astype(np.int8)
            if wsconst_types:
                cts_pad = table[cps]
                for wt in wsconst_types:
                    bnd[
                        (cts_pad[:, :-1] == wt) & (cts_pad[:, 1:] == wt)
                    ] = 0
            if not want_scores:
                return bnd
            sc = np.where(valid, vals2d, 0).astype(np.int32)
            return bnd, sc

        return fn

    def serve_boundaries_host_fn(self, wsconst_types: Tuple[int, ...] = ()):
        """Host-engine twin of :meth:`serve_boundaries_fn` (numpy in/out,
        byte-identical results)."""
        return self._serve_host_core(tuple(sorted(wsconst_types)), False)

    def serve_scores_host_fn(self, wsconst_types: Tuple[int, ...] = ()):
        """Host-engine twin of :meth:`serve_scores_fn`."""
        return self._serve_host_core(tuple(sorted(wsconst_types)), True)

    def serve_tags_host_fn(self, wsconst_types: Tuple[int, ...] = ()):
        """Host-engine twin of :meth:`serve_tags_fn`: one native serve
        call (emitting per-position match states) + the batched C++ tag
        scorer, returning the same (boundaries, token_id, choice)
        triple the lean tag detokenizer consumes — `--backend host
        --predict-tags` as a fully native pipeline."""
        host = self._host()
        scorer = self._tag_scorer()
        if host is None or scorer is None:
            raise RuntimeError("native host tag engine unavailable")
        n_tags = self.compiled.n_tags
        S = max(n_tags, 1)
        ws = tuple(sorted(wsconst_types))
        has_char = scorer.has_char
        has_type = scorer.has_type

        def fn(cps, lengths):
            cps = np.asarray(cps)
            lengths64 = np.asarray(lengths, dtype=np.int64)
            B, L = cps.shape
            res = host.serve_padded(cps, lengths, ws, want_states=True)
            if res is None:
                raise RuntimeError("native host serve unavailable")
            bnd, (cm, tm) = res
            # the native scorer's flat label stream assumes n-1 labels
            # per sentence, which cannot represent empty lines — feed it
            # the nonempty rows only (empty lines carry no tokens)
            nz = np.flatnonzero(lengths64 > 0)
            lens_nz = lengths64[nz]
            iota = np.arange(L)
            mask = iota[None, :] < lens_nz[:, None]
            sent_off = np.zeros(len(nz) + 1, dtype=np.int64)
            np.cumsum(lens_nz, out=sent_off[1:])
            cps_flat = cps[nz][mask].astype(np.int32)
            gmask = iota[None, : L - 1] < (lens_nz[:, None] - 1)
            bnd_flat = bnd[nz][gmask].astype(np.uint8)
            tids, pos, sent, choices, _, _, _ = scorer.predict_batch(
                cps_flat, bnd_flat, sent_off,
                cm[nz][mask] if has_char else None,
                tm[nz][mask] if has_type else None,
                want_scores=False,
            )
            tid = np.full((B, L), -1, dtype=np.int32)
            choice = np.full((B, L, S), -1, dtype=np.int8)
            if len(tids):
                rows = nz[sent]
                tid[rows, pos] = tids
                choice[rows, pos, :] = choices[:, :S].astype(np.int8)
            return bnd, tid, choice

        return fn

    def serve_scores_traced_fn(self, wsconst_types: Tuple[int, ...] = (),
                               host_types: bool = False):
        """Lean serving variant that also returns the raw int32 gap
        scores: ``fn(cps, lengths, tables) -> (boundary bits uint8
        (B, ceil((L-1)/8)), scores int32 (B, L-1))`` — boundaries
        BIT-PACKED like :meth:`serve_traced_fn` (round 5; the native
        scores writer consumes the bits directly, vt_detok_scores2).

        Backs the lean ``--scores`` path (reference predict
        main.rs:66-75): scores are the exact i32 totals of the exposed
        gaps (wsconst affects only the boundary labels, never the
        scores); ~4.1 B/char readback instead of the 16 B/char general
        path.
        """
        serve = self._make_serve_core(wsconst_types, host_types)
        tables = self._serve_tables(wsconst_types)

        if host_types:
            def fn(cps, cts, lengths, tables):
                gaps, _, _, gap_scores, _, _ = serve(
                    cps, cts, lengths, tables
                )
                return _pack_gap_bits(gaps), gap_scores
        else:
            def fn(cps, lengths, tables):
                gaps, _, _, gap_scores, _, _ = serve(cps, lengths, tables)
                return _pack_gap_bits(gaps), gap_scores

        return fn, tables

    def serve_scores_fn(self, wsconst_types: Tuple[int, ...] = (),
                        mesh=None, mesh_axis: str = "dp",
                        host_types: bool = False):
        """Jitted lean scores path (see :meth:`serve_scores_traced_fn`);
        mesh semantics identical to :meth:`serve_boundaries_fn`."""
        import jax

        fn, tables = self.serve_scores_traced_fn(wsconst_types, host_types)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(mesh, P(mesh_axis, None))
            vec_sh = NamedSharding(mesh, P(mesh_axis))
            rep = NamedSharding(mesh, P())
            table_sh = jax.tree.map(lambda _: rep, tables)
            in_sh = ((batch_sh, batch_sh, vec_sh, table_sh)
                     if host_types else (batch_sh, vec_sh, table_sh))
            jitted = jax.jit(
                fn,
                in_shardings=in_sh,
                out_shardings=(batch_sh, batch_sh),
            )
            tables = jax.device_put(tables, table_sh)
        else:
            jitted = jax.jit(fn)

        if host_types:
            def wrapper(cps, cts, lengths):
                return jitted(cps, cts, lengths, tables)
        else:
            def wrapper(cps, lengths):
                return jitted(cps, lengths, tables)

        return wrapper

    # ------------------------------------------------------------------
    # device tag pass (reference predictor.rs:546-637 on the TPU)
    # ------------------------------------------------------------------

    #: lazily-built device tag tables (False = not built yet)
    _tag_dev_obj = False

    def device_tag_tables(self):
        """The packed :class:`compile.tagdev.DeviceTagTables`, or None when
        the model has no device-packable tag side."""
        if self._tag_dev_obj is False:
            if self.compiled.tag_meta is None:
                self._tag_dev_obj = None
            else:
                from .compile.tagdev import build_device_tag_tables

                try:
                    self._tag_dev_obj = build_device_tag_tables(self.compiled)
                except Exception:
                    self._tag_dev_obj = None
        return self._tag_dev_obj

    def serve_tags_traced_fn(self, wsconst_types: Tuple[int, ...] = (),
                             want_gap_scores: bool = False,
                             want_tag_scores: bool = False,
                             host_types: bool = False):
        """The unjitted lean tag-serving function and its table pytree:
        ``fn(cps, lengths, tables) -> (boundary bits uint8
        (B, ceil((L-1)/8)), token_id int8/int16/int32 (B, L),
        choice int8 (B, L, n_slots))`` — boundaries BIT-PACKED and the
        token ids at the narrowest dtype the model's token count allows
        (round 5: the tag readback was the device tag path's dominant
        transfer on slow links; vt_detok_tags2 consumes these directly).

        ``want_gap_scores`` appends the int32 per-gap boundary scores
        (the lean ``--scores --predict-tags`` combination, reference
        predict main.rs:65-74,150-156); ``want_tag_scores`` appends the
        class-concatenated tag score tensor int32 (B, L, C) the argmax
        otherwise discards (the lean ``--tag-scores`` path, reference
        main.rs:76-91) — rows are meaningful at token-end positions with
        ``token_id >= 0``.

        Extends the lean boundary kernel with the tag pass ON DEVICE
        (reference predictor.rs:546-637): token spans come from the
        thresholded boundary mask (cummax over span starts), the token id
        ending at each position from a reversed-surface trie walk, scores
        from bias + per-(token, rel, state) weight-row gathers over the
        match-state tensors the boundary pass already produced, and the
        candidate choice from a per-slot masked argmax (first maximum
        wins, TagPredictor::predict predictor.rs:286-304).

        ``token_id`` is -1 except at the last char of each recognized
        token; ``choice[b, e, s]`` is the winning candidate index of slot
        ``s`` for the token ending at ``e`` (-1 for single/empty-candidate
        slots — the host resolves those without scores, and for
        unrecognized tokens).
        """
        import jax
        import jax.numpy as jnp
        from jax import lax

        from .compile.tagdev import _M1, _M2

        dt = self.device_tag_tables()
        if dt is None:
            raise RuntimeError("model has no device-packable tag tables")
        from .ops.match import build_walk_tab, hash_project_fused

        tables = self._serve_tables(wsconst_types)
        # fused reversed-trie tables: (check, base, value) rows + dead
        # slot (one gather per walk step; see match_longest_fused) and
        # the (P, 2) hash projection of the token-surface alphabet
        rev_tab, rev_dead, rev_root_base = build_walk_tab(
            dt.rev_base, dt.rev_check, dt.rev_value
        )
        if dt.rev_hash_tab2 is not None:
            tables["tag_rev"] = (jnp.asarray(dt.rev_hash_tab2),
                                 jnp.asarray(rev_tab))
            rev_hash = (dt.rev_hash_mul, dt.rev_hash_shift)
        else:  # older table build: dense 64 Ki projection
            tables["tag_rev"] = (jnp.asarray(dt.rev_sym_bmp),
                                 jnp.asarray(rev_tab))
            rev_hash = None
        tables["tag_bias"] = jnp.asarray(dt.bias)
        # slot offsets and counts fused into ONE (n_tokens, 2S) row
        # gather (was two gathers; every kernel counts on the measured
        # per-kernel cost model)
        tables["tag_slot2"] = jnp.asarray(
            np.concatenate(
                [np.asarray(dt.slot_off), np.asarray(dt.slot_cnt)],
                axis=1,
            ).astype(np.int32)
        )
        # probe rows carry the WEIGHT ROW INLINE when the class
        # concatenation is narrow: (P, 2 + C) rows [tid, state, w...]
        # remove the per-side weight indirection gather; wide tag
        # models keep the (P, 3) + w_rows indirection
        w_rows_np = np.asarray(dt.w_rows)
        inline_w = w_rows_np.shape[1] <= 32
        for key, tabs in (("tag_char", dt.char_tabs),
                          ("tag_type", dt.type_tabs)):
            if inline_w:
                tables[key] = tuple(
                    jnp.asarray(
                        np.concatenate(
                            [
                                np.stack(
                                    [t.ver_tid, t.ver_state], axis=1
                                ),
                                w_rows_np[np.asarray(t.row)],
                            ],
                            axis=1,
                        ).astype(np.int32)
                    )
                    for t in tabs
                )
            else:
                tables[key] = tuple(
                    jnp.asarray(
                        np.stack([t.ver_tid, t.ver_state, t.row], axis=1)
                        .astype(np.int32)
                    )
                    for t in tabs
                )
        if not inline_w:
            tables["tag_w"] = jnp.asarray(w_rows_np)

        c = self.compiled
        serve_core = self._make_serve_core(wsconst_types, host_types)
        max_tok_len = dt.max_tok_len
        n_tokens = dt.n_tokens
        S = dt.n_slots
        C = dt.n_classes
        # small-model fused readback: (tid+1) | (choice0+1)<<7 |
        # (choice1+1)<<11 in ONE uint16 per position — the tag payload
        # drops from 3 B to 2 B per position, and on slow links the tag
        # readback is the device tag path's dominant transfer. Applies
        # when every field fits (token ids 7 bits, choices 4 bits each,
        # <= 2 slots); larger models keep the separate tensors.
        meta = c.tag_meta
        max_cands = max(
            (len(cands) for slots in meta.tags for cands in slots),
            default=0,
        )
        packed_tc = n_tokens <= 126 and S <= 2 and max_cands <= 15
        # static probe metadata (python ints; see _build_predict_fn note)
        char_meta = [(t.shift, t.probe_len, t.rel) for t in dt.char_tabs]
        type_meta = [(t.shift, t.probe_len, t.rel) for t in dt.type_tabs]
        m1 = int(np.int64(np.uint32(_M1)) - (1 << 32)
                 if int(_M1) >= 1 << 31 else int(_M1))
        m2 = int(np.int64(np.uint32(_M2)) - (1 << 32)
                 if int(_M2) >= 1 << 31 else int(_M2))

        def body(serve_out, lengths, tables):
            gaps, cps, _, gap_scores, char_match, type_match = serve_out
            B, L = cps.shape

            # ---- token spans from the boundary mask -------------------
            # separator-aware: gaps adjacent to codepoint-0 positions
            # (padding, or the packed-line separators) always delimit
            # spans, so packed rows never form tokens across lines.
            # Padding-region "tokens" are all-zero surfaces -> tid -1,
            # and the per-line unpack never reads them. For unpacked
            # rows this only re-asserts the existing end-of-line cut.
            sep_gap = (cps[:, :-1] == 0) | (cps[:, 1:] == 0)
            span_gaps = gaps | sep_gap
            iota = lax.broadcasted_iota(jnp.int32, (B, L), 1)
            is_start = jnp.pad(
                span_gaps, ((0, 0), (1, 0)), constant_values=True
            )
            last_start = lax.cummax(
                jnp.where(is_start, iota, 0), axis=1
            )
            span_len = iota - last_start + 1
            is_end = jnp.pad(
                span_gaps, ((0, 0), (0, 1)), constant_values=False
            ) | (iota == lengths[:, None] - 1)

            # ---- token id: reversed-surface trie walk (fused: one
            # gather per step, see match_longest_fused) ----------------
            proj_tab, rev_tab = tables["tag_rev"]
            if rev_hash is not None:
                syms = hash_project_fused(
                    cps, rev_hash[0], rev_hash[1], proj_tab
                )
            else:
                bmp = cps < 0x10000
                syms = jnp.where(
                    bmp,
                    proj_tab[jnp.where(bmp, cps, 0)].astype(jnp.int32),
                    0,
                )
            node = jnp.zeros((B, L), dtype=jnp.int32)
            node_base = jnp.full((B, L), rev_root_base, dtype=jnp.int32)
            tid = jnp.full((B, L), -1, dtype=jnp.int32)
            dead_c = jnp.int32(rev_dead)

            def walk_step(node, node_base, tid, shifted, k):
                cand = node_base + shifted
                trip = rev_tab[cand]  # (B, L, 3): check, base, value
                ok = trip[..., 0] == node
                node = jnp.where(ok, cand, dead_c)
                node_base = jnp.where(ok, trip[..., 1], 0)
                tid = jnp.where(
                    ok & (span_len == k), trip[..., 2], tid
                )
                shifted = jnp.pad(
                    shifted[:, :-1], ((0, 0), (1, 0))
                )
                return node, node_base, tid, shifted

            if max_tok_len <= 63:
                shifted = syms
                for k in range(1, max_tok_len + 1):
                    node, node_base, tid, shifted = walk_step(
                        node, node_base, tid, shifted, k
                    )
            else:
                def body(carry, k):
                    return walk_step(*carry, k), None

                (node, node_base, tid, _), _ = lax.scan(
                    body, (node, node_base, tid, syms),
                    jnp.arange(1, max_tok_len + 1, dtype=jnp.int32),
                )
            tid = jnp.where(is_end, tid, -1)

            # ---- scoring: bias + hash-probed weight rows --------------
            tid_safe = jnp.clip(tid, 0, n_tokens - 1)
            sc = tables["tag_bias"][tid_safe]  # (B, L, C)
            inline_w = "tag_w" not in tables

            def add_side(sc, match, key, meta):
                if match is None or not meta:
                    return sc
                for j, (shift, probe, rel) in enumerate(meta):
                    tab = tables[key][j]  # (P, 3) or inline (P, 2 + C)
                    size = tab.shape[0]
                    if rel == 0:
                        st = match
                    else:
                        st = jnp.pad(
                            match[:, rel:], ((0, 0), (0, rel)),
                            constant_values=-1,
                        )
                    h = tid * jnp.int32(m1) + st * jnp.int32(m2)
                    slot0 = lax.shift_right_logical(h, jnp.int32(shift))
                    found = jnp.zeros(st.shape, dtype=bool)
                    if inline_w:
                        # the probe row carries the weight row inline —
                        # no per-side indirection gather
                        wvec = jnp.zeros(st.shape + (C,), dtype=jnp.int32)
                        for p in range(probe):
                            s = (slot0 + p) & (size - 1)
                            g = tab[s]  # one row gather per probe
                            hit = (
                                (~found) & (g[..., 0] == tid)
                                & (g[..., 1] == st)
                            )
                            wvec = jnp.where(hit[..., None], g[..., 2:],
                                             wvec)
                            found = found | hit
                        sc = sc + wvec
                    else:
                        row = jnp.zeros_like(st)
                        for p in range(probe):
                            s = (slot0 + p) & (size - 1)
                            g = tab[s]  # one row gather per probe
                            hit = (
                                (~found) & (g[..., 0] == tid)
                                & (g[..., 1] == st)
                            )
                            row = jnp.where(hit, g[..., 2], row)
                            found = found | hit
                        sc = sc + tables["tag_w"][row]
                return sc

            sc = add_side(sc, char_match, "tag_char", char_meta)
            sc = add_side(sc, type_match, "tag_type", type_meta)

            # ---- per-slot masked argmax (first maximum wins) ----------
            oc = tables["tag_slot2"][tid_safe]  # (B, L, 2S): off then cnt
            off = oc[..., :S]
            cnt = oc[..., S:]
            ciota = lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
            NEG = jnp.int32(-(2**31))
            choices = []
            for s in range(S):
                o = off[..., s]
                n = cnt[..., s]
                m = (ciota >= o[..., None]) & (ciota < (o + n)[..., None])
                idx = jnp.argmax(
                    jnp.where(m, sc, NEG), axis=-1
                ).astype(jnp.int32) - o
                choices.append(
                    jnp.where((n >= 2) & (tid >= 0), idx, -1)
                )
            if packed_tc:
                w = tid + 1
                for s_i in range(S):
                    w = w | ((choices[s_i] + 1) << (7 + 4 * s_i))
                outs = [_pack_gap_bits(gaps), w.astype(jnp.uint16)]
            else:
                choice = jnp.stack(choices, axis=-1).astype(jnp.int8)
                if n_tokens <= 126:
                    # shrink the tid readback to its information content
                    # (token ids fit int8/int16; -1 = none) — on slow
                    # links the tid transfer is the tag path's largest
                    tid = tid.astype(jnp.int8)
                elif n_tokens <= 32766:
                    tid = tid.astype(jnp.int16)
                outs = [_pack_gap_bits(gaps), tid, choice]
            if want_gap_scores:
                outs.append(gap_scores)
            if want_tag_scores:
                outs.append(sc)
            return tuple(outs)

        if host_types:
            def fn(cps, cts, lengths, tables):
                return body(serve_core(cps, cts, lengths, tables),
                            lengths, tables)
        else:
            def fn(cps, lengths, tables):
                return body(serve_core(cps, lengths, tables),
                            lengths, tables)

        fn.packed_tc = packed_tc
        fn.n_tag_slots = S
        return fn, tables

    def serve_tags_fn(self, wsconst_types: Tuple[int, ...] = (),
                      mesh=None, mesh_axis: str = "dp",
                      want_gap_scores: bool = False,
                      want_tag_scores: bool = False,
                      host_types: bool = False):
        """Jitted lean tag-serving path (see :meth:`serve_tags_traced_fn`);
        mesh semantics identical to :meth:`serve_boundaries_fn`."""
        import jax

        fn, tables = self.serve_tags_traced_fn(
            wsconst_types, want_gap_scores, want_tag_scores, host_types
        )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(mesh, P(mesh_axis, None))
            vec_sh = NamedSharding(mesh, P(mesh_axis))
            rep = NamedSharding(mesh, P())
            table_sh = jax.tree.map(lambda _: rep, tables)
            if fn.packed_tc:
                out_sh = [batch_sh, batch_sh]
            else:
                out_sh = [
                    batch_sh,
                    batch_sh,
                    NamedSharding(mesh, P(mesh_axis, None, None)),
                ]
            if want_gap_scores:
                out_sh.append(batch_sh)
            if want_tag_scores:
                out_sh.append(NamedSharding(mesh, P(mesh_axis, None, None)))
            in_sh = ((batch_sh, batch_sh, vec_sh, table_sh)
                     if host_types else (batch_sh, vec_sh, table_sh))
            jitted = jax.jit(
                fn,
                in_shardings=in_sh,
                out_shardings=tuple(out_sh),
            )
            tables = jax.device_put(tables, table_sh)
        else:
            jitted = jax.jit(fn)

        if host_types:
            def wrapper(cps, cts, lengths):
                return jitted(cps, cts, lengths, tables)
        else:
            def wrapper(cps, lengths):
                return jitted(cps, lengths, tables)

        wrapper.packed_tc = fn.packed_tc
        wrapper.n_tag_slots = fn.n_tag_slots
        return wrapper

    def predict_raw_fn(self):
        """The raw (unjitted) batch predict function over device tables.

        Signature: ``fn(codepoints, char_types, lengths) ->
        (padded_scores, char_match, type_match)``. Used by the benchmark
        harness and the driver's compile check.
        """
        tables = self._tables()
        c = self.compiled
        traced = _make_traced_fn(c)

        def fn(cps, cts, lengths):
            return traced(cps, cts, lengths, tables)

        return fn

    def predict_traced_fn(self):
        """The 4-arg traced function and its device-table pytree.

        ``fn(cps, cts, lengths, tables)`` — tables must be passed as
        arguments (never closed over) so jit treats them as device inputs;
        used by the sharded data-parallel path which jits with explicit
        shardings.
        """
        return _make_traced_fn(self.compiled), self._tables()

    # ------------------------------------------------------------------
    # prediction
    # ------------------------------------------------------------------

    #: sentences longer than this are processed as halo-overlap chunks
    #: (identical results, bounded device shapes)
    LONG_SENTENCE_THRESHOLD = 8192

    def _host(self):
        """The native host evaluator, or None when unavailable."""
        if self._host_predictor is False:
            try:
                from .native import NativeHostPredictor

                self._host_predictor = NativeHostPredictor(self.compiled)
            except Exception:
                self._host_predictor = None
        return self._host_predictor

    def predict_host_batch(self, sentences: Sequence[Sentence]) -> bool:
        """Predict via the native host evaluator; returns False (and does
        nothing) when the native library is unavailable.

        One native call scores the whole batch (worker threads inside the
        library), so the Python/ctypes overhead is per batch, not per
        sentence."""
        host = self._host()
        if host is None:
            return False
        pad = self.compiled.pad_left
        scores_flat, s_offs, char_flat, type_flat, offs = host.predict_batch(
            [s.codepoints for s in sentences],
            [s.char_types for s in sentences],
        )
        for i, s in enumerate(sentences):
            n = len(s)
            lo = int(s_offs[i])
            s.score_padding = pad
            s.boundary_scores = scores_flat[
                lo : lo + pad + max(n - 1, 0) + 1
            ].copy()
            exposed = scores_flat[lo + pad : lo + pad + max(n - 1, 0)]
            s.boundaries = (exposed > 0).astype(np.uint8)
            clo = int(offs[i])
            # state exposure parity with the device path: states exist iff
            # the predictor was built for tag prediction
            if self.compiled.tag_meta is not None:
                if host.has_char:
                    s.char_pma_states = char_flat[clo : clo + n].astype(
                        np.int32
                    )
                if host.has_type:
                    s.type_pma_states = type_flat[clo : clo + n].astype(
                        np.int32
                    )
            s.set_predictor(self)
        return True

    def predict(self, sentence: Sentence) -> None:
        """Predict word boundaries of the given sentence in place."""
        if self.backend == "host" and self.predict_host_batch([sentence]):
            return
        if len(sentence) > self.LONG_SENTENCE_THRESHOLD:
            from .parallel.chunking import predict_long

            predict_long(self, sentence, chunk_size=self.LONG_SENTENCE_THRESHOLD)
            return
        self.predict_batch([sentence])

    def predict_batch(self, sentences: Sequence[Sentence]) -> None:
        """Predict boundaries for a batch of sentences in place.

        Sentences beyond ``LONG_SENTENCE_THRESHOLD`` are routed through
        halo-overlap chunking individually (parallel/chunking.py) so one
        long line cannot inflate the whole batch's device shape.
        """
        if not sentences:
            return
        if self.backend == "host" and self.predict_host_batch(sentences):
            return
        long_ones = [
            s for s in sentences if len(s) > self.LONG_SENTENCE_THRESHOLD
        ]
        if long_ones:
            from .parallel.chunking import predict_long

            for s in long_ones:
                predict_long(
                    self, s, chunk_size=self.LONG_SENTENCE_THRESHOLD
                )
            sentences = [
                s for s in sentences
                if len(s) <= self.LONG_SENTENCE_THRESHOLD
            ]
            if not sentences:
                return
        cps, cts, lengths = tensorize(sentences)
        B, L = cps.shape
        fn = self._predict_fn(B, L)
        scores, char_match, type_match = fn(cps, cts, lengths)
        scores = np.asarray(scores)
        char_match = np.asarray(char_match) if char_match is not None else None
        type_match = np.asarray(type_match) if type_match is not None else None
        for i, s in enumerate(sentences):
            self.assign_result_row(
                s,
                scores[i],
                char_match[i] if char_match is not None else None,
                type_match[i] if type_match is not None else None,
            )
        self.debug_verify(sentences)

    def assign_result_row(self, s: Sentence, scores_row,
                          cm_row=None, tm_row=None) -> None:
        """Apply one padded score row (and optional match-state rows) to
        a sentence — the single place that knows the score/padding
        layout, shared by predict_batch and the distributed general path
        so the two cannot drift."""
        n = len(s)
        pad = self.compiled.pad_left
        s.score_padding = pad
        s.boundary_scores = scores_row[: pad + max(n - 1, 0) + 1].copy()
        s.boundaries = (scores_row[pad : pad + n - 1] > 0).astype(np.uint8)
        if cm_row is not None:
            s.char_pma_states = cm_row[:n].astype(np.int32)
        if tm_row is not None:
            s.type_pma_states = tm_row[:n].astype(np.int32)
        s.set_predictor(self)

    def debug_verify(self, sentences: Sequence[Sentence]) -> None:
        """Cross-check device results against the numpy oracle when
        VAPORETTO_TPU_DEBUG_CHECKS=1 (no-op otherwise)."""
        from .utils.observe import debug_checks_enabled

        if debug_checks_enabled():
            from .ops.host_reference import verify_batch

            err = verify_batch(self.compiled, sentences)
            if err is not None:
                raise AssertionError(err)

    # ------------------------------------------------------------------
    # tags (host-side; reference predictor.rs:546-637)
    # ------------------------------------------------------------------

    def store_tag_scores(self, flag: bool) -> None:
        self._store_tag_scores = flag

    #: lazily-built native batched tag scorer (False = not built yet)
    _tag_scorer_obj = False

    def _tag_scorer(self):
        if self._tag_scorer_obj is False:
            import os

            if os.environ.get("VAPORETTO_TPU_NO_NATIVE_TAGS") == "1":
                self._tag_scorer_obj = None
                return None
            try:
                from .native import NativeTagScorer

                self._tag_scorer_obj = NativeTagScorer(self.compiled)
            except Exception:
                self._tag_scorer_obj = None
        return self._tag_scorer_obj

    def predict_tags(self, sentence: Sentence) -> None:
        self.predict_tags_batch([sentence])

    def predict_tags_batch(self, sentences: Sequence[Sentence]) -> None:
        """Tag every recognized token of the batch (predictor.rs:546-637).

        The whole pass — token-span enumeration, surface -> token_id
        lookup, scoring over the cached per-position match states, and
        per-slot argmax — runs in one native call (native/tag_scorer.cc);
        Python only assigns the chosen candidate strings. Pure-Python
        fallback: ``_token_spans`` + ``_tag_token_by_id``.
        """
        c = self.compiled
        if c.tag_meta is None:
            raise RuntimeError(
                "this predictor is created with predict_tags = false"
            )
        if c.n_tags == 0:
            return
        meta = c.tag_meta
        for s in sentences:
            s.n_tags = c.n_tags
            s.tag_scores = [None] * len(s) if self._store_tag_scores else []
        native = self._tag_scorer()
        if native is None:
            for s in sentences:
                s.tags = [None] * (len(s) * c.n_tags)
                for start, end in _token_spans(s.boundaries, len(s)):
                    token_id = meta.token_ids.get(
                        s.text_substring(start, end)
                    )
                    if token_id is not None:
                        self._tag_token_by_id(s, token_id, end - 1)
            return
        sent_off = np.zeros(len(sentences) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in sentences], out=sent_off[1:])
        total = int(sent_off[-1])
        empty32 = np.zeros(0, dtype=np.int32)
        cps_flat = np.concatenate(
            [s.codepoints for s in sentences] or [empty32]
        )
        # gap labels ride at sent_off[i] - i (n-1 labels per n-char line)
        bnd_flat = np.concatenate(
            [s.boundaries for s in sentences]
            or [np.zeros(0, dtype=np.uint8)]
        )

        def flat_states(attr):
            # a sentence that never ran through predict() has a 0-length
            # (or stale-length) state array; it must still occupy len(s)
            # slots in the flat stream or every later sentence's states
            # misalign — fill with -1 ("no match state" -> bias-only
            # scoring, same degradation as the pure-Python path)
            parts = []
            for s in sentences:
                st = getattr(s, attr)
                if st is None or len(st) != len(s):
                    st = np.full(len(s), -1, dtype=np.int32)
                parts.append(st)
            return np.concatenate(parts or [empty32])

        char_states = flat_states("char_pma_states") if native.has_char else None
        type_states = flat_states("type_pma_states") if native.has_type else None
        tids, pos, sent, choices, raw, gpos, pool_idx = native.predict_batch(
            cps_flat, bnd_flat, sent_off, char_states, type_states,
            want_scores=self._store_tag_scores,
        )
        n_tags = c.n_tags
        # one vectorized scatter resolves every tag of the batch, then the
        # flat object array splits back into per-sentence lists
        all_tags = np.full(total * n_tags, None, dtype=object)
        if len(gpos):
            all_tags[gpos] = native.pool[pool_idx]
        off = sent_off * n_tags
        for si, s in enumerate(sentences):
            s.tags = all_tags[off[si] : off[si + 1]].tolist()
        if self._store_tag_scores:
            for t, (token_id, p, si) in enumerate(
                zip(tids.tolist(), pos.tolist(), sent.tolist())
            ):
                tags = meta.tags[token_id]
                cap = max(8, len(meta.bias[token_id]))
                sentences[si].tag_scores[p] = (tags, raw[t, :cap].tolist())

    def _tag_token_by_id(
        self, sentence: Sentence, token_id: int, pos: int
    ) -> None:
        c = self.compiled
        meta = c.tag_meta
        bias = meta.bias[token_id]
        scores = np.zeros(max(8, len(bias)), dtype=np.int32)
        scores[: len(bias)] = bias
        if c.char_matcher is not None and c.char_matcher.tag_weight is not None:
            _add_tag_scores(
                c.char_matcher.tag_weight[token_id],
                sentence.char_pma_states,
                pos,
                scores,
            )
        if c.type_matcher is not None and c.type_matcher.tag_weight is not None:
            _add_tag_scores(
                c.type_matcher.tag_weight[token_id],
                sentence.type_pma_states,
                pos,
                scores,
            )
        tags = meta.tags[token_id]
        _fill_token_tags(sentence, pos, tags, scores)
        if self._store_tag_scores:
            sentence.tag_scores[pos] = (tags, scores.tolist())

    # ------------------------------------------------------------------
    # AOT artifact (analogue of predictor.rs:639-664)
    # ------------------------------------------------------------------

    def serialize_to_vec(self) -> bytes:
        from .compile.artifact import serialize_compiled

        return serialize_compiled(self.compiled, self.predict_tags_enabled)

    @classmethod
    def deserialize_from_slice(cls, data: bytes) -> "Predictor":
        from .compile.artifact import deserialize_compiled

        compiled, predict_tags = deserialize_compiled(data)
        return cls(None, predict_tags, compiled=compiled)


def _pack_gap_bits(gaps):
    """bool (B, G) -> uint8 (B, W8 = ceil(G/8)), COLUMN-MAJOR bit
    order: gap ``g`` lives in byte ``g % W8`` at bit ``g // W8``.

    The round-4 byte-major pack (reshape to (B, W8, 8) + lane reduce)
    compiled to three extra odd-layout u8 kernels on TPU — the measured
    serve-vs-full gap (BENCH_r04 dispatch_marginal). Column-major packs
    with eight CONTIGUOUS W8-wide slices instead: no reshape, no
    strided access, one fused elementwise expression. Decode with
    :func:`unpack_gap_bits` (host) or ``(row[g % W8] >> (g // W8)) & 1``
    (native detokenizers)."""
    import jax.numpy as jnp

    B, G = gaps.shape
    Gp = -(-G // 8) * 8
    W8 = Gp // 8
    g = jnp.pad(gaps, ((0, 0), (0, Gp - G))).astype(jnp.int32)
    b = g[:, 0:W8]
    for j in range(1, 8):
        b = b | (g[:, j * W8 : (j + 1) * W8] << j)
    return b.astype(jnp.uint8)


def unpack_gap_bits(bits: np.ndarray) -> np.ndarray:
    """Host inverse of :func:`_pack_gap_bits`: uint8 (B, W8) ->
    uint8 0/1 (B, W8 * 8) in gap order (gap g = bit g//W8 of byte
    g%W8)."""
    B, W8 = bits.shape
    u = np.unpackbits(bits, axis=1, bitorder="little")  # j*8 + b order
    return np.ascontiguousarray(
        u.reshape(B, W8, 8).transpose(0, 2, 1)
    ).reshape(B, W8 * 8)


def pack_gap_bits_np(bnd: np.ndarray) -> np.ndarray:
    """Host twin of :func:`_pack_gap_bits` over a 0/1 byte mask
    (B, G); pads G up to a byte multiple."""
    B, G = bnd.shape
    Gp = -(-G // 8) * 8
    W8 = Gp // 8
    if Gp != G:
        bnd = np.pad(bnd, ((0, 0), (0, Gp - G)))
    return np.packbits(
        np.ascontiguousarray(
            bnd.reshape(B, 8, W8).transpose(0, 2, 1)
        ).reshape(B, Gp),
        axis=1, bitorder="little",
    )


def _classify_types(cps, tables, kanji: int, other: int):
    """Device char-type classification shared by the lean serving kernels.

    Exact parity with :func:`sentence.char_types_of_codepoints`
    (reference sentence.rs:50-67): a VMEM-resident 64 KiB BMP table plus
    astral kanji-extension range checks for int32 inputs. Returns
    (cps int32, char_types int32)."""
    import jax.numpy as jnp

    if cps.dtype == jnp.uint16:
        cps = cps.astype(jnp.int32)
        cts = tables["ctype_bmp"][cps].astype(jnp.int32)
    else:
        bmp = cps < 0x10000
        cts = jnp.where(
            bmp,
            tables["ctype_bmp"][jnp.where(bmp, cps, 0)].astype(jnp.int32),
            jnp.where(
                ((cps >= 0x20000) & (cps <= 0x2A6DF))
                | ((cps >= 0x2A700) & (cps <= 0x2B73F))
                | ((cps >= 0x2B740) & (cps <= 0x2B81F))
                | ((cps >= 0x2B820) & (cps <= 0x2CEAF))
                | ((cps >= 0x2F800) & (cps <= 0x2FA1F)),
                jnp.int32(kanji),
                jnp.int32(other),
            ),
        )
    return cps, cts


def _token_spans(boundaries, n: int):
    """Token spans (start, end) delimited by WordBoundary/Unknown gaps.

    Matches the reference's gap walk (predictor.rs:546-571): spans between
    consecutive break gaps (boundary != NotWordBoundary), emitted only when
    neither delimiting break is Unknown — an Unknown gap suppresses both
    the token ending at it and the one starting after it.
    """
    if n < 256:  # short sentences: a plain walk beats numpy setup costs
        spans = []
        start = 0
        prev_unk = False
        for i, v in enumerate(boundaries):
            if v:
                if not prev_unk and v == 1:
                    spans.append((start, i + 1))
                prev_unk = v == 2
                start = i + 1
        if not prev_unk:
            spans.append((start, n))
        return spans
    b = np.asarray(boundaries)
    if b.size == 0:
        return [(0, n)]
    br = np.flatnonzero(b != 0)
    if br.size == 0:
        return [(0, n)]
    starts = np.concatenate(([0], br + 1))
    ends = np.concatenate((br + 1, [n]))
    is_unk = b[br] == 2
    left_ok = np.concatenate(([True], ~is_unk))
    right_ok = np.concatenate((~is_unk, [True]))
    keep = left_ok & right_ok
    return list(zip(starts[keep].tolist(), ends[keep].tolist()))


def _add_tag_scores(
    tag_weight: List[Dict[int, List[int]]],
    states: np.ndarray,
    pos: int,
    scores: np.ndarray,
) -> None:
    """Reference char_scorer/boundary_tag_scorer.rs:153-174."""
    n = len(states)
    for j, table in enumerate(tag_weight):
        if pos + j >= n:
            break
        state = int(states[pos + j])
        if state < 0:
            continue
        w = table.get(state)
        if w is not None:
            k = min(len(w), len(scores))
            scores[:k] += np.asarray(w[:k], dtype=np.int32)


def _fill_token_tags(
    sentence: Sentence, pos: int, tags: List[List[str]], scores: np.ndarray
) -> None:
    """Reference TagPredictor::predict (predictor.rs:286-304)."""
    n_tags = sentence.n_tags
    offset = 0
    out = sentence.tags
    for slot, cands in enumerate(tags):
        if slot >= n_tags:
            break
        if len(cands) >= 2:
            seg = scores[offset : offset + len(cands)]
            # strict > comparison: first maximum wins
            idx = 0
            best = None
            for i, v in enumerate(seg):
                if best is None or int(v) > best:
                    idx = i
                    best = int(v)
            out[pos * n_tags + slot] = cands[idx]
            offset += len(cands)
        else:
            out[pos * n_tags + slot] = cands[0] if cands else None


def _build_predict_fn(compiled: CompiledModel, tables):
    """Build the batch predict function.

    The model tables are passed as ARGUMENTS into the traced function (via a
    closure that forwards the device-array pytree), never closed over as
    jit constants: on the axon TPU backend, constants embedded in the
    executable are re-shipped through the tunnel on every invocation, which
    made each large table cost ~16 ms *per call* (~50x the actual gather).
    """
    import jax

    traced = jax.jit(_make_traced_fn(compiled))

    def fn(cps, cts, lengths):
        return traced(cps, cts, lengths, tables)

    return fn


def _make_score_core(c):
    """The scoring core over PRE-PROJECTED char symbols: callers supply
    ``syms`` (dense char symbol ids, 0 = OOV/padding) so the lean serve
    kernel can produce them from one fused (sym, ctype) table gather."""
    import jax
    import jax.numpy as jnp

    from .ops.hashmatch import hash_match_for, hash_match_longest
    from .ops.match import match_longest_fused
    from .ops.score import (
        shift_add_scores,
        type_cache_scores,
        type_pos_scores,
        type_split_scores,
        wide_add_scores,
        wide_offset_span,
    )

    pad_left = c.pad_left
    pad_right = c.pad_right
    bias = c.bias
    char_wide_meta = (
        wide_offset_span(c.char_matcher) if c.char_matcher else None
    )
    type_wide_meta = (
        wide_offset_span(c.type_matcher) if c.type_matcher else None
    )
    # static hash-match metadata (cached per matcher; same objects whose
    # tables _tables() uploaded — ops/hashmatch.py)
    char_hm = hash_match_for(c.char_matcher) if c.char_matcher else None
    type_hm = hash_match_for(c.type_matcher) if c.type_matcher else None
    # per-position match states are only consumed by tag scoring; on a
    # bandwidth-bound pipeline not returning them lets XLA drop the
    # (B, L) int32 stores (~4 B/char of HBM writes) from the hot path
    want_states = c.tag_meta is not None

    def core(syms, cts, lengths, tables):
        B, L = cts.shape
        S = pad_left + (L - 1) + pad_right
        scores = jnp.full((B, S), bias, dtype=jnp.int32)
        char_match = None
        type_match = None
        if "char" in tables:
            walk_tab, rf, rc, w8, off = tables["char"]
            if "char_hm" in tables and char_hm is not None:
                char_match = hash_match_longest(
                    syms, *tables["char_hm"], char_hm
                )
            else:
                char_match = match_longest_fused(
                    syms, walk_tab, c.char_matcher.max_len,
                    dead=walk_tab.shape[0] - 1,
                    root_base=int(c.char_matcher.base[0]),
                )
            if "char_wide" in tables and char_wide_meta is not None:
                scores = wide_add_scores(
                    char_match, tables["char_wide"], char_wide_meta[0],
                    scores, pad_left,
                )
            else:
                scores = shift_add_scores(
                    char_match, rf, rc, w8, off, c.char_matcher, scores,
                    pad_left, c.char_matcher.max_chunks,
                )
        if "type_split" in tables:
            scores = type_split_scores(
                cts, lengths, *tables["type_split"], c.type_window_size,
                c.type_split_maxn, scores, pad_left,
            )
        elif "type_pos" in tables:
            scores = type_pos_scores(
                cts, lengths, tables["type_pos"], c.type_window_size,
                c.type_pos_m, scores, pad_left,
            )
        elif "type_cache" in tables:
            scores = type_cache_scores(
                cts, lengths, tables["type_cache"], c.type_window_size,
                scores, pad_left,
            )
        elif "type" in tables:
            walk_tab, rf, rc, w8, off = tables["type"]
            t_idx = jax.lax.broadcasted_iota(jnp.int32, cts.shape, 1)
            tsyms = jnp.where(t_idx < lengths[:, None], cts, 0)
            if "type_hm" in tables and type_hm is not None:
                type_match = hash_match_longest(
                    tsyms, *tables["type_hm"], type_hm
                )
            else:
                type_match = match_longest_fused(
                    tsyms, walk_tab, c.type_matcher.max_len,
                    dead=walk_tab.shape[0] - 1,
                    root_base=int(c.type_matcher.base[0]),
                )
            if "type_wide" in tables and type_wide_meta is not None:
                scores = wide_add_scores(
                    type_match, tables["type_wide"], type_wide_meta[0],
                    scores, pad_left,
                )
            else:
                scores = shift_add_scores(
                    type_match, rf, rc, w8, off, c.type_matcher, scores,
                    pad_left, c.type_matcher.max_chunks,
                )
        if not want_states:
            return scores, None, None
        return scores, char_match, type_match

    return core


def _project_char_syms(c, cps, tables):
    """Codepoint -> dense char symbol projection (0 = OOV/padding)."""
    import jax.numpy as jnp

    from .ops.match import hash_project_fused

    if "char_hash2" in tables:
        return hash_project_fused(
            cps, c.char_hash_mul, c.char_hash_shift, tables["char_hash2"]
        )
    if "char_sym_bmp" in tables:
        bmp = cps < 0x10000
        safe = jnp.where(bmp, cps, 0)
        return jnp.where(
            bmp, tables["char_sym_bmp"][safe].astype(jnp.int32), 0
        )
    return tables["char_sym"][cps]


def _make_traced_fn(c):
    core = _make_score_core(c)

    def fn(cps, cts, lengths, tables):
        syms = (
            _project_char_syms(c, cps, tables) if "char" in tables else None
        )
        return core(syms, cts, lengths, tables)

    return fn
