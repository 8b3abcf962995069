"""Lean high-throughput serving pipeline (stdin -> tokenized stdout).

The reference predict CLI's whole-pipeline contract is wall-clock elapsed
over the per-line loop (predict/src/main.rs:124,183-185). This module is
the TPU-native equivalent tuned end-to-end:

    bytes -> native uint16 tensorize (+ fused fullwidth normalization
             and char-type classification; short-line runs PACKED
             many-per-row with separator gaps)
          -> device boundary kernel (uint16 cps + uint8 types in,
             BIT-PACKED gap mask out, wsconst fused; tag pass / score
             outputs when asked)
          -> native detokenizer against the ORIGINAL bytes (consumes the
             bit-packed gaps directly, with per-line (row, col)
             placement for packed batches)
          -> bytes

* ~3.1 B/char crosses the host<->device boundary on the boundary path
  (uint16 codepoints + uint8 types in, 1 bit per gap out) vs
  ~16 B/char on the general path; the host-computed types drop the
  device classify chain, making the serve kernel's arithmetic a strict
  subset of the full kernel's.
* Each stage is C++ or XLA; Python only orchestrates batches. Lines are
  addressed as (start, end) byte ranges straight into the read chunk —
  the input bytes are never copied host-side.
* Double buffering: batch k+1 is dispatched before batch k's result is
  read back, overlapping device compute with host detokenization.
* Short-line packing: contiguous runs of lines <= PACK_MAX_LINE chars
  pack many-per-(B, PACK_L)-row with separator gaps computed exactly
  from the compiled tables (score spill + type-window isolation), and
  groups target a constant per-dispatch character volume.

Lines the lean path cannot represent (astral-plane codepoints, NUL
bytes, over-long lines) fall back to the caller-provided general path,
preserving output order.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from .utils.batch import bucket_length

__all__ = ["LeanServer", "lean_path_supported"]

#: wsconst flags the lean path can fuse on device; G (grapheme
#: clustering) is handled by a host-side UAX#29 mask ANDed into the
#: readback (LeanServer(grapheme=True)) — order-independent because both
#: mechanisms only force gaps to NotWordBoundary
_WSCONST_FAST = {"D", "R", "H", "T", "K", "O", "G"}


def lean_path_supported(args_like) -> bool:
    """Whether the predict-CLI flag set can take the lean path.

    Since round 4 EVERY reference flag combination is lean-capable on
    the device backend: plain boundaries, ``--predict-tags``,
    ``--scores``, and the rich combinations (``--scores
    --predict-tags``, ``--tag-scores`` with ``--predict-tags``,
    reference predict main.rs:65-91) via the tag kernel's extra score
    outputs. The exceptions that still route to the general path:
    ``--predict-tags`` with wsconst G (token spans would desync from
    the host grapheme mask), ``--tag-scores`` without ``--predict-tags``
    (the general path raises exactly like the reference), and rich
    combinations on the host engine.
    """
    from .native import available, scores_detok_available

    backend = getattr(args_like, "backend", "device")
    if backend not in ("device", "host") or not available():
        return False
    if not all(w in _WSCONST_FAST for w in args_like.wsconst):
        return False
    if args_like.predict_tags and "G" in args_like.wsconst:
        # the device tag pass derives token spans from the pre-G
        # boundaries; LeanServer rejects the combination too
        return False
    if args_like.tag_scores:
        return bool(args_like.predict_tags) and backend == "device"
    if args_like.scores:
        if args_like.predict_tags:
            return backend == "device"
        return scores_detok_available()
    return True


def lean_tags_supported(predictor) -> bool:
    """Whether the lean --predict-tags path is available: the native
    tag-aware detokenizer plus, per backend, the device tag tables or
    the native host tag scorer (int8 choice output bounds candidate
    counts at 127 either way)."""
    from .native import _load

    lib = _load()
    if lib is None or not hasattr(lib, "vt_detok_tags"):
        return False
    if getattr(predictor, "backend", "device") == "host":
        meta = predictor.compiled.tag_meta
        return (
            predictor._host() is not None
            and predictor._tag_scorer() is not None
            and predictor.compiled.n_tags > 0
            and meta is not None
            and all(
                len(c) <= 127 for slots in meta.tags for c in slots
            )
        )
    return predictor.device_tag_tables() is not None


#: rows of this width hold the packed short-line layout
PACK_L = 512
#: lines at most this long are packed many-per-row
PACK_MAX_LINE = 64
#: packed super-groups target this many filled rows per dispatch (~2M
#: chars — the same per-dispatch volume as the unpacked (8192, 256)
#: long-line batches, so short lines stop paying the per-dispatch
#: round-trip floor thousands of times more often than long ones)
PACK_TARGET_ROWS = 4096


def pack_separator(compiled) -> int:
    """Separator width (codepoint-0 chars) between packed lines.

    Must cover (a) score spill: the rightmost gap any match's weights
    can reach past its end position — computed exactly from the packed
    weight rows (off + last nonzero lane), and (b) type-window context
    isolation: a gap's window sees ``type_window_size - 1`` chars beyond
    the line end, which must all read as symbol 0 exactly like the
    reference's out-of-sentence positions
    (type_scorer/boundary_scorer_cache.rs increment_seqid_without_char).
    Char patterns can never span a separator (codepoint 0 projects to
    the OOV symbol), so within-line matches are unaffected.
    """
    sep = max(1, compiled.type_window_size - 1)
    for m in (compiled.char_matcher, compiled.type_matcher):
        if m is None or not len(m.w8):
            continue
        nz = m.w8 != 0
        has = nz.any(axis=1)
        last = np.where(has, 7 - nz[:, ::-1].argmax(axis=1), -(10**6))
        n = min(len(m.off), len(last))
        if n:
            sep = max(sep, int((m.off[:n] + last[:n]).max(initial=0)))
    return sep


_UNSAFE_TABLE: Optional[np.ndarray] = None


def _grapheme_unsafe_table() -> np.ndarray:
    """bool[65536]: BMP codepoints that can participate in a multi-char
    UAX#29 extended grapheme cluster.

    A codepoint ``c`` is SAFE iff ``"A" + c + c + "A"`` segments into 4
    singleton clusters: backward-joiners (Extend, SpacingMark, ZWJ) fail
    the ``A c`` pair, forward-joiners (Prepend) fail ``c A``, and
    same-class pairs (Hangul jamo, regional indicators) fail ``c c``.
    CR is special-cased unsafe (the CRLF pair is one cluster and the
    self-test cannot see cross-class pairs). Built lazily once
    (~0.3 s), only when a grapheme-filtered lean server runs.
    """
    global _UNSAFE_TABLE
    if _UNSAFE_TABLE is None:
        from .rules.sentence_filters import _GRAPHEME_RE

        unsafe = np.zeros(65536, dtype=bool)
        probe = _GRAPHEME_RE.findall
        for c in range(65536):
            if 0xD800 <= c <= 0xDFFF:
                continue  # surrogates cannot appear in decoded text
            ch = chr(c)
            if len(probe("A" + ch + ch + "A")) != 4:
                unsafe[c] = True
        unsafe[0x0D] = True
        _UNSAFE_TABLE = unsafe
    return _UNSAFE_TABLE


def _fullwidth_norm_map() -> np.ndarray:
    """uint16[65536] codepoint map of the KyTea fullwidth filter
    (kytea_fullwidth.rs:13-118); identity elsewhere."""
    from .rules.string_filters import FULLWIDTH_MAP

    table = np.arange(65536, dtype=np.uint16)
    for src, dst in FULLWIDTH_MAP.items():
        table[ord(src)] = ord(dst)
    return table


class LeanServer:
    """Streams line-delimited UTF-8 through the lean boundary pipeline.

    ``wsconst``: character-type codes (ints) fused as device-side
    KyteaWsConst filters. ``fallback(lines: List[bytes])`` handles batches
    the lean path rejects (must write its own output, in order).
    """

    def __init__(
        self,
        predictor,
        wsconst: Sequence[int] = (),
        normalize: bool = True,
        batch_lines: int = 8192,
        fallback: Optional[Callable[[List[bytes]], None]] = None,
        mesh=None,
        tags: bool = False,
        scores: bool = False,
        grapheme: bool = False,
        tag_scores: bool = False,
    ):
        if mesh is not None and batch_lines % mesh.devices.size:
            raise ValueError("batch_lines must divide by the mesh size")
        if tag_scores and not tags:
            # mirrors the reference/general behavior: --tag-scores needs
            # a tag-enabled predictor (main.rs:112-115)
            raise ValueError("lean tag_scores requires tags")
        if tags and grapheme:
            # the device tag pass derives token spans from the pre-G
            # boundaries; a post-hoc host mask would desynchronize them —
            # callers must route tags+G to the general path
            raise ValueError("lean tag path cannot compose with the "
                             "grapheme filter")
        self.predictor = predictor
        self.tags = bool(tags)
        self.scores = bool(scores)
        self.grapheme = bool(grapheme)
        self.tag_scores = bool(tag_scores)
        #: tag pass with extra score outputs: --predict-tags with
        #: --scores and/or --tag-scores (reference main.rs:65-91), device
        #: kernels + host formatting
        self.rich = self.tags and (self.scores or self.tag_scores)
        host_engine = getattr(predictor, "backend", "device") == "host"
        if host_engine and mesh is not None:
            raise ValueError("the lean host engine takes no device mesh")
        # host-computed char types (round 5): the native tensorizer
        # classifies during decode (as the reference engine does,
        # sentence.rs:264-283), so the device serve kernels skip the
        # classify chain — their arithmetic becomes a strict subset of
        # the full kernel's. Requires the round-5 native ABI.
        from .native import abi_version

        self._host_types = not host_engine and abi_version() >= 5
        ht = self._host_types
        if self.rich:
            from .native import TagEmitPlan

            if host_engine:
                raise ValueError(
                    "lean tags+scores combinations run on the device "
                    "backend"
                )
            self.fn = predictor.serve_tags_fn(
                tuple(sorted(wsconst)), mesh=mesh,
                want_gap_scores=self.scores,
                want_tag_scores=self.tag_scores, host_types=ht,
            )
            self.plan = TagEmitPlan(
                predictor.compiled.tag_meta, predictor.compiled.n_tags
            )
            self.tag_meta = predictor.compiled.tag_meta
        elif self.tags:
            from .native import TagEmitPlan

            self.fn = (
                predictor.serve_tags_host_fn(tuple(sorted(wsconst)))
                if host_engine
                else predictor.serve_tags_fn(
                    tuple(sorted(wsconst)), mesh=mesh, host_types=ht
                )
            )
            self.plan = TagEmitPlan(
                predictor.compiled.tag_meta, predictor.compiled.n_tags
            )
        elif self.scores:
            self.fn = (
                predictor.serve_scores_host_fn(tuple(sorted(wsconst)))
                if host_engine
                else predictor.serve_scores_fn(
                    tuple(sorted(wsconst)), mesh=mesh, host_types=ht
                )
            )
        else:
            self.fn = (
                predictor.serve_boundaries_host_fn(tuple(sorted(wsconst)))
                if host_engine
                else predictor.serve_boundaries_fn(
                    tuple(sorted(wsconst)), mesh=mesh, host_types=ht
                )
            )
        self.norm_map = _fullwidth_norm_map() if normalize else None
        self._scratch: dict = {}  # reused detok output buffer
        self.batch_lines = batch_lines
        self.fallback = fallback
        self.n_lines = 0
        self.n_chars = 0
        #: per-run pipeline breakdown (the captured tag-path diagnosis,
        #: VERDICT r4 #3): dispatch counts, device->host readback bytes
        #: and seconds, native detok seconds
        self.stats = {
            "dispatches": 0, "packed_dispatches": 0, "fallback_lines": 0,
            "readback_bytes": 0, "t_readback_s": 0.0, "t_detok_s": 0.0,
        }
        # short-line packing: many lines per (B, PACK_L) device row with
        # codepoint-0 separator gaps, so ~10-char lines stop paying a
        # full padded row + per-line dispatch share each (the reference's
        # per-line loop has zero padding waste; this recovers that for
        # batched device serving). Since round 5 EVERY device flag set
        # packs — boundaries, tags, scores, the rich combinations, and
        # sharded batches (the packed row count is rounded up to the
        # mesh size) — because the native v2 detokenizers read results
        # at per-line (row, col) placement directly. The host engine's
        # sequential C++ scan has per-line semantics (separators would
        # need host-side isolation), so it stays unpacked.
        self.pack = not host_engine
        self._mesh_div = int(mesh.devices.size) if mesh is not None else 1
        from .native import detok_tags2_available

        if not detok_tags2_available() and (tags or scores or self.rich):
            # stale native lib without the placement-aware v2 writers:
            # these paths fall back to dense per-line slicing, which
            # only supports the unpacked layout
            self.pack = False
        self._sep = pack_separator(predictor.compiled) if self.pack else 0
        self._ts_plan = None
        if self.tag_scores:
            from .native import TagScoresPlan

            self._ts_plan = TagScoresPlan(predictor.compiled.tag_meta)
        #: small-model fused tid+choice readback word (see
        #: Predictor.serve_tags_traced_fn)
        self._packed_tc = getattr(self.fn, "packed_tc", False)
        self._n_tag_slots = getattr(self.fn, "n_tag_slots", 0)
        #: every device kernel returns bit-packed gaps (8/byte) since
        #: round 5; the host engine returns bytes
        self.bits = not host_engine

    # ------------------------------------------------------------------

    def _count_chars(self, blob, starts, ends) -> Optional[np.ndarray]:
        from .native import available, count_chars_native

        counts = count_chars_native(blob, starts, ends)
        if counts is None:
            if not available():  # no native lib at all: general path
                return None
            # library predates vt_count_chars: portable numpy count
            csum = np.empty(len(blob) + 1, dtype=np.int32)
            csum[0] = 0
            np.cumsum((blob & 0xC0) != 0x80, dtype=np.int32,
                      out=csum[1:])
            counts = csum[ends] - csum[starts]
        return counts

    def _dispatch(self, blob, starts, ends, n_valid):
        """Tensorize + dispatch one group; returns the pending tuple or
        None if the group needs the general path."""
        from .native import tensorize16_native

        counts = self._count_chars(blob, starts, ends)
        if counts is None:
            return None
        max_chars = int(counts.max(initial=0))
        if max_chars > self.predictor.LONG_SENTENCE_THRESHOLD:
            # very long lines go through the general path's halo-overlap
            # chunking (parallel/chunking.py) instead of inflating the
            # device batch shape
            return None
        L = bucket_length(max_chars + 1)
        t16 = tensorize16_native(blob, starts, ends, L, self.norm_map,
                                 want_types=self._host_types)
        if t16 is None:
            return None
        if self._host_types:
            cps, lengths, cts = t16
            res = self.fn(cps, cts, lengths)
        else:
            cps, lengths = t16
            res = self.fn(cps, lengths)
        self.n_lines += n_valid
        self.n_chars += int(lengths[:n_valid].sum())
        self.stats["dispatches"] += 1
        # cps/lengths are host-side numpy (the tensorizer's output);
        # carrying them costs nothing and the v2 detokenizers use
        # lengths as the per-line char counts
        return res, blob, starts[:n_valid], ends[:n_valid], \
            (cps, lengths), None

    def _pack_groups(self, counts: np.ndarray):
        """Split a chunk's lines into dispatch groups: contiguous runs
        of short lines become PACKED super-groups sized by cumulative
        character width (so every dispatch carries ~PACK_TARGET_ROWS
        full rows regardless of line length), long lines fall into
        classic ``batch_lines``-line groups. Yields (lo, hi, packed)."""
        n = len(counts)
        if n == 0:
            return
        B = self.batch_lines
        sep = self._sep
        cap = PACK_L - PACK_MAX_LINE - sep
        target = cap * PACK_TARGET_ROWS
        is_long = counts > PACK_MAX_LINE
        # run boundaries: positions where long/short flips
        flips = np.flatnonzero(np.diff(is_long.astype(np.int8))) + 1
        run_edges = np.concatenate(([0], flips, [n]))
        width = counts.astype(np.int64) + sep
        for r in range(len(run_edges) - 1):
            a, b = int(run_edges[r]), int(run_edges[r + 1])
            if is_long[a]:
                for lo in range(a, b, B):
                    yield lo, min(lo + B, b), False
            else:
                cum = np.cumsum(width[a:b])
                lo = a
                while lo < b:
                    base = cum[lo - a - 1] if lo > a else 0
                    hi = a + int(
                        np.searchsorted(cum, base + target, side="left")
                    ) + 1
                    hi = min(max(hi, lo + 1), b, lo + (1 << 17))
                    yield lo, hi, True
                    lo = hi

    def _dispatch_packed(self, blob, starts, ends, n_valid, counts,
                         max_chars):
        """Short-line packing dispatch: place lines into (B, PACK_L)
        rows at cumulative offsets with ``self._sep`` separator chars,
        run the boundary kernel on the packed rows, and let ``_realize``
        unpack per-line gap slices. Returns the pending tuple or None to
        fall through to the unpacked path."""
        from .native import tensorize16_packed_native

        sep = self._sep
        # vectorized placement: conceptual stream position -> (row, col)
        # with capacity cap per row; a line starting before the cap
        # boundary may extend up to max_chars + sep beyond it, hence the
        # headroom. Utilization ~= cap / PACK_L.
        cap = PACK_L - max_chars - sep
        if cap < max(2 * max_chars, 16):
            return None  # lines too long to pack profitably
        width = counts.astype(np.int64) + sep
        s_pos = np.zeros(len(width), dtype=np.int64)
        np.cumsum(width[:-1], out=s_pos[1:])
        row = (s_pos // cap).astype(np.int32)
        col = (s_pos - row.astype(np.int64) * cap).astype(np.int32)
        n_rows = int(row[-1]) + 1 if len(row) else 1
        # row-count buckets: pow2 or 0.75*pow2 (e.g. 1536, 3072) — the
        # ragged last group of a chunk otherwise pays up to 2x padding
        # in device compute AND readback for at most 2x the compiled
        # shape variety
        p = max(64, 1 << (n_rows - 1).bit_length())
        B = 3 * p // 4 if (3 * p // 4 >= n_rows and p >= 256) else p
        if B % self._mesh_div:  # sharded batch: keep B divisible
            B = -(-B // self._mesh_div) * self._mesh_div
        t16 = tensorize16_packed_native(
            blob, starts, ends, row, col, B, PACK_L, self.norm_map,
            want_types=self._host_types,
        )
        if t16 is None:
            return None
        lengths = np.full(B, PACK_L, dtype=np.int32)
        if self._host_types:
            cps, cts = t16
            res = self.fn(cps, cts, lengths)
        else:
            cps = t16
            res = self.fn(cps, lengths)
        self.n_lines += n_valid
        self.n_chars += int(counts[:n_valid].sum())
        self.stats["dispatches"] += 1
        self.stats["packed_dispatches"] += 1
        packed = (row[:n_valid], col[:n_valid], max_chars,
                  counts[:n_valid].astype(np.int32))
        return res, blob, starts[:n_valid], ends[:n_valid], \
            (cps, lengths), packed

    def _realize(self, pending, out) -> None:
        import time as _time

        from .native import detok_native

        res, blob, starts, ends, host, packed = pending
        n = len(starts)
        st = self.stats
        if packed is not None:
            row, col, max_chars, counts = packed
        else:
            row = col = None
            counts = host[1][:n] if host is not None else None
        if not self.bits:  # host engine: dense byte rows, unpacked
            self._realize_host(res, blob, starts, ends, host, n, out)
            return
        # ---- device engine: bit-packed gaps, optional placement ------
        if self.tags:  # incl. the rich combinations
            t0 = _time.perf_counter()
            it = iter(res)
            bits = np.asarray(next(it))
            if self._packed_tc:
                w = np.asarray(next(it))
                tid = choice = None
            else:
                w = None
                tid = np.asarray(next(it))
                choice = np.asarray(next(it))
            gap_sc = np.asarray(next(it)) if self.scores else None
            tag_sc = np.asarray(next(it)) if self.tag_scores else None
            st["t_readback_s"] += _time.perf_counter() - t0
            st["readback_bytes"] += (
                bits.nbytes
                + (w.nbytes if w is not None
                   else tid.nbytes + choice.nbytes)
                + (gap_sc.nbytes if gap_sc is not None else 0)
                + (tag_sc.nbytes if tag_sc is not None else 0)
            )
            if w is not None:
                # small-model fused word: (tid+1) | (c0+1)<<7 |
                # (c1+1)<<11 — unpack with three vectorized host ops
                tid = (w & 0x7F).astype(np.int16) - 1
                tid = tid.astype(np.int8)
                S = self._n_tag_slots
                cols = [
                    ((w >> (7 + 4 * s)) & 0xF).astype(np.int16) - 1
                    for s in range(S)
                ]
                choice = np.stack(cols, axis=-1).astype(np.int8)
            data = self._detok_tags(
                bits, tid, choice, gap_sc, tag_sc, blob, starts, ends,
                host, n, row, col, counts,
            )
        elif self.scores:
            t0 = _time.perf_counter()
            bits_d, sc_d = res
            bits = np.asarray(bits_d)
            sc = np.asarray(sc_d)
            st["t_readback_s"] += _time.perf_counter() - t0
            st["readback_bytes"] += bits.nbytes + sc.nbytes
            if self.grapheme:
                bits = self._grapheme_bits(
                    bits, host, bits.shape[0] if packed is not None else n
                )
            from .native import detok_scores2_native, detok_scores_native

            t0 = _time.perf_counter()
            data = detok_scores2_native(
                blob, starts, ends, bits, counts, host[0], sc, row, col
            )
            if data is None and packed is None:
                # stale native lib without v2: dense byte fallback
                from .predictor import unpack_gap_bits

                bnd = unpack_gap_bits(bits)[:, : sc.shape[1]]
                data = detok_scores_native(
                    blob, starts, ends, bnd[:n].astype(np.int8),
                    host[0][:n], counts, sc[:n],
                )
            st["t_detok_s"] += _time.perf_counter() - t0
        else:
            from .native import detok_bits_native

            t0 = _time.perf_counter()
            raw = np.asarray(res)  # the one device->host readback
            st["t_readback_s"] += _time.perf_counter() - t0
            st["readback_bytes"] += raw.nbytes
            if self.grapheme:
                raw = self._grapheme_bits(
                    raw, host, raw.shape[0] if packed is not None else n
                )
            t0 = _time.perf_counter()
            if packed is not None:
                data = detok_bits_native(
                    blob, starts, ends, raw,
                    max(max_chars - 1, 0), row, col,
                    scratch=self._scratch,
                )
            else:
                data = detok_bits_native(
                    blob, starts, ends, raw[:n], raw.shape[1] * 8,
                    scratch=self._scratch,
                )
            if data is None and packed is None:
                # stale native lib without vt_detok_bits: byte fallback
                from .predictor import unpack_gap_bits

                bnd = unpack_gap_bits(raw)
                data = detok_native(
                    blob, starts, ends, bnd[:n].astype(np.int8),
                    scratch=self._scratch,
                )
            st["t_detok_s"] += _time.perf_counter() - t0
        if data is None:  # native lib raced away; should not happen
            raise RuntimeError("native detokenizer unavailable")
        out.write(data)

    def _detok_tags(self, bits, tid, choice, gap_sc, tag_sc, blob,
                    starts, ends, host, n, row, col, counts):
        """Native tag emission (vt_detok_tags2): bit boundaries, narrow
        tid, per-line placement, and the rich diagnostic blocks emitted
        in C++ (byte-identical to the general path's ``_emit_outputs``
        tail; reference print_scores/print_tag_scores, main.rs:65-91).
        Falls back to the round-4 dense path on stale native libs
        (unpacked layouts only — packing is disabled without v2)."""
        import time as _time

        from .native import detok_tags2_native

        st = self.stats
        t0 = _time.perf_counter()
        data = detok_tags2_native(
            blob, starts, ends, bits, counts, tid, choice, self.plan,
            rows_of=row, cols_of=col,
            cps16=host[0] if (gap_sc is not None or tag_sc is not None)
            else None,
            gap_scores=gap_sc, tag_scores=tag_sc, ts_plan=self._ts_plan,
        )
        st["t_detok_s"] += _time.perf_counter() - t0
        if data is not None:
            return data
        # stale-lib fallback: dense bytes + int32, Python block formatting
        from .predictor import unpack_gap_bits

        bnd = unpack_gap_bits(bits)[:, : tid.shape[1] - 1]
        if self.rich:
            return self._format_rich_py(
                bnd, tid, choice, gap_sc, tag_sc, blob, starts, ends,
                host, n,
            )
        from .native import detok_tags_native

        return detok_tags_native(
            blob, starts, ends, bnd[:n].astype(np.int8),
            tid[:n].astype(np.int32), choice[:n], self.plan,
        )

    def _realize_host(self, res, blob, starts, ends, host, n, out) -> None:
        """Host-engine realization: dense byte boundaries, unpacked."""
        import time as _time

        from .native import (
            detok_native,
            detok_scores_native,
            detok_tags_native,
        )

        st = self.stats
        t0 = _time.perf_counter()
        if self.scores:
            bnd, sc = res
            cps_h, lengths_h = host
            bnd = np.asarray(bnd)
            if self.grapheme:
                bnd = np.array(bnd)  # writable copy for the host mask
                self._apply_grapheme(bnd, host, n)
            data = detok_scores_native(
                blob, starts, ends, bnd[:n], cps_h[:n],
                lengths_h[:n], np.asarray(sc)[:n],
            )
        elif self.tags:
            bnd, tid, choice = res
            data = detok_tags_native(
                blob, starts, ends, np.asarray(bnd)[:n],
                np.asarray(tid)[:n], np.asarray(choice)[:n], self.plan,
            )
        else:
            bnd = np.asarray(res)
            if self.grapheme:
                bnd = np.array(bnd)
                self._apply_grapheme(bnd, host, n)
            data = detok_native(
                blob, starts, ends, bnd[:n].astype(np.int8),
                scratch=self._scratch,
            )
        st["t_detok_s"] += _time.perf_counter() - t0
        if data is None:
            raise RuntimeError("native detokenizer unavailable")
        out.write(data)

    def _format_rich_py(self, bnd, tid, choice, gap_sc, tag_sc, blob,
                        starts, ends, host, n) -> bytes:
        """Python fallback for the rich diagnostic blocks (stale native
        lib only; the shipped path is native, vt_detok_tags2)."""
        from .native import detok_tags_native

        cps_h, lens_h = host
        data = detok_tags_native(
            blob, starts, ends, bnd[:n].astype(np.int8),
            tid[:n].astype(np.int32), choice[:n], self.plan
        )
        if data is None:
            raise RuntimeError("native detokenizer unavailable")
        lines = bytes(data).split(b"\n")
        meta = self.tag_meta
        parts: List[bytes] = []
        for i in range(n):
            parts.append(lines[i])
            parts.append(b"\n")
            ln = int(lens_h[i])
            if ln == 0:
                # the general path's from_raw("") error: bare line, no
                # blocks
                continue
            if self.scores:
                row = cps_h[i]
                sc_row = gap_sc[i]
                parts.extend(
                    f"{g}:{chr(row[g])}{chr(row[g + 1])} "
                    f"{int(sc_row[g])}\n".encode("utf-8")
                    for g in range(ln - 1)
                )
                parts.append(b"\n")
            if self.tag_scores:
                b = bnd[i, : ln - 1] if ln > 1 else bnd[i, :0]
                token_ends = np.flatnonzero(b).tolist() + [ln - 1]
                st = 0
                for e in token_ends:
                    surface = "".join(
                        chr(c) for c in cps_h[i, st : e + 1]
                    )
                    buf = [surface.encode("utf-8")]
                    t = int(tid[i, e])
                    if t >= 0:
                        sc_row = tag_sc[i, e]
                        k = 0
                        for cands in meta.tags[t]:
                            if len(cands) == 1:
                                cell = f"{cands[0]}:0"
                            else:
                                cell = ",".join(
                                    f"{cand}:{int(sc_row[k + j])}"
                                    for j, cand in enumerate(cands)
                                )
                                k += len(cands)
                            buf.append(b"\t")
                            buf.append(cell.encode("utf-8"))
                    parts.append(b"".join(buf))
                    parts.append(b"\n")
                    st = e + 1
                parts.append(b"\n")
        return b"".join(parts)

    def _grapheme_bits(self, bits: np.ndarray, host,
                       n_rows: int) -> np.ndarray:
        """Apply the host grapheme mask to bit-packed gap rows:
        unpack -> mask -> repack (the unsafe-codepoint prefilter makes
        this near-free on typical CJK corpora)."""
        from .predictor import pack_gap_bits_np, unpack_gap_bits

        bnd = unpack_gap_bits(bits)
        self._apply_grapheme(bnd, host, n_rows)
        return pack_gap_bits_np(bnd)

    def _apply_grapheme(self, bnd: np.ndarray, host, n: int) -> None:
        """AND the ConcatGraphemeClustersFilter into the boundary mask:
        gaps strictly inside a UAX#29 extended grapheme cluster of the
        NORMALIZED text become NotWordBoundary
        (concat_grapheme_clusters.rs:11-35). Composes with the device
        wsconst filters in any order — both only force gaps to 0.

        A vectorized pre-filter skips the per-line Python regex for
        lines containing no cluster-capable codepoint — on typical CJK
        corpora almost every line, keeping the lean path's host cost
        near zero even under ``--wsconst G``."""
        from .rules.sentence_filters import _GRAPHEME_RE

        cps_h, lens_h = host
        unsafe = _grapheme_unsafe_table()
        rows = np.flatnonzero(unsafe[cps_h[:n]].any(axis=1))
        for i in rows.tolist():
            ln = int(lens_h[i])
            if ln < 2:
                continue
            text = "".join(map(chr, cps_h[i, :ln].tolist()))
            start = 0
            for m in _GRAPHEME_RE.finditer(text):
                nc = m.end() - m.start()
                if nc > 1:
                    bnd[i, start : start + nc - 1] = 0
                start += nc

    # ------------------------------------------------------------------

    def run(self, infile, out) -> None:
        """Stream ``infile`` (binary) to ``out`` (binary), line-delimited.

        Batches are exactly ``batch_lines`` rows (short tails padded with
        empty lines so jit sees one batch dimension); row length is
        bucketed per batch.
        """
        read_chunk = max(1 << 23, self.batch_lines * 512)
        pending = None
        carry = b""
        eof = False
        while not eof:
            synthetic_tail = False
            data = infile.read(read_chunk)
            if not data:
                eof = True
                data = carry
                if not data:
                    break
                if not data.endswith(b"\n"):
                    data += b"\n"
                    synthetic_tail = True
                carry = b""
            else:
                data = carry + data
                cut = data.rfind(b"\n")
                if cut < 0:
                    carry = data
                    continue
                carry = data[cut + 1 :]
                data = data[: cut + 1]
            blob = np.frombuffer(data, dtype=np.uint8)
            from .native import find_newlines_native

            nl = find_newlines_native(blob)
            if nl is None:
                nl = np.flatnonzero(blob == 0x0A)
            if len(nl) == 0:
                continue
            starts = np.empty(len(nl), dtype=np.int64)
            starts[0] = 0
            starts[1:] = nl[:-1] + 1
            ends = nl
            # strip a trailing '\r' (CRLF input) from each line, matching
            # the reference's BufRead::lines — which strips '\r' only when
            # it precedes '\n', so the synthetic newline appended to an
            # unterminated final line exempts that line's CR
            has_cr = (ends > starts) & (blob[np.maximum(ends - 1, 0)] == 0x0D)
            if synthetic_tail:
                has_cr[-1] = False
            ends = ends - has_cr.astype(np.int64)
            B = self.batch_lines
            n = len(nl)
            counts_all = (
                self._count_chars(blob, starts, ends) if self.pack else None
            )
            if counts_all is not None:
                groups = self._pack_groups(counts_all)
            else:
                groups = (
                    (g, min(g + B, n), False) for g in range(0, n, B)
                )
            for lo, hi, packed in groups:
                sub = [(lo, hi, packed)]
                if packed:
                    done = self._dispatch_packed(
                        blob, starts[lo:hi], ends[lo:hi], hi - lo,
                        counts_all[lo:hi],
                        int(counts_all[lo:hi].max(initial=0)),
                    )
                    if done is None:
                        # NUL/astral inside the super-group: retry it in
                        # classic batch_lines-sized unpacked groups so
                        # only the failing slice pays the general path
                        sub = [
                            (g, min(g + B, hi), False)
                            for g in range(lo, hi, B)
                        ]
                    else:
                        if pending is not None:
                            self._realize(pending, out)
                        pending = done
                        continue
                for g, ghi, _ in sub:
                    gs = starts[g:ghi]
                    ge = ends[g:ghi]
                    if ghi - g < B:  # pad the tail group with empty lines
                        pad = np.zeros(B - (ghi - g), dtype=np.int64)
                        gs = np.concatenate((gs, pad))
                        ge = np.concatenate((ge, pad))
                    done = self._dispatch(blob, gs, ge, ghi - g)
                    if done is None:
                        if pending is not None:
                            self._realize(pending, out)
                            pending = None
                        self._run_fallback(
                            blob, starts[g:ghi], ends[g:ghi], out
                        )
                        continue
                    if pending is not None:
                        self._realize(pending, out)
                    pending = done
        if pending is not None:
            self._realize(pending, out)

    def _run_fallback(self, blob, starts, ends, out) -> None:
        if self.fallback is None:
            raise RuntimeError("batch needs the general path; no fallback")
        self.stats["fallback_lines"] += len(starts)
        lines = [
            blob[s:e].tobytes() for s, e in zip(starts.tolist(), ends.tolist())
        ]
        self.fallback(lines)
