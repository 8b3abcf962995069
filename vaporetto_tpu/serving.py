"""Lean high-throughput serving pipeline (stdin -> tokenized stdout).

The reference predict CLI's whole-pipeline contract is wall-clock elapsed
over the per-line loop (predict/src/main.rs:124,183-185). This module is
the TPU-native equivalent tuned end-to-end:

    bytes -> native uint16 tensorize (+ fused fullwidth normalization)
          -> device boundary kernel (uint16 in, int8 out, wsconst fused)
          -> native byte-level detokenizer against the ORIGINAL bytes
          -> bytes

* ~3 B/char crosses the host<->device boundary (uint16 codepoints in,
  int8 gap labels out) vs ~16 B/char on the general path.
* Each stage is C++ or XLA; Python only orchestrates batches. Lines are
  addressed as (start, end) byte ranges straight into the read chunk —
  the input bytes are never copied host-side.
* Double buffering: batch k+1 is dispatched before batch k's result is
  read back, overlapping device compute with host detokenization.

Lines the lean path cannot represent (astral-plane codepoints) fall back
to the caller-provided general path, preserving output order.
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

    ``--predict-tags`` (device tag pass, predictor.serve_tags_fn — check
    :func:`lean_tags_supported` on the built predictor too) and
    ``--scores`` (int32 score readback + native score formatter,
    predictor.serve_scores_fn) are lean-capable since round 3; their
    combination and ``--tag-scores`` still take the general path.
    """
    from .native import available, scores_detok_available

    if args_like.scores and (
        args_like.predict_tags or not scores_detok_available()
    ):
        return False
    if args_like.predict_tags and "G" in args_like.wsconst:
        # the device tag pass derives token spans from the pre-G
        # boundaries; LeanServer rejects the combination too
        return False
    backend = getattr(args_like, "backend", "device")
    return (
        not args_like.tag_scores
        and backend in ("device", "host")
        and all(w in _WSCONST_FAST for w in args_like.wsconst)
        and available()
    )


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
    ):
        if mesh is not None and batch_lines % mesh.devices.size:
            raise ValueError("batch_lines must divide by the mesh size")
        if tags and scores:
            raise ValueError("lean path supports tags or scores, not both")
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
        host_engine = getattr(predictor, "backend", "device") == "host"
        if host_engine and mesh is not None:
            raise ValueError("the lean host engine takes no device mesh")
        if self.tags:
            from .native import TagEmitPlan

            self.fn = (
                predictor.serve_tags_host_fn(tuple(sorted(wsconst)))
                if host_engine
                else predictor.serve_tags_fn(
                    tuple(sorted(wsconst)), mesh=mesh
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
                    tuple(sorted(wsconst)), mesh=mesh
                )
            )
        else:
            self.fn = (
                predictor.serve_boundaries_host_fn(tuple(sorted(wsconst)))
                if host_engine
                else predictor.serve_boundaries_fn(
                    tuple(sorted(wsconst)), mesh=mesh
                )
            )
        self.norm_map = _fullwidth_norm_map() if normalize else None
        self._scratch: dict = {}  # reused detok output buffer
        self.batch_lines = batch_lines
        self.fallback = fallback
        self.n_lines = 0
        self.n_chars = 0

    # ------------------------------------------------------------------

    def _dispatch(self, blob, starts, ends, n_valid):
        """Tensorize + dispatch one group; returns the pending tuple or
        None if the group needs the general path."""
        from .native import available, count_chars_native, tensorize16_native

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
        max_chars = int(counts.max(initial=0))
        if max_chars > self.predictor.LONG_SENTENCE_THRESHOLD:
            # very long lines go through the general path's halo-overlap
            # chunking (parallel/chunking.py) instead of inflating the
            # device batch shape
            return None
        L = bucket_length(max_chars + 1)
        t16 = tensorize16_native(blob, starts, ends, L, self.norm_map)
        if t16 is None:
            return None
        cps, lengths = t16
        res = self.fn(cps, lengths)
        self.n_lines += n_valid
        self.n_chars += int(lengths[:n_valid].sum())
        host = (cps, lengths) if (self.scores or self.grapheme) else None
        return res, blob, starts[:n_valid], ends[:n_valid], host

    def _realize(self, pending, out) -> None:
        from .native import (
            detok_native,
            detok_scores_native,
            detok_tags_native,
        )

        res, blob, starts, ends, host = pending
        n = len(starts)
        if self.scores:
            bnd_d, sc_d = res
            if self.grapheme:
                bnd = np.array(bnd_d)  # writable copy for the host mask
                self._apply_grapheme(bnd, host, n)
            else:
                bnd = np.asarray(bnd_d)
            sc = np.asarray(sc_d)
            cps_h, lengths_h = host
            data = detok_scores_native(
                blob, starts, ends, bnd[:n], cps_h[:n], lengths_h[:n],
                sc[:n],
            )
        elif self.tags:
            bnd_d, tid_d, choice_d = res
            bnd = np.asarray(bnd_d)
            tid = np.asarray(tid_d)
            choice = np.asarray(choice_d)
            data = detok_tags_native(
                blob, starts, ends, bnd[:n], tid[:n], choice[:n],
                self.plan,
            )
        else:
            if self.grapheme:
                bnd = np.array(res)  # writable copy for the host mask
                self._apply_grapheme(bnd, host, n)
            else:
                bnd = np.asarray(res)  # the one device->host readback
            data = detok_native(blob, starts, ends, bnd[:n],
                                scratch=self._scratch)
        if data is None:  # native lib raced away; should not happen
            raise RuntimeError("native detokenizer unavailable")
        out.write(data)

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
            for g in range(0, n, B):
                hi = min(g + B, n)
                gs = starts[g:hi]
                ge = ends[g:hi]
                if hi - g < B:  # pad the tail group with empty lines
                    pad = np.zeros(B - (hi - g), dtype=np.int64)
                    gs = np.concatenate((gs, pad))
                    ge = np.concatenate((ge, pad))
                done = self._dispatch(blob, gs, ge, hi - g)
                if done is None:
                    if pending is not None:
                        self._realize(pending, out)
                        pending = None
                    self._run_fallback(blob, starts[g:hi], ends[g:hi], out)
                    continue
                if pending is not None:
                    self._realize(pending, out)
                pending = done
        if pending is not None:
            self._realize(pending, out)

    def _run_fallback(self, blob, starts, ends, out) -> None:
        if self.fallback is None:
            raise RuntimeError("batch needs the general path; no fallback")
        lines = [
            blob[s:e].tobytes() for s, e in zip(starts.tolist(), ends.tolist())
        ]
        self.fallback(lines)
