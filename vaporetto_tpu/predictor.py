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
from .utils.batch import bucket_length, tensorize

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

            # Benchmarking on TPU v5e showed the XLA cost is per gather op,
            # not per table byte: one dense-table gather beats several
            # small-table gathers. The hash/positional variants remain
            # opt-in for experimentation on other backends.
            use_small_tables = (
                os.environ.get("VAPORETTO_TPU_SMALL_TABLES") == "1"
            )
            if c.char_matcher is not None:
                m = c.char_matcher
                if use_small_tables and c.char_hash_keys is not None:
                    t["char_hash"] = (
                        jnp.asarray(c.char_hash_keys),
                        jnp.asarray(c.char_hash_syms),
                    )
                else:
                    # shrink the projection table to keep it VMEM-resident:
                    # practical models have only BMP pattern chars, so a
                    # 64Ki-entry table in the narrowest dtype suffices
                    # (astral input chars are OOV -> symbol 0)
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
                t["char"] = tuple(
                    jnp.asarray(x)
                    for x in (m.base, m.check, m.inherit, m.rows_first,
                              m.rows_cnt, m.w8, m.off)
                )
            if c.type_matcher is not None:
                m = c.type_matcher
                t["type"] = tuple(
                    jnp.asarray(x)
                    for x in (m.base, m.check, m.inherit, m.rows_first,
                              m.rows_cnt, m.w8, m.off)
                )
            if use_small_tables and c.type_pos_tables is not None:
                t["type_pos"] = jnp.asarray(c.type_pos_tables)
            elif c.type_cache_table is not None:
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

    def serve_boundaries_fn(self):
        """HBM-lean serving path: ``fn(codepoints, lengths) -> int8 (B, L-1)``.

        For throughput serving where only the segmentation is needed (no
        ``--scores``, no tags). Compared to the full predict function it
        * classifies character types ON DEVICE (a VMEM-resident 64 KiB
          uint8 BMP table + astral kanji-extension range checks — exact
          parity with :func:`sentence.char_types_of_codepoints`),
        * returns only the thresholded per-gap boundary mask as int8
          instead of the padded int32 score buffer and the match tensor.

        The codepoint input may be **uint16** for pure-BMP batches (callers
        route the rare astral-plane-containing lines to the int32 path —
        dtype dispatch retraces automatically): on this HBM-bandwidth-bound
        pipeline the bytes/char ARE the throughput, and uint16-in/int8-out
        is ~3 B/char vs the full path's ~16 B/char.
        """
        import jax
        import jax.numpy as jnp

        from .sentence import _CHAR_TYPE_TABLE_SMALL, CharacterType

        tables = dict(self._tables())
        tables["ctype_bmp"] = jnp.asarray(_CHAR_TYPE_TABLE_SMALL)
        c = self.compiled
        char_off_np = c.char_matcher.off if c.char_matcher is not None else None
        type_off_np = c.type_matcher.off if c.type_matcher is not None else None
        traced = _make_traced_fn(c, char_off_np, type_off_np)
        pad_left = c.pad_left
        # plain Python ints: eager jnp scalars would be closed over as
        # device-buffer constants, which the axon tunnel re-ships on every
        # call (~16 ms each; see PERF.md)
        kanji = int(CharacterType.KANJI)
        other = int(CharacterType.OTHER)

        def fn(cps, lengths, tables):
            B, L = cps.shape
            if cps.dtype == jnp.uint16:
                cps = cps.astype(jnp.int32)
                cts = tables["ctype_bmp"][cps].astype(jnp.int32)
            else:
                bmp = cps < 0x10000
                cts = jnp.where(
                    bmp,
                    tables["ctype_bmp"][jnp.where(bmp, cps, 0)].astype(
                        jnp.int32
                    ),
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
            scores, _, _ = traced(cps, cts, lengths, tables)
            gaps = scores[:, pad_left : pad_left + L - 1] > 0
            t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, L - 1), 1)
            gaps = gaps & (t_idx < (lengths[:, None] - 1))
            return gaps.astype(jnp.int8)

        jitted = jax.jit(fn)

        def wrapper(cps, lengths):
            return jitted(cps, lengths, tables)

        return wrapper

    def predict_raw_fn(self):
        """The raw (unjitted) batch predict function over device tables.

        Signature: ``fn(codepoints, char_types, lengths) ->
        (padded_scores, char_match, type_match)``. Used by the benchmark
        harness and the driver's compile check.
        """
        tables = self._tables()
        c = self.compiled
        char_off_np = c.char_matcher.off if c.char_matcher is not None else None
        type_off_np = c.type_matcher.off if c.type_matcher is not None else None
        traced = _make_traced_fn(c, char_off_np, type_off_np)

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
        c = self.compiled
        char_off_np = c.char_matcher.off if c.char_matcher is not None else None
        type_off_np = c.type_matcher.off if c.type_matcher is not None else None
        return _make_traced_fn(c, char_off_np, type_off_np), self._tables()

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
                        np.int64
                    )
                if host.has_type:
                    s.type_pma_states = type_flat[clo : clo + n].astype(
                        np.int64
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
        """Predict boundaries for a batch of sentences in place."""
        if not sentences:
            return
        if self.backend == "host" and self.predict_host_batch(sentences):
            return
        cps, cts, lengths = tensorize(sentences)
        B, L = cps.shape
        fn = self._predict_fn(B, L)
        scores, char_match, type_match = fn(cps, cts, lengths)
        scores = np.asarray(scores)
        char_match = np.asarray(char_match) if char_match is not None else None
        type_match = np.asarray(type_match) if type_match is not None else None
        pad = self.compiled.pad_left
        for i, s in enumerate(sentences):
            n = len(s)
            s.score_padding = pad
            s.boundary_scores = scores[i, : pad + max(n - 1, 0) + 1].copy()
            exposed = scores[i, pad : pad + n - 1]
            s.boundaries = (exposed > 0).astype(np.uint8)
            if char_match is not None:
                s.char_pma_states = char_match[i, :n].astype(np.int64)
            if type_match is not None:
                s.type_pma_states = type_match[i, :n].astype(np.int64)
            s.set_predictor(self)
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

    def predict_tags(self, sentence: Sentence) -> None:
        c = self.compiled
        if c.tag_meta is None:
            raise RuntimeError(
                "this predictor is created with predict_tags = false"
            )
        if c.n_tags == 0:
            return
        n = len(sentence)
        sentence.n_tags = c.n_tags
        sentence.tags = [None] * (n * c.n_tags)
        sentence.tag_scores = [None] * n if self._store_tag_scores else []
        bounds = sentence.boundaries
        # walk gaps; emit token at each WordBoundary and at sentence end
        range_start: Optional[int] = 0
        for i, b in enumerate(np.asarray(bounds)):
            b = int(b)
            if b == 2:  # Unknown
                range_start = None
            elif b == 1:  # WordBoundary
                if range_start is not None:
                    self._tag_token(sentence, range_start, i + 1)
                range_start = i + 1
        if range_start is not None:
            self._tag_token(sentence, range_start, n)

    def _tag_token(self, sentence: Sentence, start: int, end: int) -> None:
        c = self.compiled
        meta = c.tag_meta
        token = sentence.text_substring(start, end)
        token_id = meta.token_ids.get(token)
        if token_id is None:
            return
        bias = meta.bias[token_id]
        scores = np.zeros(max(8, len(bias)), dtype=np.int32)
        scores[: len(bias)] = bias
        pos = end - 1
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

    c = compiled
    char_off_np = c.char_matcher.off if c.char_matcher is not None else None
    type_off_np = c.type_matcher.off if c.type_matcher is not None else None
    traced = jax.jit(_make_traced_fn(c, char_off_np, type_off_np))

    def fn(cps, cts, lengths):
        return traced(cps, cts, lengths, tables)

    return fn


def _make_traced_fn(c, char_off_np, type_off_np):
    import jax
    import jax.numpy as jnp

    from .ops.match import hash_project, match_longest
    from .ops.score import shift_add_scores, type_cache_scores, type_pos_scores

    pad_left = c.pad_left
    pad_right = c.pad_right
    bias = c.bias
    # per-position match states are only consumed by tag scoring; on a
    # bandwidth-bound pipeline not returning them lets XLA drop the
    # (B, L) int32 stores (~4 B/char of HBM writes) from the hot path
    want_states = c.tag_meta is not None

    def fn(cps, cts, lengths, tables):
        B, L = cps.shape
        S = pad_left + (L - 1) + pad_right
        scores = jnp.full((B, S), bias, dtype=jnp.int32)
        char_match = None
        type_match = None
        if "char" in tables:
            base, check, inherit, rf, rc, w8, off = tables["char"]
            if "char_hash" in tables:
                keys, hsyms = tables["char_hash"]
                syms = hash_project(
                    cps, c.char_hash_mul, c.char_hash_shift, keys, hsyms
                )
            elif "char_sym_bmp" in tables:
                bmp = cps < 0x10000
                safe = jnp.where(bmp, cps, 0)
                syms = jnp.where(
                    bmp, tables["char_sym_bmp"][safe].astype(jnp.int32), 0
                )
            else:
                syms = tables["char_sym"][cps]
            # padding codepoints (0) project to symbol 0 = OOV
            char_match = match_longest(
                syms, base, check, inherit, c.char_matcher.max_len
            )
            scores = shift_add_scores(
                char_match, rf, rc, w8, off, char_off_np, scores, pad_left,
                c.char_matcher.max_chunks,
            )
        if "type_pos" in tables:
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
            base, check, inherit, rf, rc, w8, off = tables["type"]
            t_idx = jax.lax.broadcasted_iota(jnp.int32, cts.shape, 1)
            syms = jnp.where(t_idx < lengths[:, None], cts, 0)
            type_match = match_longest(
                syms, base, check, inherit, c.type_matcher.max_len
            )
            scores = shift_add_scores(
                type_match, rf, rc, w8, off, type_off_np, scores, pad_left,
                c.type_matcher.max_chunks,
            )
        if not want_states:
            return scores, None, None
        return scores, char_match, type_match

    return fn
