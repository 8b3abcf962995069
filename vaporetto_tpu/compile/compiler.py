"""Model -> device-table compiler.

Host-side analogue of the reference's ``Predictor::new`` scorer construction
(predictor.rs:450-508, char_scorer/boundary_scorer.rs:55-89,
type_scorer.rs:103-144): merges weights (suffix propagation), builds the
double-array tries over projected symbols, and packs positional weights into
fixed-8 rows ready for the gather/scatter scoring kernels.

Output is a :class:`CompiledModel` of plain numpy arrays — the AOT
"compiled model" artifact (the analogue of the reference's zero-copy
predictor blob, predictor.rs:639-664): it can be serialized and later
uploaded straight to HBM without re-running this compiler.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..errors import invalid_model
from ..models.model import Model
from .merger import PositionalWeight, PositionalWeightWithTag, WeightMerger
from .trie import build_trie

__all__ = ["CompiledModel", "CompiledMatcher", "compile_model",
           "CACHE_MAX_WINDOW_SIZE"]

# reference type_scorer.rs:34-35
CACHE_MAX_WINDOW_SIZE = 3

WEIGHT_FIXED_LEN = 8  # reference predictor.rs:32
MAX_CODEPOINT = 0x110000


@dataclasses.dataclass
class CompiledMatcher:
    """One matcher+scorer side (char or type)."""

    base: np.ndarray
    check: np.ndarray
    value: np.ndarray
    inherit: np.ndarray  # AC output link resolved to pattern id (or -1)
    max_len: int
    rows_first: np.ndarray  # (n_ids,) int32
    rows_cnt: np.ndarray  # (n_ids,) int32
    w8: np.ndarray  # (n_rows, 8) int32
    off: np.ndarray  # (n_rows,) int32
    max_chunks: int
    # tag side: [token_id][rel_position] -> {merged_pattern_id: weights}
    tag_weight: Optional[List[List[Dict[int, List[int]]]]] = None


@dataclasses.dataclass
class CompiledTagMeta:
    """Per-token tag predictor data (reference predictor.rs:264-304)."""

    token_ids: Dict[str, int]
    tags: List[List[List[str]]]  # [token_id][slot] -> candidates
    bias: List[List[int]]  # [token_id] -> class-concatenated bias


@dataclasses.dataclass
class CompiledModel:
    bias: int
    char_window_size: int
    type_window_size: int
    pad_left: int
    pad_right: int
    char_sym_table: Optional[np.ndarray]  # int32[MAX_CODEPOINT] or None
    char_matcher: Optional[CompiledMatcher]
    type_matcher: Optional[CompiledMatcher]
    type_cache_table: Optional[np.ndarray]  # int32[8**(2w)] or None
    tag_meta: Optional[CompiledTagMeta]
    n_tags: int
    # hash projection: slot = (cp * hash_mul) >>_logical hash_shift;
    # valid iff hash_keys[slot] == cp, symbol = hash_syms[slot].
    # Replaces the dense MAX_CODEPOINT gather with two small-table gathers
    # (large-table gathers are the TPU bottleneck; see ops/match.py).
    char_hash_mul: int = 0
    char_hash_shift: int = 0
    char_hash_keys: Optional[np.ndarray] = None  # int32[P], -1 = empty
    char_hash_syms: Optional[np.ndarray] = None  # int32[P]
    # positional type tables: score(gap) += sum_j T[j, code_j] where code_j
    # packs M window symbols starting at window offset j. Decomposition of
    # type_cache_table into 2w small tables (same scores).
    type_pos_tables: Optional[np.ndarray] = None  # int32[2w, 8**M]
    type_pos_m: int = 0
    # left/mid/right split of the cache table (3 small gathers; see
    # _build_type_split_tables)
    type_split_tables: Optional[Tuple[np.ndarray, np.ndarray,
                                      np.ndarray]] = None
    type_split_maxn: int = 0


def _pack_weight_rows(
    weights: List[Optional[PositionalWeight]],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Split merged positional weights into 8-wide chunks.

    Weights of length <= 8 become one zero-padded row — exactly the
    reference's ``WeightVector::Fixed`` (predictor.rs:118-135); longer
    (rare: long dictionary words) become several rows with offsets stepped
    by 8, reproducing ``WeightVector::Variable`` adds.
    """
    rows_first = np.zeros(len(weights), dtype=np.int32)
    rows_cnt = np.zeros(len(weights), dtype=np.int32)
    w8_rows: List[List[int]] = []
    off_rows: List[int] = []
    for i, pw in enumerate(weights):
        rows_first[i] = len(w8_rows)
        if pw is None or not pw.weight:
            rows_cnt[i] = 0
            continue
        w = pw.weight
        n_chunks = (len(w) + WEIGHT_FIXED_LEN - 1) // WEIGHT_FIXED_LEN
        rows_cnt[i] = n_chunks
        for c in range(n_chunks):
            chunk = w[c * 8 : c * 8 + 8]
            chunk = chunk + [0] * (8 - len(chunk))
            w8_rows.append(chunk)
            off_rows.append(pw.offset + 8 * c)
    if not w8_rows:
        w8_rows = [[0] * 8]
        off_rows = [0]
    w8 = np.array(w8_rows, dtype=np.int64)
    if (w8 > 2**31 - 1).any() or (w8 < -(2**31)).any():
        raise invalid_model("weight overflow during merge")
    return (
        rows_first,
        rows_cnt,
        w8.astype(np.int32),
        np.array(off_rows, dtype=np.int32),
        int(rows_cnt.max()) if len(rows_cnt) else 0,
    )


def _build_matcher(
    merged: List[Tuple[Tuple[int, ...], object]],
    n_symbols: int,
    with_tags: bool,
    n_tag_models: int,
    window_size: int,
) -> CompiledMatcher:
    patterns = [key for key, _ in merged]
    trie = build_trie(patterns, n_symbols)
    if with_tags:
        weights = []
        tag_weight: List[List[Dict[int, List[int]]]] = [
            [dict() for _ in range(window_size + 1)] for _ in range(n_tag_models)
        ]
        for i, (_, pwt) in enumerate(merged):
            weights.append(pwt.weight)
            for (token_id, rel_position), w in pwt.tag_info.items():
                tag_weight[token_id][rel_position][i] = list(w)
    else:
        weights = [pw for _, pw in merged]
        tag_weight = None
    rows_first, rows_cnt, w8, off, max_chunks = _pack_weight_rows(weights)
    return CompiledMatcher(
        base=trie.base,
        check=trie.check,
        value=trie.value,
        inherit=trie.inherit,
        max_len=trie.max_len,
        rows_first=rows_first,
        rows_cnt=rows_cnt,
        w8=w8,
        off=off,
        max_chunks=max_chunks,
        tag_weight=tag_weight,
    )


def _build_char_hash(cps_sorted: np.ndarray, sym_ids: np.ndarray):
    """Collision-free multiplicative hash over the model's codepoints.

    ``cps_sorted`` are the raw codepoints, ``sym_ids`` the dense symbol id of
    each. Returns (mul, shift, keys, syms) with table size the smallest
    power of two giving an injective ``(cp * mul) >> shift`` over the keys.
    """
    cps = np.asarray(cps_sorted, dtype=np.uint64)
    sym_ids = np.asarray(sym_ids, dtype=np.int32)
    n = max(len(cps), 1)
    m_bits = max(4, int(np.ceil(np.log2(n * 2))))
    rng = np.random.default_rng(0x5EED)
    while m_bits <= 24:
        shift = 32 - m_bits
        for _ in range(64):
            mul = int(rng.integers(0, 2**31)) * 2 + 1
            slots = ((cps * np.uint64(mul)) & np.uint64(0xFFFFFFFF)) >> np.uint64(shift)
            if len(np.unique(slots)) == len(cps):
                P = 1 << m_bits
                keys = np.full(P, -1, dtype=np.int32)
                syms = np.zeros(P, dtype=np.int32)
                keys[slots] = cps.astype(np.int32)
                syms[slots] = sym_ids
                # two's-complement signed form for int32 device arithmetic
                mul_signed = mul - 2**32 if mul >= 2**31 else mul
                return mul_signed, shift, keys, syms
        m_bits += 1
    raise invalid_model("could not build hash projection")


def _flatten_patterns_weights(
    lengths: np.ndarray, weight_lists: List[List[int]]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(pattern offsets, flat weights, weight offsets) without Python loops."""
    n = len(weight_lists)
    pat_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=pat_offs[1:])
    w_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(
        np.fromiter(map(len, weight_lists), dtype=np.int64, count=n),
        out=w_offs[1:],
    )
    w_flat = np.fromiter(
        itertools.chain.from_iterable(weight_lists),
        dtype=np.int32,
        count=int(w_offs[-1]),
    )
    return pat_offs, w_flat, w_offs


def _native_matcher_result(res: dict, tag_weight=None) -> CompiledMatcher:
    return CompiledMatcher(
        base=res["base"],
        check=res["check"],
        value=res["value"],
        inherit=res["inherit"],
        max_len=res["max_len"],
        rows_first=res["rows_first"],
        rows_cnt=res["rows_cnt"],
        w8=res["w8"],
        off=res["off"],
        max_chunks=res["max_chunks"],
        tag_weight=tag_weight,
    )


def _tag_rows(tag_ngram_models) -> Tuple[list, list, list, list]:
    """Flatten per-tag-model n-gram tag rows in the Python add order
    (order matters: the tag merge keeps the FIRST row's weight length)."""
    pats, toks, rels, weights = [], [], [], []
    for i, tag_ngrams in tag_ngram_models:
        for d in tag_ngrams:
            for tw in d.weights:
                pats.append(d.ngram)
                toks.append(i)
                rels.append(tw.rel_position)
                weights.append(tw.weights)
    return pats, toks, rels, weights


def _unpack_tag_weight_entries(
    res: dict, n_tag_models: int, window_size: int
):
    tag_weight: List[List[Dict[int, List[int]]]] = [
        [dict() for _ in range(window_size + 1)] for _ in range(n_tag_models)
    ]
    woffs = res["tag_woffs"].tolist()
    wflat = res["tag_wflat"].tolist()
    pats = res["tag_pat"].tolist()
    toks = res["tag_tok"].tolist()
    rels = res["tag_rel"].tolist()
    lo = woffs[0] if woffs else 0
    for k in range(len(pats)):
        hi = woffs[k + 1]
        tag_weight[toks[k]][rels[k]][pats[k]] = wflat[lo:hi]
        lo = hi
    return tag_weight


def _compile_char_fast(model: Model, with_tags: bool = False,
                       n_tag_models: int = 0):
    """Native one-call char-side compile. Returns
    (matcher, sym_table, hash) or None when the native library is absent."""
    try:
        from ..native import compile_matcher_native
    except Exception:
        return None
    strs = [d.ngram for d in model.char_ngram_model] + [
        rec.word for rec in model.dict_model
    ]
    n_ng = len(model.char_ngram_model)
    n_bound = len(strs)
    weight_lists = [d.weights for d in model.char_ngram_model] + [
        rec.weights for rec in model.dict_model
    ]
    tag_kwargs = {}
    if with_tags:
        t_pats, t_toks, t_rels, t_weights = _tag_rows(
            (i, tm.char_ngram_model) for i, tm in enumerate(model.tag_models)
        )
        strs = strs + t_pats
        weight_lists = weight_lists + t_weights
        is_tag = np.zeros(len(strs), dtype=np.uint8)
        is_tag[n_bound:] = 1
        tag_arr = np.zeros(len(strs), dtype=np.int32)
        rel_arr = np.zeros(len(strs), dtype=np.int32)
        tag_arr[n_bound:] = t_toks
        rel_arr[n_bound:] = t_rels
        tag_kwargs = dict(is_tag=is_tag, tag_tok=tag_arr, tag_rel=rel_arr)
    lengths = np.fromiter(map(len, strs), dtype=np.int64, count=len(strs))
    if n_ng < n_bound and int(lengths[n_ng:n_bound].max()) > 32767:
        raise invalid_model(
            "words must be shorter than or equal to 32767 characters"
        )
    pat_flat = np.frombuffer(
        "".join(strs).encode("utf-32-le"), dtype=np.int32
    )
    w_offset = np.zeros(len(strs), dtype=np.int32)
    w_offset[:n_ng] = -model.char_window_size
    w_offset[n_ng:n_bound] = -lengths[n_ng:n_bound]
    pat_offs, w_flat, w_offs = _flatten_patterns_weights(
        lengths, weight_lists
    )
    try:
        res = compile_matcher_native(
            pat_flat, pat_offs, w_offset, w_flat, w_offs, **tag_kwargs
        )
    except OverflowError:
        raise invalid_model("weight overflow during merge")
    if res is None:
        return None
    tag_weight = None
    if with_tags:
        tag_weight = _unpack_tag_weight_entries(
            res, n_tag_models, model.char_window_size
        )
    syms_raw = res["syms"].astype(np.int64)
    sym_ids = np.arange(1, len(syms_raw) + 1, dtype=np.int32)
    sym_table = np.zeros(MAX_CODEPOINT, dtype=np.int32)
    sym_table[syms_raw] = sym_ids
    char_hash = _build_char_hash(syms_raw, sym_ids)
    return _native_matcher_result(res, tag_weight), sym_table, char_hash


def _compile_type_trie_fast(model: Model, with_tags: bool = False,
                            n_tag_models: int = 0):
    """Native one-call type-side trie compile."""
    try:
        from ..native import compile_matcher_native
    except Exception:
        return None
    bs = [bytes(d.ngram) for d in model.type_ngram_model]
    n_bound = len(bs)
    weight_lists = [d.weights for d in model.type_ngram_model]
    tag_kwargs = {}
    if with_tags:
        t_pats, t_toks, t_rels, t_weights = _tag_rows(
            (i, tm.type_ngram_model) for i, tm in enumerate(model.tag_models)
        )
        bs = bs + [bytes(p) for p in t_pats]
        weight_lists = weight_lists + t_weights
        is_tag = np.zeros(len(bs), dtype=np.uint8)
        is_tag[n_bound:] = 1
        tag_arr = np.zeros(len(bs), dtype=np.int32)
        rel_arr = np.zeros(len(bs), dtype=np.int32)
        tag_arr[n_bound:] = t_toks
        rel_arr[n_bound:] = t_rels
        tag_kwargs = dict(is_tag=is_tag, tag_tok=tag_arr, tag_rel=rel_arr)
    lengths = np.fromiter(map(len, bs), dtype=np.int64, count=len(bs))
    pat_flat = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.int32)
    w_offset = np.zeros(len(bs), dtype=np.int32)
    w_offset[:n_bound] = -model.type_window_size
    pat_offs, w_flat, w_offs = _flatten_patterns_weights(lengths, weight_lists)
    try:
        res = compile_matcher_native(
            pat_flat, pat_offs, w_offset, w_flat, w_offs,
            project=False, n_symbols=6, **tag_kwargs,
        )
    except OverflowError:
        raise invalid_model("weight overflow during merge")
    if res is None:
        return None
    tag_weight = None
    if with_tags:
        tag_weight = _unpack_tag_weight_entries(
            res, n_tag_models, model.type_window_size
        )
    return _native_matcher_result(res, tag_weight)


def _build_type_pos_tables(
    ngrams: List[Tuple[Tuple[int, ...], List[int]]], window_size: int
) -> Optional[Tuple[np.ndarray, int]]:
    """Decompose window scoring into per-start-offset tables.

    ``score(gap) = sum_j T[j, code(types[start_j .. start_j+M-1])]`` where
    each n-gram occurrence (start j, length n <= M) contributes its weight
    to every code whose first n symbols equal the n-gram — numerically
    identical to the 8^(2w) cache table but using 2w tables of 8^M entries
    (small-table gathers are fast on TPU; one big-table gather is not).
    """
    seq = 2 * window_size
    M = max((len(g) for g, _ in ngrams), default=1)
    if M > 4 or M > seq:
        return None
    tables = np.zeros((seq, 8**M), dtype=np.int64)
    codes = np.arange(8**M, dtype=np.int64)
    for ngram, weights in ngrams:
        n = len(ngram)
        prefix = 0
        for a in ngram:
            prefix = prefix * 8 + a
        # codes with this prefix: prefix * 8^(M-n) + anything
        lo = prefix * 8 ** (M - n)
        hi = lo + 8 ** (M - n)
        for j in range(0, seq - n + 1):
            w_idx = seq - (j + n)
            if w_idx >= len(weights):
                continue
            tables[j, lo:hi] += weights[w_idx]
    if (np.abs(tables) > 2**31 - 1).any():
        return None
    return tables.astype(np.int32), M


def _build_type_split_tables(
    ngrams: List[Tuple[Tuple[int, ...], List[int]]], window_size: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
    """Decompose the 8^(2w) cache table into three SMALL tables.

    Every n-gram occurrence in the 2w window lies fully in the left half
    (window[0:w]), fully in the right half (window[w:2w]), or crosses
    the middle — and a crossing occurrence (len n <= maxn) lies within
    window[w-maxn+1 : w+maxn-1]. So

        score(gap) = TL[code(window[0:w])] + TM[code(mid)] +
                     TR[code(window[w:2w])]

    with tables of 8^w / 8^(2*maxn-2) / 8^w entries (512/4096/512 for
    the default w = maxn = 3) instead of one 8^6 monster — on the TPU
    the gather cost is tiered by table size (PERF.md round-4 cost
    model). Numerically identical to :func:`_build_type_cache_table`
    (same occurrence enumeration, partitioned).
    """
    w = window_size
    maxn = max((len(g) for g, _ in ngrams), default=0)
    if maxn == 0 or maxn > w:
        return None
    seq = 2 * w
    mid_lo = w - maxn + 1
    mid_len = 2 * maxn - 2

    def accumulate(n_chars, occs):
        n_codes = 8 ** max(n_chars, 1)
        ids = np.arange(n_codes, dtype=np.int64)
        syms = [
            (ids >> (3 * (n_chars - 1 - k))) & 7 for k in range(n_chars)
        ]
        out = np.zeros(n_codes, dtype=np.int64)
        for local_start, ngram, weight in occs:
            hit = np.ones(n_codes, dtype=bool)
            for jj, a in enumerate(ngram):
                hit &= syms[local_start + jj] == a
            out[hit] += weight
        return out

    occ_l, occ_m, occ_r = [], [], []
    for ngram, weights in ngrams:
        n = len(ngram)
        for end in range(n, seq + 1):
            w_idx = seq - end
            if w_idx >= len(weights):
                continue
            j = end - n
            if end <= w:
                occ_l.append((j, ngram, weights[w_idx]))
            elif j >= w:
                occ_r.append((j - w, ngram, weights[w_idx]))
            else:
                occ_m.append((j - mid_lo, ngram, weights[w_idx]))
    tl = accumulate(w, occ_l)
    tm = accumulate(mid_len, occ_m)
    tr = accumulate(w, occ_r)
    for t in (tl, tm, tr):
        if (np.abs(t) > 2**31 - 1).any():
            return None
    return (tl.astype(np.int32), tm.astype(np.int32),
            tr.astype(np.int32), maxn)


def _build_type_cache_table(
    ngrams: List[Tuple[Tuple[int, ...], List[int]]], window_size: int
) -> np.ndarray:
    """Precompute total score per type-window id.

    Reference type_scorer/boundary_scorer_cache.rs:21-56: enumerate all
    8^(2w) windows, sum the weights of every n-gram occurrence. Here the
    enumeration is vectorized: for each n-gram and each end-position inside
    the window, add its weight to all matching window ids via strided
    reshapes.
    """
    seq_size = 2 * window_size
    n_windows = 8**seq_size
    scores = np.zeros(n_windows, dtype=np.int64)
    # decompose every window id into symbols once: sym k (from left, 0-based)
    ids = np.arange(n_windows, dtype=np.int64)
    syms = np.empty((seq_size, n_windows), dtype=np.int8)
    for k in range(seq_size):
        syms[k] = (ids >> (3 * (seq_size - 1 - k))) & 7
    valid = np.ones(n_windows, dtype=bool)
    for k in range(seq_size):
        valid &= syms[k] != 7  # seqid_to_seq rejects symbol 7
    for ngram, weights in ngrams:
        gl = len(ngram)
        for end in range(gl, seq_size + 1):
            # occurrence filling window positions [end-gl, end)
            w_idx = seq_size - end  # weights[seq_size - m.end()]
            if w_idx >= len(weights):
                continue
            hit = valid.copy()
            for j, a in enumerate(ngram):
                hit &= syms[end - gl + j] == a
            scores[hit] += weights[w_idx]
    scores[~valid] = 0
    if (np.abs(scores) > 2**31 - 1).any():
        raise invalid_model("type cache score overflow")
    return scores.astype(np.int32)


def compile_model(
    model: Model,
    predict_tags: bool = False,
    *,
    prefer_type_trie: bool = False,
) -> CompiledModel:
    """Compile a :class:`Model` into dense device tables.

    Follows the variant dispatch of the reference (char_scorer.rs:92-124,
    type_scorer.rs:103-144): the type side uses the precomputed cache table
    when ``window <= 3`` and no tag models exist, else the trie matcher.
    ``prefer_type_trie`` forces the trie variant (a runtime analogue of the
    reference's cache-type-score feature flag; identical scores, different
    device cost profile).
    """
    n_tag_models = len(model.tag_models) if predict_tags else 0
    with_tags = predict_tags and n_tag_models > 0

    # ------------------------------------------------------------------ char
    char_matcher = None
    char_sym_table = None
    char_hash = None
    type_pos = None
    type_split = None
    use_char = (
        (model.char_ngram_model or model.dict_model)
        and model.char_window_size > 0
    )
    if use_char:
        fast = _compile_char_fast(model, with_tags, n_tag_models)
        if fast is not None:
            char_matcher, char_sym_table, char_hash = fast
    if use_char and char_matcher is None:
        merger = WeightMerger()
        for d in model.char_ngram_model:
            key = tuple(ord(c) for c in d.ngram)
            pw = PositionalWeight(-model.char_window_size, d.weights)
            merger.add(key, PositionalWeightWithTag(pw) if with_tags else pw)
        for rec in model.dict_model:
            word_len = len(rec.word)
            if word_len > 32767:
                raise invalid_model(
                    "words must be shorter than or equal to 32767 characters"
                )
            key = tuple(ord(c) for c in rec.word)
            pw = PositionalWeight(-word_len, rec.weights)
            merger.add(key, PositionalWeightWithTag(pw) if with_tags else pw)
        if with_tags:
            for i, tm in enumerate(model.tag_models):
                for d in tm.char_ngram_model:
                    key = tuple(ord(c) for c in d.ngram)
                    for tw in d.weights:
                        merger.add(
                            key,
                            PositionalWeightWithTag.with_tag(
                                i, tw.rel_position, tw.weights
                            ),
                        )
        merged = merger.merge()
        # symbol projection: codepoint -> dense id; OOV -> 0
        cps = sorted({cp for key, _ in merged for cp in key})
        sym_of = {cp: i + 1 for i, cp in enumerate(cps)}
        char_sym_table = np.zeros(MAX_CODEPOINT, dtype=np.int32)
        for cp, sym in sym_of.items():
            char_sym_table[cp] = sym
        char_hash = _build_char_hash(
            np.array(cps, dtype=np.int64),
            np.arange(1, len(cps) + 1, dtype=np.int32),
        )
        merged_proj = [
            (tuple(sym_of[cp] for cp in key), w) for key, w in merged
        ]
        char_matcher = _build_matcher(
            merged_proj, len(cps), with_tags, n_tag_models,
            model.char_window_size,
        )

    # ------------------------------------------------------------------ type
    type_matcher = None
    type_cache_table = None
    use_type = model.type_ngram_model and model.type_window_size > 0
    if use_type:
        if (
            not with_tags
            and not prefer_type_trie
            and model.type_window_size <= CACHE_MAX_WINDOW_SIZE
        ):
            # cache variant: merge duplicates only (no suffix merge needed,
            # the table enumerates raw overlapping occurrences)
            ngrams: List[Tuple[Tuple[int, ...], List[int]]] = []
            seen: Dict[Tuple[int, ...], int] = {}
            for d in model.type_ngram_model:
                key = tuple(bytes(d.ngram))
                if key in seen:
                    w = ngrams[seen[key]][1]
                    for i, x in enumerate(d.weights):
                        if i < len(w):
                            w[i] += x
                        else:
                            w.append(x)
                else:
                    seen[key] = len(ngrams)
                    ngrams.append((key, list(d.weights)))
            type_cache_table = _build_type_cache_table(
                ngrams, model.type_window_size
            )
            type_pos = _build_type_pos_tables(ngrams, model.type_window_size)
            type_split = _build_type_split_tables(
                ngrams, model.type_window_size
            )
        else:
            type_matcher = _compile_type_trie_fast(
                model, with_tags, n_tag_models
            )
            if type_matcher is None:
                merger = WeightMerger()
                for d in model.type_ngram_model:
                    key = tuple(bytes(d.ngram))
                    pw = PositionalWeight(-model.type_window_size, d.weights)
                    merger.add(
                        key, PositionalWeightWithTag(pw) if with_tags else pw
                    )
                if with_tags:
                    for i, tm in enumerate(model.tag_models):
                        for d in tm.type_ngram_model:
                            key = tuple(bytes(d.ngram))
                            for tw in d.weights:
                                merger.add(
                                    key,
                                    PositionalWeightWithTag.with_tag(
                                        i, tw.rel_position, tw.weights
                                    ),
                                )
                merged = merger.merge()
                type_matcher = _build_matcher(
                    merged, 6, with_tags, n_tag_models, model.type_window_size
                )

    # ------------------------------------------------------------------ tags
    tag_meta = None
    n_tags = 0
    if predict_tags:
        token_ids: Dict[str, int] = {}
        tags_list: List[List[List[str]]] = []
        bias_list: List[List[int]] = []
        for i, tm in enumerate(model.tag_models):
            n_tags = max(n_tags, len(tm.tags))
            token_ids[tm.token] = i
            tags_list.append([list(c) for c in tm.tags])
            bias_list.append(list(tm.bias))
        tag_meta = CompiledTagMeta(token_ids, tags_list, bias_list)

    # ------------------------------------------------------------------ pads
    pad_left = WEIGHT_FIXED_LEN - 1
    pad_right = WEIGHT_FIXED_LEN
    for m in (char_matcher, type_matcher):
        if m is not None and len(m.off):
            pad_left = max(pad_left, int(-m.off.min()))
            pad_right = max(pad_right, int(m.off.max()) + 8)

    return CompiledModel(
        bias=model.bias,
        char_window_size=model.char_window_size,
        type_window_size=model.type_window_size,
        pad_left=pad_left,
        pad_right=pad_right,
        char_sym_table=char_sym_table,
        char_matcher=char_matcher,
        type_matcher=type_matcher,
        type_cache_table=type_cache_table,
        tag_meta=tag_meta,
        n_tags=n_tags,
        char_hash_mul=char_hash[0] if char_hash else 0,
        char_hash_shift=char_hash[1] if char_hash else 0,
        char_hash_keys=char_hash[2] if char_hash else None,
        char_hash_syms=char_hash[3] if char_hash else None,
        type_pos_tables=type_pos[0] if type_pos else None,
        type_pos_m=type_pos[1] if type_pos else 0,
        type_split_tables=type_split[:3] if type_split else None,
        type_split_maxn=type_split[3] if type_split else 0,
    )
