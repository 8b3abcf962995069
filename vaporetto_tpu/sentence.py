"""Text/annotation data model.

TPU-first re-design of the reference sentence layer
(/root/reference/vaporetto/src/sentence.rs). Behaviour parity targets:

* ``CharacterType.get_type`` Unicode ranges (sentence.rs:50-67)
* ``CharacterBoundary`` values (sentence.rs:73-82)
* the three corpus formats: raw (sentence.rs:160-196), tokenized
  (sentence.rs:285-406) and partial annotation (sentence.rs:516-631),
  including escaping and the exact error strings
* writers (sentence.rs:850-944) and the token iterator skipping
  Unknown-adjacent tokens (sentence.rs:1270-1300)
* tags layout: flat ``len*n_tags`` array, the j-th tag of char i lives at
  ``i*n_tags + j`` (sentence.rs:1048-1070)

Unlike the reference (per-char Rust loops), the character payload is held as
numpy arrays (codepoints + char types) so batches of sentences tensorize into
``(B, L)`` device buffers without further conversion.
"""

from __future__ import annotations

import enum
from typing import List, Optional, Sequence

import numpy as np

from .errors import invalid_argument

__all__ = [
    "CharacterType",
    "CharacterBoundary",
    "Sentence",
    "Token",
    "char_types_of_codepoints",
]


class CharacterType(enum.IntEnum):
    """Character type (reference sentence.rs:11-29)."""

    DIGIT = 1
    ROMAN = 2
    HIRAGANA = 3
    KATAKANA = 4
    KANJI = 5
    OTHER = 6

    @staticmethod
    def get_type(c: str) -> "CharacterType":
        """Classify one character (reference sentence.rs:50-67)."""
        cp = ord(c)
        return CharacterType(int(_CHAR_TYPE_TABLE_SMALL[cp]) if cp < _SMALL_LIMIT
                             else _get_type_slow(cp))


# Unicode ranges from reference sentence.rs:50-67.
_CHAR_TYPE_RANGES = (
    (0x30, 0x39, 1), (0xFF10, 0xFF19, 1),
    (0x41, 0x5A, 2), (0x61, 0x7A, 2), (0xFF21, 0xFF3A, 2), (0xFF41, 0xFF5A, 2),
    (0x3040, 0x3096, 3),
    (0x30A0, 0x30FA, 4), (0x30FC, 0x30FF, 4), (0xFF66, 0xFF9F, 4),
    (0x3400, 0x4DBF, 5), (0x4E00, 0x9FFF, 5), (0xF900, 0xFAFF, 5),
    (0x20000, 0x2A6DF, 5), (0x2A700, 0x2B73F, 5), (0x2B740, 0x2B81F, 5),
    (0x2B820, 0x2CEAF, 5), (0x2F800, 0x2FA1F, 5),
)

# Dense lookup covering the BMP (all non-Other ranges except CJK ext B+ live
# below 0x10000); astral planes handled by the slow path.
_SMALL_LIMIT = 0x10000
_CHAR_TYPE_TABLE_SMALL = np.full(_SMALL_LIMIT, CharacterType.OTHER, dtype=np.uint8)
for _lo, _hi, _ty in _CHAR_TYPE_RANGES:
    if _lo < _SMALL_LIMIT:
        _CHAR_TYPE_TABLE_SMALL[_lo : min(_hi, _SMALL_LIMIT - 1) + 1] = _ty


def _get_type_slow(cp: int) -> int:
    for lo, hi, ty in _CHAR_TYPE_RANGES:
        if lo <= cp <= hi:
            return ty
    return int(CharacterType.OTHER)


def char_types_of_codepoints(cps: np.ndarray) -> np.ndarray:
    """Vectorized character classification of an int32/int64 codepoint array."""
    cps = np.asarray(cps)
    small = np.clip(cps, 0, _SMALL_LIMIT - 1)
    out = _CHAR_TYPE_TABLE_SMALL[small]
    big = cps >= _SMALL_LIMIT
    if big.any():
        out = out.copy()
        flat = cps[big]
        # astral plane: only the Kanji extension ranges are non-Other
        kanji = ((0x20000 <= flat) & (flat <= 0x2A6DF)) | \
                ((0x2A700 <= flat) & (flat <= 0x2B73F)) | \
                ((0x2B740 <= flat) & (flat <= 0x2B81F)) | \
                ((0x2B820 <= flat) & (flat <= 0x2CEAF)) | \
                ((0x2F800 <= flat) & (flat <= 0x2FA1F))
        out[big] = np.where(kanji, np.uint8(CharacterType.KANJI),
                            np.uint8(CharacterType.OTHER))
    return out


class CharacterBoundary(enum.IntEnum):
    """Boundary type (reference sentence.rs:73-82)."""

    NOT_WORD_BOUNDARY = 0
    WORD_BOUNDARY = 1
    UNKNOWN = 2


NOT_WORD_BOUNDARY = CharacterBoundary.NOT_WORD_BOUNDARY
WORD_BOUNDARY = CharacterBoundary.WORD_BOUNDARY
UNKNOWN = CharacterBoundary.UNKNOWN


class Sentence:
    """Sentence data containing boundary and tag annotations.

    Field map vs the reference struct (sentence.rs:85-101):

    * ``text``: the raw text (Python str)
    * ``codepoints``: int32 numpy array of Unicode codepoints (new; the
      tensorized form consumed by the device pipeline)
    * ``char_types``: uint8 numpy array (values 1..=6)
    * ``boundaries``: uint8 numpy array over the ``len-1`` gaps
    * ``boundary_scores``: int32 numpy array incl. ``score_padding`` on both
      sides (scores are exposed un-padded via :meth:`boundary_scores`)
    * ``char_pma_states`` / ``type_pma_states``: int32 match-id-per-position
      arrays cached by the tag-capable scorers (u32::MAX sentinel -> -1 here)
    * ``tags``: flat list of Optional[str], layout ``i*n_tags + j``
    * ``tag_scores``: per-char Optional[(tags, scores)] when the predictor
      stores tag scores
    """

    __slots__ = (
        "text",
        "codepoints",
        "char_types",
        "boundaries",
        "boundary_scores",
        "score_padding",
        "char_pma_states",
        "type_pma_states",
        "tags",
        "tag_scores",
        "n_tags",
        "_predictor",
        "_char_to_str_pos",
        "_byte_maps",
    )

    def __init__(self) -> None:
        self._set_default()

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def _set_default(self) -> None:
        """Reference sentence.rs:140-158: reset to a single white space."""
        self.text: str = " "
        self.codepoints = np.array([0x20], dtype=np.int32)
        self.char_types = np.array([CharacterType.OTHER], dtype=np.uint8)
        self.boundaries = np.zeros(0, dtype=np.uint8)
        self.boundary_scores = np.zeros(0, dtype=np.int32)
        self.score_padding = 0
        self.char_pma_states = np.zeros(0, dtype=np.int32)
        self.type_pma_states = np.zeros(0, dtype=np.int32)
        self.tags: List[Optional[str]] = []
        self.tag_scores: List[Optional[tuple]] = []
        self.n_tags = 0
        self._predictor = None
        self._char_to_str_pos: Optional[np.ndarray] = None
        self._byte_maps = None

    @classmethod
    def default(cls) -> "Sentence":
        return cls()

    def _clear_annotations(self) -> None:
        self.boundary_scores = np.zeros(0, dtype=np.int32)
        self.score_padding = 0
        self.char_pma_states = np.zeros(0, dtype=np.int32)
        self.type_pma_states = np.zeros(0, dtype=np.int32)
        self._predictor = None
        self.tag_scores = []
        self._char_to_str_pos = None
        self._byte_maps = None

    @classmethod
    def from_raw(cls, text: str) -> "Sentence":
        s = cls.__new__(cls)
        s._set_default()
        s.update_raw(text)
        return s

    def update_raw(self, text: str) -> None:
        """Reference sentence.rs:160-196,264-283."""
        if "\0" in text:
            self._set_default()
            raise invalid_argument("text", "must not contain NULL")
        if not text:
            self._set_default()
            raise invalid_argument("text", "must contain at least one character")
        self.text = text
        self.codepoints = np.frombuffer(
            text.encode("utf-32-le"), dtype=np.int32
        ).copy()
        self.char_types = char_types_of_codepoints(self.codepoints)
        n = len(self.codepoints)
        self.boundaries = np.full(n - 1, UNKNOWN, dtype=np.uint8)
        self._clear_annotations()
        self.tags = []
        self.n_tags = 0

    @classmethod
    def from_tokenized(cls, tokenized_text: str) -> "Sentence":
        s = cls.__new__(cls)
        s._set_default()
        s.update_tokenized(tokenized_text)
        return s

    def update_tokenized(self, tokenized_text: str) -> None:
        """Parse a space-separated tokenized line (reference sentence.rs:285-406).

        Rules: ``' '`` separates tokens, ``'/tag'`` attaches tags to the
        preceding token, ``'\\'`` escapes the next character.
        """
        try:
            text, char_list, boundaries, tags, n_tags = _parse_tokenized(
                tokenized_text
            )
        except Exception:
            self._set_default()
            raise
        self._assign_parsed(text, char_list, boundaries, tags, n_tags)

    @classmethod
    def from_partial_annotation(cls, partial_annotation_text: str) -> "Sentence":
        s = cls.__new__(cls)
        s._set_default()
        s.update_partial_annotation(partial_annotation_text)
        return s

    def update_partial_annotation(self, partial_annotation_text: str) -> None:
        """Parse interleaved char/boundary annotation (sentence.rs:516-631).

        Boundary markers: ``'|'`` word boundary, ``'-'`` not-boundary,
        ``' '`` unknown; ``'/tag'`` after a char attaches tags.
        """
        try:
            text, char_list, boundaries, tags, n_tags = _parse_partial_annotation(
                partial_annotation_text
            )
        except Exception:
            self._set_default()
            raise
        self._assign_parsed(text, char_list, boundaries, tags, n_tags)

    def _assign_parsed(self, text, char_list, boundaries, tags, n_tags) -> None:
        self.text = text
        self.codepoints = np.array([ord(c) for c in char_list], dtype=np.int32)
        self.char_types = char_types_of_codepoints(self.codepoints)
        self.boundaries = np.array(boundaries, dtype=np.uint8)
        self.tags = tags
        self.n_tags = n_tags
        self._clear_annotations()

    # ------------------------------------------------------------------
    # accessors
    # ------------------------------------------------------------------

    def as_raw_text(self) -> str:
        return self.text

    def __len__(self) -> int:
        return len(self.char_types)

    def len(self) -> int:
        return len(self.char_types)

    def char_types_list(self) -> List[int]:
        return [int(x) for x in self.char_types]

    def boundaries_list(self) -> List[CharacterBoundary]:
        return [CharacterBoundary(int(b)) for b in self.boundaries]

    def boundary_scores_list(self) -> List[int]:
        """Un-padded boundary scores (reference sentence.rs:1040-1046)."""
        if self.boundary_scores.size == 0:
            return []
        p = self.score_padding
        return [int(x) for x in self.boundary_scores[p : p + len(self.boundaries)]]

    def reset_tags(self, n_tags: int) -> None:
        """Reference sentence.rs:967-971."""
        self.tags = [None] * (n_tags * self.len())
        self.n_tags = n_tags

    def set_predictor(self, predictor) -> None:
        self._predictor = predictor

    def fill_tags(self) -> None:
        """Reference sentence.rs:1144-1148: delegates to the stored predictor."""
        if self._predictor is not None:
            self._predictor.predict_tags(self)

    def text_substring(self, start: int, end: int) -> str:
        """Substring by char positions (reference sentence.rs:1184-1186).

        Python strs index by char, so the char -> str map is the identity
        (see :meth:`_char_positions`) and this is a plain slice — kept as a
        method for parity with the reference API.
        """
        return self.text[start:end]

    def _char_positions(self) -> np.ndarray:
        """char index -> byte... here: str index map (prefix lengths).

        The reference maintains byte<->char maps because Rust strings are
        UTF-8 (sentence.rs:99-100); Python strs index by char, but the raw
        ``text`` may contain multi-char annotations only in the parsed
        formats, where ``text`` is rebuilt char-by-char, so the map is simply
        the identity over characters of ``text``. We still precompute prefix
        sums for surrogate-free slicing parity.
        """
        if self._char_to_str_pos is None or len(self._char_to_str_pos) != self.len() + 1:
            self._char_to_str_pos = np.arange(self.len() + 1, dtype=np.int64)
        return self._char_to_str_pos

    def _build_byte_maps(self):
        if self._byte_maps is None:
            cps = self.codepoints
            blen = np.where(
                cps < 0x80, 1,
                np.where(cps < 0x800, 2, np.where(cps < 0x10000, 3, 4)),
            ).astype(np.int64)
            c2s = np.zeros(len(cps) + 1, dtype=np.int64)
            np.cumsum(blen, out=c2s[1:])
            s2c = np.zeros(int(c2s[-1]) + 1, dtype=np.int64)
            s2c[c2s] = np.arange(len(cps) + 1, dtype=np.int64)
            self._byte_maps = (s2c, c2s)
        return self._byte_maps

    def char_to_str_pos(self) -> np.ndarray:
        """Char index -> UTF-8 byte offset prefix map, length ``len + 1``
        (reference sentence.rs:100,1189-1191). The reference keeps these
        maps because Rust strings index by byte; library users doing
        byte-offset work (e.g. search-engine integrations, AC matches over
        the UTF-8 stream) get the same API here."""
        return self._build_byte_maps()[1]

    def str_to_char_pos(self, pos: int) -> int:
        """UTF-8 byte offset -> char index (reference
        sentence.rs:99,164-196,1179-1181). Char-start bytes and the end
        offset map to their char index; mid-character bytes map to 0,
        matching the reference's construction."""
        return int(self._build_byte_maps()[0][pos])

    def str_to_char_pos_map(self) -> np.ndarray:
        """The full byte -> char map, length ``byte_len + 1``."""
        return self._build_byte_maps()[0]

    # ------------------------------------------------------------------
    # token iteration / writers
    # ------------------------------------------------------------------

    def iter_tokens(self):
        """Yield :class:`Token` for each confirmed token.

        Segments delimited by WordBoundary gaps; a segment containing an
        Unknown gap is skipped entirely (reference sentence.rs:1270-1300).
        """
        start = 0
        skip = False
        b = self.boundaries
        for i in range(len(b)):
            v = b[i]
            if v == WORD_BOUNDARY:
                if skip:
                    skip = False
                else:
                    yield Token(self, start, i + 1)
                start = i + 1
            elif v == UNKNOWN:
                skip = True
        if not skip:
            yield Token(self, start, len(b) + 1)

    def write_tokenized_text(self) -> str:
        """Reference sentence.rs:850-886. Escapes ' ', '\\\\', '/' with '\\\\'."""
        parts = []
        for token in self.iter_tokens():
            buf = _escape(token.surface())
            ts = token.tags()
            last_some = _rposition_some(ts)
            for tag in ts[:last_some]:
                buf += "/"
                if tag is not None:
                    buf += _escape(tag)
            parts.append(buf)
        return " ".join(parts)

    def write_partial_annotation_text(self) -> str:
        """Reference sentence.rs:907-944."""
        out = []
        chars = list(self.text)
        n_tags = self.n_tags
        for i, c in enumerate(chars):
            if i > 0:
                bv = int(self.boundaries[i - 1])
                out.append(
                    "-" if bv == NOT_WORD_BOUNDARY else "|" if bv == WORD_BOUNDARY else " "
                )
            out.append(c)
            if n_tags:
                ts = self.tags[i * n_tags : (i + 1) * n_tags]
                last_some = _rposition_some(ts)
                for tag in ts[:last_some]:
                    out.append("/")
                    if tag is not None:
                        out.append(tag)
        return "".join(out)


def _escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in (" ", "\\", "/"):
            out.append("\\")
        out.append(ch)
    return "".join(out)


def _rposition_some(ts: Sequence[Optional[str]]) -> int:
    """Index one past the last non-None element (0 if all None)."""
    for i in range(len(ts) - 1, -1, -1):
        if ts[i] is not None:
            return i + 1
    return 0


class Token:
    """A token view into a sentence (reference sentence.rs:1196-1263)."""

    __slots__ = ("sentence", "_start", "_end")

    def __init__(self, sentence: Sentence, start: int, end: int):
        self.sentence = sentence
        self._start = start
        self._end = end

    def surface(self) -> str:
        return self.sentence.text_substring(self._start, self._end)

    def tags(self) -> List[Optional[str]]:
        n = self.sentence.n_tags
        return self.sentence.tags[(self._end - 1) * n : self._end * n]

    def tag_candidates(self):
        """Tag candidates with scores (reference sentence.rs:1228-1250)."""
        if not self.sentence.tag_scores:
            raise RuntimeError(
                "Predictor.store_tag_scores() must be set to true to use this function."
            )
        results = []
        entry = self.sentence.tag_scores[self._end - 1]
        if entry is not None:
            tags, scores = entry
            i = 0
            for cands in tags:
                inner = []
                if len(cands) == 1:
                    inner.append((cands[0], 0))
                else:
                    for cand in cands:
                        inner.append((cand, int(scores[i])))
                        i += 1
                results.append(inner)
        return results

    def start(self) -> int:
        return self._start

    def end(self) -> int:
        return self._end


# ----------------------------------------------------------------------
# parsers (host-side; pure Python state machines matching the reference)
# ----------------------------------------------------------------------


def _finalize_tags(tags_tmp: List[List[str]]):
    n_tags = max((len(ts) for ts in tags_tmp), default=0)
    tags: List[Optional[str]] = []
    for ts in tags_tmp:
        for t in ts:
            tags.append(t if t else None)
        tags.extend([None] * (n_tags - len(ts)))
    return tags, n_tags


def _parse_tokenized(tokenized_text: str):
    """Reference sentence.rs:285-406."""
    if not tokenized_text:
        raise invalid_argument(
            "tokenized_text", "must contain at least one character"
        )
    chars: List[str] = []
    boundaries: List[int] = []
    tags_tmp: List[List[str]] = []
    tag_str: Optional[str] = None
    prev_boundary = False
    escape = False
    for c in tokenized_text:
        if not escape and c == "\\":
            escape = True
        elif not escape and c == " ":
            if not chars:
                raise invalid_argument(
                    "tokenized_text", "must not start with a whitespace"
                )
            if prev_boundary:
                raise invalid_argument(
                    "tokenized_text", "must not contain consecutive whitespaces"
                )
            if tag_str is not None:
                tags_tmp[-1].append(tag_str)
                tag_str = None
            prev_boundary = True
        elif not escape and c == "/":
            if not chars or prev_boundary:
                raise invalid_argument(
                    "tokenized_text", "a slash must follow a character"
                )
            if tag_str is not None:
                tags_tmp[-1].append(tag_str)
            tag_str = ""
        else:
            escape = False
            if c == "\0":
                raise invalid_argument("tokenized_text", "must not contain NULL")
            if tag_str is not None:
                tag_str += c
                continue
            if chars:
                boundaries.append(
                    WORD_BOUNDARY if prev_boundary else NOT_WORD_BOUNDARY
                )
            prev_boundary = False
            chars.append(c)
            tags_tmp.append([])
    if prev_boundary:
        raise invalid_argument(
            "tokenized_text", "must not end with a whitespace"
        )
    if tag_str is not None:
        tags_tmp[-1].append(tag_str)
    tags, n_tags = _finalize_tags(tags_tmp)
    return "".join(chars), chars, boundaries, tags, n_tags


def _parse_partial_annotation(text: str):
    """Reference sentence.rs:516-631."""
    if not text:
        raise invalid_argument(
            "partial_annotation_text", "must contain at least one character"
        )
    chars: List[str] = []
    boundaries: List[int] = []
    tags_tmp: List[List[str]] = []
    tag_str: Optional[str] = None
    escape = False
    is_char = True
    for c in text:
        if is_char:
            if c == "\0":
                raise invalid_argument(
                    "partial_annotation_text", "must not contain NULL"
                )
            chars.append(c)
            tags_tmp.append([])
            is_char = False
            continue
        if not escape and c == "\\":
            escape = True
        elif not escape and c == " ":
            if tag_str is not None:
                tags_tmp[-1].append(tag_str)
                tag_str = None
            boundaries.append(UNKNOWN)
            is_char = True
        elif not escape and c == "-":
            if tag_str is not None:
                tags_tmp[-1].append(tag_str)
                tag_str = None
            boundaries.append(NOT_WORD_BOUNDARY)
            is_char = True
        elif not escape and c == "|":
            if tag_str is not None:
                tags_tmp[-1].append(tag_str)
                tag_str = None
            boundaries.append(WORD_BOUNDARY)
            is_char = True
        elif not escape and c == "/":
            if tag_str is not None:
                tags_tmp[-1].append(tag_str)
            tag_str = ""
        else:
            if escape and tag_str is None:
                # an escaped character outside a tag is still invalid here
                escape = False
                raise invalid_argument(
                    "partial_annotation_text",
                    f"contains an invalid boundary character: '{c}'",
                )
            escape = False
            if tag_str is not None:
                tag_str += c
            else:
                raise invalid_argument(
                    "partial_annotation_text",
                    f"contains an invalid boundary character: '{c}'",
                )
    if is_char:
        raise invalid_argument("partial_annotation_text", "invalid annotation")
    if tag_str is not None:
        tags_tmp[-1].append(tag_str)
    tags, n_tags = _finalize_tags(tags_tmp)
    return "".join(chars), chars, boundaries, tags, n_tags
