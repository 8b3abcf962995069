"""Model schema and I/O.

Mirrors the reference training artifact
(/root/reference/vaporetto/src/{model,ngram_model,dict_model}.rs):

* magic ``b"VaporettoTokenizer 0.5.0\\n"`` (model.rs:14-15)
* ``ModelData{char_ngram_model, type_ngram_model, dict_model, bias:i32,
  char_window_size:u8, type_window_size:u8, tag_models}`` (model.rs:60-70)
* ``NgramData{ngram, weights:Vec<i32>}`` (ngram_model.rs:5-12)
* tag side: ``TagWeight{rel_position:u8, weights}``, ``TagNgramData``,
  ``TagModel{token, tags, char_ngram_model, type_ngram_model, bias}``
  (ngram_model.rs:14-27, model.rs:40-47)
* ``WordWeightRecord{word, weights, comment}`` with the invariant
  ``len(weights) == len(word)+1`` (dict_model.rs:37-49)

Files are bincode after the magic; the CLIs additionally wrap everything in
a zstd container — :meth:`Model.read` sniffs the zstd magic so both forms
load transparently, like the reference's separate CLI-level decompression.
"""

from __future__ import annotations

import dataclasses
import io
from typing import List, Optional, Union

from ..errors import invalid_argument, invalid_model
from .bincode import Reader, Writer

MODEL_MAGIC = b"VaporettoTokenizer 0.5.0\n"
_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"

__all__ = [
    "Model",
    "NgramData",
    "TagWeight",
    "TagNgramData",
    "TagModel",
    "WordWeightRecord",
    "MODEL_MAGIC",
]


@dataclasses.dataclass
class NgramData:
    """One n-gram and its positional weights (ngram_model.rs:5-9)."""

    ngram: Union[str, bytes]
    weights: List[int]


@dataclasses.dataclass
class TagWeight:
    """Weights for one relative position of a tag n-gram (ngram_model.rs:14-18)."""

    rel_position: int
    weights: List[int]


@dataclasses.dataclass
class TagNgramData:
    ngram: Union[str, bytes]
    weights: List[TagWeight]


@dataclasses.dataclass
class TagModel:
    """Per-token tag classifier data (model.rs:40-47).

    The score array layout is the concatenation of the candidate classes of
    every tag slot that has >=2 candidates (model.rs:17-38).
    """

    token: str
    tags: List[List[str]]
    char_ngram_model: List[TagNgramData]
    type_ngram_model: List[TagNgramData]
    bias: List[int]


@dataclasses.dataclass
class WordWeightRecord:
    """Dictionary word with per-boundary weights (dict_model.rs:17-49)."""

    word: str
    weights: List[int]
    comment: str = ""

    def __post_init__(self):
        if len(self.weights) != len(self.word) + 1:
            raise invalid_argument(
                "weights", "does not match the length of the `word`"
            )

    def get_word(self) -> str:
        return self.word

    def get_weights(self) -> List[int]:
        return self.weights

    def get_comment(self) -> str:
        return self.comment


class Model:
    """The serializable training artifact (NOT the runtime form).

    The runtime form is produced by :mod:`vaporetto_tpu.compile` which packs
    this into dense device tables.
    """

    def __init__(
        self,
        char_ngram_model: List[NgramData],
        type_ngram_model: List[NgramData],
        dict_model: List[WordWeightRecord],
        bias: int,
        char_window_size: int,
        type_window_size: int,
        tag_models: Optional[List[TagModel]] = None,
    ):
        self.char_ngram_model = char_ngram_model
        self.type_ngram_model = type_ngram_model
        self.dict_model = dict_model
        self.bias = int(bias)
        self.char_window_size = int(char_window_size)
        self.type_window_size = int(type_window_size)
        self.tag_models = tag_models or []

    # ------------------------------------------------------------------
    # public accessors (model.rs:155-168)
    # ------------------------------------------------------------------

    def dictionary(self) -> List[WordWeightRecord]:
        return self.dict_model

    def replace_dictionary(self, dict_: List[WordWeightRecord]) -> None:
        self.dict_model = list(dict_)

    # ------------------------------------------------------------------
    # serialization
    # ------------------------------------------------------------------

    def to_bytes(self) -> bytes:
        w = Writer()
        w.buf += MODEL_MAGIC
        _encode_ngram_vec(w, self.char_ngram_model, is_str=True)
        _encode_ngram_vec(w, self.type_ngram_model, is_str=False)
        w.varu64(len(self.dict_model))
        for rec in self.dict_model:
            w.string(rec.word)
            w.i32_vec(rec.weights)
            w.string(rec.comment)
        w.i32(self.bias)
        w.u8(self.char_window_size)
        w.u8(self.type_window_size)
        w.varu64(len(self.tag_models))
        for tm in self.tag_models:
            w.string(tm.token)
            w.varu64(len(tm.tags))
            for cands in tm.tags:
                w.varu64(len(cands))
                for t in cands:
                    w.string(t)
            _encode_tag_ngram_vec(w, tm.char_ngram_model, is_str=True)
            _encode_tag_ngram_vec(w, tm.type_ngram_model, is_str=False)
            w.i32_vec(tm.bias)
        return w.getvalue()

    def write(self, f, *, zstd_level: Optional[int] = None,
              zstd_workers: int = 0) -> None:
        """``zstd_workers`` enables libzstd's multithreaded compression
        (reference train/src/main.rs:185-187, ``zstd::stream::Encoder::
        multithread``); 0 = single-threaded."""
        data = self.to_bytes()
        if zstd_level is not None:
            import zstandard

            data = zstandard.ZstdCompressor(
                level=zstd_level, threads=zstd_workers
            ).compress(data)
        f.write(data)

    @classmethod
    def read_slice(cls, data: bytes) -> "Model":
        if data[:4] == _ZSTD_MAGIC:
            import zstandard

            data = zstandard.ZstdDecompressor().decompress(
                data, max_output_size=1 << 31
            )
        if data[: len(MODEL_MAGIC)] != MODEL_MAGIC:
            raise invalid_model("model version mismatch")
        r = Reader(data, len(MODEL_MAGIC))
        char_ngram_model = _decode_ngram_vec(r, is_str=True)
        type_ngram_model = _decode_ngram_vec(r, is_str=False)
        dict_model = []
        for _ in range(r.varu64()):
            word = r.string()
            weights = r.i32_vec()
            comment = r.string()
            dict_model.append(WordWeightRecord(word, weights, comment))
        bias = r.i32()
        char_window_size = r.u8()
        type_window_size = r.u8()
        tag_models = []
        for _ in range(r.varu64()):
            token = r.string()
            tags = [
                [r.string() for _ in range(r.varu64())] for _ in range(r.varu64())
            ]
            char_tng = _decode_tag_ngram_vec(r, is_str=True)
            type_tng = _decode_tag_ngram_vec(r, is_str=False)
            tag_bias = r.i32_vec()
            tag_models.append(TagModel(token, tags, char_tng, type_tng, tag_bias))
        return cls(
            char_ngram_model,
            type_ngram_model,
            dict_model,
            bias,
            char_window_size,
            type_window_size,
            tag_models,
        )

    @classmethod
    def read(cls, f) -> "Model":
        if isinstance(f, (str, bytes)) and not isinstance(f, bytes):
            with open(f, "rb") as fh:
                return cls.read_slice(fh.read())
        if isinstance(f, (bytes, bytearray)):
            return cls.read_slice(bytes(f))
        return cls.read_slice(f.read())


def _encode_ngram_vec(w: Writer, ngrams: List[NgramData], *, is_str: bool) -> None:
    w.varu64(len(ngrams))
    for d in ngrams:
        if is_str:
            w.string(d.ngram)
        else:
            w.byte_vec(bytes(d.ngram))
        w.i32_vec(d.weights)


def _decode_ngram_vec(r: Reader, *, is_str: bool) -> List[NgramData]:
    out = []
    for _ in range(r.varu64()):
        ngram = r.string() if is_str else r.byte_vec()
        out.append(NgramData(ngram, r.i32_vec()))
    return out


def _encode_tag_ngram_vec(w: Writer, items: List[TagNgramData], *, is_str: bool) -> None:
    w.varu64(len(items))
    for d in items:
        if is_str:
            w.string(d.ngram)
        else:
            w.byte_vec(bytes(d.ngram))
        w.varu64(len(d.weights))
        for tw in d.weights:
            w.u8(tw.rel_position)
            w.i32_vec(tw.weights)


def _decode_tag_ngram_vec(r: Reader, *, is_str: bool) -> List[TagNgramData]:
    out = []
    for _ in range(r.varu64()):
        ngram = r.string() if is_str else r.byte_vec()
        tws = [TagWeight(r.u8(), r.i32_vec()) for _ in range(r.varu64())]
        out.append(TagNgramData(ngram, tws))
    return out
