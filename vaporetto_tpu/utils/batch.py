"""Batch tensorization: sentences -> padded (B, L) device-ready arrays."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..sentence import Sentence

__all__ = ["tensorize", "bucket_length"]

MIN_BUCKET = 16


def bucket_length(n: int) -> int:
    """Round up to the next power of two (>= MIN_BUCKET) to bound the number
    of compiled shapes."""
    b = MIN_BUCKET
    while b < n:
        b *= 2
    return b


def tensorize(
    sentences: Sequence[Sentence], length: int | None = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack sentences into (codepoints, char_types, lengths) padded arrays.

    Padding value 0 doubles as the OOV/absent symbol for both matchers.
    """
    lengths = np.array([len(s) for s in sentences], dtype=np.int32)
    L = length if length is not None else bucket_length(int(lengths.max()))
    B = len(sentences)
    cps = np.zeros((B, L), dtype=np.int32)
    cts = np.zeros((B, L), dtype=np.int32)
    for i, s in enumerate(sentences):
        n = len(s)
        cps[i, :n] = s.codepoints
        cts[i, :n] = s.char_types
    return cps, cts, lengths
