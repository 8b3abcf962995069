"""Multi-host corpus input pipeline.

The reference streams stdin line-by-line on one core
(predict/src/main.rs:126-180). Here: each host reads its shard of the
corpus (round-robin by ``jax.process_index()``), tensorizes with the native
C++ decoder, buckets lines by length to bound padding waste, and emits
fixed-shape ``(B, L)`` batches ready to shard over the ``dp`` mesh.
Order-restoring indices are carried alongside so outputs can be written in
input order.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.batch import bucket_length

__all__ = ["Batch", "host_shard", "host_shard_bounds", "batched_lines"]


@dataclasses.dataclass
class Batch:
    codepoints: np.ndarray  # (B, L) int32
    char_types: np.ndarray  # (B, L) int32
    lengths: np.ndarray  # (B,) int32
    line_indices: np.ndarray  # (B,) int64 original positions (-1 = padding row)


def host_shard(lines: Sequence[str], process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> List[Tuple[int, str]]:
    """This host's (index, line) shard of a corpus (round-robin)."""
    if process_index is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    return [
        (i, line)
        for i, line in enumerate(lines)
        if i % process_count == process_index
    ]


def host_shard_bounds(n_lines: int, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> Tuple[int, int]:
    """This host's CONTIGUOUS [lo, hi) line-index block of a corpus.

    Contiguous blocks (unlike the round-robin :func:`host_shard`) let the
    distributed predict CLI restore global output order by concatenating
    the per-process output files in process order."""
    if process_index is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    lo = process_index * n_lines // process_count
    hi = (process_index + 1) * n_lines // process_count
    return lo, hi


def batched_lines(
    indexed_lines: Iterable[Tuple[int, str]],
    batch_size: int,
    max_len: int = 4096,
    bucket: bool = True,
) -> Iterator[Batch]:
    """Yield fixed-shape batches; lines are grouped into power-of-two length
    buckets so each distinct (B, L) shape compiles once."""
    from ..native import tensorize_native
    from ..sentence import char_types_of_codepoints

    buckets: dict = {}
    items = list(indexed_lines)

    def flush(L: int, group: List[Tuple[int, bytes]]) -> Batch:
        idxs = np.full(batch_size, -1, dtype=np.int64)
        idxs[: len(group)] = [i for i, _ in group]
        raw = [b for _, b in group] + [b""] * (batch_size - len(group))
        native = tensorize_native(raw, L)
        if native is not None:
            cps, types, lengths = native
            return Batch(cps, types.astype(np.int32), lengths, idxs)
        cps = np.zeros((batch_size, L), dtype=np.int32)
        lengths = np.zeros(batch_size, dtype=np.int32)
        for r, (_, b) in enumerate(group):
            arr = np.frombuffer(
                b.decode("utf-8").encode("utf-32-le"), dtype=np.int32
            )[:L]
            cps[r, : len(arr)] = arr
            lengths[r] = len(arr)
        types = char_types_of_codepoints(cps).astype(np.int32)
        types[cps == 0] = 0
        return Batch(cps, types, lengths, idxs)

    for i, line in items:
        data = line.encode("utf-8")
        n_chars = len(line)
        L = min(bucket_length(max(n_chars, 1)), max_len) if bucket else max_len
        group = buckets.setdefault(L, [])
        group.append((i, data))
        if len(group) >= batch_size:
            yield flush(L, group)
            buckets[L] = []
    for L, group in sorted(buckets.items()):
        if group:
            yield flush(L, group)
