"""Shared CLI plumbing (wsconst parsing, filter construction)."""

from __future__ import annotations

from typing import List

from ..rules import (
    ConcatGraphemeClustersFilter,
    KyteaWsConstFilter,
)
from ..sentence import CharacterType

WSCONST_HELP = (
    "Do not segment some character types: {D, R, H, T, K, O, G}. "
    "D: Digit, R: Roman, H: Hiragana, T: Katakana, K: Kanji, O: Other, "
    "G: Grapheme cluster."
)

_WSCONST_MAP = {
    "D": CharacterType.DIGIT,
    "R": CharacterType.ROMAN,
    "H": CharacterType.HIRAGANA,
    "T": CharacterType.KATAKANA,
    "K": CharacterType.KANJI,
    "O": CharacterType.OTHER,
}


def build_post_filters(wsconst_values: List[str]):
    """Reference predict/src/main.rs:100-107."""
    filters = []
    for w in wsconst_values:
        if w == "G":
            filters.append(ConcatGraphemeClustersFilter())
        elif w in _WSCONST_MAP:
            filters.append(KyteaWsConstFilter(_WSCONST_MAP[w]))
        else:
            raise SystemExit(f"error: could not parse a wsconst value: {w!r}")
    return filters


BACKEND_HELP = (
    "device = jitted TPU pipeline (bulk throughput); host = native C++ "
    "evaluator (low latency, bit-identical); auto (default) = probe the "
    "attached accelerator and pick the faster engine "
    "(utils/routing.py; override with VAPORETTO_TPU_BACKEND)."
)


def build_predictor(model, predict_tags: bool, backend_flag: str,
                    need_device: bool = False, bulk_hint=None):
    """Construct a Predictor, resolving ``--backend auto`` to the faster
    engine for this machine and input size (see utils/routing.py);
    ``bulk_hint`` = upper bound on input chars (None = unknown)."""
    from ..predictor import Predictor
    from ..utils.routing import resolve_backend

    p = Predictor(
        model, predict_tags,
        backend=backend_flag if backend_flag != "auto" else "device",
    )
    if backend_flag == "auto":
        p.backend = resolve_backend(
            "auto", p._host() is not None, need_device=need_device,
            bulk_hint=bulk_hint,
        )
    return p


def validate_multiprocess_args(parser, args) -> None:
    """Multi-process flag sanity: ``--num-processes N`` (N > 1) requires
    ``--process-id`` and ``--coordinator`` — passing None straight into
    ``jax.distributed.initialize`` yields a cryptic JAX error instead of
    a usage message."""
    n = getattr(args, "num_processes", None)
    if n is None:
        return
    if n < 1:
        parser.error("--num-processes must be >= 1")
    if n > 1:
        missing = [
            flag
            for flag, v in (
                ("--process-id", getattr(args, "process_id", None)),
                ("--coordinator", getattr(args, "coordinator", None)),
            )
            if v is None
        ]
        if missing:
            parser.error(
                f"--num-processes {n} requires {' and '.join(missing)}"
            )
        if not 0 <= args.process_id < n:
            parser.error(
                "--process-id must be in [0, --num-processes)"
            )


def iter_lines(f):
    """Iterate lines of a text stream with the reference's line semantics
    (BufRead::lines, e.g. predict/src/main.rs:126-128): split on '\n'
    only — a lone '\r' is NOT a line terminator — and strip one trailing
    "\r" per line (CRLF). Python's universal-newline text mode would
    split on lone '\r' too, so the stream is reconfigured when possible.
    """
    try:
        f.reconfigure(newline="\n")
    except (AttributeError, OSError, ValueError):
        # not a reconfigurable TextIOWrapper (StringIO), or the stream was
        # already read from / detached (reconfigure raises ValueError)
        pass
    for line in f:
        # BufRead::lines strips '\r' only when it precedes '\n': an
        # unterminated final line ending in a lone '\r' keeps its CR
        if line.endswith("\n"):
            line = line[:-1]
            if line.endswith("\r"):
                line = line[:-1]
        yield line
