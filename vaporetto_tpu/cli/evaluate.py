"""evaluate CLI — accuracy evaluation against gold tokenized text.

Mirrors the reference evaluate CLI (evaluate/src/main.rs): gold tokenized
lines on stdin, re-predict on (optionally normalized) raw text, report
char-boundary P/R/F1 or Nagata word-level P/R/F1.

Multi-host: with ``--num-processes N --process-id I --coordinator H:P``
(and ``--input FILE`` instead of stdin), each process initializes
``jax.distributed``, evaluates its round-robin shard of the corpus, and
the confusion/word counts are allreduced across processes
(parallel.distributed.metric_allreduce); process 0 prints the global
metrics — byte-for-byte those of a single-process run over the full
corpus.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from ..metrics import (
    char_metric,
    char_metric_from_counts,
    word_metric,
    word_metric_from_counts,
)
from ..models.model import Model
from ..rules import KyteaFullwidthFilter
from ..sentence import Sentence
from .common import (
    BACKEND_HELP,
    WSCONST_HELP,
    build_post_filters,
    build_predictor,
    iter_lines,
    validate_multiprocess_args,
)

BATCH = 256


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        description="A program to evaluate the accuracy of Vaporetto."
    )
    p.add_argument("--model", required=True)
    p.add_argument("--predict-tags", action="store_true")
    p.add_argument("--wsconst", action="append", default=[], help=WSCONST_HELP)
    p.add_argument("--no-norm", action="store_true")
    p.add_argument("--metric", choices=["char", "word"], default="char")
    p.add_argument("--batch-size", type=int, default=BATCH)
    p.add_argument("--backend", choices=("device", "host", "auto"),
                   default="auto", help=BACKEND_HELP)
    p.add_argument("--input", default=None,
                   help="Gold corpus file (default: stdin; required for "
                   "multi-process runs).")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address.")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)
    validate_multiprocess_args(p, args)

    distributed = args.num_processes is not None and args.num_processes > 1
    if distributed:
        from ..parallel.distributed import initialize

        if args.input is None:
            p.error("--input is required for multi-process evaluation")
        initialize(args.coordinator, args.num_processes, args.process_id)

    fullwidth = KyteaFullwidthFilter()
    post_filters = build_post_filters(args.wsconst)

    print("Loading model file...", file=sys.stderr)
    model = Model.read(args.model)
    from ..utils.routing import input_size_hint

    if args.input is not None:
        try:
            import os as _os

            hint = _os.path.getsize(args.input)
        except OSError:
            hint = None
    else:
        hint = input_size_hint(sys.stdin.buffer)
    predictor = build_predictor(model, args.predict_tags, args.backend,
                                bulk_hint=hint)

    print("Start tokenization", file=sys.stderr)
    # Streaming accumulation: the confusion/word counts are additive, so
    # each flushed batch folds into running totals and neither the gold
    # corpus nor the per-line results are ever materialized — constant
    # memory at BCCWJ scale (the reference's per-line loop has the same
    # property, evaluate/src/main.rs:69-119).
    counts = [0, 0, 0]  # word: n_sys, n_ref, n_cor
    ccounts = [0, 0, 0, 0]  # char: tp, tn, fp, fn
    pending = []  # (ref_boundaries, ref_tags, sentence)

    def flush() -> None:
        if not pending:
            return
        predictor.predict_batch([s for _, _, s in pending])
        batch_results = []
        for ref_b, ref_t, s in pending:
            for f in post_filters:
                f.filter(s)
            if args.predict_tags:
                s.fill_tags()
            sys_b = [int(b) for b in s.boundaries]
            n = s.n_tags
            sys_t = [s.tags[i * n : (i + 1) * n] for i in range(len(sys_b) + 1)]
            batch_results.append((ref_b, ref_t, sys_b, sys_t))
        pending.clear()
        if args.metric == "char":
            m = char_metric(batch_results)
            ccounts[0] += m.tp
            ccounts[1] += m.tn
            ccounts[2] += m.fp
            ccounts[3] += m.fn
        else:
            m = word_metric(batch_results)
            counts[0] += m.n_sys
            counts[1] += m.n_ref
            counts[2] += m.n_cor

    def line_stream():
        if args.input is not None:
            with open(args.input, encoding="utf-8") as f:
                yield from iter_lines(f)
        else:
            yield from iter_lines(sys.stdin)

    lines = line_stream()
    if distributed:
        import jax

        pid, pcount = jax.process_index(), jax.process_count()
        lines = (
            line for i, line in enumerate(lines) if i % pcount == pid
        )

    for line in lines:
        if not line:
            continue
        s = Sentence.from_tokenized(line)
        ref_b = [int(b) for b in s.boundaries]
        n = s.n_tags
        ref_t = [s.tags[i * n : (i + 1) * n] for i in range(len(ref_b) + 1)]
        if not args.no_norm:
            s = Sentence.from_raw(fullwidth.filter(s.as_raw_text()))
        else:
            s = Sentence.from_raw(s.as_raw_text())
        pending.append((ref_b, ref_t, s))
        if len(pending) >= args.batch_size:
            flush()
    flush()

    if args.metric == "char":
        m = char_metric_from_counts(*ccounts)
        if distributed:
            from ..parallel.distributed import metric_allreduce

            g = metric_allreduce(
                {"tp": m.tp, "tn": m.tn, "fp": m.fp, "fn": m.fn}
            )
            m = char_metric_from_counts(g["tp"], g["tn"], g["fp"], g["fn"])
            import jax

            if jax.process_index() != 0:
                return 0
        print(f"Precision: {m.precision}")
        print(f"Recall: {m.recall}")
        print(f"F1: {m.f1}")
        print(f"TP: {m.tp}, TN: {m.tn}, FP: {m.fp}, FN: {m.fn}")
    else:
        m = word_metric_from_counts(*counts)
        if distributed:
            from ..parallel.distributed import metric_allreduce

            g = metric_allreduce(
                {"n_sys": m.n_sys, "n_ref": m.n_ref, "n_cor": m.n_cor}
            )
            m = word_metric_from_counts(
                g["n_sys"], g["n_ref"], g["n_cor"]
            )
            import jax

            if jax.process_index() != 0:
                return 0
        print(f"Precision: {m.precision}")
        print(f"Recall: {m.recall}")
        print(f"F1: {m.f1}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
