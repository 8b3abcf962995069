"""evaluate CLI — accuracy evaluation against gold tokenized text.

Mirrors the reference evaluate CLI (evaluate/src/main.rs): gold tokenized
lines on stdin, re-predict on (optionally normalized) raw text, report
char-boundary P/R/F1 or Nagata word-level P/R/F1.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from ..metrics import char_metric, word_metric
from ..models.model import Model
from ..predictor import Predictor
from ..rules import KyteaFullwidthFilter
from ..sentence import Sentence
from .common import WSCONST_HELP, build_post_filters, iter_lines

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
    args = p.parse_args(argv)

    fullwidth = KyteaFullwidthFilter()
    post_filters = build_post_filters(args.wsconst)

    print("Loading model file...", file=sys.stderr)
    model = Model.read(args.model)
    predictor = Predictor(model, args.predict_tags)

    print("Start tokenization", file=sys.stderr)
    results = []
    pending = []  # (ref_boundaries, ref_tags, sentence)

    def flush() -> None:
        if not pending:
            return
        predictor.predict_batch([s for _, _, s in pending])
        for ref_b, ref_t, s in pending:
            for f in post_filters:
                f.filter(s)
            if args.predict_tags:
                s.fill_tags()
            sys_b = [int(b) for b in s.boundaries]
            n = s.n_tags
            sys_t = [s.tags[i * n : (i + 1) * n] for i in range(len(sys_b) + 1)]
            results.append((ref_b, ref_t, sys_b, sys_t))
        pending.clear()

    for line in iter_lines(sys.stdin):
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
        m = char_metric(results)
        print(f"Precision: {m.precision}")
        print(f"Recall: {m.recall}")
        print(f"F1: {m.f1}")
        print(f"TP: {m.tp}, TN: {m.tn}, FP: {m.fp}, FN: {m.fn}")
    else:
        m = word_metric(results)
        print(f"Precision: {m.precision}")
        print(f"Recall: {m.recall}")
        print(f"F1: {m.f1}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
