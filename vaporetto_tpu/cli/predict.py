"""predict CLI — word segmentation filter program.

Mirrors the reference predict CLI (predict/src/main.rs): reads raw lines
from stdin, normalizes (KyTea fullwidth, skippable with --no-norm),
predicts boundaries (+tags with --predict-tags), applies --wsconst post
filters, re-applies results onto the ORIGINAL un-normalized text, and
writes tokenized lines to stdout. --scores prints per-gap integer scores in
the reference's exact format.

TPU-native difference: lines are processed in large padded batches rather
than one at a time (the reference's per-line loop,
predict/src/main.rs:126-180) — same outputs, device-friendly throughput.
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import List, Optional

from ..models.model import Model
from ..predictor import Predictor
from ..rules import KyteaFullwidthFilter
from ..sentence import Sentence
from .common import WSCONST_HELP, build_post_filters

BATCH = 256


def print_scores(s: Sentence, out) -> None:
    """Reference predict/src/main.rs:66-75."""
    text = s.as_raw_text()
    scores = s.boundary_scores_list()
    for i in range(len(text) - 1):
        out.write(f"{i}:{text[i]}{text[i + 1]} {scores[i]}\n")
    out.write("\n")


def print_tag_scores(s: Sentence, out) -> None:
    """Reference predict/src/main.rs:77-93."""
    for token in s.iter_tokens():
        out.write(token.surface())
        for cands in token.tag_candidates():
            out.write("\t")
            out.write(",".join(f"{tag}:{score}" for tag, score in cands))
        out.write("\n")
    out.write("\n")


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        description="A program to perform word segmentation."
    )
    p.add_argument("--model", required=True, help="The model file to use")
    p.add_argument("--predict-tags", action="store_true",
                   help="Predicts POS tags.")
    p.add_argument("--wsconst", action="append", default=[],
                   help=WSCONST_HELP)
    p.add_argument("--scores", action="store_true",
                   help="Prints boundary scores.")
    p.add_argument("--tag-scores", action="store_true",
                   help="Prints tag scores.")
    p.add_argument("--no-norm", action="store_true",
                   help="Do not normalize input strings before prediction.")
    p.add_argument("--batch-size", type=int, default=BATCH)
    p.add_argument("--backend", choices=("device", "host"), default="device",
                   help="device = jitted TPU pipeline (throughput); host = "
                   "native C++ evaluator (low latency, bit-identical).")
    args = p.parse_args(argv)

    pre_filter = KyteaFullwidthFilter()
    post_filters = build_post_filters(args.wsconst)

    print("Loading model file...", file=sys.stderr)
    model = Model.read(args.model)
    predictor = Predictor(model, args.predict_tags, backend=args.backend)
    if args.tag_scores:
        predictor.store_tag_scores(True)

    print("Start tokenization", file=sys.stderr)
    out = sys.stdout
    start = time.perf_counter()

    def flush_batch(lines: List[str]) -> None:
        sentences: List[Optional[Sentence]] = []
        for line in lines:
            try:
                text = line if args.no_norm else pre_filter.filter(line)
                sentences.append(Sentence.from_raw(text))
            except Exception:
                sentences.append(None)
        alive = [s for s in sentences if s is not None]
        if alive:
            predictor.predict_batch(alive)
        for line, s in zip(lines, sentences):
            if s is None:
                out.write("\n")
                continue
            for f in post_filters:
                f.filter(s)
            if args.predict_tags:
                s.fill_tags()
            if args.no_norm:
                out.write(s.write_tokenized_text())
                out.write("\n")
                if args.scores:
                    print_scores(s, out)
            else:
                orig = Sentence.from_raw(line)
                orig.reset_tags(s.n_tags)
                orig.boundaries = s.boundaries
                orig.tags = list(s.tags)
                out.write(orig.write_tokenized_text())
                out.write("\n")
                if args.scores:
                    print_scores(s, out)
            if args.tag_scores:
                print_tag_scores(s, out)

    batch: List[str] = []
    for line in sys.stdin:
        batch.append(line.rstrip("\n"))
        if len(batch) >= args.batch_size:
            flush_batch(batch)
            batch = []
    if batch:
        flush_batch(batch)

    print(f"Elapsed: {time.perf_counter() - start} [sec]", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
