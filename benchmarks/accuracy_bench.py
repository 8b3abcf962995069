"""Trainer accuracy at scale (VERDICT r4 #8: the accuracy contract
beyond tiny fixtures).

Teacher-student setup: text is generated from a closed vocabulary,
labeled by the BUNDLED reference model's own segmentations (the
teacher — a linear model over the same feature class the trainer
learns, so the task is exactly realizable), and a fresh model is
trained on >= 100k teacher-labeled lines with representative solver
enums. Held-out lines are then segmented by the student and scored
against the teacher's labels with the evaluate CLI's metric math
(char boundary F1 + Nagata word F1, evaluate/src/main.rs:121-192).

Expected: char F1 >= 0.99 of the teacher on held-out text (the student
can express the teacher exactly; residual error is optimization +
feature-coverage noise).

Usage: python benchmarks/accuracy_bench.py [--lines N] [--heldout N]
       [--solvers 0,4,5]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def gen_corpus(n_lines: int, seed: int = 13):
    """Vocabulary-structured random text (word sequences), as raw
    strings. A closed 120-char alphabet keeps the observed n-gram
    feature space bounded."""
    rng = np.random.default_rng(seed)
    pool = np.concatenate([
        np.arange(0x3041, 0x3071),  # hiragana subset
        np.arange(0x30A1, 0x30D1),  # katakana subset
        np.arange(0x4E00, 0x4E40),  # kanji subset
    ])
    vocab = sorted({
        "".join(chr(c) for c in pool[rng.integers(0, len(pool),
                                                  rng.integers(1, 5))])
        for _ in range(2000)
    })
    vocab_arr = np.asarray(vocab, dtype=object)
    lines = []
    for _ in range(n_lines):
        k = int(rng.integers(5, 12))
        lines.append("".join(vocab_arr[rng.integers(0, len(vocab_arr), k)]))
    return lines


def teacher_label(lines):
    """Segment with the bundled reference model (the teacher); returns
    tokenized strings. Uses the native host engine when available (the
    fastest path for bulk host-side labeling)."""
    from vaporetto_tpu.models.model import Model
    from vaporetto_tpu.predictor import Predictor
    from vaporetto_tpu.sentence import Sentence

    model = Model.read("/root/reference/resources/model.bin")
    pred = Predictor(model, backend="host")
    if pred._host() is None:
        pred = Predictor(model)
    out = []
    B = 4096
    for lo in range(0, len(lines), B):
        sents = [Sentence.from_raw(t) for t in lines[lo:lo + B]]
        pred.predict_batch(sents)
        out.extend(s.write_tokenized_text() for s in sents)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=100_000)
    ap.add_argument("--heldout", type=int, default=5_000)
    ap.add_argument("--solvers", default="0,4,5")
    ap.add_argument(
        "--max-iter", type=int, default=600,
        help="FISTA iteration cap per solve (2000 = the trainer "
             "default; classification quality saturates far earlier "
             "on this realizable task)",
    )
    args = ap.parse_args()

    from vaporetto_tpu.metrics import char_metric, word_metric
    from vaporetto_tpu.models.model import Model
    from vaporetto_tpu.predictor import Predictor
    from vaporetto_tpu.sentence import Sentence
    from vaporetto_tpu.train.trainer import Trainer

    t0 = time.perf_counter()
    raw = gen_corpus(args.lines + args.heldout)
    gold = teacher_label(raw)
    label_s = time.perf_counter() - t0
    train_tok = gold[: args.lines]
    held_tok = gold[args.lines:]
    held_raw = raw[args.lines:]

    rows = []
    for solver in (int(s) for s in args.solvers.split(",")):
        t0 = time.perf_counter()
        trainer = Trainer(3, 3, 3, 3, [], 4)
        for line in train_tok:
            trainer.add_example(Sentence.from_tokenized(line))
        extract_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        model = trainer.train(0.01, 1.0, solver, max_iter=args.max_iter)
        train_s = time.perf_counter() - t0

        student = Predictor(model, backend="host")
        if student._host() is None:
            student = Predictor(model)
        results = []
        B = 4096
        for lo in range(0, len(held_raw), B):
            golds = [Sentence.from_tokenized(t)
                     for t in held_tok[lo:lo + B]]
            sents = [Sentence.from_raw(t) for t in held_raw[lo:lo + B]]
            student.predict_batch(sents)
            for g, s in zip(golds, sents):
                results.append((
                    [int(b) for b in g.boundaries], None,
                    [int(b) for b in s.boundaries], None,
                ))
        cm = char_metric(results)
        wm = word_metric([
            (rb, [[None]] * (len(rb) + 1), sb, [[None]] * (len(sb) + 1))
            for rb, _, sb, _ in results
        ])
        rows.append({
            "solver": solver,
            "char_f1": round(cm.f1, 5),
            "word_f1": round(wm.f1, 5),
            "n_features": trainer.n_features(),
            "extract_s": round(extract_s, 1),
            "train_s": round(train_s, 1),
        })
        print(f"solver {solver}: char F1 {cm.f1:.5f} word F1 "
              f"{wm.f1:.5f} ({train_s:.0f}s train)", file=sys.stderr)

    print(json.dumps({
        "train_lines": args.lines,
        "heldout_lines": args.heldout,
        "train_chars": sum(len(t) for t in raw[: args.lines]),
        "teacher_label_s": round(label_s, 1),
        "per_solver": rows,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
