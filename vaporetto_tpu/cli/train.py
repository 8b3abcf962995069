"""train CLI.

Mirrors the reference train CLI (train/src/main.rs): loads tokenized
(--tok) and/or partially annotated (--part) corpora plus dictionaries
(--dict), fullwidth-normalizes the training text while keeping the original
boundaries/tags (main.rs:92-101), trains, and writes a zstd-19 model.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from ..rules import KyteaFullwidthFilter
from .common import iter_lines, validate_multiprocess_args
from ..sentence import Sentence
from ..train.trainer import SolverType, Trainer


def _normalized(s: Sentence, fullwidth: KyteaFullwidthFilter,
                no_norm: bool) -> Sentence:
    if no_norm:
        return s
    new_s = Sentence.from_raw(fullwidth.filter(s.as_raw_text()))
    new_s.boundaries = s.boundaries.copy()
    new_s.reset_tags(s.n_tags)
    new_s.tags = list(s.tags)
    new_s.n_tags = s.n_tags
    return new_s


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(
        description="A program to train models of Vaporetto."
    )
    p.add_argument("--tok", action="append", default=[],
                   help="A tokenized training corpus")
    p.add_argument("--part", action="append", default=[],
                   help="A partially annotated training corpus")
    p.add_argument("--dict", action="append", default=[],
                   help="A word dictionary file")
    p.add_argument("--model", required=True,
                   help="The file to write the trained model to")
    p.add_argument("--charw", type=int, default=3)
    p.add_argument("--charn", type=int, default=3)
    p.add_argument("--typew", type=int, default=3)
    p.add_argument("--typen", type=int, default=3)
    p.add_argument("--dictn", type=int, default=4)
    p.add_argument("--eps", type=float, default=0.01)
    p.add_argument("--cost", type=float, default=1.0)
    p.add_argument("--solver", required=True, type=SolverType.from_str,
                   help="The solver. {0..7} (see LIBLINEAR documentation)")
    p.add_argument("--no-norm", action="store_true",
                   help="Do not normalize training data.")
    p.add_argument("--zstd-workers", type=int, default=0,
                   help="The number of zstd workers (multithreaded "
                   "compression; 0 = single-threaded).")
    p.add_argument("--dp", type=int, default=0, metavar="N",
                   help="Shard the solver's example matrix over an "
                   "N-device data-parallel mesh (0 = single device). "
                   "The TPU-native analogue of multi-core LIBLINEAR; "
                   "gradients are psum-reduced by GSPMD.")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address "
                   "(multi-host training).")
    p.add_argument("--num-processes", type=int, default=None,
                   help="Multi-host training: every process loads the "
                   "same corpus files and extracts identical features; "
                   "the solver's example matrix is sharded over the "
                   "GLOBAL device mesh and gradients reduce across "
                   "hosts; process 0 writes the model.")
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    if not args.tok and not args.part:
        p.error("at least one of --tok / --part is required")
    validate_multiprocess_args(p, args)

    distributed = args.num_processes is not None and args.num_processes > 1
    if distributed:
        from ..parallel.distributed import initialize

        initialize(args.coordinator, args.num_processes, args.process_id)

    fullwidth = KyteaFullwidthFilter()

    print("Loading dataset...", file=sys.stderr)
    train_sents = []
    for path in args.tok:
        print(f"Loading {path} ...", file=sys.stderr)
        with open(path) as f:
            for line in iter_lines(f):
                s = Sentence.from_tokenized(line)
                train_sents.append(_normalized(s, fullwidth, args.no_norm))
        print(f"# of sentences: {len(train_sents)}", file=sys.stderr)
    for path in args.part:
        print(f"Loading {path} ...", file=sys.stderr)
        with open(path) as f:
            for line in iter_lines(f):
                s = Sentence.from_partial_annotation(line)
                train_sents.append(_normalized(s, fullwidth, args.no_norm))
        print(f"# of sentences: {len(train_sents)}", file=sys.stderr)

    tag_dictionary = []
    dictionary = set()
    for path in args.dict:
        print(f"Loading {path} ...", file=sys.stderr)
        with open(path) as f:
            for line in iter_lines(f):
                s = Sentence.from_tokenized(line)
                s = _normalized(s, fullwidth, args.no_norm)
                for token in s.iter_tokens():
                    dictionary.add(token.surface())
                tag_dictionary.append(s)
        print(f"# of words: {len(dictionary)}", file=sys.stderr)

    print("Extracting into features...", file=sys.stderr)
    trainer = Trainer(
        args.charw, args.charn, args.typew, args.typen,
        sorted(dictionary), args.dictn, tag_dictionary,
    )
    for s in train_sents:
        trainer.add_example(s)
    print(f"# of features: {trainer.n_features()}", file=sys.stderr)

    mesh = None
    if distributed:
        # one 1-D mesh over every chip of every host: each process holds
        # the identical full example matrix (same corpus, deterministic
        # feature interning), jax shards the rows globally, and GSPMD
        # inserts the cross-host gradient reduction (SURVEY §2.4)
        from ..parallel.distributed import global_mesh

        mesh = global_mesh()
    elif args.dp:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.dp)

    print("Start training...", file=sys.stderr)
    model = trainer.train(args.eps, args.cost, args.solver, mesh=mesh)
    print("Finish training.", file=sys.stderr)

    if distributed:
        import jax

        if jax.process_index() != 0:
            return 0  # weights are replicated; one writer suffices
    with open(args.model, "wb") as f:
        model.write(f, zstd_level=19, zstd_workers=args.zstd_workers)
    return 0


if __name__ == "__main__":
    sys.exit(main())
