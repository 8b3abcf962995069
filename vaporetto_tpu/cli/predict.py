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
    p.add_argument("--batch-size", type=int, default=None,
                   help="Lines per device batch (default: 256 on the "
                   "general path, 8192 on the lean serving path).")
    p.add_argument("--backend", choices=("device", "host", "auto"),
                   default="auto", help=BACKEND_HELP)
    p.add_argument("--no-lean", action="store_true",
                   help="Disable the lean serving fast path (native "
                   "tensorize -> uint16/int8 device kernel -> native "
                   "detokenize); the general Sentence path is then used "
                   "for all flag combinations.")
    p.add_argument("--dp", type=int, default=0, metavar="N",
                   help="Data-parallel scale-out: shard batches over the "
                   "first N devices of a 1-D mesh (lean path only; model "
                   "tables replicated, zero collectives).")
    p.add_argument("--input", default=None,
                   help="Input corpus file (default: stdin; required for "
                   "multi-process runs).")
    p.add_argument("--output", default=None,
                   help="Output path; multi-process runs write "
                   "OUTPUT.partN per process (cat in order restores the "
                   "corpus order).")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address.")
    p.add_argument("--num-processes", type=int, default=None,
                   help="Multi-host predict: each process handles a "
                   "contiguous block of the input lines.")
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="Capture a jax.profiler trace of the run into "
                   "DIR (view with TensorBoard/xprof).")
    args = p.parse_args(argv)
    validate_multiprocess_args(p, args)

    if args.profile:
        from ..utils.observe import trace

        with trace(args.profile):
            return _dispatch_modes(args)
    return _dispatch_modes(args)


def _dispatch_modes(args) -> int:
    if args.num_processes is not None and args.num_processes > 1:
        if args.dp:
            print("error: --dp cannot combine with --num-processes "
                  "(the multi-process run already spans every host's "
                  "devices)", file=sys.stderr)
            return 2
        return _run_dist(args)

    pre_filter = KyteaFullwidthFilter()
    post_filters = build_post_filters(args.wsconst)

    print("Loading model file...", file=sys.stderr)
    model = Model.read(args.model)
    # --input/--output are honored in single-process mode too
    in_b = open(args.input, "rb") if args.input else None
    from ..utils.routing import input_size_hint

    predictor = build_predictor(
        model, args.predict_tags, args.backend,
        need_device=bool(args.dp),
        bulk_hint=input_size_hint(in_b if in_b is not None
                                  else sys.stdin.buffer),
    )
    args.backend = predictor.backend  # resolved engine for the lean router
    if args.tag_scores:
        predictor.store_tag_scores(True)

    print("Start tokenization", file=sys.stderr)
    out = open(args.output, "wb") if args.output else sys.stdout.buffer
    start = time.perf_counter()

    from ..serving import lean_path_supported, lean_tags_supported

    if (
        not args.no_lean
        and lean_path_supported(args)
        and (not args.predict_tags or lean_tags_supported(predictor))
        and (args.backend != "host" or predictor._host() is not None)
    ):
        rc = _run_lean(args, predictor, in_b, out)
        if args.output:
            out.close()
        print(f"Elapsed: {time.perf_counter() - start} [sec]",
              file=sys.stderr)
        return rc
    if args.dp:
        print("warning: --dp requires the lean serving path "
              "(device backend; no --predict-tags with wsconst G, no "
              "--tag-scores without --predict-tags); ignored",
              file=sys.stderr)

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
            if s is not None:
                for f in post_filters:
                    f.filter(s)
                if args.predict_tags:
                    s.fill_tags()
            _emit_outputs(args, line, s, out)

    import io

    text_in = (
        io.TextIOWrapper(in_b, encoding="utf-8", newline="\n")
        if in_b is not None
        else sys.stdin
    )
    batch: List[str] = []
    batch_size = args.batch_size or BATCH
    for line in iter_lines(text_in):
        batch.append(line)
        if len(batch) >= batch_size:
            flush_batch(batch)
            batch = []
    if batch:
        flush_batch(batch)
    if args.output:
        out.close()

    print(f"Elapsed: {time.perf_counter() - start} [sec]", file=sys.stderr)
    return 0


def _run_lean(args, predictor, infile=None, out_b=None) -> int:
    """The lean serving path: native tensorize (+ fused normalization) ->
    uint16/int8 device kernel (wsconst fused; tag pass or int32 score
    readback when requested) -> native byte-level detokenizer against
    the original input bytes, with the wsconst-G host mask when asked.
    Output is byte-identical to the general path for every flag set
    lean_path_supported accepts; rejected batches (astral chars) fall
    back per batch.
    """
    from ..serving import LeanServer
    from .common import _WSCONST_MAP

    pre_filter = KyteaFullwidthFilter()
    post_filters = build_post_filters(args.wsconst)
    if infile is None:
        infile = sys.stdin.buffer
    if out_b is None:
        out_b = sys.stdout.buffer

    def fallback(lines: List[bytes]) -> None:
        # invalid UTF-8 aborts the run, as in the reference
        # (predict/src/main.rs:128 `line?` on BufRead::lines) and the
        # general path (strict text-mode stdin) — but only AFTER the
        # batch's valid prefix has been predicted and written, so the
        # abort point matches a line-by-line reader's
        bad_utf8: Optional[UnicodeDecodeError] = None
        sentences: List[Optional[Sentence]] = []
        texts = []
        for raw in lines:
            try:
                line = raw.decode("utf-8", errors="strict")
            except UnicodeDecodeError as e:
                bad_utf8 = e
                break
            texts.append(line)
            try:
                text = line if args.no_norm else pre_filter.filter(line)
                sentences.append(Sentence.from_raw(text))
            except Exception:
                sentences.append(None)
        alive = [s for s in sentences if s is not None]
        if alive:
            predictor.predict_batch(alive)
        for line, s in zip(texts, sentences):
            if s is not None:
                for f in post_filters:
                    f.filter(s)
                if args.predict_tags:
                    s.fill_tags()
            _emit_outputs(args, line, s, out_b)
        if bad_utf8 is not None:
            out_b.flush()
            raise bad_utf8

    mesh = None
    if args.dp and args.backend == "host":
        print("warning: --dp has no effect with --backend host; ignored",
              file=sys.stderr)
    elif args.dp:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.dp)
    server = LeanServer(
        predictor,
        wsconst=[int(_WSCONST_MAP[w]) for w in args.wsconst if w != "G"],
        normalize=not args.no_norm,
        batch_lines=args.batch_size or 8192,
        fallback=fallback,
        mesh=mesh,
        tags=args.predict_tags,
        scores=args.scores,
        grapheme="G" in args.wsconst,
        tag_scores=args.tag_scores,
    )
    server.run(infile, out_b)
    out_b.flush()
    return 0


def _emit_outputs(args, line: str, s: Optional[Sentence], out_b) -> None:
    """Write one line's outputs as bytes: the tokenized text re-applied
    onto the ORIGINAL line, then the --scores / --tag-scores blocks —
    the binary-sink twin of ``flush_batch``'s per-line tail (shared by
    the lean fallback and the distributed general path so the two cannot
    drift). Filters and ``fill_tags`` must already have run on ``s``."""
    if s is None:
        out_b.write(b"\n")
        return
    orig = s
    if not args.no_norm:
        orig = Sentence.from_raw(line)
        orig.reset_tags(s.n_tags)
        orig.boundaries = s.boundaries
        orig.tags = list(s.tags)
    out_b.write(orig.write_tokenized_text().encode("utf-8"))
    out_b.write(b"\n")
    if args.scores:
        text = s.as_raw_text()
        scores = s.boundary_scores_list()
        for i in range(len(text) - 1):
            out_b.write(
                f"{i}:{text[i]}{text[i + 1]} {scores[i]}\n".encode("utf-8")
            )
        out_b.write(b"\n")
    if args.tag_scores:
        for token in s.iter_tokens():
            out_b.write(token.surface().encode("utf-8"))
            for cands in token.tag_candidates():
                out_b.write(b"\t")
                out_b.write(
                    ",".join(
                        f"{tag}:{score}" for tag, score in cands
                    ).encode("utf-8")
                )
            out_b.write(b"\n")
        out_b.write(b"\n")


def _run_dist(args) -> int:
    """Multi-process predict: ``jax.distributed`` init, a CONTIGUOUS line
    block per process (parallel.data.host_shard_bounds), output written to
    ``{output}.part{process_id}`` — concatenating the parts in process
    order restores the corpus order. Each process runs the lean pipeline
    on its shard when the flag set allows, else the general path batched
    through the bucketed input pipeline (parallel.data.batched_lines)."""
    import io

    import numpy as np

    from ..parallel.distributed import initialize

    if args.input is None or args.output is None:
        print("error: --input and --output are required with "
              "--num-processes", file=sys.stderr)
        return 2
    initialize(args.coordinator, args.num_processes, args.process_id)
    import jax

    pid = jax.process_index()

    print("Loading model file...", file=sys.stderr)
    model = Model.read(args.model)
    predictor = build_predictor(model, args.predict_tags, args.backend)
    args.backend = predictor.backend
    if args.tag_scores:
        predictor.store_tag_scores(True)

    with open(args.input, "rb") as f:
        data = f.read()
    blob = np.frombuffer(data, dtype=np.uint8)
    nl = np.flatnonzero(blob == 0x0A)
    starts = np.concatenate(([0], nl + 1))
    if len(data) and not data.endswith(b"\n"):
        starts = np.concatenate((starts, [len(data)]))
    n_lines = len(starts) - 1
    from ..parallel.data import host_shard_bounds

    lo, hi = host_shard_bounds(n_lines)
    shard = data[starts[lo] : starts[hi]]
    # BufRead::lines keeps a lone CR on an unterminated final line; only
    # the LAST process's shard can contain it
    unterminated_tail = (
        hi == n_lines and len(data) > 0 and not data.endswith(b"\n")
    )

    print("Start tokenization", file=sys.stderr)
    # Elapsed covers tokenization only (the reference's wall-clock
    # contract, predict/src/main.rs:124,183-185) — not jax.distributed
    # init or model load, so per-process numbers compare fairly with
    # the single-process run
    start = time.perf_counter()
    from ..serving import lean_path_supported, lean_tags_supported

    rc = 0
    with open(f"{args.output}.part{pid}", "wb") as out_b:
        if (
            not args.no_lean
            and lean_path_supported(args)
            and (not args.predict_tags or lean_tags_supported(predictor))
            and (args.backend != "host" or predictor._host() is not None)
        ):
            rc = _run_lean(args, predictor, io.BytesIO(shard), out_b)
        else:
            _general_dist(args, predictor, shard, out_b, unterminated_tail)
    print(f"Elapsed: {time.perf_counter() - start} [sec]", file=sys.stderr)
    return rc


def _general_dist(args, predictor, shard: bytes, out_b,
                  unterminated_tail: bool = False) -> None:
    """General path over the bucketed fixed-shape input pipeline
    (parallel.data.batched_lines); ``--backend host`` routes through
    ``predict_batch`` (native evaluator + debug checks) instead."""
    import numpy as np

    from ..parallel.data import batched_lines

    pre_filter = KyteaFullwidthFilter()
    post_filters = build_post_filters(args.wsconst)
    text_lines = shard.decode("utf-8").split("\n")
    if text_lines and text_lines[-1] == "":
        text_lines.pop()
    # CR is stripped only when it preceded '\n' (BufRead::lines): the
    # unterminated final line of the whole input keeps a lone CR
    text_lines = [
        t[:-1]
        if t.endswith("\r")
        and not (unterminated_tail and i == len(text_lines) - 1)
        else t
        for i, t in enumerate(text_lines)
    ]
    norm: List[Optional[str]] = []
    sents: List[Optional[Sentence]] = []
    for line in text_lines:
        try:
            text = line if args.no_norm else pre_filter.filter(line)
            s = Sentence.from_raw(text)
        except Exception:
            text, s = None, None
        norm.append(text)
        sents.append(s)
    alive = [s for s in sents if s is not None]
    if args.backend == "host":
        bs = args.batch_size or BATCH
        for g in range(0, len(alive), bs):
            predictor.predict_batch(alive[g : g + bs])
    else:
        max_len = predictor.LONG_SENTENCE_THRESHOLD
        for s in alive:
            if len(s) > max_len:
                predictor.predict(s)
        stream = (
            (i, norm[i])
            for i, s in enumerate(sents)
            if s is not None and len(s) <= max_len
        )
        for batch in batched_lines(stream, args.batch_size or BATCH,
                                   max_len=max_len):
            B, L = batch.codepoints.shape
            fn = predictor._predict_fn(B, L)
            scores, cm, tm = fn(
                batch.codepoints, batch.char_types, batch.lengths
            )
            scores = np.asarray(scores)
            cm = np.asarray(cm) if cm is not None else None
            tm = np.asarray(tm) if tm is not None else None
            for r, idx in enumerate(batch.line_indices.tolist()):
                if idx < 0:
                    continue
                predictor.assign_result_row(
                    sents[idx],
                    scores[r],
                    cm[r] if cm is not None else None,
                    tm[r] if tm is not None else None,
                )
        predictor.debug_verify(alive)
    for line, s in zip(text_lines, sents):
        if s is not None:
            for f in post_filters:
                f.filter(s)
            if args.predict_tags:
                s.fill_tags()
        _emit_outputs(args, line, s, out_b)


if __name__ == "__main__":
    sys.exit(main())
