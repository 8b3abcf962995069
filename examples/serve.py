"""Minimal batch tokenization service loop.

Demonstrates the production serving shape: the corpus pipeline
(length-bucketed batches, native UTF-8 tensorization) feeding the jitted
predictor, with order-restoring output. Reads lines from stdin, writes
tokenized lines to stdout.

Usage: python examples/serve.py model_path < input.txt
"""

import sys

from vaporetto_tpu import Model, Predictor
from vaporetto_tpu.parallel.data import batched_lines
from vaporetto_tpu.sentence import Sentence
import numpy as np


def main() -> int:
    predictor = Predictor(Model.read(sys.argv[1]), predict_tags=False)
    lines = [line.rstrip("\n") for line in sys.stdin]
    pad = predictor.compiled.pad_left
    out = [""] * len(lines)
    for b in batched_lines(list(enumerate(lines)), batch_size=256):
        B, L = b.codepoints.shape
        fn = predictor._predict_fn(B, L)
        scores, _, _ = fn(b.codepoints, b.char_types, b.lengths)
        scores = np.asarray(scores)
        for r in range(B):
            i = int(b.line_indices[r])
            if i < 0:
                continue
            s = Sentence.from_raw(lines[i])
            n = len(s)
            s.boundaries = (scores[r, pad : pad + n - 1] > 0).astype(np.uint8)
            out[i] = s.write_tokenized_text()
    sys.stdout.write("\n".join(out) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
