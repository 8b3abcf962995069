"""Tokenization service with the reference WASM demo's exact flow.

Mirrors examples/wasm/src/lib.rs:48-128 (the deployed web demo):

* INSTANT LOAD: the predictor is revived from an ahead-of-time compiled
  artifact blob (``Predictor.serialize_to_vec`` /
  ``deserialize_from_slice`` — the analogue of the reference's zero-copy
  predictor serialization, predictor.rs:639-664). The first run builds
  and caches the blob next to the model; later starts skip model
  compilation entirely.
* TAGS: the predictor is created with ``predict_tags=True`` and every
  token's POS/reading tags are filled (lib.rs:55,118).
* FILTERS: KyTea fullwidth pre-normalization, then wsconst D (digits) and
  G (grapheme clusters) post filters, exactly the demo's filter chain
  (lib.rs:60-66).
* ORIGINAL-TEXT MAPPING: predicted boundaries and tags are re-applied
  onto the ORIGINAL un-normalized line before writing (lib.rs:101-117).

Usage: python examples/serve.py model_path < input.txt > output.txt
"""

import os
import sys

from vaporetto_tpu import Model, Predictor
from vaporetto_tpu.rules import (
    ConcatGraphemeClustersFilter,
    KyteaFullwidthFilter,
    KyteaWsConstFilter,
)
from vaporetto_tpu.sentence import CharacterType, Sentence

BATCH = 256


def _blob_path(model_path: str) -> str:
    path = model_path + ".vtc"  # compiled-predictor cache
    model_dir = os.path.dirname(os.path.abspath(model_path)) or "."
    if not os.access(model_dir, os.W_OK):
        import hashlib
        import tempfile

        h = hashlib.sha1(
            os.path.abspath(model_path).encode()
        ).hexdigest()[:12]
        path = os.path.join(tempfile.gettempdir(), f"vtc_{h}.bin")
    return path


def load_predictor(model_path: str) -> Predictor:
    """Instant load from the AOT artifact, building it on first use."""
    blob_path = _blob_path(model_path)
    if os.path.exists(blob_path) and (
        os.path.getmtime(blob_path) >= os.path.getmtime(model_path)
    ):
        with open(blob_path, "rb") as f:
            predictor = Predictor.deserialize_from_slice(f.read())
        print("revived predictor from artifact", file=sys.stderr)
        return predictor
    predictor = Predictor(Model.read(model_path), predict_tags=True)
    with open(blob_path, "wb") as f:
        f.write(predictor.serialize_to_vec())
    print("compiled predictor and cached artifact", file=sys.stderr)
    return predictor


def main() -> int:
    predictor = load_predictor(sys.argv[1])
    # the WASM demo runs without an accelerator; the native host engine
    # models that exactly (bit-identical to the device pipeline) and
    # keeps this example instant on machines with no TPU attached —
    # falls back to the device path when the C++ library is unavailable
    if predictor._host() is not None:
        predictor.backend = "host"
        print("segmenting on the native host engine", file=sys.stderr)
    pre_filter = KyteaFullwidthFilter()
    post_filters = [
        ConcatGraphemeClustersFilter(),  # wsconst G
        KyteaWsConstFilter(CharacterType.DIGIT),  # wsconst D
    ]

    out = sys.stdout

    def flush(lines):
        sentences = []
        for line in lines:
            try:
                sentences.append(Sentence.from_raw(pre_filter.filter(line)))
            except Exception:
                sentences.append(None)
        alive = [s for s in sentences if s is not None]
        if alive:
            predictor.predict_batch(alive)
            for s in alive:
                for f in post_filters:
                    f.filter(s)
            predictor.predict_tags_batch(alive)
        for line, s in zip(lines, sentences):
            if s is None:
                out.write("\n")
                continue
            # re-apply boundaries + tags onto the original text
            # (normalization is 1 char -> 1 char, lib.rs:101-117)
            orig = Sentence.from_raw(line)
            orig.reset_tags(s.n_tags)
            orig.boundaries = s.boundaries
            orig.tags = list(s.tags)
            out.write(orig.write_tokenized_text())
            out.write("\n")

    batch = []
    for line in sys.stdin:
        batch.append(line.rstrip("\n"))
        if len(batch) >= BATCH:
            flush(batch)
            batch = []
    if batch:
        flush(batch)
    return 0


if __name__ == "__main__":
    sys.exit(main())
