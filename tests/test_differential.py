"""Differential tests: device pipeline vs independent numpy oracle.

Random models x random texts; the XLA formulation (windowed trie matching +
shift-add scoring) must agree bit-for-bit with the scalar host
re-implementation of the reference algorithm.
"""

import numpy as np
import pytest

from vaporetto_tpu.models.model import Model, NgramData, WordWeightRecord
from vaporetto_tpu.ops.host_reference import reference_scores
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import Sentence


def random_model(rng, with_dict=True, type_window=3):
    alphabet = [chr(c) for c in range(0x3041, 0x3061)]
    ngrams = {}
    for _ in range(rng.integers(5, 30)):
        ln = int(rng.integers(1, 4))
        ng = "".join(rng.choice(alphabet) for _ in range(ln))
        w = [int(x) for x in rng.integers(-50, 51, int(rng.integers(1, 8)))]
        ngrams[ng] = w
    dict_words = {}
    if with_dict:
        for _ in range(rng.integers(0, 10)):
            ln = int(rng.integers(1, 13))
            word = "".join(rng.choice(alphabet) for _ in range(ln))
            if word in ngrams or word in dict_words:
                continue
            dict_words[word] = [int(x) for x in rng.integers(-50, 51, ln + 1)]
    type_ngrams = {}
    for _ in range(rng.integers(1, 10)):
        ln = int(rng.integers(1, 4))
        tn = bytes(int(x) for x in rng.integers(1, 7, ln))
        type_ngrams[tn] = [
            int(x) for x in rng.integers(-50, 51, int(rng.integers(1, 8)))
        ]
    return Model(
        [NgramData(n, w) for n, w in ngrams.items()],
        [NgramData(n, w) for n, w in type_ngrams.items()],
        [WordWeightRecord(w, ws) for w, ws in dict_words.items()],
        int(rng.integers(-5, 6)),
        3,
        type_window,
    )


def random_text(rng, n):
    # mix of in-alphabet and OOV chars
    pools = [chr(c) for c in range(0x3041, 0x3061)] + ["X", "1", "漢"]
    return "".join(rng.choice(pools) for _ in range(n))


class TestDifferential:
    @pytest.mark.parametrize("seed", range(6))
    def test_random_models(self, seed):
        rng = np.random.default_rng(seed)
        model = random_model(rng, type_window=3 if seed % 2 else 4)
        pred = Predictor(model, False)
        sentences = [
            Sentence.from_raw(random_text(rng, int(rng.integers(1, 60))))
            for _ in range(8)
        ]
        pred.predict_batch(sentences)
        for s in sentences:
            expected = reference_scores(
                pred.compiled, s.codepoints, s.char_types
            )
            assert s.boundary_scores_list() == expected.tolist(), s.text

    def test_debug_checks_mode(self, monkeypatch):
        monkeypatch.setenv("VAPORETTO_TPU_DEBUG_CHECKS", "1")
        rng = np.random.default_rng(123)
        model = random_model(rng)
        pred = Predictor(model, False)
        s = Sentence.from_raw(random_text(rng, 30))
        pred.predict(s)  # raises AssertionError on any mismatch
