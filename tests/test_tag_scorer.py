"""Native batched tag scorer vs the pure-Python tag path.

The native scorer (native/tag_scorer.cc) must produce exactly the tags and
raw scores of the Python reference walk (predictor._tag_token_by_id), which
itself pins the reference semantics (predictor.rs:546-637, golden-tested in
test_scorers.py). Here the two are cross-checked on the golden model, the
bundled reference model + docs.tok, and randomized tagged models.
"""

import numpy as np
import pytest

from vaporetto_tpu.models.model import (
    Model,
    NgramData,
    TagModel,
    TagNgramData,
    TagWeight,
)
from vaporetto_tpu.predictor import Predictor, _token_spans
from vaporetto_tpu.sentence import Sentence

from test_scorers import create_test_model


def _native_available(pred) -> bool:
    return pred._tag_scorer() is not None


def _predict_and_tag(pred, texts, store_scores=False):
    sents = [Sentence.from_raw(t) for t in texts]
    pred.predict_batch(sents)
    pred.store_tag_scores(store_scores)
    pred.predict_tags_batch(sents)
    return sents


class TestTokenSpans:
    def test_plain(self):
        # boundaries [1, 0, 1] over 4 chars -> tokens (0,1),(1,3),(3,4)
        assert _token_spans(np.array([1, 0, 1], np.uint8), 4) == [
            (0, 1), (1, 3), (3, 4),
        ]

    def test_unknown_suppresses_both_sides(self):
        # reference predictor.rs:546-571: Unknown resets the range start
        assert _token_spans(np.array([1, 2, 1, 1], np.uint8), 5) == [
            (0, 1), (3, 4), (4, 5),
        ]

    def test_no_breaks(self):
        assert _token_spans(np.array([0, 0], np.uint8), 3) == [(0, 3)]
        assert _token_spans(np.array([], np.uint8), 1) == [(0, 1)]
        assert _token_spans(np.array([], np.uint8), 0) == [(0, 0)]


class TestNativeMatchesPython:
    def _assert_equal_paths(self, model, texts):
        pred_n = Predictor(model, True)
        if not _native_available(pred_n):
            pytest.skip("native library unavailable")
        pred_p = Predictor(model, True)
        pred_p._tag_scorer_obj = None  # force Python fallback
        sn = _predict_and_tag(pred_n, texts, store_scores=True)
        sp = _predict_and_tag(pred_p, texts, store_scores=True)
        for a, b in zip(sn, sp):
            assert a.tags == b.tags
            assert len(a.tag_scores) == len(b.tag_scores)
            for ta, tb in zip(a.tag_scores, b.tag_scores):
                if ta is None or tb is None:
                    assert ta is None and tb is None
                else:
                    assert ta[0] == tb[0]
                    assert ta[1] == tb[1]

    def test_golden_model(self):
        self._assert_equal_paths(
            create_test_model(),
            ["この人は地球人だ", "人だ人だ", "地球", "人"],
        )

    def test_bundled_reference_model(self):
        model = Model.read("/root/reference/resources/model.bin")
        from conftest import docs_tok_raws

        texts = docs_tok_raws()
        assert all(len(t) >= 7 for t in texts)  # full multi-token lines
        self._assert_equal_paths(model, texts)

    def test_randomized_tagged_model(self):
        rng = np.random.default_rng(11)
        chars = [chr(c) for c in range(0x3041, 0x3061)]

        def rand_word(lo, hi):
            return "".join(
                rng.choice(chars) for _ in range(int(rng.integers(lo, hi)))
            )

        tokens = sorted({rand_word(1, 4) for _ in range(12)})
        tag_models = []
        for tok in tokens:
            slots = []
            for s in range(int(rng.integers(1, 3))):
                n_c = int(rng.integers(1, 4))
                slots.append([f"T{s}C{i}" for i in range(n_c)])
            n_classes = sum(len(c) for c in slots if len(c) >= 2)
            char_ngrams = []
            for _ in range(3):
                ng = rand_word(1, 3) + tok
                # rel_position is the right extension, bounded by the char
                # window size (2 for this model; trainer tag_trainer.rs:72-109)
                ws = [
                    TagWeight(
                        int(rng.integers(0, 3)),
                        [int(x) for x in rng.integers(-20, 21, max(n_classes, 1))],
                    )
                ]
                char_ngrams.append(TagNgramData(ng, ws))
            bias = [int(x) for x in rng.integers(-10, 11, max(n_classes, 1))]
            tag_models.append(
                TagModel(tok, slots, char_ngrams, [], bias)
            )
        model = Model(
            [
                NgramData(rand_word(1, 3),
                          [int(x) for x in rng.integers(-9, 10, 5)])
                for _ in range(10)
            ],
            [NgramData(bytes([1]), [2, -3, 4, 1, 2])],
            [],
            1,
            2,
            2,
            tag_models=tag_models,
        )
        texts = [
            "".join(rng.choice(tokens + [rand_word(1, 3)]) for _ in range(6))
            for _ in range(10)
        ]
        self._assert_equal_paths(model, texts)


class TestBatchMatchesSingle:
    def test_batch_tagging_equals_per_sentence(self):
        pred = Predictor(create_test_model(), True)
        texts = ["この人は地球人だ", "人だ", "地球人だ"]
        batch = _predict_and_tag(pred, texts)
        for t, sb in zip(texts, batch):
            s = Sentence.from_raw(t)
            pred.predict(s)
            s.fill_tags()
            assert s.tags == sb.tags


class TestUnpredictedSentences:
    """A sentence that never ran through predict() has 0-length pma-state
    arrays; in a mixed batch its states must still occupy len(s) slots of
    the flat state stream (regression: misaligned states scored every
    later sentence with the wrong stream / read past the buffer). Both
    paths degrade it to bias-only scoring."""

    def _mixed_batch(self, pred):
        predicted = Sentence.from_raw("この人は地球人だ")
        pred.predict(predicted)
        gold_only = Sentence.from_tokenized("地球 人")
        gold_only.set_predictor(pred)
        return [gold_only, predicted]

    def test_native_matches_python_on_mixed_batch(self):
        pred_n = Predictor(create_test_model(), True)
        if not _native_available(pred_n):
            pytest.skip("native library unavailable")
        pred_p = Predictor(create_test_model(), True)
        pred_p._tag_scorer_obj = None  # force Python fallback
        sn = self._mixed_batch(pred_n)
        pred_n.predict_tags_batch(sn)
        sp = self._mixed_batch(pred_p)
        pred_p.predict_tags_batch(sp)
        for a, b in zip(sn, sp):
            assert a.tags == b.tags
        # the predicted sentence's tags must be unaffected by the
        # unpredicted sentence that precedes it in the flat stream
        alone = Sentence.from_raw("この人は地球人だ")
        pred_n.predict(alone)
        alone.fill_tags()
        assert sn[1].tags == alone.tags
