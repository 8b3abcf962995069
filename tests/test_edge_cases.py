"""Edge-case and robustness tests."""

import numpy as np
import pytest

from vaporetto_tpu.errors import InvalidModelError
from vaporetto_tpu.models.model import Model, NgramData, WordWeightRecord
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import CharacterBoundary, Sentence

from test_scorers import create_test_model


class TestModelIOErrors:
    def test_bad_magic(self):
        with pytest.raises(InvalidModelError) as e:
            Model.read_slice(b"NotAVaporettoModel 9.9.9\n\x00\x00")
        assert "model version mismatch" in str(e.value)

    def test_truncated(self):
        good = create_test_model().to_bytes()
        with pytest.raises(Exception):
            Model.read_slice(good[: len(good) // 2])

    def test_dict_weight_invariant(self):
        with pytest.raises(Exception) as e:
            WordWeightRecord("abc", [1, 2])  # needs len+1 = 4
        assert "does not match the length of the `word`" in str(e.value)


class TestUnknownBoundaryTags:
    def test_fill_tags_skips_unknown_spans(self):
        """predict_tags must skip token spans touching Unknown gaps
        (reference predictor.rs:567-571)."""
        pred = Predictor(create_test_model(), True)
        s = Sentence.from_raw("この人は地球人だ")
        pred.predict(s)
        # manually mark one gap Unknown: spans crossing it get no tags
        s.boundaries[3] = int(CharacterBoundary.UNKNOWN)
        s.fill_tags()
        # the token ending at char 5 ("地球" span start is after the
        # Unknown gap reset) — tags before the Unknown gap survive
        assert s.tags[4] == "名詞"  # 人 (ends at char index 2; gap 2 is WB)
        # no tag assigned inside the Unknown-touching span
        assert s.tags[6] is None and s.tags[7] is None


class TestLongWordMultiChunk:
    def test_dict_word_longer_than_8(self):
        """Dictionary words > 7 chars exercise multi-chunk weight rows
        (the reference's WeightVector::Variable path)."""
        word = "あいうえおかきくけこさし"  # 12 chars -> 13 weights
        weights = list(range(1, 14))
        model = Model(
            [NgramData("あ", [5, 5, 5])],
            [],
            [WordWeightRecord(word, weights)],
            0,
            1,
            0,
        )
        pred = Predictor(model)
        assert pred.compiled.char_matcher.max_chunks >= 2
        s = Sentence.from_raw("x" + word + "y")
        pred.predict(s)
        from vaporetto_tpu.ops.host_reference import reference_scores

        expected = reference_scores(pred.compiled, s.codepoints, s.char_types)
        assert s.boundary_scores_list() == expected.tolist()


class TestVeryLongDictWords:
    """The reference allows dictionary words up to 32 767 chars
    (char_scorer/boundary_scorer.rs:67-74) and clips variable-length adds
    at the sentence edge (predictor.rs:176-213). Words of 100 and 1000+
    chars exercise the scatter fallback in ops/score.py (the shifted-add
    unroll would blow up the trace) and the padding-sized clipping scheme.
    """

    def _long_word_model(self, word_lens, seed=7):
        rng = np.random.default_rng(seed)
        chars = [chr(c) for c in range(0x4E00, 0x4E80)]
        words = []
        for ln in word_lens:
            words.append("".join(rng.choice(chars) for _ in range(ln)))
        dict_model = [
            WordWeightRecord(
                w, [int(x) for x in rng.integers(-9, 10, len(w) + 1)]
            )
            for w in words
        ]
        ngrams = [
            NgramData("".join(rng.choice(chars) for _ in range(n)),
                      [int(x) for x in rng.integers(-5, 6, 7 - n)])
            for n in (1, 2, 3)
        ]
        model = Model(ngrams, [NgramData(bytes([5]), [3, 1, 4, 1, 5])],
                      dict_model, 2, 3, 3)
        return model, words

    def _assert_oracle_match(self, pred, texts):
        from vaporetto_tpu.ops.host_reference import reference_scores

        sents = [Sentence.from_raw(t) for t in texts]
        pred.predict_batch(sents)
        for s in sents:
            expected = reference_scores(
                pred.compiled, s.codepoints, s.char_types
            )
            assert s.boundary_scores_list() == expected.tolist()

    def test_100_char_word(self):
        model, words = self._long_word_model([100, 37, 5])
        pred = Predictor(model)
        w = words[0]
        self._assert_oracle_match(
            pred, [w, "口" + w + "口", w[:50], w + w]
        )

    def test_1000_char_word_edge_clipping(self):
        model, words = self._long_word_model([1000, 333, 12])
        pred = Predictor(model)
        assert pred.compiled.char_matcher.max_chunks >= 126
        w = words[0]
        # word at the very start/end of the sentence: left-edge clipping
        self._assert_oracle_match(pred, [w, w + "口口", "口" + words[1]])

    def test_long_word_trace_stays_bounded(self):
        """The scoring trace must not scale with chunks x offsets: the
        scatter fallback keeps it linear in max_chunks."""
        import jax

        model, words = self._long_word_model([1000, 500, 250, 125, 60, 30])
        pred = Predictor(model)
        fn = pred.predict_raw_fn()
        B, L = 2, 1100
        cps = np.zeros((B, L), dtype=np.int32)
        cts = np.zeros((B, L), dtype=np.int32)
        lengths = np.full(B, L, dtype=np.int32)
        jaxpr = jax.make_jaxpr(fn)(cps, cts, lengths)
        n_eqns = len(jaxpr.jaxpr.eqns)
        assert n_eqns < 4000, f"trace blew up: {n_eqns} equations"


class TestScaleSmoke:
    def test_5k_dict_words(self):
        """Production-ish dictionary through the native trie builder."""
        rng = np.random.default_rng(3)
        chars = [chr(c) for c in range(0x4E00, 0x4F80)]
        words = set()
        while len(words) < 5000:
            ln = int(rng.integers(1, 7))
            words.add("".join(rng.choice(chars) for _ in range(ln)))
        dict_model = [
            WordWeightRecord(w, [int(x) for x in rng.integers(-9, 10, len(w) + 1)])
            for w in sorted(words)
        ]
        model = Model(
            [NgramData("".join(rng.choice(chars) for _ in range(2)),
                       [1, 2, 3]) for _ in range(50)],
            [NgramData(bytes([5]), [3, 1, 4, 1, 5])],
            dict_model,
            2,
            3,
            3,
        )
        pred = Predictor(model)
        texts = [
            "".join(rng.choice(chars) for _ in range(int(rng.integers(5, 60))))
            for _ in range(8)
        ]
        sents = [Sentence.from_raw(t) for t in texts]
        pred.predict_batch(sents)
        from vaporetto_tpu.ops.host_reference import reference_scores

        for s in sents[:3]:
            expected = reference_scores(pred.compiled, s.codepoints, s.char_types)
            assert s.boundary_scores_list() == expected.tolist()
