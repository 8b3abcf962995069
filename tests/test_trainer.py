"""Trainer tests.

Feature-extraction cases ported verbatim from the reference
(trainer.rs:495-868) plus an end-to-end train -> predict round trip (the
reference trusts LIBLINEAR and does not test the solver in-repo; we do).
"""

import numpy as np
import pytest

from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import CharacterType, Sentence
from vaporetto_tpu.train.trainer import Trainer

H = bytes([CharacterType.HIRAGANA])
K = bytes([CharacterType.KATAKANA])


def c(ngram, rel):
    return ("c", ngram, rel)


def t(ngram, rel):
    return ("t", ngram, rel)


class TestGenFeatures:
    def test_check_features_3322(self):
        """Reference trainer.rs:501-695."""
        s = Sentence.from_tokenized("これ は テスト です")
        trainer = Trainer(3, 3, 2, 2, [], 4)
        examples = trainer.gen_features(s)

        assert examples[0][0] == [
            c("こ", -1), c("れ", 0), c("は", 1), c("テ", 2),
            c("これ", -1), c("れは", 0), c("はテ", 1),
            c("これは", -1), c("れはテ", 0),
            t(H, -1), t(H, 0), t(H, 1),
            t(H + H, -1), t(H + H, 0),
        ]
        assert examples[0][1] == 0

        assert examples[1][0] == [
            c("こ", -2), c("れ", -1), c("は", 0), c("テ", 1), c("ス", 2),
            c("これ", -2), c("れは", -1), c("はテ", 0), c("テス", 1),
            c("これは", -2), c("れはテ", -1), c("はテス", 0),
            t(H, -2), t(H, -1), t(H, 0), t(K, 1),
            t(H + H, -2), t(H + H, -1), t(H + K, 0),
        ]
        assert examples[1][1] == 1

        assert examples[6][0] == [
            c("ス", -3), c("ト", -2), c("で", -1), c("す", 0),
            c("スト", -3), c("トで", -2), c("です", -1),
            c("ストで", -3), c("トです", -2),
            t(K, -2), t(H, -1), t(H, 0),
            t(K + H, -2), t(H + H, -1),
        ]
        assert examples[6][1] == 0

    def test_check_features_2222_dict(self):
        """Reference trainer.rs:697-867."""
        s = Sentence.from_tokenized("これ は テスト です")
        trainer = Trainer(2, 2, 2, 2, ["これ", "これは", "テスト"], 4)
        examples = trainer.gen_features(s)

        assert examples[0][0] == [
            c("こ", -1), c("れ", 0), c("は", 1),
            c("これ", -1), c("れは", 0),
            t(H, -1), t(H, 0), t(H, 1),
            t(H + H, -1), t(H + H, 0),
            ("di", 2), ("di", 3),
        ]
        assert examples[0][1] == 0

        assert sorted(examples[1][0][-2:]) == sorted(
            [("dr", 2), ("di", 3)]
        )
        assert examples[1][1] == 1

        assert sorted(examples[2][0][-2:]) == sorted(
            [("dr", 3), ("dl", 3)]
        )
        assert examples[2][1] == 1

        assert examples[3][0][-1] == ("di", 3)
        assert examples[4][0][-1] == ("di", 3)
        assert examples[5][0][-1] == ("dr", 3)
        # last example has no dict features
        assert all(f[0] in ("c", "t") for f in examples[6][0])


CORPUS = [
    "これ は テスト です",
    "これ も テスト です",
    "この 文 は 短い",
    "この 文 も 短い",
    "テスト が 好き",
    "テスト は 難しい",
    "良い テスト と 悪い テスト",
    "それ は それ で 良い",
]


class TestTrainRoundTrip:
    @pytest.mark.parametrize("solver", [0, 2, 5, 6])
    def test_train_predict(self, solver):
        trainer = Trainer(3, 3, 3, 3, [], 4)
        for line in CORPUS:
            trainer.add_example(Sentence.from_tokenized(line))
        model = trainer.train(0.01, 1.0, solver)
        assert model.bias != 0 or model.char_ngram_model
        pred = Predictor(model)
        # the model must reproduce its own training data (tiny, separable)
        correct = 0
        total = 0
        for line in CORPUS:
            gold = Sentence.from_tokenized(line)
            s = Sentence.from_raw(gold.as_raw_text())
            pred.predict(s)
            total += len(gold.boundaries)
            correct += int(
                np.sum(np.asarray(gold.boundaries) == np.asarray(s.boundaries))
            )
        assert correct / total >= 0.95, f"solver {solver}: {correct}/{total}"

    def test_train_with_tags(self):
        corpus = [
            "これ/代名詞 は/助詞 テスト/名詞 です/助動詞",
            "これ/代名詞 も/助詞 テスト/名詞 です/助動詞",
            "テスト/名詞 は/助詞 これ/代名詞 です/助動詞",
            "それ/代名詞 は/助詞 テスト/名詞 かも/助詞",
        ]
        trainer = Trainer(3, 3, 3, 3, [], 4)
        for line in corpus:
            trainer.add_example(Sentence.from_tokenized(line))
        model = trainer.train(0.01, 1.0, 5)
        assert model.tag_models
        pred = Predictor(model, True)
        s = Sentence.from_raw("これはテストです")
        pred.predict(s)
        s.fill_tags()
        out = s.write_tokenized_text()
        assert out == "これ/代名詞 は/助詞 テスト/名詞 です/助動詞", out

    def test_train_with_dict(self):
        trainer = Trainer(2, 2, 2, 2, ["テスト"], 4)
        for line in CORPUS:
            trainer.add_example(Sentence.from_tokenized(line))
        model = trainer.train(0.01, 1.0, 5)
        words = [r.word for r in model.dict_model]
        assert words == ["テスト"]
        # dictionary word weights: len(word)+1 entries
        assert len(model.dict_model[0].weights) == 4

    def test_partial_annotation_examples(self):
        trainer = Trainer(3, 3, 3, 3, [], 4)
        trainer.add_example(Sentence.from_partial_annotation("こ-れ|は テ-ス-ト"))
        # Unknown gap included as third label
        if trainer._native is not None:
            _, _, ys = trainer._native.export()
            assert 2 in ys.tolist()
        else:
            assert 2 in trainer.ys
        model = trainer.train(0.01, 1.0, 0)
        assert model.char_window_size == 3

    def test_native_matches_python_extractor(self, monkeypatch):
        from vaporetto_tpu.native import available

        if not available():
            pytest.skip("native library unavailable")
        """The C++ extractor must produce an identical trained model."""
        corpus = CORPUS + ["これ は 追加 の 文"]

        def train_with(env):
            if env:
                monkeypatch.setenv("VAPORETTO_TPU_PY_EXTRACTOR", "1")
            else:
                monkeypatch.delenv("VAPORETTO_TPU_PY_EXTRACTOR", raising=False)
            t = Trainer(3, 3, 3, 3, ["テスト", "これ"], 4)
            for line in corpus:
                t.add_example(Sentence.from_tokenized(line))
            return t, t.train(0.01, 1.0, 5)

        t_py, m_py = train_with(True)
        t_nat, m_nat = train_with(False)
        assert t_nat._native is not None and t_py._native is None
        assert t_py.n_features() == t_nat.n_features()
        # identical feature sets; weights may differ by float summation
        # order in the solver, so compare structurally + by predictions
        assert [d.ngram for d in m_py.char_ngram_model] == [
            d.ngram for d in m_nat.char_ngram_model
        ]
        assert [d.ngram for d in m_py.type_ngram_model] == [
            d.ngram for d in m_nat.type_ngram_model
        ]
        assert [r.word for r in m_py.dict_model] == [
            r.word for r in m_nat.dict_model
        ]
        pred_py = Predictor(m_py)
        pred_nat = Predictor(m_nat)
        for line in corpus:
            gold = Sentence.from_tokenized(line)
            a = Sentence.from_raw(gold.as_raw_text())
            b = Sentence.from_raw(gold.as_raw_text())
            pred_py.predict(a)
            pred_nat.predict(b)
            assert np.array_equal(a.boundaries, b.boundaries), line


class TestDictACScan:
    def test_suffix_overlapping_dictionary(self, monkeypatch):
        from vaporetto_tpu.native import available

        if not available():
            pytest.skip("native library unavailable")
        """The native extractor's AC dictionary scan (trainer.rs:227,
        296-317 analogue) must emit exactly the Python probe's features
        for suffix-nested and overlapping dictionary words — the cases
        that exercise Aho-Corasick output links."""
        from vaporetto_tpu.train.trainer import Trainer

        dict_words = ["人", "地球人", "球人", "地球", "人だ", "この人"]
        corpus = [
            "この 人 は 地球人 だ",
            "地球 人 だ この人",
            "人 人 人",
        ]

        def feats(py: bool):
            if py:
                monkeypatch.setenv("VAPORETTO_TPU_PY_EXTRACTOR", "1")
            else:
                monkeypatch.delenv(
                    "VAPORETTO_TPU_PY_EXTRACTOR", raising=False
                )
            t = Trainer(3, 3, 3, 3, dict_words, 4)
            for line in corpus:
                t.add_example(Sentence.from_tokenized(line))
            return t, t.train(0.01, 1.0, 5)

        t_py, m_py = feats(True)
        t_nat, m_nat = feats(False)
        assert t_nat._native is not None and t_py._native is None
        assert t_py.n_features() == t_nat.n_features()
        assert [r.word for r in m_py.dict_model] == [
            r.word for r in m_nat.dict_model
        ]
        for r_py, r_nat in zip(m_py.dict_model, m_nat.dict_model):
            assert r_py.weights == r_nat.weights, r_py.word
