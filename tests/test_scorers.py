"""Scorer numerics golden tests.

Ported from the reference's hand-computed integer scoring tables:
char_scorer.rs:156-526, type_scorer.rs:179-474, predictor.rs:667-1001.
These pin the full scoring semantics: suffix merging, positional offsets,
fixed-8 padding, dictionary words, and the no-suffix longest-match rule.
"""

import numpy as np
import pytest

from vaporetto_tpu.compile.merger import PositionalWeight, WeightMerger
from vaporetto_tpu.models.model import (
    Model,
    NgramData,
    TagModel,
    TagNgramData,
    TagWeight,
    WordWeightRecord,
)
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.sentence import CharacterType, Sentence

H = int(CharacterType.HIRAGANA)
K = int(CharacterType.KATAKANA)
J = int(CharacterType.KANJI)


def skey(s):
    return tuple(ord(c) for c in s)


class TestPositionalWeightMerge:
    """Reference predictor.rs:677-747 cases 1-8."""

    CASES = [
        ((-2, [1, 2, 3, 4]), (4, [2, 4, 8]), (-2, [1, 2, 3, 4, 0, 0, 2, 4, 8])),
        ((-2, [1, 2, 3, 4]), (2, [2, 4, 8]), (-2, [1, 2, 3, 4, 2, 4, 8])),
        ((-2, [1, 2, 3, 4]), (0, [2, 4, 8]), (-2, [1, 2, 5, 8, 8])),
        ((-2, [1, 2, 3, 4]), (-1, [2, 4, 8]), (-2, [1, 4, 7, 12])),
        ((-2, [1, 2, 3, 4]), (-2, [2, 4, 8]), (-2, [3, 6, 11, 4])),
        ((-2, [1, 2, 3, 4]), (-4, [2, 4, 8]), (-4, [2, 4, 9, 2, 3, 4])),
        ((-2, [1, 2, 3, 4]), (-5, [2, 4, 8]), (-5, [2, 4, 8, 1, 2, 3, 4])),
        ((-2, [1, 2, 3, 4]), (-7, [2, 4, 8]), (-7, [2, 4, 8, 0, 0, 1, 2, 3, 4])),
    ]

    @pytest.mark.parametrize("y,x,expected", CASES)
    def test_add_assign(self, y, x, expected):
        pw = PositionalWeight(*y)
        pw.add_assign(PositionalWeight(*x))
        assert pw == PositionalWeight(*expected)


class TestWeightMerger:
    def test_char_merger(self):
        """Reference char_scorer.rs:171-185."""
        m = WeightMerger()
        m.add(skey("東京都"), PositionalWeight(-3, [1, 2, 3, 4]))
        m.add(skey("京都"), PositionalWeight(-3, [2, 4, 6, 8, 10]))
        m.add(skey("京都"), PositionalWeight(-2, [3, 6, 9]))
        m.add(skey("大阪"), PositionalWeight(-2, [4, 8, 12]))
        result = m.merge()
        assert result == [
            (skey("京都"), PositionalWeight(-3, [2, 7, 12, 17, 10])),
            (skey("大阪"), PositionalWeight(-2, [4, 8, 12])),
            (skey("東京都"), PositionalWeight(-3, [3, 9, 15, 21, 10])),
        ]

    def test_type_merger(self):
        """Reference type_scorer.rs:192-208."""
        m = WeightMerger()
        m.add(tuple(b"eab"), PositionalWeight(-3, [1, 2, 3, 4]))
        m.add(tuple(b"ab"), PositionalWeight(-3, [2, 4, 6, 8, 10]))
        m.add(tuple(b"ab"), PositionalWeight(-3, [3, 6, 9]))
        m.add(tuple(b"cd"), PositionalWeight(-2, [4, 8, 12]))
        result = m.merge()
        assert result == [
            (tuple(b"ab"), PositionalWeight(-3, [5, 10, 15, 8, 10])),
            (tuple(b"cd"), PositionalWeight(-2, [4, 8, 12])),
            (tuple(b"eab"), PositionalWeight(-3, [6, 12, 18, 12, 10])),
        ]


def run_char_scorer(ngrams, dict_words, window_size, text, init):
    """Run only the char scorer with a given initial score value."""
    model = Model(
        [NgramData(n, w) for n, w in ngrams],
        [],  # no type ngrams
        [WordWeightRecord(w, ws) for w, ws in dict_words],
        init,  # bias doubles as the init value of the reference tests
        window_size,
        0,
    )
    pred = Predictor(model)
    s = Sentence.from_raw(text)
    pred.predict(s)
    return s.boundary_scores_list()


class TestCharScorer:
    def test_add_scores_1(self):
        """Reference char_scorer.rs:188-254 (window=3, init=1)."""
        scores = run_char_scorer(
            [
                ("我ら", [1, 2, 3, 4, 5]),
                ("全世界", [6, 7, 8, 9]),
                ("国民", [10, 11, 12, 13, 14]),
                ("世界", [15, 16, 17, 18, 19]),
                ("界", [20, 21, 22, 23, 24, 25]),
            ],
            [
                ("全世界", [26, 27, 28, 29]),
                ("世界", [30, 31, 32]),
                ("世", [33, 34]),
            ],
            3,
            "我らは全世界の国民",
            1,
        )
        assert scores == [4, 5, 73, 135, 141, 122, 55, 38]

    def test_add_scores_2(self):
        """Reference char_scorer.rs:257-320 (window=2, init=2)."""
        scores = run_char_scorer(
            [
                ("我ら", [1, 2, 3]),
                ("全世界", [4, 5]),
                ("国民", [6, 7, 8]),
                ("世界", [9, 10, 11]),
                ("界", [12, 13, 14, 15]),
            ],
            [
                ("全世界", [16, 17, 18, 19]),
                ("世界", [20, 21, 22]),
                ("世", [23, 24]),
            ],
            2,
            "我らは全世界の国民",
            2,
        )
        assert scores == [4, 5, 18, 87, 93, 68, 23, 9]

    def test_add_scores_3(self):
        """Reference char_scorer.rs:323-401 (long dict words, init=3)."""
        scores = run_char_scorer(
            [
                ("我ら", [1, 2, 3, 4, 5]),
                ("全世界", [6, 7, 8, 9]),
                ("国民", [10, 11, 12, 13, 14]),
                ("世界", [15, 16, 17, 18, 19]),
                ("界", [20, 21, 22, 23, 24, 25]),
            ],
            [
                ("全世界", [26, 27, 28, 29]),
                ("世界", [30, 31, 32]),
                ("世", [33, 34]),
                ("世界の国民", [35, 36, 37, 38, 39, 40]),
                ("は全世界", [41, 42, 43, 44, 45]),
            ],
            3,
            "我らは全世界の国民",
            3,
        )
        assert scores == [6, 48, 117, 215, 223, 206, 95, 79]


def run_type_scorer(ngrams, window_size, text, init):
    model = Model(
        [],
        [NgramData(bytes(n), w) for n, w in ngrams],
        [],
        init,
        0,
        window_size,
    )
    pred = Predictor(model)
    s = Sentence.from_raw(text)
    pred.predict(s)
    return s.boundary_scores_list()


class TestTypeScorer:
    def test_add_scores_window4(self):
        """Reference type_scorer.rs:211-259 (window=4 -> trie matcher, init=1)."""
        scores = run_type_scorer(
            [
                ([J, H], [1, 2, 3, 4, 5, 6, 7]),
                ([J, J, J], [8, 9, 10, 11, 12, 13]),
                ([J, J], [14, 15, 16, 17, 18, 19, 20]),
                ([J], [21, 22, 23, 24, 25, 26, 27, 28]),
            ],
            4,
            "我らは全世界の国民",
            1,
        )
        assert scores == [87, 135, 144, 174, 182, 192, 202, 148]

    def test_add_scores_cache_1(self):
        """Reference type_scorer.rs:262-311 (window=3 -> cache, init=2)."""
        scores = run_type_scorer(
            [
                ([J, H], [1, 2, 3, 4, 5]),
                ([J, J, J], [6, 7, 8, 9]),
                ([J, J], [10, 11, 12, 13, 14]),
                ([J], [15, 16, 17, 18, 19, 20]),
            ],
            3,
            "我らは全世界の国民",
            2,
        )
        assert scores == [38, 66, 102, 84, 106, 139, 103, 74]

    def test_add_scores_cache_2(self):
        """Reference type_scorer.rs:314-363 (window=2 -> cache, init=3)."""
        scores = run_type_scorer(
            [
                ([J, H], [1, 2, 3]),
                ([J, J, J], [4, 5]),
                ([J, J], [6, 7, 8]),
                ([J], [9, 10, 11, 12]),
            ],
            2,
            "我らは全世界の国民",
            3,
        )
        assert scores == [16, 27, 28, 50, 57, 45, 43, 31]


def create_test_model():
    """Reference predictor.rs:749-838."""
    return Model(
        [
            NgramData("この人", [1, -2, 3, 4]),
            NgramData("人だ", [-5, 6, 7, 8, 9]),
        ],
        [
            NgramData(bytes([H, H, J]), [10, -11, 12, 13]),
            NgramData(bytes([J, H]), [-14, 15, 16, 17, -18]),
        ],
        [
            WordWeightRecord("人", [19, 20]),
            WordWeightRecord("地球", [21, -22, 23]),
        ],
        5,
        3,
        3,
        [
            TagModel(
                "人",
                [["名詞", "接尾辞"], ["ジン", "ヒト"]],
                [
                    TagNgramData(
                        "は地球人", [TagWeight(0, [-32, 33, 34, -35])]
                    )
                ],
                [
                    TagNgramData(
                        bytes([H, J, H]), [TagWeight(1, [36, -37, -38, 39])]
                    )
                ],
                [40, 41, 42, 43],
            ),
            TagModel(
                "地球",
                [["名詞"], ["マンホーム", "チキュー"]],
                [TagNgramData("は地球人", [TagWeight(1, [-44, 45])])],
                [],
                [46, 47],
            ),
        ],
    )


class TestPredictor:
    def test_predict_boundaries(self):
        """Reference predictor.rs:840-859."""
        pred = Predictor(create_test_model(), False)
        s = Sentence.from_raw("この人は地球人だ")
        pred.predict(s)
        assert s.boundary_scores_list() == [-22, 54, 58, 43, -54, 68, 48]
        assert [int(b) for b in s.boundaries] == [0, 1, 1, 1, 0, 1, 1]

    def test_predict_tags(self):
        """Reference predictor.rs:861-903."""
        pred = Predictor(create_test_model(), True)
        s = Sentence.from_raw("この人は地球人だ")
        pred.predict(s)
        s.fill_tags()
        assert s.boundary_scores_list() == [-22, 54, 58, 43, -54, 68, 48]
        assert [int(b) for b in s.boundaries] == [0, 1, 1, 1, 0, 1, 1]
        assert s.tags == [
            None, None,
            None, None,
            "名詞", "ヒト",
            None, None,
            None, None,
            "名詞", "チキュー",
            "接尾辞", "ジン",
            None, None,
        ]

    def test_serialization_roundtrip(self):
        """Reference predictor.rs:905-972 (AOT predictor artifact)."""
        pred = Predictor(create_test_model(), True)
        data = pred.serialize_to_vec()
        pred2 = Predictor.deserialize_from_slice(data)
        s = Sentence.from_raw("この人は地球人だ")
        pred2.predict(s)
        s.fill_tags()
        assert s.boundary_scores_list() == [-22, 54, 58, 43, -54, 68, 48]
        assert s.tags[4] == "名詞"
        assert s.tags[5] == "ヒト"

    def test_serialization_keeps_small_table_variants(self, monkeypatch):
        """A deserialized artifact must support every runtime config of the
        original: the small-table variants (VAPORETTO_TPU_SMALL_TABLES=1)
        require char_hash_* / type_pos_tables to survive serialization."""
        pred = Predictor(create_test_model(), False)
        c = pred.compiled
        data = pred.serialize_to_vec()
        pred2 = Predictor.deserialize_from_slice(data)
        c2 = pred2.compiled
        if c.char_hash_keys is not None:
            assert c2.char_hash_keys is not None
            assert (c2.char_hash_keys == c.char_hash_keys).all()
            assert (c2.char_hash_syms == c.char_hash_syms).all()
            assert c2.char_hash_mul == c.char_hash_mul
            assert c2.char_hash_shift == c.char_hash_shift
        if c.type_pos_tables is not None:
            assert c2.type_pos_tables is not None
            assert (c2.type_pos_tables == c.type_pos_tables).all()
            assert c2.type_pos_m == c.type_pos_m
        monkeypatch.setenv("VAPORETTO_TPU_SMALL_TABLES", "1")
        s = Sentence.from_raw("この人は地球人だ")
        pred2.predict(s)
        assert s.boundary_scores_list() == [-22, 54, 58, 43, -54, 68, 48]

    def test_fill_tags_unsupported(self):
        """Reference predictor.rs:974-984."""
        pred = Predictor(create_test_model(), False)
        s = Sentence.from_raw("この人は地球人だ")
        pred.predict(s)
        with pytest.raises(RuntimeError):
            s.fill_tags()

    def test_batch_matches_single(self):
        pred = Predictor(create_test_model(), False)
        texts = ["この人は地球人だ", "人だ", "地球", "この人はこの人だ"]
        singles = []
        for t in texts:
            s = Sentence.from_raw(t)
            pred.predict(s)
            singles.append(s.boundary_scores_list())
        batch = [Sentence.from_raw(t) for t in texts]
        pred.predict_batch(batch)
        for s, expected in zip(batch, singles):
            assert s.boundary_scores_list() == expected


class TestCharScorerWithTags:
    def test_add_scores_with_tags(self):
        """Reference char_scorer.rs:404-525 + type_scorer.rs:366-473.

        Tag-capable scorers must produce the same boundary scores and cache
        per-position match states for the tag pass.
        """
        model = Model(
            [
                NgramData("この人", [1, 2, 3, 4]),
                NgramData("人だ", [5, 6, 7, 8, 9]),
            ],
            [],
            [
                WordWeightRecord("人", [10, 11]),
                WordWeightRecord("火星", [12, 13, 14]),
            ],
            1,  # init=1 in the reference test via resize(.., 1)
            3,
            0,
            [
                TagModel(
                    "人",
                    [["a", "b", "c"]],
                    [
                        TagNgramData(
                            "の人",
                            [TagWeight(0, [15, 16, 17]),
                             TagWeight(1, [18, 19, 20])],
                        ),
                        TagNgramData(
                            "人は",
                            [TagWeight(1, [21, 22, 23]),
                             TagWeight(3, [24, 25, 26])],
                        ),
                        TagNgramData("火星人", [TagWeight(0, [27, 28, 29])]),
                    ],
                    [],
                    [0, 0, 0],
                ),
                TagModel("猫", [["x"]], [], [], []),
                TagModel(
                    "だ",
                    [["p", "q"]],
                    [
                        TagNgramData(
                            "人は",
                            [TagWeight(0, [27, 28]),
                             TagWeight(3, [29, 30])],
                        ),
                        TagNgramData("は火星人", [TagWeight(3, [31, 32])]),
                    ],
                    [],
                    [0, 0],
                ),
            ],
        )
        pred = Predictor(model, True)
        s = Sentence.from_raw("この人は火星人だ")
        pred.predict(s)
        assert s.boundary_scores_list() == [3, 14, 16, 13, 19, 31, 19]

        # add_tag_scores(0, 2): token_id=0 ("人"), pos=2
        from vaporetto_tpu.predictor import _add_tag_scores

        tw = pred.compiled.char_matcher.tag_weight
        scores = np.full(8, 1, dtype=np.int32)
        _add_tag_scores(tw[0], s.char_pma_states, 2, scores)
        assert scores.tolist() == [37, 39, 41, 1, 1, 1, 1, 1]

        scores = np.full(8, 1, dtype=np.int32)
        _add_tag_scores(tw[0], s.char_pma_states, 6, scores)
        assert scores.tolist() == [28, 29, 30, 1, 1, 1, 1, 1]

        scores = np.full(8, 1, dtype=np.int32)
        _add_tag_scores(tw[2], s.char_pma_states, 3, scores)
        assert scores.tolist() == [59, 61, 1, 1, 1, 1, 1, 1]
