"""Analyzer integration tests.

Ported from the reference tantivy integration tests
(vaporetto_tantivy/src/lib.rs:231-492) using the same bundled model fixture
(test_model/model.zst), asserting identical token texts, byte offsets, and
positions.
"""

import pytest

from vaporetto_tpu.analyzer import VaporettoAnalyzer
from vaporetto_tpu.models.model import Model

MODEL_ZST = "/root/reference/vaporetto_tantivy/test_model/model.zst"


@pytest.fixture(scope="module")
def model():
    return Model.read(MODEL_ZST)


def tok(analyzer_tokens):
    return [
        (t.text, t.offset_from, t.offset_to, t.position, t.position_length)
        for t in analyzer_tokens
    ]


class TestAnalyzer:
    def test_tokenize_empty(self, model):
        a = VaporettoAnalyzer(model, "")
        assert a.analyze("") == []

    def test_tokenizer_tokyo(self, model):
        a = VaporettoAnalyzer(model, "")
        tokens = tok(a.analyze("東京特許許可局"))
        assert tokens == [
            ("東京", 0, 6, 0, 4),
            ("特許", 6, 12, 1, 4),
            ("許可", 12, 18, 2, 4),
            ("局", 18, 21, 3, 4),
        ]

    def test_tokenizer_no_wsconst(self, model):
        a = VaporettoAnalyzer(model, "")
        tokens = tok(a.analyze("123456円🤌🏿"))
        assert tokens == [
            ("1", 0, 1, 0, 9),
            ("2", 1, 2, 1, 9),
            ("3", 2, 3, 2, 9),
            ("4", 3, 4, 3, 9),
            ("5", 4, 5, 4, 9),
            ("6", 5, 6, 5, 9),
            ("円", 6, 9, 6, 9),
            ("🤌", 9, 13, 7, 9),
            ("🏿", 13, 17, 8, 9),
        ]

    def test_tokenize_wsconst_d(self, model):
        a = VaporettoAnalyzer(model, "D")
        tokens = tok(a.analyze("123456円🤌🏿"))
        assert tokens == [
            ("123456", 0, 6, 0, 4),
            ("円", 6, 9, 1, 4),
            ("🤌", 9, 13, 2, 4),
            ("🏿", 13, 17, 3, 4),
        ]

    def test_tokenizer_wsconst_g(self, model):
        a = VaporettoAnalyzer(model, "G")
        tokens = tok(a.analyze("123456円🤌🏿"))
        assert tokens == [
            ("1", 0, 1, 0, 8),
            ("2", 1, 2, 1, 8),
            ("3", 2, 3, 2, 8),
            ("4", 3, 4, 3, 8),
            ("5", 4, 5, 4, 8),
            ("6", 5, 6, 5, 8),
            ("円", 6, 9, 6, 8),
            ("🤌🏿", 9, 17, 7, 8),
        ]

    def test_tokenize_wsconst_dg(self, model):
        a = VaporettoAnalyzer(model, "DG")
        tokens = tok(a.analyze("123456円🤌🏿"))
        assert tokens == [
            ("123456", 0, 6, 0, 3),
            ("円", 6, 9, 1, 3),
            ("🤌🏿", 9, 17, 2, 3),
        ]

    def test_from_serialized(self, model):
        a1 = VaporettoAnalyzer(model, "")
        data = a1.predictor.serialize_to_vec()
        a2 = VaporettoAnalyzer.from_serialized(data, "")
        assert tok(a2.analyze("東京特許許可局")) == tok(
            a1.analyze("東京特許許可局")
        )
