"""Rule filter tests, ported from vaporetto_rules inline tests."""

from vaporetto_tpu.rules import (
    ConcatGraphemeClustersFilter,
    KyteaFullwidthFilter,
    KyteaWsConstFilter,
    PatternMatchTagger,
    SplitLinebreaksFilter,
)
from vaporetto_tpu.sentence import CharacterType, Sentence


class TestKyteaFullwidth:
    def test_ascii(self):
        f = KyteaFullwidthFilter()
        assert f.filter("abc XYZ 019") == "ａｂｃ　ＸＹＺ　０１９".replace("　", " ")

    def test_punct(self):
        f = KyteaFullwidthFilter()
        assert f.filter("(test)") == "（ｔｅｓｔ）"
        assert f.filter("a-b") == "ａ−ｂ"
        # many-to-one prolonged sound mark folds
        for c in ["－", "―", "─", "–"]:
            assert f.filter(c) == "ー"
        assert f.filter(".") == "。"
        assert f.filter("/") == "／"

    def test_passthrough(self):
        f = KyteaFullwidthFilter()
        assert f.filter("日本語そのまま") == "日本語そのまま"
        assert f.filter(" ") == " "


class TestKyteaWsConst:
    def test_no_boundary(self):
        s = Sentence.from_tokenized("5")
        KyteaWsConstFilter(CharacterType.DIGIT).filter(s)
        assert s.write_tokenized_text() == "5"

    def test_concat(self):
        s = Sentence.from_tokenized("5 00 0")
        KyteaWsConstFilter(CharacterType.DIGIT).filter(s)
        assert s.write_tokenized_text() == "5000"

    def test_combined(self):
        s = Sentence.from_tokenized("20 21 年 8 月 2 4 日")
        KyteaWsConstFilter(CharacterType.DIGIT).filter(s)
        assert s.write_tokenized_text() == "2021 年 8 月 24 日"


class TestSplitLinebreaks:
    def test_lf(self):
        s = Sentence.from_tokenized("前の行\n次の行")
        SplitLinebreaksFilter().filter(s)
        assert s.write_tokenized_text() == "前の行 \n 次の行"

    def test_cr(self):
        s = Sentence.from_tokenized("前の行\r次の行")
        SplitLinebreaksFilter().filter(s)
        assert s.write_tokenized_text() == "前の行 \r 次の行"

    def test_crlf(self):
        s = Sentence.from_tokenized("前の行\r\n次の行")
        SplitLinebreaksFilter().filter(s)
        assert s.write_tokenized_text() == "前の行 \r \n 次の行"


class TestConcatGraphemeClusters:
    def test_no_boundary(self):
        s = Sentence.from_tokenized("‍")
        ConcatGraphemeClustersFilter().filter(s)
        assert s.write_tokenized_text() == "‍"

    def test_zwj(self):
        s = Sentence.from_tokenized(
            "\U0001f468 ‍ \U0001f469 ‍ \U0001f466"
        )
        ConcatGraphemeClustersFilter().filter(s)
        assert s.write_tokenized_text() == (
            "\U0001f468‍\U0001f469‍\U0001f466"
        )

    def test_color(self):
        s = Sentence.from_tokenized("\U0001f44f \U0001f3fd")
        ConcatGraphemeClustersFilter().filter(s)
        assert s.write_tokenized_text() == "\U0001f44f\U0001f3fd"

    def test_combined(self):
        s = Sentence.from_tokenized("これ は 手 \U0001f44f \U0001f3fd で す")
        ConcatGraphemeClustersFilter().filter(s)
        assert s.write_tokenized_text() == "これ は 手 \U0001f44f\U0001f3fd で す"


class TestPatternMatchTagger:
    def test_fill_missing(self):
        s = Sentence.from_tokenized("これ/名詞/ソレ は テスト/名詞 です//デス")
        rules = {
            "これ": ["代名詞", "コレ"],
            "は": ["助詞", "ワ"],
            "テスト": ["名詞", "テスト"],
            "です": ["助動詞", "デス"],
        }
        PatternMatchTagger(rules).filter(s)
        assert s.write_tokenized_text() == (
            "これ/名詞/ソレ は/助詞/ワ テスト/名詞/テスト です/助動詞/デス"
        )
