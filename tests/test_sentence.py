"""Sentence data-model tests.

Ported from the reference inline tests (/root/reference/vaporetto/src/
sentence.rs:1302-2943) including the exact error strings, plus doctest
examples from the same file.
"""

import pytest

from vaporetto_tpu.sentence import (
    CharacterBoundary,
    CharacterType,
    Sentence,
)

NWB = CharacterBoundary.NOT_WORD_BOUNDARY
WB = CharacterBoundary.WORD_BOUNDARY
UNK = CharacterBoundary.UNKNOWN

D = CharacterType.DIGIT
R = CharacterType.ROMAN
H = CharacterType.HIRAGANA
K = CharacterType.KATAKANA
J = CharacterType.KANJI
O = CharacterType.OTHER


def err_str(excinfo):
    return str(excinfo.value)


class TestCharacterType:
    def test_get_type(self):
        assert CharacterType.get_type("A") == R
        assert CharacterType.get_type("5") == D
        assert CharacterType.get_type("５") == D
        assert CharacterType.get_type("あ") == H
        assert CharacterType.get_type("ア") == K
        assert CharacterType.get_type("ー") == K  # prolonged sound mark
        assert CharacterType.get_type("漢") == J
        assert CharacterType.get_type("！") == O
        assert CharacterType.get_type(" ") == O
        # astral-plane kanji (CJK ext B)
        assert CharacterType.get_type("\U00020000") == J
        assert CharacterType.get_type("\U0001F600") == O  # emoji


class TestFromRaw:
    def test_empty(self):
        with pytest.raises(Exception) as e:
            Sentence.from_raw("")
        assert err_str(e) == (
            "InvalidArgumentError: text: must contain at least one character"
        )

    def test_update_empty_resets(self):
        s = Sentence.from_raw("12345")
        with pytest.raises(Exception) as e:
            s.update_raw("")
        assert err_str(e) == (
            "InvalidArgumentError: text: must contain at least one character"
        )
        assert s.as_raw_text() == " "
        assert s.char_types_list() == [O]
        assert s.boundaries_list() == []
        assert s.boundary_scores_list() == []

    def test_null(self):
        with pytest.raises(Exception) as e:
            Sentence.from_raw("A1あ\0ア亜")
        assert err_str(e) == "InvalidArgumentError: text: must not contain NULL"

    def test_update_null_resets(self):
        s = Sentence.from_raw("12345")
        with pytest.raises(Exception):
            s.update_raw("A1あ\0ア亜")
        assert s.as_raw_text() == " "
        assert s.char_types_list() == [O]

    def test_one(self):
        s = Sentence.from_raw("あ")
        assert s.as_raw_text() == "あ"
        assert s.char_types_list() == [H]
        assert s.boundaries_list() == []
        assert s.boundary_scores_list() == []

    def test_full(self):
        s = Sentence.from_raw("Rustで良いプログラミング体験を！")
        assert s.as_raw_text() == "Rustで良いプログラミング体験を！"
        assert s.char_types_list() == [
            R, R, R, R, H, J, H, K, K, K, K, K, K, K, J, J, H, O,
        ]
        assert s.boundaries_list() == [UNK] * 17
        assert s.boundary_scores_list() == []

    def test_update(self):
        s = Sentence.from_raw("12345")
        s.update_raw("Rustで良いプログラミング体験を！")
        assert s.as_raw_text() == "Rustで良いプログラミング体験を！"
        assert len(s) == 18

    def test_write_partial_annotation(self):
        # doctest at sentence.rs:206-213
        s = Sentence.from_raw("まぁ良いだろう")
        assert s.write_partial_annotation_text() == "ま ぁ 良 い だ ろ う"


class TestFromTokenized:
    def test_empty(self):
        with pytest.raises(Exception) as e:
            Sentence.from_tokenized("")
        assert err_str(e) == (
            "InvalidArgumentError: tokenized_text: must contain at least one character"
        )

    def test_null(self):
        with pytest.raises(Exception) as e:
            Sentence.from_tokenized("A1あ\0ア亜")
        assert err_str(e) == (
            "InvalidArgumentError: tokenized_text: must not contain NULL"
        )

    def test_start_with_space(self):
        with pytest.raises(Exception) as e:
            Sentence.from_tokenized(" Rust で 良い プログラミング 体験 を ！")
        assert err_str(e) == (
            "InvalidArgumentError: tokenized_text: must not start with a whitespace"
        )

    def test_end_with_space(self):
        with pytest.raises(Exception) as e:
            Sentence.from_tokenized("Rust で 良い プログラミング 体験 を ！ ")
        assert err_str(e) == (
            "InvalidArgumentError: tokenized_text: must not end with a whitespace"
        )

    def test_two_spaces(self):
        with pytest.raises(Exception) as e:
            Sentence.from_tokenized("Rust で 良い  プログラミング 体験 を ！")
        assert err_str(e) == (
            "InvalidArgumentError: tokenized_text: must not contain consecutive whitespaces"
        )

    def test_update_error_resets(self):
        s = Sentence.from_raw("12345")
        with pytest.raises(Exception):
            s.update_tokenized("")
        assert s.as_raw_text() == " "
        assert s.char_types_list() == [O]

    def test_one(self):
        s = Sentence.from_tokenized("あ")
        assert s.as_raw_text() == "あ"
        assert s.char_types_list() == [H]
        assert s.boundaries_list() == []

    def test_basic(self):
        s = Sentence.from_tokenized("Rust で 良い プログラミング 体験 を ！")
        assert s.as_raw_text() == "Rustで良いプログラミング体験を！"
        assert s.char_types_list() == [
            R, R, R, R, H, J, H, K, K, K, K, K, K, K, J, J, H, O,
        ]
        assert s.boundaries_list() == [
            NWB, NWB, NWB, WB, WB, NWB, WB, NWB, NWB, NWB, NWB, NWB, NWB, WB,
            NWB, WB, WB,
        ]

    def test_with_tags(self):
        s = Sentence.from_tokenized(
            "Rust/名詞 で 良い/形容詞 プログラミング 体験 を ！/補助記号"
        )
        assert s.as_raw_text() == "Rustで良いプログラミング体験を！"
        assert s.n_tags == 1
        assert s.tags == [
            None, None, None, "名詞", None, None, "形容詞",
            None, None, None, None, None, None, None, None, None, None,
            "補助記号",
        ]

    def test_with_tags_two_slashes(self):
        s = Sentence.from_tokenized(
            "Rust/名詞 で 良い/形容詞/イイ プログラミング 体験 を ！/補助記号"
        )
        assert s.n_tags == 2
        expected = [None] * 36
        expected[6] = "名詞"
        expected[12] = "形容詞"
        expected[13] = "イイ"
        expected[34] = "補助記号"
        assert s.tags == expected

    def test_with_tags_empty_slashes(self):
        s = Sentence.from_tokenized(
            "Rust//ラスト で 良い/形容詞/イイ プログラミング 体験 を ！//ビックリ"
        )
        assert s.n_tags == 2
        assert s.tags[6] is None
        assert s.tags[7] == "ラスト"
        assert s.tags[12] == "形容詞"
        assert s.tags[13] == "イイ"
        assert s.tags[34] is None
        assert s.tags[35] == "ビックリ"

    def test_escape_whitespace(self):
        s = Sentence.from_tokenized("火星 猫 の 生態 ( M \\  et\\ al. )")
        assert s.as_raw_text() == "火星猫の生態(M et al.)"
        assert s.char_types_list() == [
            J, J, J, H, J, J, O, R, O, R, R, O, R, R, O, O,
        ]
        assert s.boundaries_list() == [
            NWB, WB, WB, WB, NWB, WB, WB, WB, WB, NWB, NWB, NWB, NWB, NWB, WB,
        ]

    def test_escape_backslash(self):
        s = Sentence.from_tokenized("改行 に \\\\n を 用い る")
        assert s.as_raw_text() == "改行に\\nを用いる"
        assert s.boundaries_list() == [NWB, WB, WB, NWB, WB, WB, NWB, WB]

    def test_escape_slash(self):
        s = Sentence.from_tokenized("品詞 に \\/ を 用い る")
        assert s.as_raw_text() == "品詞に/を用いる"
        assert s.boundaries_list() == [NWB, WB, WB, WB, WB, NWB, WB]


class TestWriters:
    def test_tokenized_unknown(self):
        s = Sentence.from_partial_annotation("火-星 猫|の|生-態")
        assert s.write_tokenized_text() == "の 生態"

    def test_tokenized_roundtrip(self):
        s = Sentence.from_tokenized("Rust で 良い プログラミング 体験 を ！")
        assert s.write_tokenized_text() == "Rust で 良い プログラミング 体験 を ！"

    def test_tokenized_with_tags(self):
        line = "Rust/名詞 で 良い/形容詞 プログラミング 体験 を ！/補助記号"
        s = Sentence.from_tokenized(line)
        assert s.write_tokenized_text() == line

    def test_tokenized_escape(self):
        s = Sentence.from_partial_annotation("火-星-猫|の| |生-態|\\-n")
        assert s.write_tokenized_text() == "火星猫 の \\  生態 \\\\n"

    def test_partial_annotation_writer(self):
        s = Sentence.from_tokenized("まぁ 良い だろう")
        assert s.write_partial_annotation_text() == "ま-ぁ|良-い|だ-ろ-う"

        s = Sentence.from_tokenized(
            "まぁ/副詞/マー 良い/形容詞/ヨイ だろう/助動詞/ダロー"
        )
        assert (
            s.write_partial_annotation_text()
            == "ま-ぁ/副詞/マー|良-い/形容詞/ヨイ|だ-ろ-う/助動詞/ダロー"
        )

    def test_tokenized_text_skips_unknown_segments(self):
        # doctest at sentence.rs:833-848
        s = Sentence.from_partial_annotation(
            "ま-ぁ/名詞|社-長/名詞|は/助詞|火-星 猫|だ/助動詞"
        )
        assert s.write_tokenized_text() == "まぁ/名詞 社長/名詞 は/助詞 だ/助動詞"


class TestIterTokens:
    def test_unknown_skip(self):
        s = Sentence.from_partial_annotation("火-星 猫|の|生-態")
        toks = list(s.iter_tokens())
        assert [t.surface() for t in toks] == ["の", "生態"]

    def test_all(self):
        s = Sentence.from_tokenized("Rust で 良い プログラミング 体験 を ！")
        toks = list(s.iter_tokens())
        assert [t.surface() for t in toks] == [
            "Rust", "で", "良い", "プログラミング", "体験", "を", "！",
        ]

    def test_with_tags(self):
        s = Sentence.from_tokenized(
            "Rust/名詞 で 良い/形容詞 プログラミング 体験 を ！/補助記号"
        )
        toks = list(s.iter_tokens())
        assert toks[0].tags() == ["名詞"]
        assert toks[1].tags() == [None]
        assert toks[2].tags() == ["形容詞"]
        assert toks[6].tags() == ["補助記号"]

    def test_start_end(self):
        # doctest at sentence.rs:794-817
        s = Sentence.from_partial_annotation("ま-ぁ|社-長|は|火-星 猫|だ")
        toks = list(s.iter_tokens())
        assert [(t.surface(), t.start(), t.end()) for t in toks] == [
            ("まぁ", 0, 2), ("社長", 2, 4), ("は", 4, 5), ("だ", 8, 9),
        ]


class TestPartialAnnotation:
    def test_empty(self):
        with pytest.raises(Exception) as e:
            Sentence.from_partial_annotation("")
        assert err_str(e) == (
            "InvalidArgumentError: partial_annotation_text: must contain at least one character"
        )

    def test_null(self):
        with pytest.raises(Exception) as e:
            Sentence.from_partial_annotation("A-1-あ-\0-ア-亜")
        assert err_str(e) == (
            "InvalidArgumentError: partial_annotation_text: must not contain NULL"
        )

    def test_invalid_length(self):
        with pytest.raises(Exception) as e:
            Sentence.from_partial_annotation("火-星 猫|の|生-態 ")
        assert err_str(e) == (
            "InvalidArgumentError: partial_annotation_text: invalid annotation"
        )

    def test_invalid_boundary_character(self):
        with pytest.raises(Exception) as e:
            Sentence.from_partial_annotation("火-星?猫|の|生-態")
        assert err_str(e) == (
            "InvalidArgumentError: partial_annotation_text: contains an invalid boundary character: '?'"
        )

    def test_basic(self):
        s = Sentence.from_partial_annotation("火-星 猫|の|生-態")
        assert s.as_raw_text() == "火星猫の生態"
        assert s.char_types_list() == [J, J, J, H, J, J]
        assert s.boundaries_list() == [NWB, UNK, WB, WB, NWB]

    def test_with_tags_doctest(self):
        # doctest at sentence.rs:655-671
        s = Sentence.from_partial_annotation(
            "ま-ぁ/名詞/マー|社-長/名詞/シャチョー|は/助詞/ワ|火-星 猫|だ/助動詞/ダ"
        )
        assert s.write_tokenized_text() == (
            "まぁ/名詞/マー 社長/名詞/シャチョー は/助詞/ワ だ/助動詞/ダ"
        )

        s = Sentence.from_partial_annotation(
            "ま-ぁ/名詞/マー|社-長/名詞/シャチョー|は/助詞/ワ|火/名詞/ヒ-星|猫|だ/助動詞/ダ"
        )
        assert s.write_tokenized_text() == (
            "まぁ/名詞/マー 社長/名詞/シャチョー は/助詞/ワ 火星 猫 だ/助動詞/ダ"
        )


class TestTags:
    def test_reset_tags(self):
        # doctest at sentence.rs:950-965
        s = Sentence.from_tokenized(
            "火星/名詞/カセー に 行き/動詞 まし/助動詞/マシ た"
        )
        assert s.n_tags == 2
        assert len(s.tags) == 16
        assert (
            s.write_tokenized_text()
            == "火星/名詞/カセー に 行き/動詞 まし/助動詞/マシ た"
        )
        s.reset_tags(1)
        assert s.n_tags == 1
        assert len(s.tags) == 8
        assert s.write_tokenized_text() == "火星 に 行き まし た"

    def test_tags_layout(self):
        # doctest at sentence.rs:1055-1066
        s = Sentence.from_tokenized(
            "火星/名詞/カセー に 行き/動詞 まし/助動詞/マシ た"
        )
        assert s.tags[2] == "名詞"
        assert s.tags[3] == "カセー"
        assert s.tags[8] == "動詞"
        assert s.tags[12] == "助動詞"
        assert s.tags[13] == "マシ"

    def test_tags_mut(self):
        # doctest at sentence.rs:1083-1096
        s = Sentence.from_tokenized(
            "火星/名詞/カセー に 行き/動詞 まし/助動詞/マシ た"
        )
        s.tags[4] = "助詞"
        assert (
            s.write_tokenized_text()
            == "火星/名詞/カセー に/助詞 行き/動詞 まし/助動詞/マシ た"
        )
        s.tags[1] = "ヒ"  # not the last char of a word -> ignored by writer
        assert (
            s.write_tokenized_text()
            == "火星/名詞/カセー に/助詞 行き/動詞 まし/助動詞/マシ た"
        )

    def test_boundaries_mut(self):
        # doctest at sentence.rs:1025-1031
        s = Sentence.from_partial_annotation("火-星|に|行-き|ま-し た")
        s.boundaries[6] = WB
        assert s.write_partial_annotation_text() == "火-星|に|行-き|ま-し|た"

    def test_default(self):
        s = Sentence.default()
        assert s.as_raw_text() == " "
        assert s.n_tags == 0


class TestByteCharMaps:
    """Byte<->char index maps (reference sentence.rs:99-100,164-196,
    1179-1191 and the map assertions ported from its update_raw/from_raw
    tests, e.g. sentence.rs:1330-1450). Rust strings index by byte, so the
    reference maintains both maps; the same API is provided for library
    users doing byte-offset work."""

    def test_default_sentence(self):
        # sentence.rs:1332-1333 (single space)
        s = Sentence.default()
        assert s.str_to_char_pos_map().tolist() == [0, 1]
        assert s.char_to_str_pos().tolist() == [0, 1]

    def test_one_multibyte_char(self):
        # sentence.rs:1372-1373,1385-1386 ("あ" = 3 bytes)
        s = Sentence.from_raw("あ")
        assert s.str_to_char_pos_map().tolist() == [0, 0, 0, 1]
        assert s.char_to_str_pos().tolist() == [0, 3]
        assert s.str_to_char_pos(3) == 1
        assert s.str_to_char_pos(0) == 0

    def test_mixed_ascii_japanese(self):
        # sentence.rs:1393-1433 ("Rustで良いプログラミング体験を！")
        s = Sentence.from_raw("Rustで良いプログラミング体験を！")
        assert s.str_to_char_pos_map().tolist() == [
            0, 1, 2, 3, 4, 0, 0, 5, 0, 0, 6, 0, 0, 7, 0, 0, 8, 0, 0, 9,
            0, 0, 10, 0, 0, 11, 0, 0, 12, 0, 0, 13, 0, 0, 14, 0, 0, 15,
            0, 0, 16, 0, 0, 17, 0, 0, 18,
        ]
        assert s.char_to_str_pos().tolist() == [
            0, 1, 2, 3, 4, 7, 10, 13, 16, 19, 22, 25, 28, 31, 34, 37,
            40, 43, 46,
        ]

    def test_update_raw_rebuilds_maps(self):
        # sentence.rs:1368-1386 (update_raw "12345" -> "あ")
        s = Sentence.from_raw("12345")
        assert s.char_to_str_pos().tolist() == [0, 1, 2, 3, 4, 5]
        s.update_raw("あ")
        assert s.str_to_char_pos_map().tolist() == [0, 0, 0, 1]
        assert s.char_to_str_pos().tolist() == [0, 3]

    def test_astral_char_four_bytes(self):
        s = Sentence.from_raw("a\U0001F431b")  # 1 + 4 + 1 bytes
        assert s.char_to_str_pos().tolist() == [0, 1, 5, 6]
        m = s.str_to_char_pos_map().tolist()
        assert m[0] == 0 and m[1] == 1 and m[5] == 2 and m[6] == 3
        assert m[2] == m[3] == m[4] == 0

    def test_parsed_formats_build_maps(self):
        # the parsed constructors go through the same map machinery
        # (reference sentence.rs:1500-1501 etc. assert them per format)
        s = Sentence.from_tokenized("火星 猫")
        assert s.char_to_str_pos().tolist() == [0, 3, 6, 9]
        assert s.str_to_char_pos(6) == 2
        s2 = Sentence.from_partial_annotation("火-星|猫")
        assert s2.char_to_str_pos().tolist() == [0, 3, 6, 9]

    def test_byte_substring_consistency(self):
        # char_to_str_pos offsets slice the UTF-8 encoding exactly like
        # text_substring slices chars (reference text_substring
        # sentence.rs:1184-1186 goes through char_to_str_pos)
        s = Sentence.from_raw("Rustで良い体験")
        raw = s.as_raw_text().encode("utf-8")
        c2s = s.char_to_str_pos()
        for a, b in ((0, 4), (4, 6), (2, 8)):
            assert raw[c2s[a]:c2s[b]].decode("utf-8") == \
                s.text_substring(a, b)
