"""Lean serving pipeline vs the general Sentence path.

The lean path (serving.LeanServer: native uint16 tensorize with fused
fullwidth normalization -> device kernel with fused wsconst -> native
byte-level detokenizer) must produce byte-identical output to the general
path (normalize -> Sentence.from_raw -> predict -> post filters ->
re-apply onto the original text -> write_tokenized_text), which pins the
reference CLI semantics (predict/src/main.rs:126-180).
"""

import io

import numpy as np
import pytest

from vaporetto_tpu.models.model import Model
from vaporetto_tpu.predictor import Predictor
from vaporetto_tpu.rules import KyteaFullwidthFilter, KyteaWsConstFilter
from vaporetto_tpu.sentence import CharacterType, Sentence

from test_scorers import create_test_model


def general_path(pred, lines, wsconst=(), normalize=True):
    """The reference CLI's per-line loop, as bytes."""
    pre = KyteaFullwidthFilter()
    posts = [KyteaWsConstFilter(CharacterType(t)) for t in wsconst]
    out = []
    for line in lines:
        try:
            text = pre.filter(line) if normalize else line
            s = Sentence.from_raw(text)
        except Exception:
            out.append("")
            continue
        pred.predict(s)
        for f in posts:
            f.filter(s)
        orig = s
        if normalize:
            orig = Sentence.from_raw(line)
            orig.boundaries = s.boundaries
        out.append(orig.write_tokenized_text())
    return ("\n".join(out) + "\n").encode("utf-8") if out else b""


def lean_path(pred, lines, wsconst=(), normalize=True, batch_lines=4):
    from vaporetto_tpu.serving import LeanServer

    sink = io.BytesIO()

    def fallback(raw_lines):
        data = general_path(
            pred, [b.decode("utf-8") for b in raw_lines], wsconst, normalize
        )
        sink.write(data)

    server = LeanServer(
        pred,
        wsconst=wsconst,
        normalize=normalize,
        batch_lines=batch_lines,
        fallback=fallback,
    )
    blob = ("\n".join(lines) + "\n").encode("utf-8") if lines else b""
    server.run(io.BytesIO(blob), sink)
    return sink.getvalue()


@pytest.fixture(scope="module")
def bundled_pred():
    from vaporetto_tpu.native import available

    if not available():
        pytest.skip("native library unavailable")
    return Predictor(Model.read("/root/reference/resources/model.bin"))


CORPUS = [
    "まぁ社長は火星猫だ",
    "まぁ良いだろう",
    "",  # empty line
    "a b/c\\d",  # escapes: space, slash, backslash
    "ABC123オレンジ",  # halfwidth roman/digits (normalization)
    "ア",  # single char, no gaps
    "火星猫だ火星猫だ火星猫だ",
]


class TestLeanMatchesGeneral:
    def test_bundled_model_corpus(self, bundled_pred):
        want = general_path(bundled_pred, CORPUS)
        got = lean_path(bundled_pred, CORPUS)
        assert got == want

    def test_no_norm(self, bundled_pred):
        want = general_path(bundled_pred, CORPUS, normalize=False)
        got = lean_path(bundled_pred, CORPUS, normalize=False)
        assert got == want

    def test_wsconst_fused(self, bundled_pred):
        ws = (int(CharacterType.KANJI), int(CharacterType.DIGIT))
        want = general_path(bundled_pred, CORPUS, wsconst=ws)
        got = lean_path(bundled_pred, CORPUS, wsconst=ws)
        assert got == want

    def test_astral_fallback(self, bundled_pred):
        lines = ["まぁ社長", "猫だ\U0001F431猫だ", "まぁ良い"]  # emoji batch
        want = general_path(bundled_pred, lines)
        got = lean_path(bundled_pred, lines, batch_lines=2)
        assert got == want

    def test_golden_model(self):
        from vaporetto_tpu.native import available

        if not available():
            pytest.skip("native library unavailable")
        pred = Predictor(create_test_model())
        lines = ["この人は地球人だ", "地球人だ", "人"]
        assert lean_path(pred, lines) == general_path(pred, lines)

    def test_batch_boundary_independence(self, bundled_pred):
        lines = CORPUS * 5
        for bl in (1, 3, 8, 64):
            assert lean_path(bundled_pred, lines, batch_lines=bl) == \
                general_path(bundled_pred, lines)


class TestDetokNative:
    def test_escapes_and_spaces(self):
        from vaporetto_tpu.native import detok_native, available

        if not available():
            pytest.skip("native library unavailable")
        text = "a b".encode("utf-8")
        blob = np.frombuffer(text, dtype=np.uint8)
        starts = np.array([0], dtype=np.int64)
        ends = np.array([len(text)], dtype=np.int64)
        # gaps: a|' ' boundary, ' '|b not
        bnd = np.array([[1, 0]], dtype=np.int8)
        out = detok_native(blob, starts, ends, bnd)
        assert out == b"a \\ b\n"


class TestInputRobustness:
    def test_crlf_lines_match_general_path(self, bundled_pred):
        """CRLF corpora: the lean byte splitter must strip the trailing
        '\r' exactly like universal-newline stdin / the reference's
        BufRead::lines."""
        from vaporetto_tpu.serving import LeanServer

        sink = io.BytesIO()
        server = LeanServer(bundled_pred, fallback=None, batch_lines=4)
        blob = "".join(l + "\r\n" for l in CORPUS if l).encode("utf-8")
        server.run(io.BytesIO(blob), sink)
        expected = general_path(bundled_pred, [l for l in CORPUS if l])
        assert sink.getvalue() == expected

    def test_invalid_utf8_routes_to_fallback(self, bundled_pred):
        """Malformed UTF-8 (bad continuation byte) must be rejected by the
        native tensorizer (rc=1 -> fallback), not silently decoded."""
        from vaporetto_tpu.serving import LeanServer

        sink = io.BytesIO()
        seen = []

        def fallback(lines):
            seen.extend(lines)
            for _ in lines:
                sink.write(b"\n")

        server = LeanServer(bundled_pred, fallback=fallback, batch_lines=4)
        bad = b"\xc3\x41"  # lead byte followed by an ASCII start byte
        blob = b"\xe7\x81\xab\n" + bad + b"\n"
        server.run(io.BytesIO(blob), sink)
        assert bad in seen

    @pytest.mark.parametrize(
        "bad",
        [
            b"\xc0\xaf",          # overlong 2-byte
            b"\xe0\x80\xaf",      # overlong 3-byte
            b"\xed\xa0\x80",      # UTF-16 surrogate
            b"\xf0\x8f\xbf\xbf",  # overlong 4-byte
            b"\xf5\x80\x80\x80",  # beyond U+10FFFF
            b"\xff",              # invalid lead byte
            b"\xe3\x81",          # truncated sequence
        ],
    )
    def test_strict_decoder_parity(self, bundled_pred, bad):
        """Everything Python's strict decoder rejects must be rejected by
        both native tensorizers too (no silent mojibake on the lean path)."""
        from vaporetto_tpu.native import tensorize16_native, tensorize_native

        with pytest.raises(UnicodeDecodeError):
            bad.decode("utf-8")
        blob = np.frombuffer(bad, dtype=np.uint8)
        starts = np.array([0], dtype=np.int64)
        ends = np.array([len(bad)], dtype=np.int64)
        assert tensorize16_native(blob, starts, ends, 8, None) is None
        assert tensorize_native([bad], 8) is None


# ---------------------------------------------------------------------------
# lean --predict-tags path (round 3: device tag pass + native tag detok)
# ---------------------------------------------------------------------------


def general_path_tags(pred, lines, wsconst=(), normalize=True):
    """The reference CLI's per-line loop with fill_tags, as bytes."""
    pre = KyteaFullwidthFilter()
    posts = [KyteaWsConstFilter(CharacterType(t)) for t in wsconst]
    out = []
    for line in lines:
        try:
            text = pre.filter(line) if normalize else line
            s = Sentence.from_raw(text)
        except Exception:
            out.append("")
            continue
        pred.predict(s)
        for f in posts:
            f.filter(s)
        s.fill_tags()
        orig = s
        if normalize:
            orig = Sentence.from_raw(line)
            orig.reset_tags(s.n_tags)
            orig.boundaries = s.boundaries
            orig.tags = list(s.tags)
        out.append(orig.write_tokenized_text())
    return ("\n".join(out) + "\n").encode("utf-8") if out else b""


def lean_path_tags(pred, lines, wsconst=(), normalize=True, batch_lines=4):
    from vaporetto_tpu.serving import LeanServer

    sink = io.BytesIO()

    def fallback(raw_lines):
        data = general_path_tags(
            pred, [b.decode("utf-8") for b in raw_lines], wsconst, normalize
        )
        sink.write(data)

    server = LeanServer(
        pred,
        wsconst=wsconst,
        normalize=normalize,
        batch_lines=batch_lines,
        fallback=fallback,
        tags=True,
    )
    blob = ("\n".join(lines) + "\n").encode("utf-8") if lines else b""
    server.run(io.BytesIO(blob), sink)
    return sink.getvalue()


@pytest.fixture(scope="module")
def bundled_pred_tags():
    from vaporetto_tpu.serving import lean_tags_supported

    pred = Predictor(
        Model.read("/root/reference/resources/model.bin"), True
    )
    if not lean_tags_supported(pred):
        pytest.skip("lean tag path unavailable")
    return pred


class TestLeanTagsMatchesGeneral:
    def test_bundled_model_corpus(self, bundled_pred_tags):
        want = general_path_tags(bundled_pred_tags, CORPUS)
        got = lean_path_tags(bundled_pred_tags, CORPUS)
        assert got == want

    def test_docs_tok_conformance(self, bundled_pred_tags):
        """Byte parity with the reference gold file through the lean tag
        pipeline (the conformance contract, resources/docs.tok)."""
        with open("/root/reference/resources/docs.tok", "rb") as f:
            gold = f.read()
        from conftest import docs_tok_raws

        got = lean_path_tags(bundled_pred_tags, docs_tok_raws())
        assert got == gold

    def test_no_norm_and_wsconst(self, bundled_pred_tags):
        ws = (int(CharacterType.KANJI),)
        want = general_path_tags(
            bundled_pred_tags, CORPUS, wsconst=ws, normalize=False
        )
        got = lean_path_tags(
            bundled_pred_tags, CORPUS, wsconst=ws, normalize=False
        )
        assert got == want

    def test_astral_fallback(self, bundled_pred_tags):
        lines = ["まぁ社長", "猫だ\U0001F431猫だ", "まぁ良い"]
        want = general_path_tags(bundled_pred_tags, lines)
        got = lean_path_tags(bundled_pred_tags, lines, batch_lines=2)
        assert got == want

    def test_golden_model(self):
        from vaporetto_tpu.serving import lean_tags_supported

        pred = Predictor(create_test_model(), True)
        if not lean_tags_supported(pred):
            pytest.skip("lean tag path unavailable")
        lines = ["この人は地球人だ", "地球人だ", "人", "", "だだだ"]
        assert lean_path_tags(pred, lines) == \
            general_path_tags(pred, lines)

    def test_batch_boundary_independence(self, bundled_pred_tags):
        lines = CORPUS * 3
        for bl in (1, 3, 64):
            assert lean_path_tags(bundled_pred_tags, lines,
                                  batch_lines=bl) == \
                general_path_tags(bundled_pred_tags, lines)


# ---------------------------------------------------------------------------
# lean --scores path (round 3: int32 score readback + native formatter)
# ---------------------------------------------------------------------------


def general_path_scores(pred, lines, wsconst=(), normalize=True):
    """The reference CLI's per-line loop with --scores, as bytes
    (predict/src/main.rs:66-75: scores of the NORMALIZED sentence)."""
    pre = KyteaFullwidthFilter()
    posts = [KyteaWsConstFilter(CharacterType(t)) for t in wsconst]
    out = []
    for line in lines:
        try:
            text = pre.filter(line) if normalize else line
            s = Sentence.from_raw(text)
        except Exception:
            out.append("")
            continue
        pred.predict(s)
        for f in posts:
            f.filter(s)
        orig = s
        if normalize:
            orig = Sentence.from_raw(line)
            orig.boundaries = s.boundaries
        block = [orig.write_tokenized_text()]
        text = s.as_raw_text()
        scores = s.boundary_scores_list()
        for i in range(len(text) - 1):
            block.append(f"{i}:{text[i]}{text[i + 1]} {scores[i]}")
        block.append("")  # trailing blank line of the score block
        out.append("\n".join(block))
    return ("\n".join(out) + "\n").encode("utf-8") if out else b""


def lean_path_scores(pred, lines, wsconst=(), normalize=True,
                     batch_lines=4):
    from vaporetto_tpu.serving import LeanServer

    sink = io.BytesIO()

    def fallback(raw_lines):
        sink.write(general_path_scores(
            pred, [b.decode("utf-8") for b in raw_lines], wsconst,
            normalize,
        ))

    server = LeanServer(
        pred,
        wsconst=wsconst,
        normalize=normalize,
        batch_lines=batch_lines,
        fallback=fallback,
        scores=True,
    )
    blob = ("\n".join(lines) + "\n").encode("utf-8") if lines else b""
    server.run(io.BytesIO(blob), sink)
    return sink.getvalue()


class TestLeanScoresMatchesGeneral:
    def test_bundled_model_corpus(self, bundled_pred):
        from vaporetto_tpu.native import scores_detok_available

        if not scores_detok_available():
            pytest.skip("native scores formatter unavailable")
        for kwargs in (
            {},
            {"normalize": False},
            {"wsconst": (int(CharacterType.KANJI),)},
        ):
            want = general_path_scores(bundled_pred, CORPUS, **kwargs)
            got = lean_path_scores(bundled_pred, CORPUS, **kwargs)
            assert got == want, kwargs

    def test_exact_reference_integers(self, bundled_pred):
        """The conformance contract's pinned integers must ride through
        the lean scores path (tests/test_integration.py pins them on the
        general path)."""
        from vaporetto_tpu.native import scores_detok_available

        if not scores_detok_available():
            pytest.skip("native scores formatter unavailable")
        got = lean_path_scores(bundled_pred, ["まぁ社長は火星猫だ"])
        assert "5:火星 -21407".encode() in got
        assert "6:星猫 32767".encode() in got

    def test_astral_fallback_and_batching(self, bundled_pred):
        from vaporetto_tpu.native import scores_detok_available

        if not scores_detok_available():
            pytest.skip("native scores formatter unavailable")
        lines = ["まぁ社長", "猫だ\U0001F431猫だ", "まぁ良い"] + CORPUS
        want = general_path_scores(bundled_pred, lines)
        for bl in (1, 2, 8):
            got = lean_path_scores(bundled_pred, lines, batch_lines=bl)
            assert got == want, bl


# ---------------------------------------------------------------------------
# wsconst G on the lean path (round 3: host UAX#29 mask ANDed into readback)
# ---------------------------------------------------------------------------


class TestLeanGraphemeFilter:
    LINES = [
        "\u304b\u3099\u304d\u3099\u304f\u3099",  # base + combining voiced marks
        "まぁ社長は火星猫だ",
        "áb̂c",      # latin + combining accents
        "アア",
        "",
    ]

    def _general(self, pred, lines, wsconst=()):
        from vaporetto_tpu.rules import ConcatGraphemeClustersFilter

        pre = KyteaFullwidthFilter()
        posts = [ConcatGraphemeClustersFilter()] + [
            KyteaWsConstFilter(CharacterType(t)) for t in wsconst
        ]
        out = []
        for line in lines:
            try:
                s = Sentence.from_raw(pre.filter(line))
            except Exception:
                out.append("")
                continue
            pred.predict(s)
            for f in posts:
                f.filter(s)
            orig = Sentence.from_raw(line)
            orig.boundaries = s.boundaries
            out.append(orig.write_tokenized_text())
        return ("\n".join(out) + "\n").encode("utf-8")

    def test_matches_general(self, bundled_pred):
        from vaporetto_tpu.serving import LeanServer

        want = self._general(bundled_pred, self.LINES)
        sink = io.BytesIO()
        server = LeanServer(
            bundled_pred, grapheme=True, batch_lines=2,
        )
        blob = ("\n".join(self.LINES) + "\n").encode("utf-8")
        server.run(io.BytesIO(blob), sink)
        assert sink.getvalue() == want

    def test_composes_with_device_wsconst(self, bundled_pred):
        from vaporetto_tpu.serving import LeanServer

        ws = (int(CharacterType.KATAKANA),)
        want = self._general(bundled_pred, self.LINES, wsconst=ws)
        sink = io.BytesIO()
        server = LeanServer(
            bundled_pred, wsconst=ws, grapheme=True, batch_lines=4,
        )
        blob = ("\n".join(self.LINES) + "\n").encode("utf-8")
        server.run(io.BytesIO(blob), sink)
        assert sink.getvalue() == want


# ---------------------------------------------------------------------------
# randomized differential fuzz: every lean mode vs the general path
# ---------------------------------------------------------------------------


class TestLeanFuzz:
    """Random lines over an adversarial alphabet (CJK, ASCII incl. the
    escape chars, halfwidth forms that normalize, combining marks, lone
    CR, empty lines) through every lean mode; outputs must equal the
    general path byte-for-byte."""

    def _lines(self, seed, n=40):
        rng = np.random.default_rng(seed)
        pool = (
            [chr(c) for c in range(0x3041, 0x3097)]
            + [chr(c) for c in range(0x4E00, 0x4E40)]
            + list("abcXYZ013 /\\-|")
            + ["ｱ", "Ａ", "１", "ー", "゙", "́", "\r"]
        )
        lines = []
        for _ in range(n):
            k = int(rng.integers(0, 14))
            line = "".join(rng.choice(pool) for _ in range(k))
            # a trailing CR would be stripped as CRLF by any line reader
            # (iter_lines / LeanServer); the helpers here compare
            # post-read lines, so normalize the generator the same way
            if line.endswith("\r"):
                line = line[:-1]
            lines.append(line)
        return lines

    @pytest.mark.parametrize("seed", [1, 2])
    def test_boundaries(self, bundled_pred, seed):
        lines = self._lines(seed)
        assert lean_path(bundled_pred, lines, batch_lines=8) == \
            general_path(bundled_pred, lines)

    @pytest.mark.parametrize("seed", [3])
    def test_grapheme(self, bundled_pred, seed):
        from vaporetto_tpu.serving import LeanServer

        lines = self._lines(seed)
        t = TestLeanGraphemeFilter()
        want = t._general(bundled_pred, lines)
        sink = io.BytesIO()

        def fallback(raw):
            sink.write(t._general(
                bundled_pred, [b.decode("utf-8") for b in raw]
            ))

        LeanServer(
            bundled_pred, grapheme=True, batch_lines=8, fallback=fallback,
        ).run(io.BytesIO(("\n".join(lines) + "\n").encode("utf-8")), sink)
        assert sink.getvalue() == want

    @pytest.mark.parametrize("seed", [4])
    def test_tags(self, bundled_pred_tags, seed):
        lines = self._lines(seed)
        assert lean_path_tags(bundled_pred_tags, lines, batch_lines=8) == \
            general_path_tags(bundled_pred_tags, lines)

    @pytest.mark.parametrize("seed", [5])
    def test_scores(self, bundled_pred, seed):
        from vaporetto_tpu.native import scores_detok_available

        if not scores_detok_available():
            pytest.skip("native scores formatter unavailable")
        lines = self._lines(seed)
        assert lean_path_scores(bundled_pred, lines, batch_lines=8) == \
            general_path_scores(bundled_pred, lines)


# ---------------------------------------------------------------------------
# lean HOST engine (round 3: native C++ serving path, no device)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def host_pred():
    pred = Predictor(
        Model.read("/root/reference/resources/model.bin"), backend="host"
    )
    if pred._host() is None:
        pytest.skip("native host engine unavailable")
    return pred


class TestLeanHostEngine:
    def test_boundaries_match_general(self, host_pred, bundled_pred):
        for kwargs in (
            {},
            {"normalize": False},
            {"wsconst": (int(CharacterType.KANJI),)},
        ):
            want = general_path(bundled_pred, CORPUS, **kwargs)
            got = lean_path(host_pred, CORPUS, **kwargs)
            assert got == want, kwargs

    def test_scores_match_general(self, host_pred, bundled_pred):
        from vaporetto_tpu.native import scores_detok_available

        if not scores_detok_available():
            pytest.skip("native scores formatter unavailable")
        want = general_path_scores(bundled_pred, CORPUS)
        got = lean_path_scores(host_pred, CORPUS)
        assert got == want
        assert "5:火星 -21407".encode() in got

    def test_grapheme_and_fuzz(self, host_pred, bundled_pred):
        t = TestLeanGraphemeFilter()
        lines = t.LINES + TestLeanFuzz()._lines(9)
        from vaporetto_tpu.serving import LeanServer

        want = t._general(bundled_pred, lines)
        sink = io.BytesIO()

        def fallback(raw):
            sink.write(t._general(
                bundled_pred, [b.decode("utf-8") for b in raw]
            ))

        LeanServer(
            host_pred, grapheme=True, batch_lines=8, fallback=fallback,
        ).run(io.BytesIO(("\n".join(lines) + "\n").encode("utf-8")), sink)
        assert sink.getvalue() == want

    def test_fuzz_boundaries(self, host_pred, bundled_pred):
        lines = TestLeanFuzz()._lines(10, n=60)
        assert lean_path(host_pred, lines, batch_lines=8) == \
            general_path(bundled_pred, lines)


class TestLeanHostTags:
    def test_tags_match_general(self):
        from vaporetto_tpu.serving import lean_tags_supported

        pred = Predictor(
            Model.read("/root/reference/resources/model.bin"), True,
            backend="host",
        )
        if not lean_tags_supported(pred):
            pytest.skip("lean host tag path unavailable")
        lines = CORPUS + TestLeanFuzz()._lines(11, n=40)
        want = general_path_tags(pred, lines)
        got = lean_path_tags(pred, lines, batch_lines=8)
        assert got == want

    def test_docs_tok_conformance(self):
        from vaporetto_tpu.serving import lean_tags_supported

        pred = Predictor(
            Model.read("/root/reference/resources/model.bin"), True,
            backend="host",
        )
        if not lean_tags_supported(pred):
            pytest.skip("lean host tag path unavailable")
        with open("/root/reference/resources/docs.tok", "rb") as f:
            gold = f.read()
        from conftest import docs_tok_raws

        assert lean_path_tags(pred, docs_tok_raws()) == gold

    def test_astral_fallback_host(self, host_pred, bundled_pred):
        lines = ["まぁ社長", "猫だ\U0001F431猫だ", "まぁ良い"]
        want = general_path(bundled_pred, lines)
        got = lean_path(host_pred, lines, batch_lines=2)
        assert got == want


def test_arith_char_type_classification_parity():
    """The serve kernel's range-compare char typing must equal the
    table (reference sentence.rs:50-67) for every BMP codepoint."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vaporetto_tpu.ops.match import classify_types_bmp_arith
    from vaporetto_tpu.sentence import _CHAR_TYPE_TABLE_SMALL

    cps = jnp.asarray(np.arange(65536, dtype=np.int32)[None, :])
    got = np.asarray(jax.jit(classify_types_bmp_arith)(cps))[0]
    assert (got == _CHAR_TYPE_TABLE_SMALL.astype(np.int32)).all()


class TestShortLinePacking:
    """The packed short-line layout (serving.PACK_L rows, separator
    gaps) must be byte-identical to the unpacked lean/general paths."""

    def test_packing_activates(self, bundled_pred):
        from vaporetto_tpu.serving import LeanServer

        server = LeanServer(bundled_pred, batch_lines=4)
        assert server.pack and server._sep >= 1

    def test_packed_corpus_matches_general(self, bundled_pred):
        rng = np.random.default_rng(5)
        pool = "まぁ社長は火星猫だ良いだろうアABC123"
        lines = [
            "".join(
                pool[i] for i in rng.integers(0, len(pool),
                                              rng.integers(0, 20))
            )
            for _ in range(300)
        ]
        want = general_path(bundled_pred, lines)
        got = lean_path(bundled_pred, lines, batch_lines=64)
        assert got == want

    def test_mixed_lengths_cross_pack_threshold(self, bundled_pred):
        from vaporetto_tpu.serving import PACK_MAX_LINE

        long_line = "火星猫だ" * (PACK_MAX_LINE // 2)  # > PACK_MAX_LINE
        lines = ["まぁ社長", long_line, "猫だ", "", "ア"]
        want = general_path(bundled_pred, lines)
        got = lean_path(bundled_pred, lines, batch_lines=8)
        assert got == want

    def test_packed_wsconst(self, bundled_pred):
        ws = (int(CharacterType.KANJI),)
        lines = ["火星猫だ", "猫猫猫", "だ火星"] * 20
        want = general_path(bundled_pred, lines, wsconst=ws)
        got = lean_path(bundled_pred, lines, wsconst=ws, batch_lines=32)
        assert got == want

    def test_nul_line_matches_general(self, bundled_pred):
        # the reference's from_raw rejects NUL ("contains NULL"); the
        # general path emits a blank line. The lean tensorizers must
        # reject NUL (it would alias the packed separator) and route the
        # batch to the fallback, matching byte-for-byte.
        lines = ["まぁ社長", "猫\x00だ", "良いだろう"]
        want = general_path(bundled_pred, lines)
        got = lean_path(bundled_pred, lines, batch_lines=4)
        assert got == want

    def test_packed_separator_isolation_golden(self):
        """Neighbor lines must not leak scores/context across the
        separator: compare per-line predictions against the same lines
        surrounded by unrelated neighbors, on the golden model (whose
        exact integer scores are pinned in test_scorers)."""
        pred = Predictor(create_test_model())
        rng = np.random.default_rng(11)
        pool = "我ら全世界猫だ人民"
        base = [
            "".join(pool[i] for i in rng.integers(0, len(pool),
                                                  rng.integers(1, 9)))
            for _ in range(100)
        ]
        solo = lean_path(pred, base, batch_lines=128)
        shuffled = list(base)
        rng.shuffle(shuffled)
        interleaved = [x for pair in zip(shuffled, base) for x in pair]
        packed = lean_path(pred, interleaved, batch_lines=256)
        packed_lines = packed.decode("utf-8").splitlines()
        solo_lines = solo.decode("utf-8").splitlines()
        assert packed_lines[1::2] == solo_lines


def test_packed_tags_match_general():
    """--predict-tags through the PACKED short-line layout must be
    byte-identical to the general path (separator-aware span derivation
    keeps tokens within lines)."""
    import io

    from vaporetto_tpu.native import available
    from vaporetto_tpu.serving import LeanServer
    from vaporetto_tpu.rules import KyteaFullwidthFilter

    if not available():
        pytest.skip("native library unavailable")
    pred = Predictor(
        Model.read("/root/reference/resources/model.bin"), True
    )
    lines = [
        "まぁ社長は火星猫だ", "まぁ良いだろう", "", "ア",
        "火星猫だ火星猫だ", "a b/c\\d",
    ] * 40
    server = LeanServer(pred, tags=True, batch_lines=64)
    assert server.pack  # short lines + tags now pack
    sink = io.BytesIO()
    blob = ("\n".join(lines) + "\n").encode("utf-8")
    server.run(io.BytesIO(blob), sink)

    pre = KyteaFullwidthFilter()
    out = []
    for line in lines:
        try:
            s = Sentence.from_raw(pre.filter(line))
        except Exception:
            out.append("")
            continue
        pred.predict(s)
        s.fill_tags()
        orig = Sentence.from_raw(line)
        orig.reset_tags(s.n_tags)
        orig.boundaries = s.boundaries
        orig.tags = list(s.tags)
        out.append(orig.write_tokenized_text())
    want = ("\n".join(out) + "\n").encode("utf-8")
    assert sink.getvalue() == want


class TestGapBitHelpers:
    """Column-major gap-bit layout: device pack, host pack, and host
    unpack must agree (the host pair backs the grapheme mask and the
    stale-native-lib fallbacks)."""

    @pytest.mark.parametrize("G", [7, 8, 63, 255, 511])
    def test_round_trip_and_device_parity(self, G):
        import jax

        from vaporetto_tpu.predictor import (
            _pack_gap_bits,
            pack_gap_bits_np,
            unpack_gap_bits,
        )

        rng = np.random.default_rng(G)
        bnd = rng.integers(0, 2, size=(5, G)).astype(np.uint8)
        dev = np.asarray(jax.jit(_pack_gap_bits)(bnd.astype(bool)))
        host = pack_gap_bits_np(bnd)
        assert np.array_equal(dev, host)
        back = unpack_gap_bits(dev)
        assert np.array_equal(back[:, :G], bnd)
        Gp = -(-G // 8) * 8
        assert not back[:, G:Gp].any()  # padding bits stay clear


class TestPackedScoresAndRich:
    """Round 5: packing covers EVERY lean flag set — --scores and the
    rich combinations ride the packed layout through the placement-aware
    native writers (vt_detok_scores2 / vt_detok_tags2)."""

    LINES = [
        "まぁ社長は火星猫だ", "まぁ良いだろう", "", "ア",
        "火星猫だ火星猫だ", "a b/c\\d", "ABC123オレンジ",
    ] * 30

    def test_packed_scores_match_general(self, bundled_pred):
        from vaporetto_tpu.serving import LeanServer

        server = LeanServer(bundled_pred, scores=True, batch_lines=32)
        assert server.pack  # scores now pack
        sink = io.BytesIO()
        blob = ("\n".join(self.LINES) + "\n").encode("utf-8")
        server.run(io.BytesIO(blob), sink)
        assert server.stats["packed_dispatches"] > 0
        want = general_path_scores(bundled_pred, self.LINES)
        assert sink.getvalue() == want

    def test_packed_scores_exact_integers(self, bundled_pred):
        from vaporetto_tpu.serving import LeanServer

        server = LeanServer(bundled_pred, scores=True, batch_lines=16)
        sink = io.BytesIO()
        lines = ["まぁ社長は火星猫だ"] * 50  # short: packed layout
        blob = ("\n".join(lines) + "\n").encode("utf-8")
        server.run(io.BytesIO(blob), sink)
        got = sink.getvalue()
        assert got.count("5:火星 -21407".encode()) == 50
        assert got.count("6:星猫 32767".encode()) == 50

    def _general_rich(self, lines, scores, tag_scores):
        """General path with --predict-tags plus the diagnostic blocks
        (mirrors cli/predict._emit_outputs)."""
        pred = Predictor(
            Model.read("/root/reference/resources/model.bin"), True
        )
        pred.store_tag_scores(tag_scores)
        pre = KyteaFullwidthFilter()
        out = []
        for line in lines:
            try:
                s = Sentence.from_raw(pre.filter(line))
            except Exception:
                out.append("")
                continue
            pred.predict(s)
            s.fill_tags()
            orig = Sentence.from_raw(line)
            orig.reset_tags(s.n_tags)
            orig.boundaries = s.boundaries
            orig.tags = list(s.tags)
            block = [orig.write_tokenized_text()]
            if scores:
                text = s.as_raw_text()
                sc = s.boundary_scores_list()
                for i in range(len(text) - 1):
                    block.append(f"{i}:{text[i]}{text[i + 1]} {sc[i]}")
                block.append("")
            if tag_scores:
                for tok in s.iter_tokens():
                    cells = [tok.surface()]
                    for cands in tok.tag_candidates():
                        cells.append(",".join(
                            f"{c}:{v}" for c, v in cands
                        ))
                    block.append("\t".join(cells))
                block.append("")
            out.append("\n".join(block))
        return ("\n".join(out) + "\n").encode("utf-8")

    @pytest.mark.parametrize("scores,tag_scores", [
        (True, False), (False, True), (True, True),
    ])
    def test_packed_rich_matches_general(self, scores, tag_scores):
        from vaporetto_tpu.native import available
        from vaporetto_tpu.serving import LeanServer

        if not available():
            pytest.skip("native library unavailable")
        pred = Predictor(
            Model.read("/root/reference/resources/model.bin"), True
        )
        server = LeanServer(
            pred, tags=True, scores=scores, tag_scores=tag_scores,
            batch_lines=32,
        )
        assert server.pack  # rich combos now pack
        sink = io.BytesIO()
        blob = ("\n".join(self.LINES) + "\n").encode("utf-8")
        server.run(io.BytesIO(blob), sink)
        assert server.stats["packed_dispatches"] > 0
        want = self._general_rich(self.LINES, scores, tag_scores)
        assert sink.getvalue() == want

    def test_stats_breakdown_populated(self, bundled_pred):
        from vaporetto_tpu.serving import LeanServer

        server = LeanServer(bundled_pred, batch_lines=16)
        sink = io.BytesIO()
        blob = ("\n".join(self.LINES) + "\n").encode("utf-8")
        server.run(io.BytesIO(blob), sink)
        st = server.stats
        assert st["dispatches"] >= 1
        assert st["readback_bytes"] > 0
        assert st["t_readback_s"] >= 0.0 and st["t_detok_s"] >= 0.0


class TestFuzzMixedLengths:
    """Fuzz the packed/unpacked group splitting: line lengths straddle
    PACK_MAX_LINE so every chunk mixes packed super-groups with classic
    groups, including emoji-forced fallbacks."""

    def _lines(self, seed, n=160):
        rng = np.random.default_rng(seed)
        pool = (
            [chr(c) for c in range(0x3041, 0x3097)]
            + [chr(c) for c in range(0x4E00, 0x4E40)]
            + list("abc01 /\\")
        )
        lines = []
        for _ in range(n):
            r = rng.random()
            if r < 0.6:
                k = int(rng.integers(0, 20))
            elif r < 0.9:
                k = int(rng.integers(60, 70))  # straddles PACK_MAX_LINE
            else:
                k = int(rng.integers(100, 140))
            line = "".join(rng.choice(pool) for _ in range(k))
            if rng.random() < 0.05:
                line += "\U0001F431"  # astral: forces fallback slices
            lines.append(line)
        return lines

    @pytest.mark.parametrize("seed", [11, 12])
    def test_boundaries(self, bundled_pred, seed):
        lines = self._lines(seed)
        assert lean_path(bundled_pred, lines, batch_lines=16) == \
            general_path(bundled_pred, lines)

    @pytest.mark.parametrize("seed", [13])
    def test_tags(self, bundled_pred_tags, seed):
        lines = self._lines(seed)
        assert lean_path_tags(bundled_pred_tags, lines, batch_lines=16) == \
            general_path_tags(bundled_pred_tags, lines)


def test_very_long_line_routes_to_chunked_general_path(bundled_pred):
    """Lines beyond LONG_SENTENCE_THRESHOLD must leave the lean path
    (halo-overlap chunking in the fallback) without corrupting the
    surrounding short lines' outputs or ordering."""
    rng = np.random.default_rng(21)
    pool = "まぁ社長は火星猫だ良いだろう"
    long_line = "".join(
        pool[i] for i in rng.integers(0, len(pool), 9000)
    )
    lines = ["まぁ社長", long_line, "猫だ"]
    want = general_path(bundled_pred, lines)
    got = lean_path(bundled_pred, lines, batch_lines=4)
    assert got == want


def test_pack_separator_covers_wide_reach_weights():
    """A model whose weight rows reach far past the match end (legal via
    the model schema: weight arrays longer than the window span) must
    widen the packing separator accordingly — and stay byte-identical
    to the general path on packed short lines."""
    from vaporetto_tpu.models.model import Model, NgramData
    from vaporetto_tpu.serving import LeanServer, pack_separator

    model = Model(
        char_ngram_model=[
            NgramData("猫", [100] * 14),  # reach = -3 + 13 = +10 gaps
            NgramData("火", [-50, 60, -70]),
        ],
        type_ngram_model=[NgramData(bytes([5]), [5, -5, 5, -5])],
        dict_model=[],
        bias=-20,
        char_window_size=3,
        type_window_size=3,
    )
    pred = Predictor(model)
    server = LeanServer(pred, batch_lines=64)
    assert server.pack and server._sep >= 10
    rng = np.random.default_rng(31)
    pool = "猫火だ山川"
    lines = [
        "".join(pool[i] for i in rng.integers(0, len(pool),
                                              rng.integers(1, 12)))
        for _ in range(120)
    ]
    want = general_path(pred, lines)
    got = lean_path(pred, lines, batch_lines=64)
    assert got == want
